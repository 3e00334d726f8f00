package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.sink.{ColumnSpec, JdbcDeltaSink, TableSpec}
import graft.streaming.DeltaPipeline

/** Restart semantics (reference runner.rs three-phase replay/catch-up/
  * live, §2.8): a query stopped and restarted from its checkpoint must
  * not re-apply delivered batches (sink idempotence + engine offset
  * recovery), and must pick up data that arrived while it was down. */
class RestartSpec extends SparkTestBase {

  test("file-source pipeline survives restart: no duplicates, catch-up applied") {
    import spark.implicits._
    val srcDir = Files.createTempDirectory("graft-src").toString
    val ckpt = Files.createTempDirectory("graft-restart-ckpt").toString
    val sink = new JdbcDeltaSink(
      "jdbc:derby:memory:restart;create=true",
      TableSpec("counts_t", 1, Seq(ColumnSpec("k", "VARCHAR(32)"))))

    // epoch 1 files (arrive before first start)
    Seq("a", "a", "b").toDF("k").write.mode("append").parquet(srcDir)

    def pipeline() = {
      val stream = spark.readStream.schema("k STRING").parquet(srcDir)
      // stateless passthrough of raw rows as +1 deltas; the sink's
      // consolidation collapses them per batch
      DeltaPipeline.start(stream, sink, ckpt, Trigger.AvailableNow())
    }

    val q1 = pipeline(); q1.awaitTermination(60000); q1.stop()
    def bag() = sink.readRows().map(r => r(0).asInstanceOf[String])
      .groupBy(identity).view.mapValues(_.size).toMap
    assert(bag() === Map("a" -> 2, "b" -> 1))

    // while down: epoch 2 files land
    Seq("b", "c").toDF("k").write.mode("append").parquet(srcDir)

    val q2 = pipeline(); q2.awaitTermination(60000); q2.stop()
    assert(bag() === Map("a" -> 2, "b" -> 2, "c" -> 1),
      "catch-up applied exactly once: epoch-1 rows not re-applied")

    // restart with nothing new: a replayed/empty run must change nothing
    val q3 = pipeline(); q3.awaitTermination(60000); q3.stop()
    assert(bag() === Map("a" -> 2, "b" -> 2, "c" -> 1))
  }
}
