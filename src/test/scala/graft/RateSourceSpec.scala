package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.sink.{ColumnSpec, JdbcDeltaSink, TableSpec}
import graft.streaming.DeltaPipeline

/** Live-subscription phase against a genuinely UNBOUNDED push source —
  * the rate source standing in for the reference's event-service
  * subscription (runner.rs:326-355; a Kafka source differs only in
  * config). Covers what the file-source specs cannot: a stream with no
  * end, stopped MID-STREAM and restarted from its checkpoint, with the
  * per-source offset map advancing through the sink transaction
  * exactly once.
  *
  * Exactly-once invariant asserted structurally: rate-source values are
  * consecutive integers and batches commit in order, so the sink table
  * must always hold a contiguous, duplicate-free prefix 0..max — any
  * replayed batch (double-apply) or dropped batch (hole) breaks it. */
class RateSourceSpec extends SparkTestBase {

  test("rate-source pipeline: mid-stream restart, exactly-once rows + offsets") {
    val ckpt = Files.createTempDirectory("graft-rate-ckpt").toString
    val sink = new JdbcDeltaSink(
      "jdbc:derby:memory:ratelive;create=true",
      TableSpec("live_t", 1, Seq(
        ColumnSpec("event_id", "BIGINT", index = true),
        ColumnSpec("payload", "BIGINT"))))

    // subscription envelope: two logical sources by id parity, the
    // event id doubling as the per-source offset (runner.rs keeps one
    // offset per source id; the sink upserts max per micro-batch)
    def pipeline() = {
      val stream = spark.readStream.format("rate")
        .option("rowsPerSecond", "200").load()
      val envelope = stream.select(
        col("value").as("event_id"),
        (col("value") % 7).as("payload"),
        concat(lit("src"), pmod(col("value"), lit(2))).as("_source"),
        col("value").as("_offset"))
      DeltaPipeline.start(envelope, sink, ckpt,
        Trigger.ProcessingTime("250 milliseconds"))
    }

    def ids(): Seq[Long] =
      sink.readRows().map(_(0).asInstanceOf[Long]).sorted

    def awaitRows(atLeast: Int): Unit = {
      val deadline = System.nanoTime() + 90L * 1000 * 1000 * 1000
      while (ids().size < atLeast && System.nanoTime() < deadline)
        Thread.sleep(200)
      assert(ids().size >= atLeast, s"timed out waiting for $atLeast rows")
    }

    def assertExactlyOnce(): Long = {
      val got = ids()
      assert(got.nonEmpty)
      val max = got.last
      assert(got === (0L to max), s"committed prefix must be contiguous " +
        s"and duplicate-free, got ${got.size} rows up to $max")
      val offs = sink.getOffsets()
      val expected = Seq("src0", "src1").flatMap { s =>
        val parity = if (s == "src0") 0L else 1L
        val m = got.filter(_ % 2 == parity)
        if (m.isEmpty) None else Some(s -> m.last)
      }.toMap
      assert(offs === expected,
        "offset map must match the committed data exactly (same txn)")
      max
    }

    val q1 = pipeline()
    try awaitRows(20) finally q1.stop()   // stop MID-STREAM, not at a boundary
    val max1 = assertExactlyOnce()

    // restart from the checkpoint: the engine resumes from its committed
    // rate offset; an in-flight uncommitted batch replays into the
    // sink's batch-id idempotence — the prefix must simply keep growing
    val q2 = pipeline()
    try awaitRows(max1.toInt + 21) finally q2.stop()
    val max2 = assertExactlyOnce()
    assert(max2 > max1, "restarted stream must extend the prefix")
  }
}
