package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Event-time windowed aggregation with watermark — the Structured
  * Streaming late-data machinery (not present in the reference, whose
  * lamport order is total — SURVEY §2.8; first-class here because a
  * 100 TB event pipeline cannot assume totally ordered arrival). */
class WatermarkSpec extends SparkTestBase {

  test("tumbling-window counts drop data later than the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(min: Int) = new Timestamp(3600L * 1000 + min * 60000L)

    val mem = MemoryStream[(Timestamp, String)]
    val agg = mem.toDF().toDF("ts", "k")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes"), col("k"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w"), col("k"), col("n"))
    val q = agg.writeStream.outputMode("update").format("memory")
      .queryName("wm_test").start()
    try {
      // window [60,70): two events; then advance event time far ahead
      mem.addData((ts(2), "a"), (ts(5), "a"))
      q.processAllAvailable()
      mem.addData((ts(40), "a")) // watermark -> 30min: window [60,70) closes
      q.processAllAvailable()
      // a straggler 35 minutes late — behind the watermark, must be dropped
      mem.addData((ts(3), "a"))
      q.processAllAvailable()
      val counts = spark.sql("SELECT w, n FROM wm_test WHERE k = 'a'")
        .as[(Timestamp, Long)].collect().groupBy(_._1)
        .view.mapValues(_.map(_._2).max).toMap
      assert(counts(ts(0)) === 2L,
        s"late straggler must not bump the closed window (got $counts)")
    } finally q.stop()
  }
}
