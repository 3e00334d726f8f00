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

  test("session windows merge events within the gap and split across it") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(min: Int) = new Timestamp(3600L * 1000 + min * 60000L)

    val mem = MemoryStream[(Timestamp, String)]
    val agg = mem.toDF().toDF("ts", "k")
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "5 minutes"), col("k"))
      .agg(count(lit(1)).as("n"))
      .select(col("session_window.start").as("s"), col("k"), col("n"))
    val q = agg.writeStream.outputMode("complete").format("memory")
      .queryName("sw_test").start()
    try {
      // 0,3,6 chain into one session (gaps < 5m); 20 starts a new one
      mem.addData((ts(0), "a"), (ts(3), "a"), (ts(6), "a"), (ts(20), "a"))
      q.processAllAvailable()
      val sessions = spark.sql("SELECT s, n FROM sw_test WHERE k = 'a'")
        .as[(Timestamp, Long)].collect().toMap
      assert(sessions === Map(ts(0) -> 3L, ts(20) -> 1L),
        s"expected two sessions (got $sessions)")
    } finally q.stop()
  }

  test("windowed trending: MG summary per event-time window under a watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(min: Int) = new Timestamp(3600L * 1000 + min * 60000L)

    val mem = MemoryStream[(Timestamp, String)]
    val agg = mem.toDF().toDF("ts", "item")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes"))
      .agg(graft.ops.Frequency.mgSummary(col("item"), 8).as("hh"))
      .select(col("window.start").as("w"),
        expr("transform(hh, e -> e.item)").as("ranked"))

    val latest = scala.collection.mutable.Map.empty[Timestamp, Seq[String]]
    val q = agg.writeStream.outputMode("update")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        df.collect().foreach(r => latest(r.getTimestamp(0)) = r.getSeq[String](1))
        ()
      }.start()
    try {
      mem.addData((ts(1), "a"), (ts(2), "a"), (ts(3), "b"),
        (ts(11), "c"), (ts(12), "c"), (ts(13), "b"))
      q.processAllAvailable()
      assert(latest(ts(0)) === Seq("a", "b"), "window 1: a(2) > b(1)")
      assert(latest(ts(10)) === Seq("c", "b"), "window 2: c(2) > b(1)")
      // next batch: window-1 state merges with new arrivals (b overtakes)
      mem.addData((ts(4), "b"), (ts(5), "b"))
      q.processAllAvailable()
      assert(latest(ts(0)) === Seq("b", "a"),
        "per-window MG state merges across batches and re-ranks")
    } finally q.stop()
  }

  test("approx_count_distinct stays within the configured relative error") {
    import spark.implicits._
    val df = spark.range(50000)
      .select((col("id") % 50).as("g"), (col("id") % 1337).as("v"))
    val got = df.groupBy(col("g"))
      .agg(approx_count_distinct(col("v"), 0.02).as("approx"))
      .as[(Long, Long)].collect()
    // every group sees all 1337 distinct values (50000/50 = 1000 rows per
    // group... 1000 rows cover v = g%1337 stride — compute exact per group)
    val exact = df.as[(Long, Long)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).distinct.size.toLong).toMap
    got.foreach { case (g, approx) =>
      val e = exact(g)
      assert(math.abs(approx - e) <= math.max(3L, (e * 0.1).toLong),
        s"group $g: approx $approx vs exact $e outside 10%")
    }
  }
}
