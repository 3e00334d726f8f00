package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.JoinStream

/** Stream-stream interval join ([[graft.streaming.JoinStream]]):
  * cross-batch matching through keyed state, the horizon bound, the
  * left-outer null emission after provable unmatchability, and the
  * late-data drop — the four contracts the attribution shape rests on.
  */
class JoinStreamSpec extends SparkTestBase {
  import spark.implicits._

  // (key, epoch-second) tuples -> event-time DataFrames
  private def evDF(mem: MemoryStream[(Long, Long)], k: String, t: String) =
    mem.toDF().toDF(k, s"${t}_s")
      .select(col(k), timestamp_seconds(col(s"${t}_s")).as(t))

  test("inner: matches within horizon across micro-batches; outside horizon never joins") {
    implicit val sqlCtx = spark.sqlContext
    val signups = MemoryStream[(Long, Long)]
    val buys = MemoryStream[(Long, Long)]
    val q = JoinStream.intervalJoin(
        evDF(signups, "s_user", "s_ts"), evDF(buys, "b_user", "b_ts"),
        "s_user", "b_user", "s_ts", "b_ts",
        horizon = "10 minutes", watermark = "5 minutes")
      .select(col("s_user"), col("s_ts").cast("long").as("s_ts_s"), col("b_ts").cast("long").as("b_ts_s"))
      .writeStream.format("memory").queryName("ssj_inner")
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ssj-ckpt").toString)
      .start()
    try {
      // batch 0: signups only — nothing can join yet
      signups.addData((1L, 1000L), (2L, 1000L), (3L, 1000L))
      q.processAllAvailable()
      assert(spark.table("ssj_inner").count() === 0L)
      // batch 1: user 1 buys inside the horizon (+5 min), user 2 buys
      // outside it (+20 min), user 3's buy PRECEDES the signup
      buys.addData((1L, 1300L), (2L, 2200L), (3L, 700L))
      q.processAllAvailable()
      val got = spark.table("ssj_inner")
        .as[(Long, Long, Long)].collect().toSet
      assert(got === Set((1L, 1000L, 1300L)),
        s"only the in-horizon, after-signup buy may join: $got")
      // the signup side was buffered in STATE across batches — that is
      // the stream-stream property no stream-static probe has
      assert(q.lastProgress.stateOperators.nonEmpty,
        "a stream-stream join must run a stateful operator")
    } finally q.stop()
  }

  test("left_outer: unmatched signup emits with nulls once provably unmatchable; matched one does not") {
    implicit val sqlCtx = spark.sqlContext
    val signups = MemoryStream[(Long, Long)]
    val buys = MemoryStream[(Long, Long)]
    val q = JoinStream.intervalJoin(
        evDF(signups, "s_user", "s_ts"), evDF(buys, "b_user", "b_ts"),
        "s_user", "b_user", "s_ts", "b_ts",
        horizon = "10 minutes", watermark = "1 minutes",
        joinType = "left_outer")
      .select(col("s_user"), col("b_ts").cast("long").as("b_ts_s"))
      .writeStream.format("memory").queryName("ssj_outer")
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ssj-ckpt2").toString)
      .start()
    try {
      signups.addData((1L, 1000L), (2L, 1000L))
      buys.addData((1L, 1200L))
      q.processAllAvailable()
      // push BOTH watermarks far past 1000 + horizon + delay (the
      // global watermark is the MIN across sides) so user 2's signup
      // becomes provably unmatchable; a further batch triggers the
      // eviction scan that emits the null row
      signups.addData((98L, 10000L)); buys.addData((99L, 10000L))
      q.processAllAvailable()
      signups.addData((98L, 20000L)); buys.addData((99L, 20000L))
      q.processAllAvailable()
      val rows = spark.table("ssj_outer")
        .as[(Long, Option[Long])].collect().toSet
      assert(rows.contains((1L, Some(1200L))), s"matched row: $rows")
      assert(rows.contains((2L, None)),
        s"unmatched signup must surface with null buy columns: $rows")
      assert(!rows.contains((1L, None)),
        "a matched left row must never ALSO emit a null row")
    } finally q.stop()
  }

  test("late data beyond the watermark is dropped, not joined") {
    implicit val sqlCtx = spark.sqlContext
    val signups = MemoryStream[(Long, Long)]
    val buys = MemoryStream[(Long, Long)]
    val q = JoinStream.intervalJoin(
        evDF(signups, "s_user", "s_ts"), evDF(buys, "b_user", "b_ts"),
        "s_user", "b_user", "s_ts", "b_ts",
        horizon = "10 minutes", watermark = "1 minutes")
      .select(col("s_user"), col("b_ts").cast("long").as("b_ts_s"))
      .writeStream.format("memory").queryName("ssj_late")
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ssj-ckpt3").toString)
      .start()
    try {
      signups.addData((1L, 1000L))
      q.processAllAvailable()
      // drag BOTH watermarks far forward
      signups.addData((98L, 50000L)); buys.addData((99L, 50000L))
      q.processAllAvailable()
      // this buy is inside user 1's horizon but its event time is now
      // far behind the right watermark -> dropped as late, no join
      buys.addData((1L, 1100L))
      q.processAllAvailable()
      assert(spark.table("ssj_late").count() === 0L,
        "a beyond-watermark row must be dropped (and the evicted left " +
          "state could not match it anyway)")
    } finally q.stop()
  }

  test("column-name collision and bad join type are rejected loudly") {
    implicit val sqlCtx = spark.sqlContext
    val a = MemoryStream[(Long, Long)]
    val dfA = evDF(a, "k", "ts")
    intercept[IllegalArgumentException] {
      JoinStream.intervalJoin(dfA, dfA, "k", "k", "ts", "ts",
        "10 minutes", "1 minutes")
    }
    val b = MemoryStream[(Long, Long)]
    intercept[IllegalArgumentException] {
      JoinStream.intervalJoin(dfA, evDF(b, "k2", "ts2"), "k", "k2",
        "ts", "ts2", "10 minutes", "1 minutes", joinType = "full_outer")
    }
  }
}
