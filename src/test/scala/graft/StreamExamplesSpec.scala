package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.{SessionizeStream, SessionEvent, UsageRow}

/** The reference's example pipelines in the incremental profile:
  * machine-usage (stateful sessionization across micro-batches) and
  * finished-goods (update-mode streaming aggregation). Dashboard (M1) is
  * covered by PipelineSpec. */
class StreamExamplesSpec extends SparkTestBase {

  test("usage: open start carries across micro-batches; stop closes it (machine-usage/logic.rs)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[SessionEvent]
    val q = SessionizeStream.usageStream(mem.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("usage_test").start()
    def rows() = spark.sql("SELECT * FROM usage_test").as[UsageRow].collect().toSet
    try {
      // batch 1: two starts (m1 order a, m2 order x), no output yet
      mem.addData(
        SessionEvent("m1", 1L, started = true, "a", 1000L),
        SessionEvent("m2", 1L, started = true, "x", 500L))
      q.processAllAvailable()
      assert(rows() === Set.empty)

      // batch 2: m1 stop closes the batch-1 start (state carried);
      // same-batch start+stop for m2 order y also closes
      mem.addData(
        SessionEvent("m1", 2L, started = false, "a", 1800L),
        SessionEvent("m2", 3L, started = false, "y", 950L), // arrives before its start
        SessionEvent("m2", 2L, started = true, "y", 900L))  // lamport sorts it first
      q.processAllAvailable()
      assert(rows() === Set(
        UsageRow("m1", "a", 1000L, 800L),
        UsageRow("m2", "y", 900L, 50L)))

      // batch 3: unmatched stop is dropped; restart overwrites open start
      mem.addData(
        SessionEvent("m2", 4L, started = false, "zzz", 2000L),
        SessionEvent("m2", 5L, started = true, "x", 3000L), // overwrites batch-1 x
        SessionEvent("m2", 6L, started = false, "x", 3100L))
      q.processAllAvailable()
      assert(rows().contains(UsageRow("m2", "x", 3000L, 100L)),
        "later start must win (BTreeMap overwrite semantics)")
    } finally q.stop()
  }

  test("finished-goods: update-mode streaming aggregation (finished-goods-1/logic.rs)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // (article_id, workstation, pcs)
    val mem = MemoryStream[(String, String, Long)]
    val agg = mem.toDF().toDF("article_id", "workstation", "pcs")
      .groupBy(col("article_id"), col("workstation"))
      .agg(sum(col("pcs")).as("total_pcs"))
    val q = agg.writeStream.outputMode("complete").format("memory")
      .queryName("fg_test").start()
    try {
      mem.addData(("a1", "w1", 5L), ("a1", "w1", 3L), ("a2", "w1", 7L))
      q.processAllAvailable()
      val r1 = spark.sql("SELECT * FROM fg_test").as[(String, String, Long)].collect().toSet
      assert(r1 === Set(("a1", "w1", 8L), ("a2", "w1", 7L)))
      mem.addData(("a1", "w1", 2L))
      q.processAllAvailable()
      val r2 = spark.sql("SELECT * FROM fg_test").as[(String, String, Long)].collect().toSet
      assert(r2 === Set(("a1", "w1", 10L), ("a2", "w1", 7L)))
    } finally q.stop()
  }
}
