package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.FunnelStream

/** Streaming funnel: stage advances across micro-batches, strict
  * ordering, bounded per-user state, and agreement with the batch
  * funnel on in-order input. */
class FunnelStreamSpec extends SparkTestBase {
  import spark.implicits._

  private val steps = Seq("signup", "view", "click", "purchase")

  test("stage advances emit once, strictly ordered, across batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Long, Long)]
    val q = FunnelStream.stageProgress(
        mem.toDF().toDF("user_id", "event_type", "ts_us", "event_id"), steps)
      .writeStream.format("memory").queryName("funnel_adv")
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("funnel-ckpt").toString)
      .start()
    try {
      // batch 0: user 1 signs up then views; a view BEFORE signup (user 2)
      // must not advance; same-ts view (user 3) fails the STRICT order
      mem.addData(
        (1L, "signup", 100L, 1L), (1L, "view", 200L, 2L),
        (2L, "view", 50L, 3L), (2L, "signup", 60L, 4L),
        (3L, "signup", 10L, 5L), (3L, "view", 10L, 6L))
      q.processAllAvailable()
      val b0 = spark.table("funnel_adv")
        .as[FunnelStream.StageAdvance].collect().toSet
      assert(b0.exists(a => a.user_id == 1L && a.stage == 2 && a.t_us == 200L))
      assert(!b0.exists(a => a.user_id == 2L && a.stage == 2),
        "view before signup must not advance")
      assert(!b0.exists(a => a.user_id == 3L && a.stage == 2),
        "same-ts is not strictly after")
      // within-batch disorder: click arrives before view in the data but
      // later in event time — sorting inside the group must chain them
      mem.addData(
        (1L, "purchase", 500L, 9L), (1L, "click", 300L, 8L))
      q.processAllAvailable()
      val b1 = spark.table("funnel_adv")
        .as[FunnelStream.StageAdvance].collect().toSet
      assert(b1.exists(a => a.user_id == 1L && a.stage == 3 && a.t_us == 300L))
      assert(b1.exists(a => a.user_id == 1L && a.stage == 4 && a.t_us == 500L))
      // user 2 advances once its strictly-after view arrives
      mem.addData((2L, "view", 70L, 10L))
      q.processAllAvailable()
      val b2 = spark.table("funnel_adv")
        .as[FunnelStream.StageAdvance].collect()
      assert(b2.count(a => a.user_id == 2L && a.stage == 2) == 1)
      // each (user, stage) emitted at most once over the whole run
      assert(b2.groupBy(a => (a.user_id, a.stage)).values.forall(_.length == 1))
      // frozen-once-set: a LATE earlier signup must not rewrite user 1's
      // stage-1 time, and a late view between it and the published time
      // must not advance anything — the emitted stream stays internally
      // consistent (no stage-2 time before the published stage-1 time)
      mem.addData((1L, "signup", 50L, 11L), (1L, "view", 80L, 12L))
      q.processAllAvailable()
      val b3 = spark.table("funnel_adv")
        .as[FunnelStream.StageAdvance].collect()
      assert(b3.count(_.user_id == 1L) == 4, "late events must emit nothing new")
      assert(b3.filter(_.user_id == 1L).forall(a => a.stage != 1 || a.t_us == 100L))
    } finally q.stop()
  }

  test("in-order replay matches the batch funnel's stage membership") {
    implicit val sqlCtx = spark.sqlContext
    val ev = graft.core.Tables.events(spark, sf0001)
      .select($"user_id", $"event_type", $"ts_us", $"event_id")
      .as[(Long, String, Long, Long)].collect()
      .sortBy(e => (e._3, e._4))
    val mem = MemoryStream[(Long, String, Long, Long)]
    val q = FunnelStream.stageProgress(
        mem.toDF().toDF("user_id", "event_type", "ts_us", "event_id"), steps)
      .writeStream.format("memory").queryName("funnel_replay")
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("funnel-ckpt2").toString)
      .start()
    try {
      val (h1, h2) = ev.splitAt(ev.length / 2)
      mem.addData(h1.toSeq); q.processAllAvailable()
      mem.addData(h2.toSeq); q.processAllAvailable()
      val streamed = spark.table("funnel_replay")
        .as[FunnelStream.StageAdvance].collect()
        .groupBy(_.stage).view.mapValues(_.map(_.user_id).toSet).toMap
      // batch truth: the q_funnel_steps stage sets
      val batch = graft.queries.Queries.all.toMap.apply("q_funnel_steps")._1(
        spark, sf0001).select($"stage", $"n_users").as[(Long, Long)]
        .collect().toMap
      (1 to steps.length).foreach { s =>
        assert(streamed.getOrElse(s, Set.empty).size.toLong
            == batch.getOrElse(s.toLong, 0L),
          s"stage $s: streamed ${streamed.getOrElse(s, Set.empty).size} vs batch ${batch.get(s.toLong)}")
      }
    } finally q.stop()
  }
}
