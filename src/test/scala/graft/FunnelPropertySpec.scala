package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.FunnelStream

/** Randomized funnel equivalence: batch q_funnel_steps vs the streaming
  * fold on GENERATED event logs — written as real parquet through the
  * same `Tables.events` envelope path a user's own data would take
  * (timestamp[us] encoding), so the test also exercises the external-
  * data entry point end-to-end. */
class FunnelPropertySpec extends SparkTestBase {
  import spark.implicits._

  private val steps = Seq("signup", "view", "click", "purchase")

  /** Deterministic random event log: nUsers users × up to maxEv events
    * with types drawn from steps + noise, distinct timestamps. */
  private def randomEvents(seed: Long, nUsers: Int, maxEv: Int) = {
    val rnd = new scala.util.Random(seed)
    val types = steps ++ Seq("error", "noise")
    (1 to nUsers).flatMap { u =>
      val n = 1 + rnd.nextInt(maxEv)
      (1 to n).map { i =>
        val eid = u.toLong * 1000 + i
        (eid, u.toLong, types(rnd.nextInt(types.length)),
          // distinct µs timestamps in random order per user
          (rnd.nextInt(1000000) * 100L + eid % 100))
      }
    }
  }

  test("random logs: batch stage counts == streaming stage sets (3 seeds)") {
    implicit val sqlCtx = spark.sqlContext
    for (seed <- Seq(7L, 19L, 43L)) {
      val ev = randomEvents(seed, nUsers = 40, maxEv = 30)
      // write through the user-data path: events.parquet with the
      // timestamp[us] envelope encoding
      val dir = java.nio.file.Files.createTempDirectory(s"funnel-prop-$seed")
      ev.toDF("event_id", "user_id", "event_type", "ts_us")
        .select(col("event_id"), timestamp_micros(col("ts_us")).as("ts"),
          col("user_id"), col("event_type"), lit(0.0).as("value"),
          lit("""{"k":1}""").as("props"))
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
      val batch = graft.queries.Queries.all.toMap.apply("q_funnel_steps")._1(
          spark, dir.toString)
        .select($"stage", $"n_users").as[(Long, Long)].collect().toMap

      val mem = MemoryStream[(Long, String, Long, Long)]
      val q = FunnelStream.stageProgress(
          mem.toDF().toDF("user_id", "event_type", "ts_us", "event_id"), steps)
        .writeStream.format("memory").queryName(s"funnel_prop_$seed")
        .outputMode("append")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory(s"fp-ckpt-$seed").toString)
        .start()
      try {
        // feed IN ORDER, split across three micro-batches
        val ordered = ev.sortBy(e => (e._4, e._1))
          .map(e => (e._2, e._3, e._4, e._1))
        val chunks = ordered.grouped(math.max(1, ordered.size / 3)).toSeq
        chunks.foreach { c => mem.addData(c); q.processAllAvailable() }
        val streamed = spark.table(s"funnel_prop_$seed")
          .as[FunnelStream.StageAdvance].collect()
          .groupBy(_.stage).view.mapValues(_.map(_.user_id).toSet).toMap
        (1 to steps.length).foreach { st =>
          assert(streamed.getOrElse(st, Set.empty).size.toLong
              == batch.getOrElse(st.toLong, 0L),
            s"seed=$seed stage=$st: stream ${streamed.getOrElse(st, Set.empty).size} vs batch ${batch.get(st.toLong)}")
        }
        // funnel is monotone: each stage's membership is a subset of
        // the previous stage's
        (2 to steps.length).foreach { st =>
          assert(streamed.getOrElse(st, Set.empty)
            .subsetOf(streamed.getOrElse(st - 1, Set.empty)),
            s"seed=$seed stage $st not nested in ${st - 1}")
        }
      } finally q.stop()
    }
  }
}
