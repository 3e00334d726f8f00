package graft

import org.apache.spark.sql.functions._

/** Batch ≡ stream equivalence for the transition twin: per-user
  * in-order delivery split across micro-batches must emit exactly the
  * batch lead-window's (from, to) pair multiset. */
class TransitionStreamSpec extends SparkTestBase {
  import spark.implicits._

  test("in-order 3-batch delivery emits the batch lead-window's transition multiset") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val rnd = new scala.util.Random(9)
    val types = Array("signup", "view", "click", "purchase")
    val events = (0 until 300).map { i =>
      (i.toLong % 7, 1700000000000000L + i * 1000000L + rnd.nextInt(500),
        types(rnd.nextInt(4)), i.toLong)
    }

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts_us", $"event_id")
    val batchTruth = events.toDF("user_id", "ts_us", "event_type", "event_id")
      .withColumn("next_type", lead($"event_type", 1).over(w))
      .filter($"next_type".isNotNull)
      .groupBy($"event_type", $"next_type").agg(count(lit(1)).as("n"))
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap

    // per-user in-order delivery: send in global (ts, eid) order
    val ordered = events.sortBy(e => (e._2, e._4))
    val mem = MemoryStream[(Long, Long, String, Long)]
    val got = scala.collection.mutable.Map.empty[(String, String), Long]
    val q = graft.streaming.TransitionStream.transitions(
        mem.toDF().toDF("user_id", "ts_us", "event_type", "event_id"))
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[graft.streaming.TransitionStream.Transition], _: Long) =>
        b.collect().foreach(t =>
          got((t.from_type, t.to_type)) = got.getOrElse((t.from_type, t.to_type), 0L) + 1)
        ()
      }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("trans-ckpt").toString)
      .start()
    try {
      ordered.grouped(100).foreach { chunk =>
        mem.addData(chunk: _*); q.processAllAvailable()
      }
    } finally q.stop()
    assert(got.toMap === batchTruth,
      s"stream transitions ${got.toMap} vs batch $batchTruth")
    assert(got.values.sum === events.size - 7L, "one transition per event after each user's first")
  }

  test("cross-batch late arrival is dropped, not emitted as a wrong-order transition") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[(Long, Long, String, Long)]
    val emitted = scala.collection.mutable.ListBuffer.empty[(String, String)]
    val q = graft.streaming.TransitionStream.transitions(
        mem.toDF().toDF("user_id", "ts_us", "event_type", "event_id"))
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[graft.streaming.TransitionStream.Transition], _: Long) =>
        b.collect().foreach(t => emitted += ((t.from_type, t.to_type))); ()
      }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("trans-late-ckpt").toString)
      .start()
    try {
      mem.addData((1L, 1000L, "signup", 1L), (1L, 2000L, "view", 2L))
      q.processAllAvailable()
      // late: ts 1500 arrives AFTER the user advanced to 2000 — dropped
      mem.addData((1L, 1500L, "click", 3L), (1L, 3000L, "purchase", 4L))
      q.processAllAvailable()
    } finally q.stop()
    assert(emitted.toList === List(("signup", "view"), ("view", "purchase")),
      s"late click must vanish: $emitted")
  }
}
