package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Stream-stream inner equi-join — the incremental profile of J1
  * (reference flow.rs:493-501: both sides fully retained in
  * arrangements). Spark's state-store join is the same shape with an
  * explicit retention bound: watermarks + a time-range condition turn
  * the unbounded arrangement into provably-expirable state — the knob
  * the reference lacks (its arrangements grow forever; SURVEY §2.4). */
class StreamJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("cross-batch matches with watermark-bounded state") {
    implicit val sqlCtx = spark.sqlContext
    val starts = MemoryStream[(String, Timestamp)]
    val stops = MemoryStream[(String, Timestamp)]

    val l = starts.toDF().toDF("machine", "started")
      .withWatermark("started", "10 minutes")
    val r = stops.toDF().toDF("machine_r", "stopped")
      .withWatermark("stopped", "10 minutes")

    // stop must follow its start within 1 hour: gives the state store a
    // provable expiry bound for BOTH sides
    val joined = l.join(r,
      col("machine") === col("machine_r") &&
        col("stopped") >= col("started") &&
        col("stopped") <= col("started") + expr("interval 1 hour"))
      .select(col("machine"), col("started"), col("stopped"))

    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ss_join").start()
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    try {
      // batch 1: starts only — no output, state retained
      starts.addData(("Drill1", ts(0)), ("Press1", ts(5)))
      q.processAllAvailable()
      assert(spark.table("ss_join").count() === 0)

      // batch 2: stops arrive later — join against batch-1 state
      stops.addData(("Drill1", ts(20)), ("Press1", ts(59)))
      q.processAllAvailable()
      val out = spark.table("ss_join")
        .select("machine", "stopped").as[(String, Timestamp)]
        .collect().toSet
      assert(out === Set(("Drill1", ts(20)), ("Press1", ts(59))))

      // outside the 1h constraint: no match even though the key matches
      stops.addData(("Drill1", Timestamp.valueOf("2024-01-01 12:30:00")))
      q.processAllAvailable()
      assert(spark.table("ss_join").count() === 2,
        "time-range condition must reject a stop 2.5h after its start")
    } finally q.stop()
  }
}
