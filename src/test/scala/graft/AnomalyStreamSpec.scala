package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.AnomalyStream

/** Streaming z-score anomalies: bit-identical to the batch cumulative
  * frame on in-order input, with three-number per-user state. */
class AnomalyStreamSpec extends SparkTestBase {
  import spark.implicits._

  test("in-order replay reproduces the batch anomaly set exactly (z to the last bit)") {
    implicit val sqlCtx = spark.sqlContext
    val ev = graft.core.Tables.events(spark, sf0001)
      .select($"user_id", $"ts_us", $"value", $"event_id")
      .as[(Long, Long, Double, Long)].collect()
      .sortBy(e => (e._2, e._4))
    val mem = MemoryStream[(Long, Long, Double, Long)]
    val q = AnomalyStream.anomalies(
        mem.toDF().toDF("user_id", "ts_us", "value", "event_id"))
      .writeStream.format("memory").queryName("anom")
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("anom-ckpt").toString)
      .start()
    try {
      val (h1, h2) = ev.splitAt(ev.length / 2)
      mem.addData(h1.toSeq); q.processAllAvailable()
      mem.addData(h2.toSeq); q.processAllAvailable()
      // same rounding semantics as Spark's round(z, 6) (BigDecimal
      // HALF_UP on the decimal repr — math.round(z*1e6) would diverge
      // on 7th-decimal half-ties)
      val streamed = spark.table("anom").as[AnomalyStream.Anomaly]
        .collect().map(a => (a.event_id,
          BigDecimal(a.z).setScale(6, BigDecimal.RoundingMode.HALF_UP)
            .toDouble)).toSet
      val batch = graft.queries.Queries.all.toMap.apply("q_rolling_z")._1(
          spark, sf0001)
        .select($"event_id", $"z").as[(Long, Double)].collect().toSet
      assert(streamed === batch,
        s"streamed ${streamed.size} vs batch ${batch.size}")
      assert(streamed.nonEmpty, "fixture must produce anomalies")
    } finally q.stop()
  }

  test("baseline warm-up: no emission before minN observations; state stays three numbers") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Double, Long)]
    val q = AnomalyStream.anomalies(
        mem.toDF().toDF("user_id", "ts_us", "value", "event_id"),
        minN = 4, zThresh = 3.0)
      .writeStream.format("memory").queryName("anom_warm")
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("anom-ckpt2").toString)
      .start()
    try {
      // 3 steady values then an extreme one: baseline too short → silent
      mem.addData((1L, 10L, 5.0, 1L), (1L, 20L, 5.1, 2L), (1L, 30L, 4.9, 3L),
        (1L, 40L, 100.0, 4L))
      q.processAllAvailable()
      assert(spark.table("anom_warm").count() == 0,
        "no anomaly before the baseline has minN points")
      // baseline now has 4 points (incl. the 100): a fresh extreme fires
      mem.addData((1L, 50L, 200.0, 5L))
      q.processAllAvailable()
      val got = spark.table("anom_warm").as[AnomalyStream.Anomaly].collect()
      assert(got.length == 1 && got.head.event_id == 5L)
    } finally q.stop()
  }
}
