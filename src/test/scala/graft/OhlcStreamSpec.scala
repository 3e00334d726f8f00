package graft

import org.apache.spark.sql.functions._

/** Batch ≡ stream equivalence for the OHLC twin: selections have no
  * arithmetic to drift, so the streamed candles must equal the batch
  * aggregate's EXACT doubles under shuffled, arbitrarily-batched
  * delivery. */
class OhlcStreamSpec extends SparkTestBase {
  import spark.implicits._

  test("shuffled 3-batch delivery converges to the batch OHLC bit-for-bit") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val rnd = new scala.util.Random(42)
    val dayUs = 86400000000L
    val events = (0 until 240).map { i =>
      val uid = (i % 5).toLong
      val ts = 1700000000000000L + rnd.nextInt(4) * dayUs +
        rnd.nextInt(86400) * 1000000L
      (uid, ts, math.rint(rnd.nextDouble() * 1000) / 100.0, i.toLong)
    }

    val batchTruth = events.toDF("user_id", "ts_us", "value", "event_id")
      .groupBy(col("user_id"), expr(s"ts_us DIV $dayUs").as("day"))
      .agg(min_by(col("value"), struct(col("ts_us"), col("event_id"))).as("open"),
        max(col("value")).as("high"), min(col("value")).as("low"),
        max_by(col("value"), struct(col("ts_us"), col("event_id"))).as("close"),
        count(lit(1)).as("n_events"))
      .as[(Long, Long, Double, Double, Double, Double, Long)]
      .collect().map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6, r._7))).toMap

    val shuffled = rnd.shuffle(events)
    val mem = MemoryStream[(Long, Long, Double, Long)]
    val live = scala.collection.mutable.Map.empty[(Long, Long), (Double, Double, Double, Double, Long)]
    val q = graft.streaming.OhlcStream.ohlc(
        mem.toDF().toDF("user_id", "ts_us", "value", "event_id"))
      .writeStream.outputMode("update")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[graft.streaming.OhlcStream.Ohlc], _: Long) =>
        b.collect().foreach(o =>
          live((o.user_id, o.day)) = (o.open, o.high, o.low, o.close, o.n_events))
        ()
      }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ohlc-ckpt").toString)
      .start()
    try {
      shuffled.grouped(80).foreach { chunk =>
        mem.addData(chunk: _*); q.processAllAvailable()
      }
    } finally q.stop()
    assert(live.size === batchTruth.size, s"${live.size} vs ${batchTruth.size} candles")
    batchTruth.foreach { case (k, truth) =>
      assert(live(k) === truth, s"candle $k: ${live(k)} vs $truth")
    }
  }
}
