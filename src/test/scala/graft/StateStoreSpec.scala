package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming state on the RocksDB state-store provider — the backend
  * that keeps unbounded keyed state (dedup fingerprints, join
  * arrangements, monotonic per-key rows) off the executor heap and
  * spillable to local disk + checkpoint. The default HDFS-backed
  * provider holds every key in memory; at 100 TB of accumulated state
  * that is the first thing to fall over, so the engine must run
  * unchanged when the provider is swapped — this spec pins exactly
  * that (same dedup semantics, state carried across batches). */
class StateStoreSpec extends SparkTestBase {
  import spark.implicits._

  test("cross-batch streaming dedup runs unchanged on RocksDB state") {
    implicit val sqlCtx = spark.sqlContext
    val conf = spark.conf
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = conf.getOption(key)
    conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[(Long, String)]
      val q = mem.toDF().toDF("doc_id", "fp")
        .dropDuplicates("fp") // state: one row per fingerprint, forever
        .writeStream.outputMode("append")
        .format("memory").queryName("rocks_dedup").start()
      try {
        mem.addData((1L, "a"), (2L, "b"), (3L, "a"))
        q.processAllAvailable()
        mem.addData((4L, "b"), (5L, "c")) // b is a dup ACROSS batches
        q.processAllAvailable()
        val out = spark.table("rocks_dedup").select("doc_id", "fp")
          .as[(Long, String)].collect().toMap
        assert(out.values.toSet === Set("a", "b", "c"))
        assert(!out.contains(4L), "cross-batch duplicate must hit RocksDB state")
        val lastProgress = q.recentProgress.last
        assert(lastProgress.stateOperators.nonEmpty, "a stateful operator ran")
      } finally q.stop()
    } finally {
      prev.fold(conf.unset(key))(conf.set(key, _))
    }
  }

  test("windowed near-dup (event-time timeout state) runs unchanged on RocksDB") {
    implicit val sqlCtx = spark.sqlContext
    val conf = spark.conf
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = conf.getOption(key)
    conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
        "lambda mu nu xi omicron pi rho sigma tau upsilon"
      def ts(min: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 10:$min%02d:00")
      val mem = MemoryStream[(Long, String, java.sql.Timestamp)]
      val out = graft.streaming.NearDupStream.pairsWindowed(
        mem.toDF().toDF("doc_id", "text", "ts"), tau = 0.35, tsCol = "ts",
        watermarkDelay = "0 seconds", horizonMs = 10 * 60 * 1000L)
      val q = out.writeStream.outputMode("append").format("memory")
        .queryName("rocks_windowed").start()
      try {
        mem.addData((1L, base, ts(0)))
        q.processAllAvailable()
        mem.addData((2L, base.replace("upsilon", "phi"), ts(5)))
        q.processAllAvailable()
        val pairs = spark.sql("SELECT DISTINCT id_a, id_b FROM rocks_windowed")
          .as[(Long, Long)].collect().toSet
        assert(pairs === Set((1L, 2L)),
          "cross-batch pair through RocksDB-held bucket state")
      } finally q.stop()
    } finally {
      prev.fold(conf.unset(key))(conf.set(key, _))
    }
  }

  test("semantic near-dup (cell-resident vector state) runs unchanged on RocksDB") {
    implicit val sqlCtx = spark.sqlContext
    val conf = spark.conf
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = conf.getOption(key)
    conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val cents = Array(1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0)
      val mem = MemoryStream[(Long, Seq[Float])]
      val out = graft.streaming.NearDupStream.semanticPairs(
        mem.toDF().toDF("vec_id", "embedding"), cents, dim = 4, tau = 0.95)
      val q = out.writeStream.outputMode("append").format("memory")
        .queryName("rocks_semantic").start()
      try {
        mem.addData((1L, Seq(1.0f, 0.1f, 0.0f, 0.0f)))
        q.processAllAvailable()
        mem.addData((2L, Seq(2.0f, 0.2f, 0.0f, 0.0f))) // scaled copy, later batch
        q.processAllAvailable()
        val pairs = spark.sql("SELECT DISTINCT id_a, id_b FROM rocks_semantic")
          .as[(Long, Long)].collect().toSet
        assert(pairs === Set((1L, 2L)),
          "cross-batch semantic pair through RocksDB-held cell state")
      } finally q.stop()
    } finally {
      prev.fold(conf.unset(key))(conf.set(key, _))
    }
  }
}
