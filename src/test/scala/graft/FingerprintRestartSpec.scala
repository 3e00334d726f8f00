package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryException
import org.apache.spark.sql.types._

/** Checkpoint KILL-AND-RESTART E2E for a self-maintaining loop: the
  * per-batch specs prove marker idempotence; this one proves the whole
  * machine — a file-source [[graft.streaming.FingerprintStream]] whose
  * batch 1 CRASHES after its store append but before the streaming
  * checkpoint commit (the worst-ordered at-least-once window), then
  * restarts from the same checkpoint. Structured Streaming replays
  * batch 1 with the same id and file set; the store and the emitted
  * pairs/survivors must end bit-identical to an uninterrupted run. */
class FingerprintRestartSpec extends SparkTestBase {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  private def writeDocs(dir: String, name: String, rows: (Long, String)*): Unit =
    rows.toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/$name")

  test("crash after append, before checkpoint commit: restart converges to the uninterrupted run") {
    val root = java.nio.file.Files.createTempDirectory("fp_restart").toString
    val template = (1 to 30).map(i => s"rk$i").mkString(" ")
    val corpus = Seq(2L -> template).toDF("doc_id", "text")
    val batch0 = Seq(
      11L -> (template + " trailing extra"),              // dup of corpus
      13L -> (1 to 30).map(i => s"nva${i}b").mkString(" ")) // novel → survives
    val batch1 = Seq(
      21L -> ((1 to 30).map(i => s"nva${i}b").mkString(" ") + " tail"), // dup of 13
      23L -> (1 to 30).map(i => s"fresh${i}x").mkString(" "))           // novel

    // drive both files through one loop instance; crashIn = the store
    // whose batch 1 should die once, AFTER the append
    def run(store: String, in: String, ckpt: String, crash: Boolean)
        : Map[Long, (Set[(Long, Long)], Set[Long])] = {
      graft.ops.Fingerprints.winnowStored(corpus, store, k = 3, w = 4)
      val out = scala.collection.mutable.Map.empty[Long, (Set[(Long, Long)], Set[Long])]
      @volatile var armed = crash
      def start() = graft.streaming.FingerprintStream.selfMaintaining(
        spark.readStream.schema(schema).parquet(in), store,
        minShared = 2, dfCap = 50) { (bid, pairs, survivors) =>
        val r = (pairs.select("corpus_id", "probe_id").as[(Long, Long)].collect().toSet,
          survivors.select("doc_id").as[Long].collect().toSet)
        if (bid == 1L && armed) {
          armed = false
          throw new RuntimeException("injected crash: append done, checkpoint commit not")
        }
        out(bid) = r
      }.option("checkpointLocation", ckpt).start()

      writeDocs(root, s"$in-stage/b0", batch0: _*)
      // atomically-visible copy into the watched dir
      new java.io.File(s"$root/$in-stage/b0").listFiles()
        .filter(_.getName.endsWith(".parquet")).zipWithIndex.foreach { case (f, i) =>
          java.nio.file.Files.copy(f.toPath,
            java.nio.file.Paths.get(in, s"b0-$i.parquet"))
        }
      val q1 = start()
      q1.processAllAvailable() // batch 0
      writeDocs(root, s"$in-stage/b1", batch1: _*)
      new java.io.File(s"$root/$in-stage/b1").listFiles()
        .filter(_.getName.endsWith(".parquet")).zipWithIndex.foreach { case (f, i) =>
          java.nio.file.Files.copy(f.toPath,
            java.nio.file.Paths.get(in, s"b1-$i.parquet"))
        }
      if (crash) {
        intercept[StreamingQueryException] { q1.processAllAvailable() }
        assert(!q1.isActive, "query must have died on the injected crash")
        // RESTART from the same checkpoint: batch 1 replays (same id,
        // same file set) against a store its first attempt already grew
        val q2 = start()
        try q2.processAllAvailable() finally q2.stop()
      } else {
        try q1.processAllAvailable() finally q1.stop()
      }
      if (q1.isActive) q1.stop()
      out.toMap
    }

    val inA = s"$root/inA"; val inB = s"$root/inB"
    new java.io.File(inA).mkdirs(); new java.io.File(inB).mkdirs()
    val crashed = run(s"$root/store", inA, s"$root/ckpt", crash = true)
    val clean = run(s"$root/storeRef", inB, s"$root/ckptRef", crash = false)

    assert(crashed === clean,
      s"replayed batch must emit the uninterrupted run's results: $crashed vs $clean")
    assert(crashed(1L)._1.exists { case (c, p) => c == 13L && p == 21L },
      "the survivor-dup pair must be present in the replayed batch")
    def storeRows(p: String) =
      spark.read.parquet(p).as[(Long, Long)].collect().sorted.toSeq
    assert(storeRows(s"$root/store") === storeRows(s"$root/storeRef"),
      "store after crash+restart must equal the uninterrupted store bit-for-bit")
  }

  test("dedupWithinWatermark: duplicates inside the horizon cut, post-eviction duplicate passes") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    val mem = MemoryStream[(String, Long)]
    val q = graft.streaming.FingerprintStream.dedupWithinWatermark(
        mem.toDF().toDF("fp", "t_s")
          .select(col("fp"), timestamp_seconds(col("t_s")).as("ts")),
        Seq("fp"), "ts", "10 seconds")
      .select(col("fp"), col("ts").cast("long").as("t_s"))
      .writeStream.format("memory").queryName("ddww")
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ddww-ck").toString)
      .start()
    try {
      // batch 0: a + its same-batch duplicate; batch 1: a CROSS-batch
      // duplicate still inside the horizon — all three collapse to one
      mem.addData(("a", 100L), ("a", 101L)); q.processAllAvailable()
      mem.addData(("a", 105L), ("b", 106L)); q.processAllAvailable()
      val afterH = spark.table("ddww").as[(String, Long)].collect()
      assert(afterH.count(_._1 == "a") === 1 && afterH.count(_._1 == "b") === 1,
        s"in-horizon duplicates must collapse: ${afterH.toSeq}")
      // advance the watermark far past a's state, then re-send "a":
      // eviction means the late twin PASSES — the documented trade vs
      // the store-backed selfMaintaining loop
      mem.addData(("z", 10000L)); q.processAllAvailable()
      mem.addData(("a", 10001L)); q.processAllAvailable()
      val afterEvict = spark.table("ddww").as[(String, Long)].collect()
      assert(afterEvict.count(_._1 == "a") === 2,
        "a duplicate arriving after eviction is a NEW row under horizon semantics")
    } finally q.stop()
  }

  test("UrlFrontierStream: spellings collapse across batches, replayed batch " +
      "is bit-identical, store unchanged") {
    val store = java.nio.file.Files
      .createTempDirectory("url_frontier").toString + "/store"
    graft.streaming.UrlFrontierStream.seed(spark, store)
    def emit(rows: Seq[String], id: Long): Set[String] = {
      var out = Set.empty[String]
      graft.streaming.UrlFrontierStream.processBatch(
        rows.toDF("url"), id, store, "url") { (_, novel) =>
        out = novel.as[String].collect().toSet
      }
      out
    }
    // batch 0: two spellings of example.com/b (dot-segment + tracking
    // params + host case + default port) plus one distinct page
    val b0 = emit(Seq(
      "HTTP://Example.com/a/../b?utm_source=x&b=1",
      "http://example.com:80/b?b=1",
      "https://other.org/p"), 0L)
    assert(b0 === Set("http://example.com/b?b=1", "https://other.org/p"),
      s"within-batch spellings must share one canonical key: $b0")
    // batch 1: a THIRD spelling of the same page (percent-encoded path
    // char + fragment) is suppressed by the store; one new page passes
    val b1 = emit(Seq(
      "http://EXAMPLE.com/./b?b=1#frag",
      "https://new.net/q?x=2"), 1L)
    assert(b1 === Set("https://new.net/q?x=2"),
      s"the store must suppress a later batch's re-spelling: $b1")
    def storeRows = spark.read.parquet(store)
      .as[(String, String)].collect().sorted.toSeq
    val afterB1 = storeRows
    // at-least-once replay: same (batch, id) again — identical novel
    // set, store bit-identical (tag-scoped pre-batch view + marker)
    val b1again = emit(Seq(
      "http://EXAMPLE.com/./b?b=1#frag",
      "https://new.net/q?x=2"), 1L)
    assert(b1again === b1, "replayed batch must emit the identical novel set")
    assert(storeRows === afterB1,
      "replayed append must leave the store bit-for-bit unchanged")
    spark.catalog.clearCache()
  }

  test("horizon composition: dedupWithinWatermark keyed on canonicalUrl " +
      "collapses cross-batch spellings") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[(String, Long)]
    val canon = mem.toDF().toDF("url", "t_s")
      .select(col("url"),
        graft.ops.Web.canonicalUrl(col("url")).as("curl"),
        timestamp_seconds(col("t_s")).as("ts"))
    val q = graft.streaming.FingerprintStream.dedupWithinWatermark(
        canon, Seq("curl"), "ts", "10 seconds")
      .select(col("curl"))
      .writeStream.format("memory").queryName("urlddw")
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("urlddw-ck").toString)
      .start()
    try {
      mem.addData(("HTTP://Example.com/a/../b?utm_source=x&b=1", 100L))
      q.processAllAvailable()
      mem.addData(("http://example.com:80/b?b=1", 103L)) // same page
      q.processAllAvailable()
      val rows = spark.table("urlddw").as[String].collect().toSeq
      assert(rows === Seq("http://example.com/b?b=1"),
        s"cross-batch spellings inside the horizon must collapse: $rows")
    } finally q.stop()
  }
}
