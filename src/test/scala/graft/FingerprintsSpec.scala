package graft

import org.apache.spark.sql.functions._
import graft.ops.Fingerprints

/** Winnowing + content-defined chunking: the paper guarantees, not just
  * output shapes — detection floor (winnow), partition + edit-stability
  * (CDC), and the df-cap prune (pairs). */
class FingerprintsSpec extends SparkTestBase {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("slidingMin equals brute force on random arrays") {
    val rnd = new scala.util.Random(7)
    val arrays = Seq.fill(20)(Seq.fill(rnd.nextInt(12))(rnd.nextLong()))
    val df = arrays.zipWithIndex.map { case (a, i) => (i.toLong, a) }
      .toDF("id", "arr")
    for (w <- Seq(1, 3, 4)) {
      val got = df.select(col("id"), Fingerprints.slidingMin(col("arr"), w).as("m"))
        .as[(Long, Seq[Long])].collect().toMap
      arrays.zipWithIndex.foreach { case (a, i) =>
        val expect = if (a.size < w) Seq.empty[Long]
          else a.sliding(w).map(_.min).toSeq
        assert(got(i.toLong) == expect, s"w=$w arr=$a")
      }
    }
  }

  test("winnow guarantee: docs sharing a run of >= w+k-1 tokens share a fingerprint") {
    // k=3, w=4: guarantee threshold = 6 shared consecutive tokens
    val shared = "alpha bravo charlie delta echo foxtrot" // 6 tokens
    val d = docs(
      1L -> s"one two three $shared four five six",
      2L -> s"zz yy xx ww $shared vv uu",
      3L -> "completely different tokens with no overlap at all here")
    val fps = Fingerprints.winnow(d, k = 3, w = 4)
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    assert((fps(1L) & fps(2L)).nonEmpty, "guaranteed shared fingerprint missing")
    assert((fps(1L) & fps(3L)).isEmpty || true) // no guarantee either way; just no crash
    // selection is sparse: strictly fewer fingerprints than k-grams
    val nGrams1 = d.filter($"doc_id" === 1L)
      .select(size(graft.functions.Text.wordShingles($"text", 3))).as[Int].head()
    assert(fps(1L).size < nGrams1)
  }

  test("winnow: too-short docs emit no rows; w=1 keeps every distinct k-gram hash") {
    val d = docs(1L -> "a b c d e", 2L -> "a b") // 5 tokens → 3 grams < w+?; 2 tokens < k
    assert(Fingerprints.winnow(d, k = 3, w = 4).filter($"id" === 2L).count() == 0)
    val all1 = Fingerprints.winnow(d, k = 3, w = 1).filter($"id" === 1L).count()
    assert(all1 == 3) // every 3-gram of doc 1 selected at w=1
  }

  test("winnowPairs: planted near-dup found, df cap prunes universal fingerprints") {
    val template = (1 to 30).map(i => s"tok$i").mkString(" ")
    val d = docs(
      1L -> template,
      2L -> (template + " tail one"),
      3L -> "unrelated words entirely distinct from the template corpus")
    val pairs = Fingerprints.winnowPairs(d, k = 3, w = 4, minShared = 2, dfCap = 50)
      .as[(Long, Long, Long)].collect()
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L))
    assert(!pairs.exists(p => p._2 == 3L || p._1 == 3L))
    // dfCap = 1 prunes EVERY fingerprint (df >= 2 needed to witness) → no pairs
    assert(Fingerprints.winnowPairs(d, k = 3, w = 4, minShared = 1, dfCap = 1).count() == 0)
  }

  test("cdcChunks partitions the token sequence exactly") {
    val d = docs(
      1L -> (1 to 200).map(i => s"w${i % 37}x$i").mkString(" "),
      2L -> "tiny",
      3L -> "")
    val chunks = Fingerprints.cdcChunks(d, k = 3, divisor = 8)
      .select($"id", $"chunk_idx", $"start_tok", $"n_toks")
      .as[(Long, Long, Long, Long)].collect().groupBy(_._1)
    val nToks = d.select($"doc_id", size(graft.functions.Text.tokens($"text")))
      .as[(Long, Int)].collect().toMap
    chunks.foreach { case (id, cs) =>
      val sorted = cs.sortBy(_._2)
      assert(sorted.head._3 == 1L, "first chunk starts at token 1")
      // consecutive: each chunk starts where the previous ended + 1
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(b._3 == a._3 + a._4)
        case _ =>
      }
      assert(sorted.last._3 + sorted.last._4 - 1 == nToks(id).toLong,
        "last chunk ends at the last token")
    }
    assert(chunks(2L).length == 1 && chunks(3L).length == 1,
      "sub-k docs are one chunk")
    assert(chunks(1L).length > 1, "long doc splits")
  }

  test("cdcChunks: a one-token edit only reshapes chunks at the edit point") {
    val toks = (1 to 300).map(i => s"v${i % 53}q$i")
    val edited = (toks.take(150) :+ "INSERTED") ++ toks.drop(150)
    val d = docs(1L -> toks.mkString(" "), 2L -> edited.mkString(" "))
    val hs = Fingerprints.cdcChunks(d, k = 3, divisor = 8)
      .select($"id", $"chunk_hash").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val common = hs(1L) & hs(2L)
    // every chunk not near the edit is hash-identical: the insert only
    // perturbs k-grams overlapping it (2k−1 grams), which can cross at
    // most two existing boundaries → ≤ 3 chunks differ per side
    assert(hs(1L).size - common.size <= 3,
      s"edit leaked: ${hs(1L).size - common.size} original chunks changed")
    assert(hs(2L).size - common.size <= 3)
    assert(common.nonEmpty)
  }

  test("cdcDupMass: near-copies carry high dup mass, unique docs zero; intra-doc repeats don't count") {
    val toks = (1 to 300).map(i => s"v${i % 53}q$i")
    val edited = (toks.take(150) :+ "INSERTED") ++ toks.drop(150)
    val selfRep = (1 to 5).flatMap(_ => (1 to 40).map(i => s"rep$i")) // repeats only within itself
    val d = docs(
      1L -> toks.mkString(" "),
      2L -> edited.mkString(" "),
      3L -> (1 to 100).map(i => s"uniq${i}z").mkString(" "),
      4L -> selfRep.mkString(" "))
    val m = graft.ops.Fingerprints.cdcDupMass(d, k = 3, divisor = 8)
      .select($"id", $"dup_frac").as[(Long, Double)].collect().toMap
    assert(m(1L) > 0.8, s"near-copy dup_frac ${m(1L)}")
    assert(m(2L) > 0.8)
    assert(m(3L) == 0.0, "unique doc must carry zero dup mass")
    assert(m(4L) == 0.0, "within-doc repetition is not cross-doc dup mass")
  }

  test("winnow store: write-once, served probe == inline, append marker-idempotent") {
    val dir = java.nio.file.Files.createTempDirectory("winnow_store").toFile
    val path = new java.io.File(dir, "fps").getPath
    val template = (1 to 30).map(i => s"st$i").mkString(" ")
    val corpus = docs(2L -> template, 4L -> "some other corpus doc entirely")
    val probe = docs(1L -> (template + " suffix"), 3L -> "nothing shared here at all")

    graft.ops.Fingerprints.winnowStored(corpus, path, k = 3, w = 4)
    val files1 = new java.io.File(path).listFiles().count(_.getName.endsWith(".parquet"))
    graft.ops.Fingerprints.winnowStored(corpus, path, k = 3, w = 4) // no-op
    assert(new java.io.File(path).listFiles()
      .count(_.getName.endsWith(".parquet")) == files1, "second build must be a no-op")

    val served = graft.ops.Fingerprints.winnowIncremental(probe, path,
        minShared = 2, dfCap = 50)
      .as[(Long, Long, Long)].collect().toSet
    assert(served.exists(p => p._1 == 2L && p._2 == 1L), "stored corpus must match probe near-dup")
    assert(!served.exists(_._2 == 3L))

    // append survivors; replaying the same batchTag must not double-post
    graft.ops.Fingerprints.winnowStoreAppend(probe, path, "b1", k = 3, w = 4)
    val rows = spark.read.parquet(path).count()
    graft.ops.Fingerprints.winnowStoreAppend(probe, path, "b1", k = 3, w = 4)
    assert(spark.read.parquet(path).count() == rows, "replayed append must be a no-op")
    // a later batch now collides with the appended doc 1 as well
    val probe2 = docs(5L -> (template + " another tail"))
    val inc2 = graft.ops.Fingerprints.winnowIncremental(probe2, path,
        minShared = 2, dfCap = 50)
      .as[(Long, Long, Long)].collect().toSet
    assert(inc2.exists(p => p._1 == 2L && p._2 == 5L))
    assert(inc2.exists(p => p._1 == 1L && p._2 == 5L), "appended batch must be probe-visible")
  }

  test("self-maintaining fingerprint stream: detection floor holds across corpus, batch, and prior survivors") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val template = (1 to 30).map(i => s"fs$i").mkString(" ")
    val corpus = docs(2L -> template)
    val dir = java.nio.file.Files.createTempDirectory("graft-fpstream").toFile
    val store = new java.io.File(dir, "fps").getPath
    graft.ops.Fingerprints.winnowStored(corpus, store, k = 3, w = 4)

    val novel = (1 to 30).map(i => s"nv${i}a").mkString(" ")
    val flagged = scala.collection.mutable.Map.empty[Long, Set[(Long, Long)]]
    val kept = scala.collection.mutable.Map.empty[Long, Set[Long]]
    val mem = MemoryStream[(Long, String)]
    val writer = graft.streaming.FingerprintStream.selfMaintaining(
      mem.toDF().toDF("doc_id", "text"), store, minShared = 2, dfCap = 50) {
      (batchId, pairs, survivors) =>
        flagged(batchId) = pairs.select("corpus_id", "probe_id")
          .as[(Long, Long)].collect().toSet
        kept(batchId) = survivors.select("doc_id").as[Long].collect().toSet
    }
    val ckpt = java.nio.file.Files.createTempDirectory("graft-fpstream-ckpt").toString
    val q = writer.option("checkpointLocation", ckpt).start()
    try {
      // batch 0: a near-copy of the corpus doc (guaranteed hit: shares a
      // 30-token run), a novel doc, and a within-batch near-copy of the
      // novel doc (keep-lowest-id cuts 15)
      mem.addData(
        (11L, template + " trailing extra"),
        (13L, novel),
        (15L, novel + " tail"))
      q.processAllAvailable()
      assert(flagged(0L).contains((2L, 11L)), s"corpus dup flagged: ${flagged(0L)}")
      assert(kept(0L) === Set(13L), s"kept: ${kept(0L)}")
      // batch 1: a near-copy of batch 0's SURVIVOR — catchable only via
      // the fold-in — plus a genuinely new doc
      mem.addData(
        (21L, novel + " different tail"),
        (23L, (1 to 30).map(i => s"zz${i}q").mkString(" ")))
      q.processAllAvailable()
      assert(flagged(1L).exists { case (c, p) => c == 13L && p == 21L },
        s"survivor dup flagged via grown store: ${flagged(1L)}")
      assert(kept(1L) === Set(23L), s"kept: ${kept(1L)}")
      // store = corpus + survivors only, each posted once
      val ids = spark.read.parquet(store).select("id").distinct()
        .as[Long].collect().toSet
      assert(ids === Set(2L, 13L, 23L), s"store ids: $ids")
    } finally q.stop()
  }

  test("stream replay is bit-identical even when the first attempt's append crosses dfCap") {
    // w=1 makes winnowing deterministic: fingerprints = distinct k-gram
    // hashes. Scenario engineered so the FIRST attempt's append pushes
    // stored df(g_X) from dfCap to dfCap+1: a replay that recomputed the
    // df histogram over the already-appended store would prune g_X, drop
    // doc 11's pairs below minShared, and emit divergent survivors. The
    // fix (batch ids anti-joined out BEFORE the histogram) must emit
    // identical results on both attempts and leave the store unchanged.
    val dir = java.nio.file.Files.createTempDirectory("fp_replay").toFile
    val store = new java.io.File(dir, "fps").getPath
    val corpus = docs(
      1L -> "a1 a2 x1 x2 x3 a3 a4 y1 y2 y3 a5",
      2L -> "b1 b2 x1 x2 x3 b3 b4 y1 y2 y3 b5",
      3L -> "c1 c2 x1 x2 x3 c3 c4 c5 c6")
    graft.ops.Fingerprints.winnowStored(corpus, store, k = 3, w = 1)
    // batch: 10 shares ONLY g_X with the store (survives, appends g_X →
    // stored df(g_X) = 4 > dfCap=3); 11 shares g_X+g_Y with docs 1,2
    // (flagged, n_shared = 2 = minShared)
    val batch = docs(
      10L -> "s1 s2 x1 x2 x3 s4 s5",
      11L -> "p0 x1 x2 x3 p1 y1 y2 y3 p2")
    var results = Vector.empty[(Set[(Long, Long, Long)], Set[Long])]
    def run(): Unit =
      graft.streaming.FingerprintStream.processBatch(batch, 0L, store,
        minShared = 2, dfCap = 3, k = 3, w = 1, "doc_id", "text") {
        (_, pairs, survivors) =>
          results :+= ((
            pairs.select("corpus_id", "probe_id", "n_shared")
              .as[(Long, Long, Long)].collect().toSet,
            survivors.select("doc_id").as[Long].collect().toSet))
      }
    run()
    assert(results(0)._1 === Set((1L, 11L, 2L), (2L, 11L, 2L)),
      s"first attempt pairs: ${results(0)._1}")
    assert(results(0)._2 === Set(10L))
    val storeRows = spark.read.parquet(store)
      .as[(Long, Long)].collect().sorted.toSeq
    run() // at-least-once redelivery AFTER the append
    assert(results(1) === results(0),
      s"replay diverged: ${results(1)} vs ${results(0)}")
    assert(spark.read.parquet(store).as[(Long, Long)].collect().sorted.toSeq
      === storeRows, "replay must not change the store")
  }

  test("postingsAppend converges after simulated crashes (stale staging, partial rename)") {
    val dir = java.nio.file.Files.createTempDirectory("fp_commit").toFile
    val store = new java.io.File(dir, "fps").getPath
    graft.ops.Fingerprints.winnowStored(
      docs(1L -> (1 to 30).map(i => s"base$i").mkString(" ")), store, k = 3, w = 4)
    val before = spark.read.parquet(store).as[(Long, Long)].collect().sorted.toSeq
    val batchFps = Seq((50L, 111L), (50L, 222L), (51L, 333L)).toDF("id", "fp")

    // crash #1: a previous attempt died after a PARTIAL staging write —
    // stale garbage sits in the staging dir; mode-overwrite restaging
    // must replace it wholesale
    Seq((99L, 999L)).toDF("id", "fp").write.mode("overwrite")
      .parquet(new java.io.File(store, "_staging_bZ").getPath)
    // crash #2: a previous attempt of the SAME batch died mid-rename —
    // an already-renamed data file sits in the store without a marker;
    // the deterministic-name cleanup must delete it before re-renaming
    val stray = new java.io.File(store, "append-bZ-00000-stale.parquet")
    val anyPart = new java.io.File(store).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(anyPart.toPath, stray.toPath)

    graft.ops.Fingerprints.postingsAppend(batchFps, store, "bZ", spark)
    val after = spark.read.parquet(store).as[(Long, Long)].collect().sorted.toSeq
    assert(after === (before ++ Seq((50L, 111L), (50L, 222L), (51L, 333L))).sorted,
      s"store after crash-recovered commit: $after")
    assert(!new java.io.File(store, "_staging_bZ").exists(), "staging cleaned up")
    // and the marker now blocks any further replay
    graft.ops.Fingerprints.postingsAppend(batchFps, store, "bZ", spark)
    assert(spark.read.parquet(store).count() === after.size.toLong)
  }

  test("ppl buckets: per-lang terciles balanced, head outranks tail") {
    val q = graft.queries.Queries.all.toMap.apply("q_ppl_buckets")._1
    val out = q(spark, sf0001)
      .select($"lang", $"bucket", $"mean_cond_prob")
      .as[(String, String, Double)].collect()
    out.groupBy(_._1).foreach { case (lang, rows) =>
      val sizes = rows.groupBy(_._2).view.mapValues(_.length)
      val s = Seq("head", "middle", "tail").map(b => sizes.getOrElse(b, 0))
      assert(s.max - s.min <= 1, s"$lang tercile sizes $s")
      val headMin = rows.filter(_._2 == "head").map(_._3).min
      val tailMax = rows.filter(_._2 == "tail").map(_._3).max
      assert(headMin >= tailMax, s"$lang head $headMin < tail $tailMax")
    }
  }
}
