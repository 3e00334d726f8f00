package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.functions.Text
import graft.sink.{ColumnSpec, JdbcDeltaSink, TableSpec}
import graft.streaming.DeltaPipeline

/** End-to-end incremental corpus maintenance: the engine's defining
  * capability (continuously-synced materialized views, reference
  * runner.rs:151-358) applied to the training-data domain — streaming
  * document ingestion through stateful content dedup and a quality
  * floor, materialized exactly-once into a JDBC table; plus streaming
  * MinHash near-dup detection across micro-batches. */
class StreamingCorpusSpec extends SparkTestBase {
  import spark.implicits._

  test("stream → fingerprint dedup → quality floor → JDBC corpus table") {
    implicit val sqlCtx = spark.sqlContext

    val sink = new JdbcDeltaSink(
      "jdbc:derby:memory:corpus;create=true",
      TableSpec("corpus", 1, Seq(
        ColumnSpec("doc_id", "BIGINT", index = true),
        ColumnSpec("lang", "VARCHAR(8)"),
        ColumnSpec("fp", "VARCHAR(32)"))))

    val mem = MemoryStream[(Long, String, String)]
    val view = mem.toDF().toDF("doc_id", "lang", "text")
      .withColumn("fp", Text.fingerprint(col("text")))
      .dropDuplicates("fp") // state-backed: first arrival wins across batches
      .filter(Text.qualityScore(col("text")) >= 0.5)
      .select(col("doc_id"), col("lang"), col("fp"))

    val ckpt = java.nio.file.Files.createTempDirectory("graft-corpus-ckpt").toString
    val q = DeltaPipeline.start(view, sink, ckpt, Trigger.ProcessingTime(0L))

    def ids(): Set[Long] = sink.readRows()
      .map(_(0).asInstanceOf[Number].longValue).toSet

    val good1 = "the quick brown fox jumps over the lazy dog near the river bank"
    val good2 = "pack my box with five dozen liquor jugs before the long winter"
    try {
      mem.addData((1L, "en", good1), (2L, "en", "!!! ??? ... ###"))
      q.processAllAvailable()
      assert(ids() === Set(1L), "junk doc fails the quality floor")

      // batch 2: a normalized duplicate of doc 1 plus a genuinely new doc
      mem.addData((3L, "en", "  THE Quick   brown fox jumps over the lazy dog near the river bank "),
        (4L, "en", good2))
      q.processAllAvailable()
      assert(ids() === Set(1L, 4L),
        "cross-batch duplicate suppressed by dedup state; new doc lands")

      // the sink recorded every micro-batch exactly once
      assert(sink.lastBatchId().exists(_ >= 1L))
    } finally q.stop()
  }

  test("streaming near-dup: a later batch's near-duplicate pairs with earlier state") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val nearDup = base.replace("upsilon", "phi") // one token differs
    val unrelated = "one two three four five six seven eight nine ten " +
      "eleven twelve thirteen fourteen fifteen sixteen"
    val out = graft.streaming.NearDupStream.pairs(
      mem.toDF().toDF("doc_id", "text"), tau = 0.35)
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("neardup_stream").start()
    try {
      mem.addData((1L, base), (2L, unrelated))
      q.processAllAvailable()
      assert(spark.sql("SELECT * FROM neardup_stream").count() === 0,
        "unrelated docs produce no pairs")
      mem.addData((3L, nearDup)) // arrives a batch later
      q.processAllAvailable()
      val pairs = spark.sql("SELECT DISTINCT id_a, id_b FROM neardup_stream")
        .as[(Long, Long)].collect().toSet
      assert(pairs === Set((1L, 3L)),
        "cross-batch near-dup detected against bucket state")
    } finally q.stop()
  }

  test("streaming store probe: batches match the batch incremental path, no state accrues") {
    implicit val sqlCtx = spark.sqlContext
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val corpus = Seq((10L, base),
      (12L, "one two three four five six seven eight nine ten eleven twelve"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-mhstream").toFile
    val store = new java.io.File(dir, "sigs").getPath
    graft.ops.Dedup.minhashBandsStored(corpus, store)
    val mem = MemoryStream[(Long, String)]
    val out = graft.streaming.NearDupStream.againstStore(
      mem.toDF().toDF("doc_id", "text"), store, tau = 0.35)
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("mh_store_stream").start()
    try {
      mem.addData((1L, base.replace("upsilon", "phi")), (2L, "unrelated text here"))
      q.processAllAvailable()
      mem.addData((3L, "one two three four five six seven eight nine ten eleven alt"))
      q.processAllAvailable()
      val got = spark.sql(
        "SELECT DISTINCT corpus_id, probe_id FROM mh_store_stream")
        .as[(Long, Long)].collect().toSet
      // must equal the batch incremental path on the same probe docs
      val probe = Seq((1L, base.replace("upsilon", "phi")),
        (2L, "unrelated text here"),
        (3L, "one two three four five six seven eight nine ten eleven alt"))
        .toDF("doc_id", "text")
      val batch = graft.ops.Dedup.minhashIncremental(probe, store, tau = 0.35)
        .select($"corpus_id", $"probe_id").as[(Long, Long)].collect().toSet
      assert(got === batch)
      assert(got.nonEmpty, "fixture must produce store hits")
      // stream-static join is stateless: no state store rows reported
      assert(q.lastProgress.stateOperators.isEmpty
        || q.lastProgress.stateOperators.forall(_.numRowsTotal == 0),
        "againstStore must not accumulate streaming state")
    } finally q.stop()
  }

  test("self-maintaining dedup corpus: each batch dedups against corpus + prior survivors, store grows") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq(
      (2L, "the quick brown fox jumps over the lazy dog tonight"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-selfmaint").toFile
    val store = new java.io.File(dir, "sigs").getPath
    graft.ops.Dedup.minhashBandsStored(corpus, store)

    val flagged = scala.collection.mutable.Map.empty[Long, Set[(Long, Long)]]
    val kept = scala.collection.mutable.Map.empty[Long, Set[Long]]
    val calls = new java.util.concurrent.atomic.AtomicInteger(0)
    val mem = MemoryStream[(Long, String)]
    val writer = graft.streaming.NearDupStream.selfMaintaining(
      mem.toDF().toDF("doc_id", "text"), store, tau = 0.5) {
      (batchId, dupPairs, survivors) =>
        calls.incrementAndGet()
        flagged(batchId) = dupPairs.select("corpus_id", "probe_id")
          .as[(Long, Long)].collect().toSet
        kept(batchId) = survivors.select("doc_id").as[Long].collect().toSet
    }
    val ckpt = java.nio.file.Files.createTempDirectory("graft-selfmaint-ckpt").toString
    val q = writer.option("checkpointLocation", ckpt).start()
    try {
      // batch 0: one exact dup of the seeded corpus (deterministic
      // band hit), one novel doc, plus a within-batch exact pair
      // (13 canonical, 15 cut by keep-lowest-id)
      mem.addData(
        (11L, "the quick brown fox jumps over the lazy dog tonight"),
        (13L, "novel text about distributed query engines at scale"),
        (15L, "novel text about distributed query engines at scale"))
      q.processAllAvailable()
      assert(flagged(0L).contains((2L, 11L)), s"corpus dup flagged: ${flagged(0L)}")
      assert(kept(0L) === Set(13L),
        s"novel canonical doc survives: kept=${kept(0L)} flagged=${flagged(0L)}")
      // batch 1: an exact dup of batch 0's SURVIVOR — catchable only
      // because the fold-in happened — and one novel doc
      mem.addData(
        (21L, "novel text about distributed query engines at scale"),
        (23L, "unrelated musings on garden vegetables and weather"))
      q.processAllAvailable()
      assert(flagged(1L).exists { case (c, p) => c == 13L && p == 21L },
        s"batch-1 doc pairs with batch-0 survivor via the grown store: ${flagged(1L)}")
      assert(kept(1L) === Set(23L), s"only the novel doc survives: ${kept(1L)}")
      // store holds exactly corpus + survivors, each signed once
      val ids = spark.read.parquet(store).select("id").distinct()
        .as[Long].collect().toSet
      assert(ids === Set(2L, 13L, 23L), s"store ids: $ids")
      // replay-robustness covers re-invocation, but steady state must be
      // one body execution per micro-batch — a systematic double run
      // would double every batch's cost in production
      assert(calls.get() === 2, s"foreachBatch bodies ran ${calls.get()} times for 2 batches")
    } finally q.stop()
  }

  test("self-maintaining span store: each batch's text is cleaned against corpus + prior batches") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-spanstream").toFile
    val store = new java.io.File(dir, "spans").getPath
    graft.ops.Dedup.spanSetStored(corpus, store, spanLen = 3)

    val cleaned = scala.collection.mutable.Map.empty[Long, Map[Long, (Long, Long, String)]]
    val mem = MemoryStream[(Long, String)]
    val writer = graft.streaming.SpanStream.selfMaintaining(
      mem.toDF().toDF("doc_id", "text"), store, spanLen = 3) {
      (batchId, out) =>
        cleaned(batchId) = out.collect()
          .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    }
    val ckpt = java.nio.file.Files.createTempDirectory("graft-spanstream-ckpt").toString
    val q = writer.option("checkpointLocation", ckpt).start()
    try {
      // batch 0: doc 11 quotes the seeded corpus, doc 13 is novel
      mem.addData((11L, "x y a b c d e z"), (13L, "p q r s t"))
      q.processAllAvailable()
      assert(cleaned(0L)(11L) === ((8L, 5L, "x y z")), s"corpus quote cut: ${cleaned(0L)}")
      assert(cleaned(0L)(13L) === ((5L, 0L, "p q r s t")), "novel doc intact")
      // batch 1: doc 21 quotes BATCH 0's doc 13 — cuttable only because
      // batch 0's spans were folded into the store
      mem.addData((21L, "m n p q r s t w"))
      q.processAllAvailable()
      assert(cleaned(1L)(21L) === ((8L, 5L, "m n w")),
        s"prior-batch spans are corpus-owned: ${cleaned(1L)}")
    } finally q.stop()
  }

  test("DSIR scoring runs unchanged on a stream (map-only, stateless, bit-equal to batch)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // λ table trained on the batch corpus; the stream scores each
    // arriving doc with a zero-exchange decimal fold — no join, no
    // state, no watermark
    val corpus = spark.read.parquet(s"$sf0001/documents.parquet")
    val ratios = graft.ops.Dsir.trainLogRatios(
      corpus.filter($"lang" === "en"), corpus, buckets = 512)
    val mem = MemoryStream[(Long, String)]
    val out = graft.ops.Dsir.scoreMapOnly(
      mem.toDF().toDF("doc_id", "text"), ratios, buckets = 512)
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("dsir_stream").start()
    try {
      mem.addData((1L, "alpha beta gamma"), (2L, "one two three four"))
      q.processAllAvailable()
      mem.addData((3L, "later batch doc"))
      q.processAllAvailable()
      val got = spark.sql("SELECT doc_id, weight, n_grams FROM dsir_stream")
        .as[(Long, java.math.BigDecimal, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      val batch = graft.ops.Dsir.scoreMapOnly(
        Seq((1L, "alpha beta gamma"), (2L, "one two three four"),
          (3L, "later batch doc")).toDF("doc_id", "text"),
        ratios, buckets = 512)
        .as[(Long, java.math.BigDecimal, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got === batch, "stream scores bit-equal the batch fold")
      assert(q.lastProgress.stateOperators.isEmpty,
        "map-only scoring must not create streaming state")
    } finally q.stop()
  }

  test("windowed near-dup: pairs within the horizon, expired residents never pair, idle buckets reaped") {
    implicit val sqlCtx = spark.sqlContext
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val nd1 = base.replace("upsilon", "phi")
    val nd2 = base.replace("upsilon", "chi")
    val unrelated = "one two three four five six seven eight nine ten " +
      "eleven twelve thirteen fourteen fifteen sixteen"
    def ts(min: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 10:$min%02d:00")
    val mem = MemoryStream[(Long, String, java.sql.Timestamp)]
    val out = graft.streaming.NearDupStream.pairsWindowed(
      mem.toDF().toDF("doc_id", "text", "ts"), tau = 0.35, tsCol = "ts",
      watermarkDelay = "0 seconds", horizonMs = 10 * 60 * 1000L)
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("windowed_neardup").start()
    try {
      mem.addData((1L, base, ts(0)))
      q.processAllAvailable()
      mem.addData((4L, nd1, ts(5)))         // within horizon of doc 1
      q.processAllAvailable()
      mem.addData((2L, unrelated, ts(30)))  // advances the watermark
      q.processAllAvailable()
      mem.addData((5L, nd2, ts(31)))        // doc 1 and 4 now expired
      q.processAllAvailable()
      val pairs = spark.sql("SELECT DISTINCT id_a, id_b FROM windowed_neardup")
        .as[(Long, Long)].collect().toSet
      assert(pairs === Set((1L, 4L)),
        s"only the in-horizon pair is emitted: $pairs")
    } finally q.stop()
  }

  test("windowed near-dup: horizon binds pairwise within one micro-batch; short docs don't crash") {
    implicit val sqlCtx = spark.sqlContext
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val mem = MemoryStream[(Long, String, java.sql.Timestamp)]
    val out = graft.streaming.NearDupStream.pairsWindowed(
      mem.toDF().toDF("doc_id", "text", "ts"), tau = 0.35, tsCol = "ts",
      watermarkDelay = "0 seconds", horizonMs = 10 * 60 * 1000L)
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("windowed_pairwise").start()
    try {
      // identical docs 22 hours apart arriving in the SAME micro-batch:
      // the watermark hasn't moved yet, so only the pairwise check can
      // (and must) suppress the pair
      mem.addData(
        (1L, base, java.sql.Timestamp.valueOf("2026-01-01 01:00:00")),
        (2L, base, java.sql.Timestamp.valueOf("2026-01-01 23:00:00")),
        // sub-shingleLen docs: NULL signature must not reach the state fn
        (3L, "hi there", java.sql.Timestamp.valueOf("2026-01-01 01:00:00")),
        (4L, "two toks", java.sql.Timestamp.valueOf("2026-01-01 01:00:00")))
      q.processAllAvailable()
      assert(spark.sql("SELECT * FROM windowed_pairwise").count() === 0,
        "distant same-batch docs never pair; short docs are dropped, not fatal")
    } finally q.stop()
  }

  test("streaming semantic near-dup: paraphrase caught across micro-batches, cells isolate state") {
    implicit val sqlCtx = spark.sqlContext
    // model: two orthogonal cells
    val cents = Array(1.0, 0.0, 0.0, 0.0,
                      0.0, 0.0, 0.0, 1.0)
    val mem = MemoryStream[(Long, Seq[Float])]
    val out = graft.streaming.NearDupStream.semanticPairs(
      mem.toDF().toDF("vec_id", "embedding"), cents, dim = 4, tau = 0.95)
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("semdup_stream").start()
    try {
      mem.addData((1L, Seq(1.0f, 0.1f, 0.0f, 0.0f)),  // cell 0
                  (2L, Seq(0.0f, 0.0f, 0.2f, 1.0f)))  // cell 1
      q.processAllAvailable()
      assert(spark.sql("SELECT * FROM semdup_stream").count() === 0,
        "cross-cell vectors are never compared")
      // batch 2: a near-duplicate of vector 1 (same direction, scaled)
      mem.addData((3L, Seq(2.0f, 0.2f, 0.0f, 0.0f)),
                  (4L, Seq(0.0f, 1.0f, 0.0f, 0.0f))) // cell 0 but orthogonal
      q.processAllAvailable()
      val pairs = spark.sql("SELECT DISTINCT id_a, id_b FROM semdup_stream")
        .as[(Long, Long)].collect().toSet
      assert(pairs === Set((1L, 3L)),
        "cross-batch semantic pair detected against cell-resident state")
    } finally q.stop()
  }

  test("streaming decontamination: stream-static gram join, stateless and append-mode") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq(
      (100L, "alpha beta gamma delta epsilon zeta"),
      (101L, "one two three four five six")).toDF("doc_id", "text")
    val corpusGrams = graft.ops.Dedup.corpusGramSet(corpus, n = 5)
    val mem = MemoryStream[(Long, String)]
    val out = graft.streaming.DecontamStream.contaminatedGrams(
      mem.toDF().toDF("doc_id", "text"), corpusGrams, n = 5)
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("decontam_stream").start()
    try {
      mem.addData((1L, "alpha beta gamma delta epsilon nine ten"), // 1 hit
                  (2L, "totally unrelated words in this evaluation doc"))
      q.processAllAvailable()
      mem.addData((3L, "one two three four five six")) // 2 hits, later batch
      q.processAllAvailable()
      import spark.implicits._
      val hits = spark.sql(
        "SELECT probe_id, count(*) FROM decontam_stream GROUP BY 1")
        .as[(Long, Long)].collect().toMap
      assert(hits === Map(1L -> 1L, 3L -> 2L),
        s"per-batch verdicts across micro-batches: $hits")
      // stateless: no state store operator in the streaming plan
      assert(q.lastProgress.stateOperators.isEmpty,
        "stream-static join must not create streaming state")
    } finally q.stop()
  }

  test("streaming decontamination with the Bloom pre-screen: same verdicts, still stateless") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq(
      (100L, "alpha beta gamma delta epsilon zeta"),
      (101L, "one two three four five six")).toDF("doc_id", "text")
    val corpusGrams = graft.ops.Dedup.corpusGramSet(corpus, n = 5)
    val bloom = graft.ops.BloomScreen
      .buildBloom(corpusGrams, "g", 1024L, 1L << 14).get
    val mem = MemoryStream[(Long, String)]
    val out = graft.streaming.DecontamStream.contaminatedGramsScreened(
      mem.toDF().toDF("doc_id", "text"), corpusGrams, bloom, n = 5)
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("decontam_bloom_stream").start()
    try {
      mem.addData((1L, "alpha beta gamma delta epsilon nine ten"), // 1 hit
                  (2L, "totally unrelated words in this evaluation doc"))
      q.processAllAvailable()
      mem.addData((3L, "one two three four five six")) // 2 hits, later batch
      q.processAllAvailable()
      import spark.implicits._
      val hits = spark.sql(
        "SELECT probe_id, count(*) FROM decontam_bloom_stream GROUP BY 1")
        .as[(Long, Long)].collect().toMap
      assert(hits === Map(1L -> 1L, 3L -> 2L),
        s"screened stream must reach the unscreened verdicts: $hits")
      assert(q.lastProgress.stateOperators.isEmpty,
        "the sketch filter must not introduce streaming state")
    } finally q.stop()
  }

  test("quality-classifier scoring runs unchanged on a stream (map-only, stateless)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // train on the batch corpus; score fresh docs as they arrive — the
    // model is a plan constant, so the streaming plan needs no join,
    // no state, no watermark
    val corpus = spark.read.parquet(s"$sf0001/documents.parquet")
    val (model, cut) = graft.ops.QualityClassifier.train(corpus,
      buckets = 256, seed = 11)
    val mem = MemoryStream[(Long, String)]
    val out = graft.ops.QualityClassifier.score(
      mem.toDF().toDF("doc_id", "text"), model, buckets = 256, seed = 11,
      cutPpm = cut)
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("qc_stream").start()
    try {
      mem.addData((1L, "alpha beta gamma"), (2L, "one two three four"))
      q.processAllAvailable()
      mem.addData((3L, "later batch doc"))
      q.processAllAvailable()
      val rows = spark.sql("SELECT doc_id, score_ppm, pred FROM qc_stream")
        .as[(Long, Long, Long)].collect()
      assert(rows.map(_._1).toSet === Set(1L, 2L, 3L))
      rows.foreach { case (_, ppm, pred) =>
        assert(ppm >= 0 && ppm < 1000000L)
        assert(pred === (if (ppm >= cut) 1L else 0L))
      }
      assert(q.lastProgress.stateOperators.isEmpty,
        "map-only scoring must not create streaming state")
    } finally q.stop()
  }

  test("stored BPE merges tokenize a stream (map-only column encode, stateless)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // train on the batch corpus once; the merge table is a plan
    // constant, so streaming token accounting is a stateless projection
    val corpus = spark.read.parquet(s"$sf0001/documents.parquet")
    val merges = graft.ops.Bpe.trainMerges(corpus, k = 4).map(m => (m._2, m._3))
    val mem = MemoryStream[(Long, String)]
    val out = mem.toDF().toDF("doc_id", "text")
      .select(col("doc_id"),
        graft.ops.Bpe.tokenCountCol(col("text"), merges).as("n_bpe_tokens"))
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("bpe_stream").start()
    try {
      mem.addData((1L, "low lower"), (2L, "newest widest"))
      q.processAllAvailable()
      mem.addData((3L, "low"))
      q.processAllAvailable()
      val rows = spark.sql("SELECT doc_id, n_bpe_tokens FROM bpe_stream")
        .as[(Long, Long)].collect().toMap
      // batch-path equality on the same texts pins the streaming result
      val batch = Seq((1L, "low lower"), (2L, "newest widest"), (3L, "low"))
        .toDF("doc_id", "text")
        .select(col("doc_id"),
          graft.ops.Bpe.tokenCountCol(col("text"), merges).as("n"))
        .as[(Long, Long)].collect().toMap
      assert(rows === batch)
      assert(q.lastProgress.stateOperators.isEmpty,
        "column encode must not create streaming state")
    } finally q.stop()
  }

  test("windowed semantic near-dup: in-horizon pairs only, expired residents evicted, on RocksDB") {
    implicit val sqlCtx = spark.sqlContext
    val conf = spark.conf
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = conf.getOption(key)
    conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val cents = Array(1.0, 0.0, 0.0, 0.0,
                        0.0, 0.0, 0.0, 1.0)
      def ts(min: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 10:$min%02d:00")
      val mem = MemoryStream[(Long, Seq[Float], java.sql.Timestamp)]
      val out = graft.streaming.NearDupStream.semanticPairsWindowed(
        mem.toDF().toDF("vec_id", "embedding", "ts"), cents, dim = 4,
        tau = 0.95, tsCol = "ts", watermarkDelay = "0 seconds",
        horizonMs = 10 * 60 * 1000L)
      val q = out.writeStream.outputMode("append").format("memory")
        .queryName("windowed_semantic").start()
      try {
        val v = Seq(1.0f, 0.1f, 0.0f, 0.0f) // cell 0
        mem.addData((1L, v, ts(0)))
        q.processAllAvailable()
        mem.addData((4L, v.map(_ * 2), ts(5))) // within horizon of vec 1
        q.processAllAvailable()
        // watermark advances past vec 1 and 4's horizon
        mem.addData((2L, Seq(0.0f, 0.0f, 0.2f, 1.0f), ts(30))) // cell 1
        q.processAllAvailable()
        mem.addData((5L, v.map(_ * 3), ts(31))) // vecs 1 and 4 expired
        q.processAllAvailable()
        // same-batch vectors far apart in event time (>horizon from
        // vec 5 and from each other): only the pairwise horizon check
        // can suppress these pairs (watermark lags)
        mem.addData((6L, v, ts(45)), (7L, v, ts(56)))
        q.processAllAvailable()
        val pairs = spark.sql("SELECT DISTINCT id_a, id_b FROM windowed_semantic")
          .as[(Long, Long)].collect().toSet
        assert(pairs === Set((1L, 4L)),
          s"only the in-horizon semantic pair is emitted: $pairs")
      } finally q.stop()
    } finally {
      prev.fold(conf.unset(key))(conf.set(key, _))
    }
  }
}
