package graft

import org.apache.spark.sql.functions._
import graft.functions.Text
import graft.ops.{Dedup, Multimodal, TextStats}

/** Text/multimodal operator units not covered by the oracle queries. */
class TextOpsSpec extends SparkTestBase {

  import spark.implicits._

  test("rolling fingerprint is order-sensitive; set-identical docs differ") {
    val docs = Seq(
      (1L, "a b c"), (2L, "a b c"), (3L, "c b a")).toDF("id", "text")
    val out = docs
      .select(col("id"),
        transform(Text.tokens(col("text")), t => Text.hash64(t, 0)).as("th"))
      .select(col("id"), Text.rollingFingerprint(col("th")).as("rh"))
      .as[(Long, Long)].collect().toMap
    assert(out(1L) === out(2L), "identical docs hash equal")
    assert(out(1L) !== out(3L), "reordered tokens hash differently")
  }

  test("simhash near-dup banding finds all pairs within hamming<=3") {
    // docs sharing most tokens land within small hamming distance
    val docs = Seq(
      (1L, "spark query engine fast scalable distributed"),
      (2L, "spark query engine fast scalable distributed extra"), // near-dup of 1
      (3L, "completely different words entirely unrelated corpus text")).toDF("doc_id", "text")
    val pairs = Dedup.simhashNearDup(docs, maxHamming = 3)
      .as[(Long, Long, Long)].collect()
    val brute = docs.select(col("doc_id"), Text.simhash(col("text")).as("sh"))
      .as[(Long, Long)].collect()
    val expected = for {
      (ia, sa) <- brute; (ib, sb) <- brute
      if ia < ib && java.lang.Long.bitCount(sa ^ sb) <= 3
    } yield (ia, ib)
    assert(pairs.map(p => (p._1, p._2)).toSet === expected.toSet,
      "banded candidates must equal brute-force hamming<=3 pairs")
  }

  test("simhashStoreAppend: batch emissions union to the from-scratch pairs; replay identical") {
    val dir = java.nio.file.Files.createTempDirectory("simhash_store").toString
    // real corpus slice: enough docs that several near-pairs straddle
    // the batch boundaries
    val docs = graft.core.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text"))
    val slices = (0 until 3).map(i =>
      docs.filter(pmod(col("doc_id"), lit(3)) === i))
    val emitted = slices.zipWithIndex.map { case (b, i) =>
      Dedup.simhashStoreAppend(b, dir, f"slice_$i")
        .as[(Long, Long, Long)].collect().toSet
    }
    // each unordered pair emits exactly once, in its later doc's batch
    assert(emitted.map(_.size).sum === emitted.reduce(_ ++ _).size,
      "no pair may emit from two different batches")
    val scratch = Dedup.simhashNearDup(docs, maxHamming = 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(emitted.reduce(_ ++ _) === scratch,
      "incremental emissions must union to the one-shot result")
    // replay of the middle batch over the now-full store: the
    // strictly-earlier-tag view recomputes the identical emission and
    // the append no-ops on its marker
    val storeRows = spark.read.parquet(dir).count()
    val replayed = Dedup.simhashStoreAppend(slices(1), dir, "slice_1")
      .as[(Long, Long, Long)].collect().toSet
    assert(replayed === emitted(1), "replay must recompute the same emission")
    assert(spark.read.parquet(dir).count() === storeRows)
  }

  test("simhash store compaction preserves emissions, markers, and tag ordering") {
    val base = java.nio.file.Files.createTempDirectory("simhash_cmp").toString
    val a = s"$base/compacted"; val b = s"$base/plain"
    val docs = graft.core.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text"))
    val s0 = docs.filter(pmod(col("doc_id"), lit(3)) === 0)
    val s1 = docs.filter(pmod(col("doc_id"), lit(3)) === 1)
    val s2 = docs.filter(pmod(col("doc_id"), lit(3)) === 2)
    Seq(a, b).foreach { d =>
      Dedup.simhashStoreAppend(s0, d, "b000")
      Dedup.simhashStoreAppend(s1, d, "b001")
    }
    graft.ops.Stores.compact(spark, a)
    // replay on the compacted store: marker carried, emission identical
    val replayA = Dedup.simhashStoreAppend(s1, a, "b001")
      .as[(Long, Long, Long)].collect().toSet
    val replayB = Dedup.simhashStoreAppend(s1, b, "b001")
      .as[(Long, Long, Long)].collect().toSet
    assert(replayA === replayB, "compaction must not change a replayed emission")
    // a genuinely new batch: tag column survives the rewrite, so the
    // earlier-tag cross view still selects b000+b001
    val newA = Dedup.simhashStoreAppend(s2, a, "b002")
      .as[(Long, Long, Long)].collect().toSet
    val newB = Dedup.simhashStoreAppend(s2, b, "b002")
      .as[(Long, Long, Long)].collect().toSet
    assert(newA === newB, "post-compaction appends must emit identically")
    assert(spark.read.parquet(a).count() === spark.read.parquet(b).count())
  }

  test("store retraction: markers survive, replays cannot resurrect, emissions skip retracted ids") {
    val dir = java.nio.file.Files.createTempDirectory("simhash_ret").toString
    val docs = graft.core.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text"))
    val s0 = docs.filter(pmod(col("doc_id"), lit(3)) === 0)
    val s2 = docs.filter(pmod(col("doc_id"), lit(3)) === 2)
    Dedup.simhashStoreAppend(s0, dir, "b000")
    Dedup.simhashStoreAppend(
      docs.filter(pmod(col("doc_id"), lit(3)) === 1), dir, "b001")
    val victim = spark.read.parquet(dir)
      .filter(col("tag") === "b000").select("id").as[Long].head()
    val before = spark.read.parquet(dir).count()
    val kept = graft.ops.Stores.rewriteWhere(spark, dir, col("id") =!= victim)
    assert(kept === before - 1)
    // replay of the batch that CONTAINED the victim: marker no-op —
    // retraction must not be undone by at-least-once redelivery
    Dedup.simhashStoreAppend(s0, dir, "b000")
    assert(spark.read.parquet(dir).filter(col("id") === victim).count() === 0,
      "a replayed batch must not resurrect a retracted row")
    // a NEW batch's emission can no longer pair against the victim
    val em = Dedup.simhashStoreAppend(s2, dir, "b002")
      .as[(Long, Long, Long)].collect()
    assert(!em.exists(p => p._1 == victim || p._2 == victim),
      "emissions must not reference retracted ids")
  }

  test("simhashStoreAppend: empty batch emits nothing; retract-all leaves a readable empty store") {
    val dir = java.nio.file.Files.createTempDirectory("simhash_edge").toString
    val docs = graft.core.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).limit(20)
    Dedup.simhashStoreAppend(docs, dir, "b000")
    val empty = Dedup.simhashStoreAppend(docs.limit(0), dir, "b001")
    assert(empty.count() === 0, "empty batch must emit no pairs")
    val n = spark.read.parquet(dir).count()
    assert(n === 20, s"empty batch must append no signatures, store has $n")
    // retract everything: store stays readable, next append starts clean
    assert(graft.ops.Stores.rewriteWhere(spark, dir, lit(false)) === 0)
    val after = Dedup.simhashStoreAppend(
      docs.withColumn("doc_id", col("doc_id") + 1000L), dir, "b002")
    assert(after.count() >= 0 && spark.read.parquet(dir).count() === 20)
  }

  test("repetition signals: dup-ngram fraction, max repeat, dup-line fraction") {
    val docs = Seq(
      // "a b" appears 3× among 4 bigram positions: dup2 = 1 - 2/4
      (1L, "a b a b a"),
      // all bigrams distinct
      (2L, "a b c d e"),
      // shorter than n tokens → zeros
      (3L, "a"),
      (4L, "x\ny\nx\n\n  \nz")).toDF("id", "text")
    val out = docs
      .select(col("id"), Text.tokens(col("text")).as("toks"),
        col("text"))
      .select(col("id"),
        Text.dupNgramFraction(col("toks"), 2).as("dup2"),
        Text.maxNgramRepeat(col("toks"), 2).as("rep2"),
        Text.dupLineFraction(col("text")).as("dupLine"))
      .as[(Long, Double, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(out(1L) === ((0.5, 2L, 0.0)))
    assert(out(2L) === ((0.0, 1L, 0.0)))
    assert(out(3L) === ((0.0, 0L, 0.0)))
    // doc 4: non-blank lines x,y,x,z → 1 dup of 4 positions = 0.25; its
    // tokens after newline-normalization are x y x z → bigrams distinct
    assert(out(4L)._3 === 0.25)
  }

  test("crossNgramContaminated: exact shingle overlap flags only true hits") {
    // probe 11's distinct 3-grams are {q r s, r s q, s q r}; only
    // "q r s" exists in the corpus (doc 2) → exactly 1 hit, counted
    // once despite appearing twice in the probe doc. Probe 12 shares
    // nothing → absent from the output entirely.
    val corpus = Seq(
      (2L, "p q r s t"),
      (4L, "u v w x y")).toDF("doc_id", "text")
    val probe = Seq(
      (11L, "q r s q r s"),
      (12L, "m n o m n o")).toDF("doc_id", "text")
    val hits = Dedup.crossNgramContaminated(corpus, probe, n = 3)
      .as[(Long, Long)].collect().toMap
    assert(hits === Map(11L -> 1L))
  }

  test("multimodal: frame sampling plan + partition-parallel extraction") {
    val media = Multimodal.mediaFromDocuments(
      Seq((0L, "image payload"), (2L, "video payload here")).toDF("doc_id", "text")
        .withColumnRenamed("doc_id", "doc_id"))
    val feats = Multimodal.extractFeatures(media)
    val rows = feats.collect().map(f => f.media_id -> f).toMap
    assert(rows(0L).modality === "image" && rows(0L).n_frames === 1)
    assert(rows(2L).modality === "video" && rows(2L).n_frames >= 1)
    assert(rows(0L).feature.length === 8)
    assert(rows(0L).sha256.length === 64)
    val sampled = Multimodal.frameSamplePlan(feats.toDF(), stride = 4, maxFrames = 8)
      .filter(col("media_id") === 2L)
      .select(col("sampled_frames")).as[Seq[Long]].head()
    assert(sampled.forall(_ % 4 == 0), "stride sampling")
    assert(sampled.size <= 8, "frame cap")
  }

  test("multimodal features feed the similarity index end-to-end") {
    // binary → (stub) decode → feature vectors → ANN over those vectors:
    // the composite a multimodal dedup/retrieval pipeline runs. The stub
    // decoder is deterministic, so the whole chain reruns bit-identical.
    val docs = graft.core.Tables.documents(spark, sf0001)
      .filter(col("doc_id") < 40)
    val media = Multimodal.mediaFromDocuments(docs)
    val feats = Multimodal.extractFeatures(media).toDF()
      .select(col("media_id").as("vec_id"), col("feature").as("embedding"))
    val top = graft.ops.Ann.bruteTopK(feats, feats.filter(col("vec_id") < 5L), 3)
    val byQ = top.select("q_id", "n_id", "rank").as[(Long, Long, Long)]
      .collect().groupBy(_._1)
    assert(byQ.keySet.size === 5 && byQ.values.forall(_.length === 3),
      "every decoded query gets 3 neighbors from the decoded corpus")
    val rerun = graft.ops.Ann.bruteTopK(feats, feats.filter(col("vec_id") < 5L), 3)
      .select("q_id", "n_id", "rank").as[(Long, Long, Long)].collect().toSet
    assert(rerun === top.select("q_id", "n_id", "rank")
      .as[(Long, Long, Long)].collect().toSet, "deterministic end-to-end")
  }

  test("unigram model truncates by (count desc, term asc); scores are hand-exact") {
    val docs = Seq((1L, "a a b"), (2L, "a c")).toDF("doc_id", "text")
    // counts: a=3, b=1, c=1, N=5; V=2 -> {a: 0.6, b: 0.2} (b beats c on term asc)
    val (vocab, total) = TextStats.unigramModel(docs, vocabSize = 2)
    assert(total === 5L)
    assert(vocab === Seq("a" -> 0.6, "b" -> 0.2))
    val out = TextStats.unigramScores(docs, vocab)
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1)
    // doc 1: n=3, oov=0, sp=1.4 -> mean 0.466667; doc 2: n=2, oov=1 (c), sp=0.6
    assert(out(0) === ((1L, 3L, 0.0, 0.466667)))
    assert(out(1) === ((2L, 2L, 0.5, 0.3)))
  }

  test("source drift: hand-exact TV distance, disjoint vocabularies hit 1.0") {
    val docs = Seq(
      (1L, "a a b", "sA"), (2L, "a c c c", "sB"), (3L, "d", "sC"),
    ).toDF("doc_id", "text", "source")
    val out = TextStats.sourceDrift(docs)
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    // pA={a:2/3,b:1/3}, pB={a:1/4,c:3/4}: TV = ½(5/12+4/12+9/12) = 0.75
    assert(out(("sA", "sB")) === ((1L, 0.75)))
    assert(out(("sA", "sC")) === ((0L, 1.0)), "disjoint vocab = full drift")
    assert(out(("sB", "sC")) === ((0L, 1.0)))
  }

  test("source drift is invariant to how docs are split within a source") {
    val one = Seq((1L, "x y x z", "s1"), (2L, "x y", "s2")).toDF("doc_id", "text", "source")
    val split = Seq((1L, "x y", "s1"), (2L, "x z", "s1"), (3L, "x", "s2"),
      (4L, "y", "s2")).toDF("doc_id", "text", "source")
    val a = TextStats.sourceDrift(one).as[(String, String, Long, Double)].collect().toSet
    val b = TextStats.sourceDrift(split).as[(String, String, Long, Double)].collect().toSet
    assert(a === b, "distribution distance depends on counts, not doc boundaries")
  }

  test("unigram scoring is one map-only projection: no exchange in the plan") {
    val docs = Seq((1L, "a b"), (2L, "b c")).toDF("doc_id", "text")
    val (vocab, _) = TextStats.unigramModel(docs, vocabSize = 10)
    val plan = TextStats.unigramScores(docs, vocab)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"scoring must not shuffle:\n$plan")
  }

  test("duplicatedSpans: shared 5-token span counted, unique docs at zero, short docs dropped") {
    val boiler = "all rights reserved by the publisher"
    val docs = Seq(
      (1L, s"intro one two three $boiler"),          // shares the span
      (2L, s"other words entirely here $boiler"),    // shares the span
      (3L, "completely unrelated text with many different tokens inside"),
      (4L, "too short")).toDF("doc_id", "text")      // < 5 tokens: no row
    val out = TextStats.duplicatedSpans(docs, spanLen = 5)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(out.keySet === Set(1L, 2L, 3L), "sub-span docs produce no row")
    // "all rights reserved by the" and "rights reserved by the publisher"
    // are the two spans both docs share
    assert(out(1L)._2 === 2L, s"doc 1 shares 2 spans: ${out(1L)}")
    assert(out(2L)._2 === 2L, s"doc 2 shares 2 spans: ${out(2L)}")
    assert(out(3L)._2 === 0L, "unique doc has no duplicated span")
  }

  test("duplicatedSpans hotSpanGuard ≡ window path, including a universal span") {
    // every doc shares the same template span (the straggler shape) plus
    // unique filler — the guard's groupBy+join count must agree with the
    // window count row-for-row
    val docs = (1L to 10L).map(i =>
      (i, s"tpl one two three four u${i}a u${i}b u${i}c")).toDF("doc_id", "text")
    def run(guard: Boolean) =
      TextStats.duplicatedSpans(docs, spanLen = 5, hotSpanGuard = guard)
        .as[(Long, Long, Long, Double)].collect().toSet
    val window = run(false)
    val guarded = run(true); spark.catalog.clearCache()
    assert(guarded === window)
    assert(window.forall(_._3 >= 1L), "universal template spans counted in every doc")
  }

  test("duplicatedSpans: span repeated WITHIN one doc only is not cross-doc duplication") {
    val docs = Seq(
      (1L, "p q r s t filler p q r s t"), // same span twice, one doc
      (2L, "a b c d e f g h")).toDF("doc_id", "text")
    val out = TextStats.duplicatedSpans(docs, spanLen = 5)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(out(1L) === 0L, "intra-doc repetition is q_repetition's domain")
  }

  test("bigram quality: fluent text outscores the same tokens scrambled") {
    val fluent = "the cat sat on the mat and the dog sat on the rug"
    val scrambled = "mat the on dog sat the and rug cat the on sat the"
    val corpus = (1L to 20L).map(i => (i, fluent)) :+ (99L, scrambled)
    val docs = corpus.toDF("doc_id", "text")
    val model = TextStats.bigramModel(docs, vocabSize = 50)
    val out = TextStats.bigramScores(docs, model)
      .as[(Long, Long, Double, Double)].collect()
      .map(r => r._1 -> (r._3, r._4)).toMap
    assert(out(1L)._2 > out(99L)._2,
      s"fluent mean_cond_prob ${out(1L)} must beat scrambled ${out(99L)}")
    assert(out(1L)._1 === 1.0, "every fluent bigram is in the model")
  }

  test("bigram scoring is one map-only projection: no exchange in the plan") {
    val docs = Seq((1L, "a b c"), (2L, "b c d")).toDF("doc_id", "text")
    val model = TextStats.bigramModel(docs, vocabSize = 10)
    val plan = TextStats.bigramScores(docs, model)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"scoring must not shuffle:\n$plan")
  }
  test("cooccurrenceTokens over a pre-tokenized corpus equals the text path") {
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog",
      "the quick dog naps while the brown fox runs",
      "lazy afternoons suit the lazy dog best").toDF("text")
    val fromText = TextStats.cooccurrence(docs, window = 2,
        minCount = 2, minPair = 2)
      .collect().map(_.toString).sorted.toSeq
    val tokenized = docs.select(Text.tokens(col("text")).as("toks"))
    val fromTokens = TextStats.cooccurrenceTokens(tokenized, window = 2,
        minCount = 2, minPair = 2, tokensCol = "toks")
      .collect().map(_.toString).sorted.toSeq
    assert(fromText.nonEmpty && fromTokens === fromText,
      "the tokens overload must be value-identical to the text path")
  }

  test("Redact.scrub: emails, phones, IPv4s replaced and counted; near-misses untouched") {
    val rows = Seq(
      (1L, "mail a.b+c@sub.example.org and x@y.io then call +1-555-0042"),
      (2L, "host 10.0.200.7 peer 192.168.1.1 but version 1.2.3.4000 stays"),
      (3L, "no pii here, just words"),
      (4L, "not-an-email @missing.local nor +1-55-0042 short"))
      .toDF("doc_id", "text")
    val out = graft.ops.Redact.scrub(rows).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))).toMap
    assert(out(1L) === ((2L, 1L, 0L,
      "mail [EMAIL] and [EMAIL] then call [PHONE]")))
    // 1.2.3.4000: the final quad is 4 digits — \b{1,3}\b cannot match
    assert(out(2L) === ((0L, 0L, 2L,
      "host [IP] peer [IP] but version 1.2.3.4000 stays")))
    assert(out(3L) === ((0L, 0L, 0L, "no pii here, just words")))
    assert(out(4L)._1 === 0L, "a bare @domain is not an email")
    assert(out(4L)._2 === 0L, "+1-55-0042 has a short exchange group")
  }

  test("distinctiveTerms: a group-exclusive term tops its group's card") {
    // "kappa" only in source A, "lambda" only in B; shared filler elsewhere
    val docs = Seq(
      (1L, "the kappa process runs the kappa stage kappa kappa kappa " * 3, "A"),
      (2L, "the kappa pipeline and the kappa merge kappa kappa kappa " * 3, "A"),
      (3L, "the lambda report and the lambda sheet lambda lambda lambda " * 3, "B"),
      (4L, "the lambda ledger for the lambda audit lambda lambda lambda " * 3, "B"))
      .toDF("doc_id", "text", "source")
    val card = graft.ops.TextStats.distinctiveTerms(docs, "source",
      minCount = 3, topK = 3)
    val top = card.filter(col("rank") === 1).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[String]("term")).toMap
    assert(top("A") === "kappa")
    assert(top("B") === "lambda")
    // "the" appears evenly -> odds near 1, never rank 1
    val theRows = card.filter(col("term") === "the").collect()
    assert(theRows.forall(_.getAs[Long]("rank") > 1L))
    // short/non-alpha tokens never enter the card
    assert(card.filter(length(col("term")) < 3).count() === 0)
  }

  test("rakeKeywords: phrase runs split at stopword/non-alpha boundaries; ratio-of-sums scores") {
    // doc1 phrases: [quick brown fox], [lazy dog] (split at 'the'/'and')
    // doc2 phrase:  [quick dog]
    // doc3: 4-word run exceeds maxPhraseLen -> dropped entirely
    // doc4: 'jumps!' is a non-alpha boundary -> phrase [over]
    val docs = Seq(
      (1L, "the quick brown fox and lazy dog"),
      (2L, "quick dog"),
      (3L, "one two three four"),
      (4L, "jumps! over")).toDF("doc_id", "text")
    val got = graft.ops.TextStats.rakeKeywords(docs,
        graft.functions.Text.EN_STOPWORDS, maxPhraseLen = 3, topK = 10)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2))))
    // word stats: quick f2 d5, brown f1 d3, fox f1 d3, lazy f1 d2,
    // dog f2 d4, over f1 d1
    val expect = Seq(
      "quick brown fox" -> ((1L, 2.75)), // (5+3+3)/(2+1+1)
      "quick dog" -> ((1L, 2.25)),       // (5+4)/(2+2)
      "lazy dog" -> ((1L, 2.0)),         // (2+4)/(1+2)
      "over" -> ((1L, 1.0)))
    assert(got.toSeq === expect, s"got ${got.toSeq}")
    spark.catalog.clearCache()
  }

  test("readability: hand-exact ARI from integer counts; fragment clamps to one sentence") {
    // source X: "one two three. four five!" -> words 5, chars 21
    // (norm length 25 - 5 + 1), sentences 2
    // source Y: "no punctuation here" -> words 3, chars 17, sentences
    // clamped to 1
    val docs = Seq(
      ("X", "one two three. four five!"),
      ("Y", "no punctuation here")).toDF("source", "text")
    val r = graft.ops.TextStats.readability(docs, "source")
      .collect().map(x => x.getAs[String]("source") ->
        ((x.getAs[Long]("chars"), x.getAs[Long]("words"),
          x.getAs[Long]("sentences"), x.getAs[Double]("ari")))).toMap
    val (cx, wx, sx, ax) = r("X")
    assert((cx, wx, sx) === ((21L, 5L, 2L)), s"got ${r("X")}")
    assert(ax === -0.398, s"4.71*21/5 + 0.5*5/2 - 21.43 rounded, got $ax")
    val (cy, wy, sy, _) = r("Y")
    assert((cy, wy, sy) === ((17L, 3L, 1L)), "fragment counts as one sentence")
  }

  test("centralChunks: highest-total-overlap chunk wins; edge-free docs are absent") {
    // doc 1, chunkLen 3: c0={a,b,c} c1={d,b,c} c2={a,b,x}
    // overlaps: c0~c1=2, c0~c2=2, c1~c2=1 -> c0 strength 4 beats 3,3
    // doc 2: fully distinct tokens -> zero-overlap chunks, no edges
    val docs = Seq(
      (1L, "a b c d b c a b x"),
      (2L, "p q r s t u")).toDF("doc_id", "text")
    val r = graft.ops.TextStats.centralChunks(docs, "doc_id", "text",
        chunkLen = 3, minShared = 1L, iters = 3)
      .collect().map(x => x.getAs[Long]("doc_id") ->
        ((x.getAs[Long]("chunk"), x.getAs[Long]("n_chunks")))).toMap
    assert(r(1L) === ((0L, 3L)),
      "chunk 0 carries the largest shared-vocabulary mass")
    assert(!r.contains(2L), "no overlap -> no salience signal, not a 0-rank row")
  }

  test("centralChunks: symmetric two-chunk doc ties break to the smaller index") {
    val docs = Seq((5L, "a b c a b d")).toDF("doc_id", "text")
    // c0={a,b,c} c1={a,b,d}: weights symmetric -> identical ranks
    val r = graft.ops.TextStats.centralChunks(docs, "doc_id", "text",
      chunkLen = 3, minShared = 1L, iters = 2).collect()
    assert(r.length === 1 && r.head.getAs[Long]("chunk") === 0L)
    assert(r.head.getAs[Long]("n_chunks") === 2L)
  }
}
