package graft

import org.apache.spark.sql.functions._
import graft.functions.Text
import graft.ops.{Pack, Sampling, TextStats}

/** Sampling / packing / term-stats / redaction — the corpus-composition
  * ops added beyond the oracle surface's own checks: determinism,
  * hand-computed fixtures, and the algebraic contracts (subset/superset,
  * permutation, expected multiplicity). */
class CorpusOpsSpec extends SparkTestBase {
  import spark.implicits._

  private def docs = Tables10
  private lazy val Tables10 =
    graft.core.Tables.documents(spark, sf0001).select("doc_id", "lang", "text")

  test("bernoulli sampling is deterministic, seed-sensitive, and roughly proportional") {
    val a1 = Sampling.bernoulli(docs, 0.25, "doc_id", seed = 7)
      .select("doc_id").as[Long].collect().sorted
    val a2 = Sampling.bernoulli(docs, 0.25, "doc_id", seed = 7)
      .select("doc_id").as[Long].collect().sorted
    assert(a1 sameElements a2, "same seed reproduces the exact sample")
    val b = Sampling.bernoulli(docs, 0.25, "doc_id", seed = 8)
      .select("doc_id").as[Long].collect().sorted
    assert(!(a1 sameElements b), "different seed gives a different sample")
    val n = docs.count().toDouble
    assert(math.abs(a1.length / n - 0.25) < 0.08, s"got ${a1.length / n}")
    // growing the fraction only ADDS rows (nested samples share a seed)
    val wider = Sampling.bernoulli(docs, 0.5, "doc_id", seed = 7)
      .select("doc_id").as[Long].collect().toSet
    assert(a1.forall(wider.contains), "f=0.25 sample is a subset of f=0.5")
  }

  test("stratifiedK takes exactly k per stratum, reproducibly (hash-order reservoir)") {
    val out = Sampling.stratifiedK(docs, Seq("lang"), 5, "doc_id", seed = 7)
    val counts = out.groupBy("lang").count().as[(String, Long)].collect().toMap
    val langs = docs.select("lang").distinct().as[String].collect()
    assert(langs.forall(l => counts(l) == 5L))
    // agrees with the reference window formulation written out longhand
    val onePhase = docs
      .withColumn("_h", Sampling.hashUnit(col("doc_id"), 7))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))
          .orderBy(col("_h"), col("doc_id"))))
      .filter(col("rn") <= 5).select("doc_id").as[Long].collect().sorted
    val twoPhase = out.select("doc_id").as[Long].collect().sorted
    assert(twoPhase sameElements onePhase)
  }

  test("weightedMix: whole-number weights duplicate exactly, fractions subsample, absent groups drop") {
    val in = Seq((1L, "a"), (2L, "a"), (3L, "b"), (4L, "c")).toDF("id", "g")
    val out = Sampling.weightedMix(in, "g", Map("a" -> 2.0, "b" -> 0.0), "id")
      .select("id", "copy").as[(Long, Long)].collect().sorted
    assert(out.toSeq === Seq((1L, 0L), (1L, 1L), (2L, 0L), (2L, 1L)),
      "a duplicated twice with copy indices; b weight 0 and absent c dropped")
    // fractional weight ~ expected multiplicity on the corpus
    val frac = Sampling.weightedMix(docs, "lang", Map("en" -> 0.5), "doc_id")
    val nEn = docs.filter(col("lang") === "en").count().toDouble
    assert(math.abs(frac.count() / nEn - 0.5) < 0.15)
  }

  test("temperatureMix: alpha=1 at full fraction is the identity; alpha=0.5 flattens toward rare groups") {
    // alpha=1: every group's rate is exactly totalFraction (n^1/N cancels)
    val id = Sampling.temperatureMix(docs, "lang", alpha = 1.0,
      totalFraction = 1.0, keyCol = "doc_id")
    assert(id.count() === docs.count(), "alpha=1, F=1 keeps every row once")
    assert(id.filter(col("copy") =!= 0L).count() === 0L)
    // alpha=0.5: heavy groups sampled below natural share, light above
    val shares = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val mixed = Sampling.temperatureMix(docs, "lang", alpha = 0.5,
      totalFraction = 0.5, keyCol = "doc_id")
    val mixedShares = mixed.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val (heavy, light) = (shares.maxBy(_._2)._1, shares.minBy(_._2)._1)
    val before = shares(heavy).toDouble / shares(light)
    val after = mixedShares(heavy).toDouble / mixedShares(light)
    assert(after < before,
      s"sqrt re-weighting must compress the heavy/light ratio ($before -> $after)")
    // deterministic: rerun reproduces the exact multiset
    val again = Sampling.temperatureMix(docs, "lang", alpha = 0.5,
      totalFraction = 0.5, keyCol = "doc_id")
      .select("doc_id", "copy").as[(Long, Long)].collect().sorted
    assert(again.toSeq === mixed.select("doc_id", "copy")
      .as[(Long, Long)].collect().sorted.toSeq)
  }

  test("shuffledExport emits a deterministic permutation in hash order") {
    val out = Sampling.shuffledExport(docs.select("doc_id"), "doc_id", seed = 7)
      .select("doc_id", "pos").as[(Long, Long)].collect()
    val n = docs.count()
    assert(out.map(_._2).sorted.toSeq === (0L until n).toSeq,
      "pos is exactly 0..n-1")
    val again = Sampling.shuffledExport(docs.select("doc_id"), "doc_id", seed = 7)
      .select("doc_id", "pos").as[(Long, Long)].collect()
    assert(out.sortBy(_._1) sameElements again.sortBy(_._1), "reruns agree")
    // pos order IS hash order
    val byPos = out.sortBy(_._2).map(_._1)
    val byHash = docs.select(col("doc_id"),
        Sampling.hashUnit(col("doc_id"), 7).as("h"))
      .orderBy(col("h"), col("doc_id")).select("doc_id").as[Long].collect()
    assert(byPos sameElements byHash)
  }

  test("contiguous packing: hand-computed bins, offsets, and bin stats") {
    val in = Seq(
      ("s", 1L, 300L), ("s", 2L, 300L), ("s", 3L, 100L), ("s", 4L, 600L),
      ("t", 9L, 10L))
      .toDF("shard", "id", "n_tokens")
    val packed = Pack.contiguous(in, budget = 512L, shardCol = "shard",
      orderCol = "id", tokensCol = "n_tokens")
    val rows = packed.select("shard", "id", "bin", "offset_in_bin")
      .as[(String, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    // cum-before: 0, 300, 600, 700 → bins 0,0,1,1; offsets 0,300,88,188
    assert(rows.toSeq === Seq(
      ("s", 1L, 0L, 0L), ("s", 2L, 0L, 300L),
      ("s", 3L, 1L, 88L), ("s", 4L, 1L, 188L),
      ("t", 9L, 0L, 0L)))
    val stats = Pack.binStats(packed, "shard")
      .as[(String, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    assert(stats.toSeq === Seq(
      ("s", 0L, 2L, 600L), ("s", 1L, 2L, 700L), ("t", 0L, 1L, 10L)))
  }

  test("chunk: overlapping windows, clipped tail, reconstruction property") {
    val in = Seq((1L, (1 to 10).map(i => s"w$i").mkString(" ")), (2L, "a b"))
      .toDF("doc_id", "text")
    // maxTokens=4, overlap=1 → step=3 → starts 0,3,6,9
    val out = graft.ops.Pack.chunk(in, maxTokens = 4, overlap = 1)
      .as[(Long, Long, Long, String)].collect().sortBy(r => (r._1, r._2))
    val doc1 = out.filter(_._1 == 1L)
    assert(doc1.map(_._4).toSeq === Seq(
      "w1 w2 w3 w4", "w4 w5 w6 w7", "w7 w8 w9 w10", "w10"))
    assert(doc1.map(_._3).toSeq === Seq(4L, 4L, 4L, 1L), "tail clips")
    assert(out.filter(_._1 == 2L).map(_._4).toSeq === Seq("a b"),
      "short doc is one chunk")
    // every token position is covered; consecutive chunks overlap by 1
    doc1.sliding(2).foreach { case Array(a, b) =>
      assert(a._4.split(" ").last === b._4.split(" ").head, "overlap stitches")
    case _ => ()
    }
  }

  test("weightedK: without-replacement, weight-proportional, layout-stable") {
    val rows = (0L until 400L).map(i =>
      (i, if (i < 200) 1.0 else 50.0)) // two weight classes
    val df = rows.toDF("id", "wt")
    val s1 = Sampling.weightedK(df, 80, "id", "wt", seed = 3)
      .select("id").as[Long].collect().toSeq
    assert(s1.distinct.size === 80, "without replacement: 80 distinct rows")
    val heavy = s1.count(_ >= 200L)
    assert(heavy > 60, s"50x-weighted rows must dominate the sample, got $heavy/80")
    val s2 = Sampling.weightedK(df.repartition(7), 80, "id", "wt", seed = 3)
      .select("id").as[Long].collect().toSeq
    assert(s1.toSet === s2.toSet, "deterministic under re-layout")
    // zero/null weight ⇒ NEVER sampled (without the explicit filter a
    // NULL priority would sort NULLS FIRST and always win a slot)
    val withDead = df.union(Seq((900L, 0.0)).toDF("id", "wt"))
      .union(Seq((901L, Option.empty[Double])).toDF("id", "wt"))
    val s3 = Sampling.weightedK(withDead, 80, "id", "wt", seed = 3)
      .select("id").as[Long].collect().toSet
    assert(!s3.contains(900L) && !s3.contains(901L),
      "zero- and null-weight rows must be excluded")
  }

  test("tfidfTopK: hand-computed ranking on a tiny corpus") {
    val in = Seq(
      (1L, "apple apple banana"),   // apple tf=2 df=2, banana tf=1 df=1
      (2L, "apple cherry"),
      (3L, "dates dates dates")).toDF("doc_id", "text")
    val out = TextStats.tfidfTopK(in, 2)
      .select("id", "term", "tfidf", "rank")
      .as[(Long, String, Double, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._4).map(r => (r._2, r._3)).toSeq).toMap
    // N=3. doc1: apple 2*3/2=3.0, banana 1*3/1=3.0 → tie → term asc
    assert(out(1L) === Seq(("apple", 3.0), ("banana", 3.0)))
    // doc2: cherry 1*3/1=3.0 beats apple 1*3/2=1.5
    assert(out(2L) === Seq(("cherry", 3.0), ("apple", 1.5)))
    // doc3: dates 3*3/1=9.0, only term
    assert(out(3L) === Seq(("dates", 9.0)))
  }

  test("bm25TopK: hand-computed scores, df cap drops stop terms, self excluded") {
    val in = Seq(
      (1L, "apple banana"),
      (2L, "apple banana cherry"),
      (3L, "apple dates"),
      (4L, "apple")).toDF("doc_id", "text")
    // N=4; df: apple 4, banana 2, cherry 1, dates 1; dl: 2,3,2,1;
    // avgdl = 8/4 = 2. Cap at maxDf=3 drops "apple" (the stop term) —
    // doc 4 then shares nothing and can never be a candidate.
    val k1 = 1.2; val b = 0.75
    val idf = TextStats.bm25IdfRows(4L, 3L).toMap
    def contrib(df: Long, tf: Long, dl: Long): Double =
      idf(df) * (tf * (k1 + 1.0)) / (tf + k1 * ((1.0 - b) + b * dl / 2.0))
    val out = TextStats.bm25TopK(in,
        in.filter(col("doc_id") === 1L).select(col("doc_id")),
        k = 3, maxDf = 3)
      .select("q_id", "doc_id", "bm25", "rank")
      .as[(Long, Long, Double, Long)].collect().sortBy(_._4).toSeq
    // only doc 2 shares an uncapped term (banana) with doc 1
    assert(out.map(r => (r._1, r._2, r._4)) === Seq((1L, 2L, 1L)), s"got $out")
    val expect = math.rint(contrib(df = 2, tf = 1, dl = 3) * 1e6) / 1e6
    assert(out.head._3 === expect, s"score ${out.head._3} != $expect")

    // with the cap open, apple joins the sum and docs 3 and 4 appear
    val all = TextStats.bm25TopK(in,
        in.filter(col("doc_id") === 1L).select(col("doc_id")),
        k = 3, maxDf = 4)
      .select("doc_id").as[Long].collect().toSet
    assert(all === Set(2L, 3L, 4L), "uncapped: every apple-sharer scored")
  }

  test("splits: total partition, stable under boundary growth, proportional") {
    val out = Sampling.splits(docs,
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), "doc_id", seed = 7)
    val n = docs.count()
    val byLabel = out.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(byLabel.values.sum === n, "every row gets exactly one split")
    assert(math.abs(byLabel("train").toDouble / n - 0.8) < 0.08)
    // growing train at val's expense must never move rows between val
    // and test, nor eject anything from train
    val before = out.filter(col("split") === "train")
      .select("doc_id").as[Long].collect().toSet
    val grown = Sampling.splits(docs,
      Seq("train" -> 0.85, "val" -> 0.05, "test" -> 0.1), "doc_id", seed = 7)
    val trainAfter = grown.filter(col("split") === "train")
      .select("doc_id").as[Long].collect().toSet
    assert(before.subsetOf(trainAfter), "train only grows")
    val testBefore = out.filter(col("split") === "test")
      .select("doc_id").as[Long].collect().toSet
    val testAfter = grown.filter(col("split") === "test")
      .select("doc_id").as[Long].collect().toSet
    assert(testBefore === testAfter, "test untouched by the train/val shift")
  }

  test("lengthBuckets: equal-population bands ordered by length") {
    val in = Seq(("s", 1L, 10L), ("s", 2L, 20L), ("s", 3L, 30L), ("s", 4L, 40L),
      ("s", 5L, 50L), ("s", 6L, 60L), ("s", 7L, 70L), ("s", 8L, 80L))
      .toDF("shard", "id", "n_tokens")
    val out = Pack.lengthBuckets(in, 4, "shard", "n_tokens", "id")
      .select("id", "bucket").as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 2L,
      5L -> 3L, 6L -> 3L, 7L -> 4L, 8L -> 4L))
  }

  test("duplicateClusters: components, chain propagation, min-id representative") {
    // component {1,2,3,4} as a chain (diameter 3 — exercises multi-round
    // propagation), component {10,11} as a single pair
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("id_a", "id_b")
    val expect = Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L)
    // local union-find path (default threshold)
    val local = graft.ops.Dedup.duplicateClusters(pairs)
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(local.toSeq === expect)
    // distributed star-contraction path (threshold 0) must agree exactly
    val dist = graft.ops.Dedup.duplicateClusters(pairs, localEdgeThreshold = 0)
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(dist.toSeq === expect)
    spark.catalog.clearCache() // distributed path's frame is persisted; caller releases
    // an un-converged run still fails loudly instead of returning a
    // half-contracted labeling
    val chain = (1L to 64L).sliding(2).map(s => (s.head, s.last)).toSeq
      .toDF("id_a", "id_b")
    intercept[IllegalStateException] {
      graft.ops.Dedup.duplicateClusters(chain, maxIters = 1, localEdgeThreshold = 0)
    }
    spark.catalog.clearCache()
  }

  test("duplicateClusters: star contraction solves a 200-chain within the log-round budget") {
    // the adversarial case for hash-min propagation: a 200-node chain
    // needs 199 min-label rounds; large/small-star contracts paths by
    // halving, so the default 25-round budget is plenty (~log n passes)
    val chain = (1L to 200L).sliding(2).map(s => (s.head, s.last)).toSeq
      .toDF("id_a", "id_b")
    val out = graft.ops.Dedup.duplicateClusters(chain, localEdgeThreshold = 0)
      .as[(Long, Long)].collect()
    spark.catalog.clearCache()
    assert(out.length === 200)
    assert(out.forall(_._2 === 1L), "one component, min-id representative")
  }

  test("property: distributed star contraction ≡ union-find on random graphs") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val edgeGen = for {
      n <- Gen.choose(5, 30)
      m <- Gen.choose(1, 40)
      es <- Gen.listOfN(m, for {
        a <- Gen.choose(1L, n.toLong); b <- Gen.choose(1L, n.toLong)
      } yield (a, b))
    } yield es.filter(e => e._1 != e._2)
    (0 until 3).foreach { i =>
      val es = edgeGen(Gen.Parameters.default, Seed(77L + i)).get
      if (es.nonEmpty) {
        val pairs = es.toDF("id_a", "id_b")
        val viaUf = graft.ops.Dedup.duplicateClusters(pairs)
          .as[(Long, Long)].collect().sortBy(_._1).toSeq
        val viaStars = graft.ops.Dedup.duplicateClusters(pairs,
          localEdgeThreshold = 0).as[(Long, Long)].collect().sortBy(_._1).toSeq
        spark.catalog.clearCache()
        assert(viaStars === viaUf, s"case $i diverged on edges: $es")
      }
    }
  }

  test("crossMinhashLsh: finds cross-corpus near-dups only, never intra-corpus pairs") {
    import graft.ops.Dedup
    val corpus = Seq(
      (10L, "the quick brown fox jumps over the lazy dog again and again"),
      (12L, "completely different training text about spark physical plans"),
      (14L, "another unrelated training document mentioning catalyst rules"))
      .toDF("doc_id", "text")
    val probe = Seq(
      (21L, "the quick brown fox jumps over the lazy dog again and again today"),
      (23L, "an eval prompt with no overlap whatsoever in its token stream"),
      // near-dup of ANOTHER probe doc — must NOT be reported (cross only)
      (25L, "an eval prompt with no overlap whatsoever in its token streams"))
      .toDF("doc_id", "text")
    val hits = Dedup.crossMinhashLsh(corpus, probe, tau = 0.5)
      .select("corpus_id", "probe_id").as[(Long, Long)].collect().toSet
    assert(hits === Set((10L, 21L)),
      "only the contaminated eval doc pairs with its training source")
    // decontaminated eval set = probe ids minus the hit probe ids
    assert(!hits.exists { case (c, p) => c % 2 == 1 || p % 2 == 0 })
  }

  test("contaminationReport: graded overlap fraction, clean probes at 0.0, strict rule is its >0 cut") {
    val corpus = Seq(
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (4L, "one two three four five six")).toDF("doc_id", "text")
    val probe = Seq(
      (1L, "alpha beta gamma delta epsilon nine ten eleven"), // partial overlap
      (3L, "totally different words with no shared grams at all"),
      (5L, "alpha beta gamma delta epsilon zeta eta theta")) // full overlap
      .toDF("doc_id", "text")
    val out = graft.ops.Dedup.contaminationReport(corpus, probe, n = 5)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    // probe 1 has 4 distinct 5-grams, of which 1 ("alpha..epsilon") is in
    // the corpus; probe 5 has 4, all 4 in the corpus; probe 3 none
    assert(out(1L) === ((4L, 1L, 0.25)), s"partial: ${out(1L)}")
    assert(out(3L) === ((5L, 0L, 0.0)), s"clean probe must appear at 0.0: ${out(3L)}")
    assert(out(5L) === ((4L, 4L, 1.0)), s"full overlap: ${out(5L)}")
    // consistency with the strict rule: contaminated = hit_frac > 0
    val strict = graft.ops.Dedup.crossNgramContaminated(corpus, probe, n = 5)
      .select("probe_id").as[Long].collect().toSet
    assert(strict === out.filter(_._2._3 > 0).keySet)
  }

  test("embeddingNearDup: LSH-banded default ≡ exact all-pairs on the fixture") {
    val emb = graft.core.Tables.embeddings(spark, sf0001)
    val exact = graft.ops.Dedup.embeddingNearDupExact(emb, tau = 0.35)
      .select("id_a", "id_b", "cos").as[(Long, Long, Double)].collect().toSet
    assert(exact.nonEmpty, "fixture must contain qualifying pairs")
    val lsh = graft.ops.Dedup.embeddingNearDup(emb, tau = 0.35)
      .select("id_a", "id_b", "cos").as[(Long, Long, Double)].collect().toSet
    // LSH candidates ⊆ block pairs and the refine is the same exact
    // cosine, so only recall can differ — the band parameters must
    // recover every qualifying pair on the fixture
    assert(lsh === exact,
      s"missed ${(exact -- lsh).size} pairs, spurious ${(lsh -- exact).size}")
  }

  test("embeddingNearDupAdaptive: mixed small/large routing ≡ exact all-pairs") {
    val emb = graft.core.Tables.embeddings(spark, sf0001)
    val exact = graft.ops.Dedup.embeddingNearDupExact(emb, tau = 0.35)
      .select("id_a", "id_b", "cos").as[(Long, Long, Double)].collect().toSet
    // fixture blocks are 42-63 wide: smallBlock = 50 forces SOME blocks
    // down each route, so the union/routing seams are actually exercised
    val sizes = emb.groupBy("label").count()
      .select("count").as[Long].collect()
    assert(sizes.exists(_ <= 50) && sizes.exists(_ > 50),
      "fixture must straddle the routing threshold for this test to bite")
    val adaptive = graft.ops.Dedup.embeddingNearDupAdaptive(
        emb, tau = 0.35, smallBlock = 50L)
      .select("id_a", "id_b", "cos").as[(Long, Long, Double)].collect().toSet
    assert(adaptive === exact,
      s"missed ${(exact -- adaptive).size}, spurious ${(adaptive -- exact).size}")
  }

  test("embeddingNearDupAdaptive auto-width: hot block widens its bands, results still ≡ exact") {
    // One 600-row hot block with targetBucket=4 forces the per-block
    // band width to ceil(log2(600/4)) = 8 bits (vs the default 3) —
    // the width column must ride the banded exchange and the bucket
    // mask must stay consistent within the block, or pairs get lost.
    // Planted duplicates are PARALLEL vectors (every plane agrees at
    // any width), so equivalence with exact is width-proof: a miss
    // here means broken plumbing, not an LSH recall tradeoff.
    val rows = (0 until 600).map { i =>
      val base = Array.tabulate(8) { j =>
        // deterministic pseudo-random direction per group of 3
        val h = ((i / 3) * 31 + j * 17) % 13
        (h - 6).toDouble / 6.0
      }
      val scale = 1.0 + (i % 3) * 0.5 // 3 parallel copies per direction
      (i.toLong, base.map(x => (x * scale).toFloat).toSeq, 0)
    }
    val emb = rows.toDF("vec_id", "embedding", "label")
    val exact = graft.ops.Dedup.embeddingNearDupExact(emb, tau = 0.999)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact.size >= 600, "each 3-copy group contributes 3 parallel pairs")
    val auto = graft.ops.Dedup.embeddingNearDupAdaptive(
        emb, tau = 0.999, dim = 8, smallBlock = 100L, targetBucket = 4L)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(auto === exact,
      s"missed ${(exact -- auto).size}, spurious ${(auto -- exact).size}")
  }

  test("capPerGroup: top-k by score per group, deterministic ties, map-side WindowGroupLimit") {
    val docs = Seq(
      (1L, "a", 0.9), (2L, "a", 0.8), (3L, "a", 0.8), (4L, "a", 0.1),
      (5L, "b", 0.5)).toDF("doc_id", "source", "q")
    val capped = graft.ops.Sampling.capPerGroup(
      docs, groupCol = "source", scoreCol = "q", k = 2, keyCol = "doc_id")
    val ids = capped.select("doc_id").as[Long].collect().toSet
    // tie at 0.8 breaks to the lower doc_id; small group passes whole
    assert(ids === Set(1L, 2L, 5L), s"got $ids")
    // the rank filter must plan as the two-phase WindowGroupLimit so map
    // tasks prune to local top-k before the per-group exchange
    val plan = capped.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"expected WindowGroupLimit:\n$plan")
  }

  test("per-block width mask coarsens buckets: w=1 yields far more candidates than w=16") {
    // the auto-width contract in candidate-count form: a narrower mask
    // must merge buckets (more candidates), a wider one split them —
    // if the mask silently stopped applying, recall at loose taus would
    // degrade with no failing assertion anywhere else (the equivalence
    // tests' planted duplicates are parallel vectors, which collide at
    // ANY width)
    val rows = (0 until 60).map { i =>
      (i.toLong, (0 until 8).map(j => (((i * 31 + j * 17) % 13) - 6).toFloat), 0)
    }
    def pairs(w: Int): Long = {
      val emb = rows.toDF("vec_id", "embedding", "label")
        .withColumn("_ppb", lit(w))
      graft.ops.Dedup.embeddingNearDup(emb, tau = -1.0, blockCol = "label",
        dim = 8, bands = 4, planesPerBand = 16, widthCol = Some("_ppb")).count()
    }
    val wide = pairs(16)
    val narrow = pairs(1)
    assert(narrow > wide * 5,
      s"mask must coarsen buckets: w=1 gave $narrow vs w=16 $wide")
  }

  test("ngramJaccard df cap: prunes stop-gram candidates, keeps rare-gram near-dups") {
    import graft.ops.Dedup
    // 20 docs whose ONLY overlap is a shared stop sentence (df = 20 on
    // its grams), plus one true near-dup pair overlapping on rare grams
    val stop = "lorem ipsum dolor sit amet"
    val rows = (1L to 20L).map(i => (i, s"unique$i word$i thing$i $stop")) ++
      Seq((100L, "alpha beta gamma delta epsilon zeta"),
        (101L, "alpha beta gamma delta epsilon eta"))
    val docsIn = rows.toDF("doc_id", "text").withColumn("lang", lit("en"))
    val uncappedCand = Dedup.ngramCandidates(docsIn, tau = 0.5, blockCol = "lang")
      .count()
    val cappedCand = Dedup.ngramCandidates(docsIn, tau = 0.5, blockCol = "lang",
      maxDf = 5).count()
    // C(20,2) stop-gram pairs + the true pair vs just the true pair
    assert(uncappedCand === 191L, s"got $uncappedCand")
    assert(cappedCand === 1L, s"got $cappedCand")
    // capped result ≡ uncapped result here (the stop-gram pairs are all
    // below tau), with identical exact jaccard values
    val uncapped = Dedup.ngramJaccard(docsIn, tau = 0.5, blockCol = "lang")
      .as[(Long, Long, Double)].collect().toSet
    val capped = Dedup.ngramJaccard(docsIn, tau = 0.5, blockCol = "lang",
      maxDf = 5).as[(Long, Long, Double)].collect().toSet
    assert(uncapped === Set((100L, 101L, 0.6)))
    assert(capped === uncapped)
    spark.catalog.clearCache() // capped path persists its signature table
  }

  test("streaming exact dedup: first arrival of a fingerprint wins across micro-batches") {
    // the incremental profile of Dedup.exact: state-backed dropDuplicates
    // on the content fingerprint — a later batch's duplicate (even with
    // different id / whitespace) must not re-emit
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val dedup = mem.toDF().toDF("doc_id", "text")
      .withColumn("fp", Text.fingerprint(col("text")))
      .dropDuplicates("fp")
    val q = dedup.writeStream.outputMode("append").format("memory")
      .queryName("stream_dedup").start()
    try {
      mem.addData((1L, "alpha beta"), (2L, "gamma delta"))
      q.processAllAvailable()
      mem.addData((3L, "  Alpha   BETA "), (4L, "epsilon zeta"))
      q.processAllAvailable()
      val ids = spark.sql("SELECT doc_id FROM stream_dedup")
        .as[Long].collect().sorted
      assert(ids.toSeq === Seq(1L, 2L, 4L),
        "doc 3 is a normalized duplicate of doc 1 from an earlier batch")
    } finally q.stop()
  }

  test("redaction: whole-word deny terms and PII patterns") {
    val in = Seq(
      (1L, "the customer bought a vectorized thing from the customer desk"),
      (2L, "mail me at a.b+c@ex-ample.co.uk or call +1 (555) 123-4567 x89"))
      .toDF("id", "text")
    val terms = Seq("customer", "vector")
    val red = in.select(col("id"),
        Text.redactTerms(col("text"), terms, "<T>").as("r"),
        Text.redactTermCount(col("text"), terms).as("n"))
      .as[(Long, String, Int)].collect().sortBy(_._1)
    assert(red(0)._2 === "the <T> bought a vectorized thing from the <T> desk",
      "whole words only — 'vectorized' untouched")
    assert(red(0)._3 === 2)
    val pii = in.filter(col("id") === 2L)
      .select(Text.redactPii(col("text"))).as[String].head()
    assert(!pii.contains("@") && pii.contains("<EMAIL>"), pii)
    assert(!pii.contains("555") && pii.contains("<NUMBER>"), pii)
  }

  test("lshBanding: derives the fixture's banding from the math; monotone in tau") {
    // the oracle queries' hand-picked (8 bands × 4 rows) at k=32,
    // tau=0.5 is exactly what the S-curve tuner selects
    assert(graft.ops.Dedup.lshBanding(32, 0.5) === (8, 4))
    // stricter targets get longer bands (fewer, tighter buckets)
    val rows = Seq(0.2, 0.5, 0.8, 0.95)
      .map(t => graft.ops.Dedup.lshBanding(32, t)._2)
    assert(rows === rows.sorted, s"rowsPerBand must grow with tau: $rows")
    // the chosen threshold brackets tau better than any other split
    val (b, r) = graft.ops.Dedup.lshBanding(16, 0.7)
    assert(b * r === 16)
    val thr = math.pow(1.0 / b, 1.0 / r)
    (1 to 16).filter(16 % _ == 0).foreach { b2 =>
      val alt = math.pow(1.0 / b2, 1.0 / (16 / b2))
      assert(math.abs(thr - 0.7) <= math.abs(alt - 0.7) + 1e-12)
    }
  }

  test("ngramContainment: quoted doc scores 1.0 where Jaccard is structurally tiny") {
    val quote = "the quick brown fox jumps over the lazy dog tonight"
    val filler = (1 to 80).map(i => s"filler$i").mkString(" ")
    val corpus = Seq(
      (1L, s"$filler $quote"), // long doc containing the quote
      (2L, quote),             // the quote alone
      (3L, "an entirely different document about something else entirely here"))
      .toDF("doc_id", "text").withColumn("lang", lit("en"))
    val cont = graft.ops.Dedup.ngramContainment(corpus, tau = 0.9, blockCol = "lang")
      .as[(Long, Long, Double)].collect()
    spark.catalog.clearCache()
    assert(cont.map(c => (c._1, c._2)).toSet === Set((1L, 2L)),
      s"the quote is fully contained: $cont")
    assert(cont.head._3 === 1.0, "every gram of the smaller doc appears in the larger")
    // the symmetric metric cannot see this pair at any useful tau
    val jac = graft.ops.Dedup.ngramJaccard(corpus, tau = 0.5, blockCol = "lang",
      maxDf = 64).as[(Long, Long, Double)].collect()
    spark.catalog.clearCache()
    assert(jac.isEmpty, s"Jaccard misses the quote/subset near-dup: $jac")
  }

  test("ngramContainment count-bound prune: boundary pair kept, chance collision dropped") {
    // the count-bound candidate prune (common ≤ c + min uncapped grams)
    // must be invisible in the output: a pair sitting EXACTLY at
    // containment = tau survives the slack arithmetic, while a pair
    // sharing one chance gram far below tau is pruned before (not by)
    // verification — same reported set as the unpruned plan
    val corpus = Seq(
      // A: 7 tokens → 5 grams; B shares exactly 3 of them (prefix
      // "w1..w5" = grams g1 g2 g3) → containment 3/5 = 0.6 exactly
      (1L, "w1 w2 w3 w4 w5 w6 w7"),
      (2L, "w1 w2 w3 w4 w5 x6 x7 x8 x9"),
      // C shares ONE gram with A (suffix w5 w6 w7) and nothing else:
      // containment 1/5 = 0.2 — a chance collision the bound prunes
      (3L, "y1 y2 y3 y4 w5 w6 w7 y8 y9"))
      .toDF("doc_id", "text").withColumn("lang", lit("en"))
    val cont = graft.ops.Dedup.ngramContainment(corpus, tau = 0.6,
      blockCol = "lang", maxDf = 64).as[(Long, Long, Double)].collect()
    spark.catalog.clearCache()
    assert(cont.map(c => (c._1, c._2)).toSet === Set((1L, 2L)), s"got ${cont.toSeq}")
    assert(cont.head._3 === 0.6, "boundary pair reports its exact score")
  }

  test("minhashIncremental: store-served probe returns exactly the inline cross-corpus pairs") {
    val docs = (1L to 40L).map { i =>
      // planted cross-parity near-dups: doc 2k ≈ doc 2k+1 for k % 3 == 0
      val base = s"alpha$i beta$i gamma delta epsilon zeta eta theta iota kappa"
      (i, if (i % 6 == 1) base.replace(s"alpha$i beta$i", s"alpha${i - 1} beta${i - 1}")
          else base)
    }.toDF("doc_id", "text")
    val corpus = docs.filter($"doc_id" % 2 === 0)
    val probe = docs.filter($"doc_id" % 2 === 1)
    val inline = graft.ops.Dedup.crossMinhashLsh(corpus, probe, tau = 0.5)
      .as[(Long, Long, Double)].collect().toSet
    val dir = java.nio.file.Files.createTempDirectory("graft-mhstore").toFile
    val store = new java.io.File(dir, "sigs").getPath
    graft.ops.Dedup.minhashBandsStored(corpus, store)
    // second build call must be a no-op read (write-iff-absent)
    graft.ops.Dedup.minhashBandsStored(corpus, store)
    val served = graft.ops.Dedup.minhashIncremental(probe, store, tau = 0.5)
      .as[(Long, Long, Double)].collect().toSet
    assert(inline.nonEmpty, "fixture must produce cross-parity pairs")
    assert(served === inline)
  }

  test("spanDedup: first occurrence keeps, later and self-repeated spans are cut out") {
    // spanLen=3 fixture exercising every rule: the canonical (lowest
    // id, pos) occurrence keeps its tokens; a doc QUOTING doc 1 loses
    // exactly the quoted region (overlapping dup spans merge via the
    // coverage events); a doc that IS a duplicated span empties; and
    // within-doc repetition collapses to the first period
    val corpus = Seq(
      (1L, "a b c d e"),
      (2L, "x y a b c d e z"),
      (3L, "a b c"),
      (4L, "p q r p q r p q"))
      .toDF("doc_id", "text")
    val byId = graft.ops.Dedup.spanDedup(corpus, spanLen = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    spark.catalog.clearCache()
    assert(byId(1L) === ((5L, 0L, "a b c d e")), "canonical doc untouched")
    assert(byId(2L) === ((8L, 5L, "x y z")), "quoted region cut, frame kept")
    assert(byId(3L) === ((3L, 3L, "")), "doc that IS a dup span empties but stays")
    assert(byId(4L) === ((8L, 5L, "p q r")), "self-repetition collapses to one period")
  }

  test("minhashStoreAppend: grown store serves the same pairs as an inline corpus union; replay is a no-op") {
    val corpus = Seq(
      (2L, "the quick brown fox jumps over the lazy dog tonight"),
      (4L, "completely different content about databases and indexes")).toDF("doc_id", "text")
    val batch1 = Seq(
      (11L, "the quick brown fox jumps over the lazy dog today"),
      (13L, "novel text about distributed query engines at scale")).toDF("doc_id", "text")
    val probe = Seq(
      (21L, "novel text about distributed query engines at scale today"),
      (23L, "unrelated musings on garden vegetables and weather")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-mhappend").toFile
    val store = new java.io.File(dir, "sigs").getPath
    graft.ops.Dedup.minhashBandsStored(corpus, store)
    val before = spark.read.parquet(store).count()
    graft.ops.Dedup.minhashStoreAppend(batch1, store, batchTag = "b1")
    val after = spark.read.parquet(store).count()
    assert(after > before, "append added the batch signatures")
    // replayed stage (same tag): marker makes it a no-op
    graft.ops.Dedup.minhashStoreAppend(batch1, store, batchTag = "b1")
    assert(spark.read.parquet(store).count() === after)
    val served = graft.ops.Dedup.minhashIncremental(probe, store, tau = 0.5)
      .as[(Long, Long, Double)].collect().toSet
    val inline = graft.ops.Dedup.crossMinhashLsh(
      corpus.unionAll(batch1), probe, tau = 0.5)
      .as[(Long, Long, Double)].collect().toSet
    assert(served === inline)
    assert(served.exists(_._1 == 13L),
      "fixture must produce a pair against the APPENDED batch doc")
  }

  test("spanSetStoredAppend: store stays the distinct span set of everything seen; replay is a no-op") {
    val corpus = Seq((10L, "a b c d e")).toDF("doc_id", "text")
    val batch = Seq((11L, "a b c d x"), (12L, "p q r s t")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-spanappend").toFile
    val store = new java.io.File(dir, "spans").getPath
    graft.ops.Dedup.spanSetStored(corpus, store, spanLen = 3)
    graft.ops.Dedup.spanSetStoredAppend(batch, store, spanLen = 3, batchTag = "b1")
    graft.ops.Dedup.spanSetStoredAppend(batch, store, spanLen = 3, batchTag = "b1")
    val grown = spark.read.parquet(store).as[Long].collect().toSeq
    assert(grown.distinct.size === grown.size, "anti-join keeps the store duplicate-free")
    // reference store built on the union in one shot must be identical
    val refDir = java.nio.file.Files.createTempDirectory("graft-spanref").toFile
    val refStore = new java.io.File(refDir, "spans").getPath
    graft.ops.Dedup.spanSetStored(corpus.unionAll(batch), refStore, spanLen = 3)
    assert(grown.toSet === spark.read.parquet(refStore).as[Long].collect().toSet)
    // a next batch quoting the APPENDED batch is cut as corpus-owned
    val next = Seq((21L, "z p q r s w")).toDF("doc_id", "text")
    val out = graft.ops.Dedup.spanDedupIncremental(next, store, spanLen = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    spark.catalog.clearCache()
    assert(out(21L) === ((6L, 4L, "z w")), "appended batch's spans cut from the next batch")
  }

  test("store compaction: file count collapses, content and markers survive, appends stay idempotent") {
    val corpus = Seq(
      (2L, "the quick brown fox jumps over the lazy dog tonight")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-compact").toFile
    val store = new java.io.File(dir, "sigs").getPath
    graft.ops.Dedup.minhashBandsStored(corpus, store)
    // three appended batches → four file sets
    (1 to 3).foreach { i =>
      graft.ops.Dedup.minhashStoreAppend(
        Seq((100L + i, s"batch $i text about subject number $i entirely"))
          .toDF("doc_id", "text"),
        store, batchTag = s"b$i")
    }
    def parquetFiles() = new java.io.File(store).listFiles()
      .count(f => f.isFile && f.getName.endsWith(".parquet"))
    val before = spark.read.parquet(store)
      .orderBy("id", "band").collect().toSeq
    val filesBefore = parquetFiles()
    assert(filesBefore >= 4, s"append left one file set per batch: $filesBefore")
    val n = graft.ops.Stores.compact(spark, store)
    assert(parquetFiles() === n && n < filesBefore, s"compacted to $n files")
    assert(spark.read.parquet(store).orderBy("id", "band").collect().toSeq === before,
      "compaction is content-identical")
    // a replayed batch still finds its marker: no double-append
    graft.ops.Dedup.minhashStoreAppend(
      Seq((101L, "batch 1 text about subject number 1 entirely")).toDF("doc_id", "text"),
      store, batchTag = "b1")
    assert(spark.read.parquet(store).count() === before.size,
      "marker survived the swap; replay appended nothing")
  }

  test("spanDedupIncremental replayTag: cut after the batch's own append equals the pre-append cut") {
    val corpus = Seq((10L, "a b c d e")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-spanreplay").toFile
    val store = new java.io.File(dir, "spans").getPath
    graft.ops.Dedup.spanSetStored(corpus, store, spanLen = 3)
    val batch = Seq((21L, "x y a b c d e z"), (23L, "f g h i j")).toDF("doc_id", "text")
    def cut(tag: Option[String]) =
      graft.ops.Dedup.spanDedupIncremental(batch, store, spanLen = 3, replayTag = tag)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    val firstAttempt = cut(None); spark.catalog.clearCache()
    graft.ops.Dedup.spanSetStoredAppend(batch, store, spanLen = 3, batchTag = "b9")
    // naive redelivery would now cut the batch against its OWN spans
    // (everything removed); the retained delta restores the pre-append
    // store view and the replay reproduces the first attempt exactly
    val replay = cut(Some("b9")); spark.catalog.clearCache()
    assert(replay === firstAttempt)
    val naive = cut(None); spark.catalog.clearCache()
    assert(naive.forall { case (_, n, removed, _) => removed == n },
      "control: without replayTag the redelivered batch empties itself")
  }

  test("spanDedup hotSpanGuard ≡ window path, including a corpus-universal span") {
    // every doc carries the same "s1 s2 s3" template (the universal-span
    // straggler case the guard exists for) plus unique content and one
    // genuine cross-doc quote — the guard's argmin+join must pick the
    // identical canonical occurrences as the rank window
    val corpus = (1L to 12L).map(i =>
      (i, s"s1 s2 s3 u${i}a u${i}b a b c d u${i}c")).toDF("doc_id", "text")
    def run(guard: Boolean) =
      graft.ops.Dedup.spanDedup(corpus, spanLen = 3, hotSpanGuard = guard)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    val window = run(false); spark.catalog.clearCache()
    val guard = run(true); spark.catalog.clearCache()
    assert(guard === window)
    // sanity: the universal template was actually cut somewhere
    assert(window.exists { case (id, _, removed, _) => id > 1L && removed > 0L })
  }

  test("spanDedupIncremental hotSpanGuard ≡ window path against a stored corpus") {
    val corpus = Seq((10L, "a b c d e")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-spanstore-g").toFile
    val store = new java.io.File(dir, "spans").getPath
    graft.ops.Dedup.spanSetStored(corpus, store, spanLen = 3)
    val batch = Seq(
      (1L, "x y a b c d e z"),
      (3L, "p q r s p q r s"),
      (5L, "p q r s t")).toDF("doc_id", "text")
    def run(guard: Boolean) =
      graft.ops.Dedup.spanDedupIncremental(batch, store, spanLen = 3, hotSpanGuard = guard)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    val window = run(false); spark.catalog.clearCache()
    val guard = run(true); spark.catalog.clearCache()
    assert(guard === window)
  }

  test("spanDedupIncremental: store spans cut every batch occurrence, batch ranks internally") {
    val corpus = Seq((10L, "a b c d e")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-spanstore").toFile
    val store = new java.io.File(dir, "spans").getPath
    graft.ops.Dedup.spanSetStored(corpus, store, spanLen = 3)
    val batch = Seq(
      // quotes the corpus doc: even its FIRST batch occurrence is cut
      (1L, "x y a b c d e z"),
      // batch-internal repetition, unknown to the corpus: rank 1 keeps
      (3L, "p q r s p q r s"),
      (5L, "p q r s t"))
      .toDF("doc_id", "text")
    val out = graft.ops.Dedup.spanDedupIncremental(batch, store, spanLen = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    spark.catalog.clearCache()
    assert(out(1L) === ((8L, 5L, "x y z")), "stored corpus span cut from the batch")
    assert(out(3L) === ((8L, 4L, "p q r s")), "within-batch repetition collapses")
    assert(out(5L) === ((5L, 4L, "t")),
      "doc 3 holds the batch-canonical 'p q r s' spans; doc 5's copies are cut")
  }

  test("boilerplateRemoval: df>=minDf spans cut everywhere incl. first copy; within-doc repeats survive") {
    val docs = Seq(
      (1L, "hdr one two three a b"),
      (2L, "hdr one two three c d"),
      (3L, "e hdr one two three f"),
      // within-doc repetition only: df=1, NOT boilerplate (spanDedup
      // would cut the second copy; boilerplate must not)
      (4L, "p q r s p q r s"),
      (5L, "x y z w k l m n"),
      // "x y z w" df=2 < minDf=3: survives
      (6L, "x y z w o u v t"))
      .toDF("doc_id", "text")
    val out = graft.ops.Dedup.boilerplateRemoval(docs, spanLen = 4, minDf = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    spark.catalog.clearCache()
    assert(out(1L) === ((6L, 4L, "a b")), "first copy of the template is cut too")
    assert(out(2L) === ((6L, 4L, "c d")))
    assert(out(3L) === ((6L, 4L, "e f")), "template cut mid-doc")
    assert(out(4L) === ((8L, 0L, "p q r s p q r s")),
      "within-doc repeat has df=1 — boilerplate keeps it")
    assert(out(5L) === ((8L, 0L, "x y z w k l m n")))
    assert(out(6L) === ((8L, 0L, "x y z w o u v t")), "df=2 below minDf survives")
  }

  test("hardNegatives: nearest wrong-label only — a same-label twin never appears") {
    val vecs = Seq(
      (0L, Array(1.0f, 0f, 0f), 7),
      (1L, Array(1.0f, 0f, 0f), 7),    // identical twin, SAME label: excluded
      (2L, Array(0.9f, 0.1f, 0f), 3),  // near, different label: rank 1
      (3L, Array(0f, 1.0f, 0f), 3),    // orthogonal, different label
      (4L, Array(-1.0f, 0f, 0f), 5))   // opposite, different label
      .toDF("vec_id", "embedding", "label")
    val out = graft.ops.Ann.hardNegatives(vecs, vecs.filter($"vec_id" === 0L), k = 3)
      .select("q_id", "n_id", "n_label", "rank")
      .as[(Long, Long, Int, Long)].collect().sortBy(_._4)
    assert(out.map(_._2).toSeq === Seq(2L, 3L, 4L),
      "ranked by cosine among wrong-label vectors only")
    assert(!out.map(_._2).contains(1L), "the same-label twin is never a negative")
    assert(out.forall(_._3 != 7))
  }

  test("int8StoreAppend: frozen scale, out-of-range additions clip, replay is a no-op") {
    val vecs = Seq(
      (0L, Array(1.0f, 0f, 0f, 0f)),
      (1L, Array(0f, 1.0f, 0f, 0f))).toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("graft-int8app").toFile
    val path = new java.io.File(dir, "emb").getPath
    graft.ops.Ann.int8Stored(vecs, path)
    // addition quantizes with the STORE's scale (1.0): 0.5 → 64,
    // and the 2.0 component exceeds the frozen max → clips to 127
    val adds = Seq((10L, Array(0.5f, 2.0f, 0f, 0f))).toDF("vec_id", "embedding")
    graft.ops.Ann.int8StoreAppend(adds, path, batchTag = "b1")
    graft.ops.Ann.int8StoreAppend(adds, path, batchTag = "b1") // replay no-op
    val store = spark.read.parquet(path)
    assert(store.count() === 3)
    val q10 = store.filter(col("id") === 10L).head.getSeq[Byte](1)
    assert(q10 === Seq[Byte](64, 127, 0, 0), s"0.5→64 (round), 2.0 clips to 127: $q10")
    assert(store.select("scale").distinct().count() === 1, "one scale for the whole store")
    // the appended vector is probe-visible through the integer kernel
    // (self-pairs are excluded, so probe with vector 0: its angle to
    // the appended (64,127,0,0) beats the orthogonal vector 1)
    val top = graft.ops.Ann.bruteTopKInt8(store,
        vecs.filter(col("vec_id") === 0L), k = 1)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    assert(top === Set((0L, 10L)), s"appended vector is vector 0's nearest: $top")
  }

  test("int8 ANN: codes bounded, identical copies at cos 1.0 exactly, store write-once") {
    val vecs = Seq(
      (0L, Array(1.0f, 0f, 0f, 0f)),
      (1L, Array(0.9f, 0.1f, 0f, 0f)),
      (2L, Array(0f, 1.0f, 0f, 0f)),
      (3L, Array(0f, 0.9f, 0.2f, 0f)),
      (4L, Array(-1.0f, 0f, 0f, 0f)),
      (5L, Array(1.0f, 0f, 0f, 0f))) // exact copy of 0
      .toDF("vec_id", "embedding")
    assert(graft.ops.Ann.int8Scale(vecs) === 1.0)
    val dir = java.nio.file.Files.createTempDirectory("graft-int8").toFile
    val path = new java.io.File(dir, "emb").getPath
    val store = graft.ops.Ann.int8Stored(vecs, path)
    val codes = store.collect()
      .map(r => r.getLong(0) -> r.getSeq[Byte](1)).toMap
    assert(codes(0L) === Seq[Byte](127, 0, 0, 0))
    assert(codes(1L) === Seq[Byte](114, 13, 0, 0), "0.9*127=114.3 rounds to 114, 0.1*127=12.7 to 13")
    assert(codes.values.forall(_.forall(b => b >= -127 && b <= 127)))
    // second call must serve the store, not retrain (write-iff-absent)
    val again = graft.ops.Ann.int8Stored(vecs, path).collect()
      .map(r => r.getLong(0) -> r.getSeq[Byte](1)).toMap
    assert(again === codes)
    val top = graft.ops.Ann.bruteTopKInt8(store, vecs.filter($"vec_id" === 0L), k = 3)
      .select("q_id", "n_id", "cos", "rank")
      .as[(Long, Long, Double, Long)].collect().sortBy(_._4)
    assert(top(0) === ((0L, 5L, 1.0, 1L)), "the exact copy scores integer-exact cos 1.0")
    assert(top(1)._2 === 1L, "nearest non-copy is the 0.9/0.1 vector")
    assert(top(2)._2 === 2L || top(2)._2 === 3L)
    assert(top.forall(t => t._3 <= 1.0 && t._3 >= -1.0))
  }

  test("DSIR: target-like docs outrank off-target; map-only scoring bit-equal; store write-once") {
    val target = Seq(
      (100L, "cat dog cat dog bird"),
      (101L, "dog cat bird cat fish")).toDF("doc_id", "text")
    val raw = target.union(Seq(
      (200L, "xx yy zz ww vv uu"),
      (201L, "aa bb cc dd ee ff")).toDF("doc_id", "text"))
    val ratios = graft.ops.Dsir.trainLogRatios(target, raw, buckets = 512)
    assert(ratios.count() === 512, "every bucket materializes a ratio row")
    val w = graft.ops.Dsir.score(raw, ratios, buckets = 512)
      .collect().map(r => r.getLong(0) ->
        ((r.getDecimal(1), r.getLong(2)))).toMap
    // 6 tokens -> 6 unigrams + 5 bigrams
    assert(w(200L)._2 === 11L, "gram occurrences = tokens + bigrams")
    assert(w(100L)._1.compareTo(w(200L)._1) > 0,
      "a doc drawn from the target distribution outranks an off-target doc")
    assert(w(101L)._1.compareTo(w(201L)._1) > 0)
    // map-only fold: same decimals, same counts (exact arithmetic both ways)
    val m = graft.ops.Dsir.scoreMapOnly(raw, ratios, buckets = 512)
      .collect().map(r => r.getLong(0) ->
        ((r.getDecimal(1), r.getLong(2)))).toMap
    assert(m === w, "zero-exchange scoring is bit-equal to the distributed sum")
    // write-iff-absent lifecycle: second call serves the stored table
    val dir = java.nio.file.Files.createTempDirectory("graft-dsir").toFile
    val path = new java.io.File(dir, "ratios").getPath
    val r1 = graft.ops.Dsir.ratiosStored(target, raw, 512, path)
      .collect().map(r => (r.getLong(0), r.getDecimal(1))).toSet
    val r2 = graft.ops.Dsir.ratiosStored(target, raw, 512, path)
      .collect().map(r => (r.getLong(0), r.getDecimal(1))).toSet
    assert(r1 === r2)
    assert(r1 === ratios.collect().map(r => (r.getLong(0), r.getDecimal(1))).toSet,
      "stored ratios identical to a fresh train (deterministic trainer)")
  }

  test("budgetMix: α=1 collapses to one epoch rate; α=0.5 tilts epochs toward the rare source") {
    // big source: 4 docs × 100 tokens; rare source: 1 doc × 50 tokens
    def doc(id: Long, src: String, n: Int) = (id, src, Seq.fill(n)("tok").mkString(" "))
    val corpus = (Seq(doc(1, "big", 100), doc(2, "big", 100), doc(3, "big", 100),
        doc(4, "big", 100), doc(10, "rare", 50)))
      .toDF("doc_id", "source", "text")
      .withColumn("n_tokens", Text.tokenCount(col("text")).cast("long"))
    val budget = 900L // 2× the 450-token corpus

    // α=1: epochs_s = budget/Σtok for EVERY source — must equal the
    // uniform-rate weightedMix exactly
    val nat = Sampling.budgetMix(corpus, "source", "n_tokens", budget,
        alpha = 1.0, keyCol = "doc_id", seed = 7)
      .select(col("doc_id"), col("copy")).as[(Long, Long)].collect().toSet
    val uniform = Sampling.weightedMix(corpus, "source",
        Map("big" -> 2.0, "rare" -> 2.0), "doc_id", seed = 7)
      .select(col("doc_id"), col("copy")).as[(Long, Long)].collect().toSet
    assert(nat === uniform, "natural mixing = one epoch count corpus-wide")

    // α=0.5: the rare source's epoch count strictly exceeds the big
    // source's (temperature flattens token mass)
    val tempered = Sampling.budgetMix(corpus, "source", "n_tokens", budget,
        alpha = 0.5, keyCol = "doc_id", seed = 7)
      .groupBy(col("source")).agg(countDistinct(col("doc_id"), col("copy")).as("emitted"))
      .as[(String, Long)].collect().toMap
    val bigEpochs = tempered("big") / 4.0
    val rareEpochs = tempered("rare").toDouble
    assert(rareEpochs > bigEpochs,
      s"α=0.5 must upsample the rare source: rare $rareEpochs vs big $bigEpochs epochs")
  }

  test("exportShards + shardManifest: full shards, remainder tail, rebuild-identical fingerprints") {
    val in = (1L to 10L).map(i => (i, s"doc number $i")).toDF("doc_id", "text")
      .select(col("doc_id"), Text.fingerprint(col("text")).as("fp"))
    val shards = Sampling.exportShards(in, shardSize = 4, "doc_id", seed = 7)
      .select(col("doc_id"), col("fp"), col("pos"), col("shard"), col("pos_in_shard"))
      .as[(Long, String, Long, Long, Long)].collect().sortBy(_._3)
    assert(shards.map(_._3).toSeq === (0L until 10L), "positions are a permutation")
    shards.foreach { case (_, _, pos, shard, pis) =>
      assert(shard === pos / 4 && pis === pos % 4)
    }
    val manifest = Sampling.shardManifest(
      Sampling.exportShards(in, shardSize = 4, "doc_id", seed = 7), "fp")
      .as[(Long, Long, Long, Long, String)].collect().sortBy(_._1)
    assert(manifest.map(m => m._1 -> m._2).toSeq === Seq(0L -> 4L, 1L -> 4L, 2L -> 2L),
      "two full shards and the remainder tail")
    // the manifest fingerprint IS the ordered per-row fingerprint chain
    val expectFp = shards.groupBy(_._4).view.mapValues { rows =>
      val joined = rows.sortBy(_._3).map(_._2).mkString
      java.security.MessageDigest.getInstance("MD5").digest(joined.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    }.toMap
    manifest.foreach { case (shard, _, minP, maxP, fp) =>
      assert(fp === expectFp(shard), s"shard $shard content fingerprint")
      assert(minP === shard * 4 && maxP === math.min(shard * 4 + 3, 9))
    }
    // determinism: a rebuilt export certifies against the same manifest
    val again = Sampling.shardManifest(
      Sampling.exportShards(in.repartition(3), shardSize = 4, "doc_id", seed = 7), "fp")
      .as[(Long, Long, Long, Long, String)].collect().sortBy(_._1)
    assert(again.toSeq === manifest.toSeq,
      "layout must not change the export: same shards, same fingerprints")
  }

  test("leakageSafeSplits: near-dup clusters co-assign; singletons match plain splits") {
    val corpus = Seq(
      (1L, "aa"), (2L, "bb"), (3L, "cc"), (4L, "dd"),
      (10L, "ee"), (11L, "ff"), (12L, "gg"), (20L, "hh"))
      .toDF("doc_id", "text")
    // duplicate graph: {1,2,3} via a chain, {10,11} direct — 4, 12, 20 clean
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val clusters = graft.ops.Dedup.duplicateClusters(pairs)
    val fr = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val out = Sampling.leakageSafeSplits(corpus, clusters, fr, "doc_id", seed = 7)
      .select(col("doc_id"), col("split_group"), col("split"))
      .as[(Long, Long, String)].collect().toSeq
    spark.catalog.clearCache() // duplicateClusters persists its edge list
    assert(out.size === 8, "exactly one row per doc")
    assert(out.map(_._1).distinct.size === 8)
    // every cluster member hashes on the SAME representative → same split
    val m = out.map(t => t._1 -> t).toMap
    assert(Seq(1L, 2L, 3L).map(m(_)._2).distinct === Seq(1L),
      "chain cluster groups under its min id")
    assert(Seq(1L, 2L, 3L).map(m(_)._3).distinct.size === 1,
      "cluster {1,2,3} must land in one split")
    assert(Seq(10L, 11L).map(m(_)._3).distinct.size === 1,
      "cluster {10,11} must land in one split")
    // clean docs group as themselves and agree with the plain splitter
    val plain = Sampling.splits(corpus, fr, "doc_id", seed = 7)
      .select(col("doc_id"), col("split")).as[(Long, String)].collect().toMap
    Seq(4L, 12L, 20L).foreach { id =>
      assert(m(id)._2 === id, s"singleton $id groups as itself")
      assert(m(id)._3 === plain(id), s"singleton $id must match plain splits")
    }
    // determinism: a rerun reproduces the assignment exactly
    val again = Sampling.leakageSafeSplits(corpus, clusters, fr, "doc_id", seed = 7)
      .select(col("doc_id"), col("split_group"), col("split"))
      .as[(Long, Long, String)].collect().toSeq
    spark.catalog.clearCache()
    assert(again.toSet === out.toSet)
  }

  test("rrfFuse: consensus item outranks either list's solo head; one-list items keep their term") {
    val lex = Seq((1L, 10L, 1), (1L, 11L, 2)).toDF("q_id", "n_id", "rank")
    val sem = Seq((1L, 11L, 1), (1L, 12L, 2)).toDF("q_id", "n_id", "rank")
    val got = graft.ops.Ann.rrfFuse(lex, sem, kConst = 60, topK = 3)
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getLong(3)))
    // n11 = 1/62 + 1/61 (consensus), n10 = 1/61, n12 = 1/62
    val e11 = math.rint((1.0 / 62 + 1.0 / 61) * 1e6) / 1e6
    assert(got.map(_._1).toSeq === Seq(11L, 10L, 12L), s"got ${got.toSeq}")
    assert(got.head._2 === e11 && got.head._3 === 1L)
    assert(got(1)._2 === math.rint(1.0 / 61 * 1e6) / 1e6,
      "lex-only item scores its single term")
  }

  test("mmrRerank: redundancy penalty promotes the diverse candidate over the closer twin") {
    // q leans toward a; b is a near-twin of a (high relevance, maximal
    // redundancy once a is picked); c is orthogonal (low relevance,
    // zero redundancy). Pure top-2 = (a, b); MMR at lambda=1/2 must
    // pick c at rank 2 and push b to rank 3.
    val vecs = Seq(
      1L -> Array(1f, 0.05f),    // query
      10L -> Array(1f, 0f),      // a
      11L -> Array(0.98f, 0.199f), // b: near-twin of a
      12L -> Array(0f, 1f)       // c: orthogonal
    ).toDF("vec_id", "embedding")
    val mmr = graft.ops.Ann.mmrRerank(vecs, vecs.filter($"vec_id" === 1L),
        kShortlist = 3, kOut = 3, lambda = 0.5)
      .select("mmr_rank", "n_id").as[(Long, Long)].collect().toMap
    assert(mmr === Map(1L -> 10L, 2L -> 12L, 3L -> 11L), s"got $mmr")
    // pure relevance order differs: b outranks c
    val brute = graft.ops.Ann.bruteTopK(vecs, vecs.filter($"vec_id" === 1L), 3)
      .select("rank", "n_id").as[(Int, Long)].collect().toMap
    assert(brute(2) === 11L && brute(3) === 12L)
    // kOut = 1 degenerates to the relevance argmax
    val k1 = graft.ops.Ann.mmrRerank(vecs, vecs.filter($"vec_id" === 1L),
      kShortlist = 3, kOut = 1).select("n_id").as[Long].collect().toSeq
    assert(k1 === Seq(10L))
    spark.catalog.clearCache()
    val ex = intercept[IllegalArgumentException] {
      graft.ops.Ann.mmrRerank(vecs, vecs, kShortlist = 2, kOut = 3)
    }
    assert(ex.getMessage.contains("kOut"))
  }

  test("canonicalPick: max-score member kept, id-ascending on score ties") {
    import spark.implicits._
    val clusters = Seq((1L, 10L), (2L, 10L), (3L, 10L), (7L, 7L), (8L, 7L))
      .toDF("id", "cluster_id")
    // cluster 10: scores 5, 9, 9 -> tie between ids 2 and 3 -> keep 2
    // cluster 7: singleton-ish pair, clear winner 8
    val scores = Seq((1L, 5L), (2L, 9L), (3L, 9L), (7L, 1L), (8L, 4L))
      .toDF("id", "score")
    val out = graft.ops.Dedup.canonicalPick(clusters, scores)
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Long]("kept_id"), r.getAs[Long]("n_docs"),
          r.getAs[Long]("kept_score")))).toMap
    assert(out(10L) === ((2L, 3L, 9L)), "tie must break to the LOWER id")
    assert(out(7L) === ((8L, 2L, 4L)))
  }

  test("canonicalUrl: tracking strip, param sort, default ports, case, fragments") {
    import graft.ops.Web
    def canon(u: String): Any = {
      val r = Seq(u).toDF("u")
        .select(Web.canonicalUrl(col("u")).as("c")).collect().head
      if (r.isNullAt(0)) null else r.getString(0)
    }
    // query-param ORDER normalizes; utm_* and gclid are stripped
    assert(canon("https://Example.com/p?z=2&utm_source=x&a=1&gclid=g")
      === "https://example.com/p?a=1&z=2")
    assert(canon("https://example.com/p?a=1&z=2")
      === canon("HTTPS://EXAMPLE.COM/p?z=2&a=1&utm_campaign=c"),
      "the same page under shuffled/tracked params must collide")
    // default port dropped per scheme; explicit non-default kept
    assert(canon("http://example.com:80/x") === "http://example.com/x")
    assert(canon("https://example.com:443/x") === "https://example.com/x")
    assert(canon("http://example.com:443/x") === "http://example.com:443/x")
    assert(canon("https://example.com:8080/x")
      === "https://example.com:8080/x")
    // empty path → '/'; fragment dropped; userinfo and trailing dot out
    assert(canon("https://example.com") === "https://example.com/")
    assert(canon("https://example.com/a#sec") === "https://example.com/a")
    assert(canon("https://bob:pw@example.com./a") === "https://example.com/a")
    // path case is PRESERVED (only scheme/host fold)
    assert(canon("https://example.com/CaseSensitive")
      === "https://example.com/CaseSensitive")
    // all params tracking → no '?' at all
    assert(canon("https://example.com/p?utm_a=1&utm_b=2&ref=r")
      === "https://example.com/p")
    // not a URL → NULL, loudly distinguishable from any canonical
    assert(canon("not a url") === null)
    assert(canon("mailto:a@b.com") === null)
  }

  test("canonicalUrl is IDEMPOTENT over generated crawl URLs (property)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import graft.ops.Web
    def gen[A](g: Gen[A], seed: Long): A =
      g(Gen.Parameters.default, Seed(seed)).get
    val urlGen = for {
      scheme <- Gen.oneOf("http", "https", "HTTP", "HTTPS")
      host <- Gen.oneOf("Example.com", "a.b.example.co.uk",
        "shop.example.com.au.", "EXAMPLE.org", "x.example.net:8080",
        "example.com:443", "example.com:80")
      path <- Gen.oneOf("", "/", "/a/b", "/Case/Sensitive", "/p%20q",
        "/a/./b", "/a/../b", "/x/y/../../z", "/../top", "/a/.", "/a/..",
        "/a//b", "/%7euser", "/%41bc", "/p%2fq", "/m%2Fn%20o", "/100%25",
        "/odd%zz", "/a/%2E%2E/b", "/%2e/k")
      params <- Gen.listOf(Gen.oneOf("a=1", "z=9", "b=", "utm_source=x",
        "utm_campaign=y", "gclid=g", "ref=r", "k=v&", "q=%7ex", "r=%2Fs"))
      frag <- Gen.oneOf("", "#top", "#a/b?c=d")
    } yield s"$scheme://$host$path" +
      (if (params.nonEmpty) "?" + params.mkString("&") else "") + frag
    val urls = (0 until 8).flatMap(i =>
      gen(Gen.listOfN(25, urlGen), 1000L + i))
    val out = urls.toDF("u")
      .select(Web.canonicalUrl(col("u")).as("c1"))
      .select(col("c1"), Web.canonicalUrl(col("c1")).as("c2"))
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(!r.isNullAt(0), "every generated URL must canonicalize")
      assert(r.getString(0) === r.getString(1),
        s"canonical form must be a FIXED POINT, got ${r.getString(0)}"
          + s" -> ${r.getString(1)}")
    }
  }

  test("registrableDomain: co.uk-class suffixes, plain TLDs, IPv4, single label") {
    import graft.ops.Web
    def dom(u: String): Any = {
      val r = Seq(u).toDF("u")
        .select(Web.registrableDomain(col("u")).as("d")).collect().head
      if (r.isNullAt(0)) null else r.getString(0)
    }
    // multi-part suffix: eTLD+1 is THREE labels
    assert(dom("https://news.bbc.co.uk/x") === "bbc.co.uk")
    assert(dom("https://a.b.shop.example.com.au/") === "example.com.au")
    assert(dom("http://www.example.gov.uk") === "example.gov.uk")
    // plain TLD: two labels, however deep the host
    assert(dom("https://a.b.c.example.com/x") === "example.com")
    assert(dom("https://example.org") === "example.org")
    // the suffix itself ≠ a registrable domain of a DEEPER host only
    assert(dom("https://co.uk") === "co.uk",
      "a bare two-label host passes through as-is")
    // IPv4 and single-label hosts pass through; ports stripped
    assert(dom("http://192.168.0.1:8080/x") === "192.168.0.1")
    assert(dom("http://localhost:3000/") === "localhost")
    assert(dom("nope") === null)
  }

  test("registrableDomain: wildcard ccTLD (*.ck) and its exception (!www.ck)") {
    import graft.ops.Web
    def dom(u: String): Any = {
      val r = Seq(u).toDF("u")
        .select(Web.registrableDomain(col("u")).as("d")).collect().head
      if (r.isNullAt(0)) null else r.getString(0)
    }
    // *.ck: every second-level label is a public suffix → eTLD+1 is
    // the last THREE labels, however deep the host
    assert(dom("https://shop.acme.ck/x") === "shop.acme.ck")
    assert(dom("https://a.b.shop.acme.ck/") === "shop.acme.ck")
    // a bare two-label host under a wildcard TLD IS the suffix itself
    assert(dom("https://acme.ck") === "acme.ck")
    // !www.ck: the exception re-registers www.ck despite *.ck
    assert(dom("https://www.ck/") === "www.ck")
    assert(dom("https://mail.www.ck/") === "www.ck")
    assert(dom("https://a.mail.www.ck/") === "www.ck")
    // other pinned wildcard TLDs behave alike
    assert(dom("http://x.y.gov.np") === "y.gov.np")
    // wildcard precedence does not disturb the multi-part table
    assert(dom("https://news.bbc.co.uk/x") === "bbc.co.uk")
  }

  test("canonicalUrl: dot-segment removal and percent normalization (RFC 3986 §6.2.2)") {
    import graft.ops.Web
    def canon(u: String): Any = {
      val r = Seq(u).toDF("u")
        .select(Web.canonicalUrl(col("u")).as("c")).collect().head
      if (r.isNullAt(0)) null else r.getString(0)
    }
    // dot-segments: '.' drops, '..' pops, leading '..' clamps at root
    assert(canon("https://example.com/a/./b") === "https://example.com/a/b")
    assert(canon("https://example.com/a/../b") === "https://example.com/b")
    assert(canon("https://example.com/a/b/../../c")
      === "https://example.com/c")
    assert(canon("https://example.com/../a") === "https://example.com/a")
    // trailing '/.' and '/..' keep their slash (the RFC's output)
    assert(canon("https://example.com/a/.") === "https://example.com/a/")
    assert(canon("https://example.com/a/..") === "https://example.com/")
    // empty segments ('//') are preserved verbatim, and '..' pops them
    assert(canon("https://example.com/a//b") === "https://example.com/a//b")
    // percent normalization: unreserved decodes, retained upcases
    assert(canon("https://example.com/%7euser") === "https://example.com/~user")
    assert(canon("https://example.com/%41%62c") === "https://example.com/Abc")
    assert(canon("https://example.com/p%2fq") === "https://example.com/p%2Fq",
      "reserved characters stay encoded, hex uppercased")
    assert(canon("https://example.com/p%20q") === "https://example.com/p%20q")
    // a lone '%' not followed by two hex digits passes through
    assert(canon("https://example.com/100%25") === "https://example.com/100%25")
    assert(canon("https://example.com/a%zz") === "https://example.com/a%zz")
    // %2E decodes to '.' and THEN dot-removal applies (whatwg order)
    assert(canon("https://example.com/a/%2E%2E/b") === "https://example.com/b")
    // query strings get the same percent normalization before sorting
    assert(canon("https://example.com/p?k=%7ev&a=1")
      === "https://example.com/p?a=1&k=~v")
    // the ADVICE case: trailing host dot BEFORE the default port must
    // still collide with the bare host (port first, dot second)
    assert(canon("https://example.com.:443/x") === "https://example.com/x")
    assert(canon("http://example.com.:8080/x")
      === "http://example.com:8080/x")
  }
}
