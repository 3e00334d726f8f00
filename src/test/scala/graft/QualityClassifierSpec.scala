package graft

import org.apache.spark.sql.functions._
import graft.functions.Text
import graft.ops.QualityClassifier

class QualityClassifierSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sf0001/documents.parquet")

  test("model is total over the bucket space with ppm-range weights") {
    val (model, cut) = QualityClassifier.train(docs, buckets = 256, seed = 11)
    assert(model.size === 256, "every bucket carries a weight (prior fills gaps)")
    assert(model.keys.forall(b => b >= 0 && b < 256))
    // Laplace smoothing keeps weights strictly inside (0, 1e6)
    assert(model.values.forall(w => w > 0 && w < 1000000L), s"weights out of ppm range")
    assert(model.values.toSet.size > 1, "a trained model is not constant")
    // the label correlates with length, so the token-weighted prior sits
    // well above the ~50% doc-weighted label rate — the reason the cut
    // is learned, not ½
    assert(cut > 500000L && cut < 1000000L, s"cut_ppm $cut")
  }

  test("scores are exact integer ppm and pred is the learned cut rule") {
    val (model, cut) = QualityClassifier.train(docs, buckets = 256, seed = 11)
    val scored = QualityClassifier.score(docs, model, buckets = 256,
      seed = 11, cutPpm = cut)
      .as[(Long, Long, Long, Long)].collect()
    assert(scored.length === docs.count())
    scored.foreach { case (_, nToks, ppm, pred) =>
      assert(nToks > 0)
      assert(ppm >= 0 && ppm < 1000000L)
      assert(pred === (if (ppm >= cut) 1L else 0L))
    }
    assert(scored.map(_._4).toSet.size === 2,
      "the base-rate cut must split the fixture corpus, not rubber-stamp it")
  }

  test("distillation beats the majority-class baseline") {
    // Ceiling check, honestly calibrated: the fixture corpus draws its
    // tokens from one shared vocabulary regardless of label, so the
    // only learnable signal is the length→token-frequency shadow of
    // the heuristic — measured ~58% vs a 50.2% majority baseline at
    // sf0.001. The op's contract is the pipeline shape and integer
    // exactness; on a real corpus the vocabulary carries the signal.
    val (model, cut) = QualityClassifier.train(docs, buckets = 1024, seed = 11,
      labelThreshold = 0.68)
    val scored = QualityClassifier.score(docs, model, buckets = 1024,
      seed = 11, cutPpm = cut)
    val labeled = docs.select(col("doc_id"),
      when(Text.qualityScore(col("text")) >= 0.68, 1L).otherwise(0L).as("label"))
    val agree = scored.join(labeled, "doc_id")
      .filter(col("pred") === col("label")).count()
    val total = docs.count()
    val majority = {
      val good = labeled.filter(col("label") === 1L).count()
      math.max(good, total - good)
    }
    assert(agree > majority,
      s"student must beat predict-the-majority: $agree vs $majority of $total")
  }

  test("scoring is map-only: model rides as a constant, no exchange") {
    val (model, cut) = QualityClassifier.train(docs, buckets = 256, seed = 11)
    val plan = QualityClassifier.score(docs, model, buckets = 256, seed = 11,
      cutPpm = cut).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"scoring must not shuffle:\n$plan")
  }

  test("model store: write-once, serve-many, value-identical to a fresh train") {
    val store = java.nio.file.Files.createTempDirectory("graft-qcmodel").toString
    val (m1, c1) = QualityClassifier.modelStored(docs, store, buckets = 256, seed = 11)
    val (mFresh, cFresh) = QualityClassifier.train(docs, buckets = 256, seed = 11)
    assert(m1 === mFresh && c1 === cFresh,
      "stored model must equal a fresh deterministic train")
    val marker = new java.io.File(store, "_SUCCESS")
    val stamp = marker.lastModified()
    val (m2, c2) = QualityClassifier.modelStored(docs, store, buckets = 256, seed = 11)
    assert(marker.lastModified() === stamp, "present store is served, not rebuilt")
    assert(m2 === m1 && c2 === c1)
  }

  test("property: train and score are layout-invariant on random corpora") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // integer-exact aggregation is order-free, so physical layout must
    // never change a weight, the cut, or a score — the contract that
    // makes the oracle replay possible at any partitioning
    val token = Gen.choose(1, 6).flatMap(n =>
      Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
    val doc = Gen.choose(1, 30).flatMap(n =>
      Gen.listOfN(n, token).map(_.mkString(" ")))
    (0 until 3).foreach { i =>
      val texts = (0 until 40).flatMap(j =>
        doc(Gen.Parameters.default, Seed(i * 100L + j)))
      val corpus = texts.zipWithIndex
        .map { case (t, id) => (id.toLong, t) }.toDF("doc_id", "text")
      val (m1, c1) = QualityClassifier.train(corpus, buckets = 64, seed = 11)
      val (m2, c2) = QualityClassifier.train(corpus.repartition(7),
        buckets = 64, seed = 11)
      assert(m1 === m2 && c1 === c2, s"case $i: layout changed the model")
      val s1 = QualityClassifier.score(corpus, m1, buckets = 64, seed = 11,
        cutPpm = c1).as[(Long, Long, Long, Long)].collect().toSet
      val s2 = QualityClassifier.score(corpus.repartition(5), m2,
        buckets = 64, seed = 11, cutPpm = c2)
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(s1 === s2, s"case $i: layout changed a score")
      s1.foreach { case (_, n, ppm, pred) =>
        assert(n > 0 && ppm >= 0 && ppm < 1000000L)
        assert(pred === (if (ppm >= c1) 1L else 0L))
      }
    }
  }

  test("fresh docs score without retraining (unseen buckets take the prior)") {
    val model = Map(0L -> 900000L) // deliberately partial model
    val fresh = Seq((1L, "zzz qqq xyzzy")).toDF("doc_id", "text")
    val out = QualityClassifier.score(fresh, model, buckets = 1024, seed = 11)
      .as[(Long, Long, Long, Long)].head()
    assert(out._2 === 3L)
    // each token's bucket is almost surely untrained → prior mean
    assert(out._3 >= 400000L && out._3 <= 1000000L)
  }
}
