package graft

import org.apache.spark.sql.functions._
import graft.ops.{BloomScreen, Dedup}

/** The EXPLICIT Bloom pre-screen ([[graft.ops.BloomScreen]]) — the
  * deliberate counterpart of Catalyst's InjectRuntimeFilter
  * (RuntimeFilterSpec): built for the regime where the reference key
  * set is too big to broadcast as an exact join build side but a
  * 10-bit/key sketch still fits, so the screen must be planted by the
  * operator, not discovered by the optimizer. */
class BloomScreenSpec extends SparkTestBase {
  import spark.implicits._

  test("bloom-screened decontamination equals the exact unscreened join") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val corpus = docs.filter(col("doc_id") % 2 === 0)
    val eval = docs.filter(col("doc_id") % 2 === 1)

    val screened = BloomScreen.corpusContaminatedBloom(corpus, eval, n = 5)
      .as[(Long, Long)].collect().toSet

    // ground truth: same join with no sketch in the way
    val evalGrams = Dedup.corpusGramSet(eval, 5)
    val exact = Dedup.ngramHashes(corpus, 5)
      .join(evalGrams, Seq("g"))
      .groupBy(col("id")).agg(count(lit(1)).as("hits"))
      .as[(Long, Long)].collect().toSet

    assert(screened === exact,
      "the bloom changes the plan, never the answer (fpp survivors must die in the confirm join)")
    assert(screened.nonEmpty, "fixture split must actually produce contamination hits")
    spark.catalog.clearCache() // evalGrams persisted inside the op
  }

  test("screen filter runs scan-side: below every exchange") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val result = BloomScreen.corpusContaminatedBloom(
      docs.filter(col("doc_id") % 2 === 0),
      docs.filter(col("doc_id") % 2 === 1), n = 5)
    result.collect() // finalize the AQE plan before inspecting it

    import org.apache.spark.sql.execution.{FilterExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    def collectAll[A](p: SparkPlan)(f: PartialFunction[SparkPlan, A]): Seq[A] =
      p.collect {
        case a: AdaptiveSparkPlanExec => collectAll(a.executedPlan)(f)
        case q: QueryStageExec => collectAll(q.plan)(f)
        case n if f.isDefinedAt(n) => Seq(f(n))
      }.flatten
    val plan = result.queryExecution.executedPlan
    val screens = collectAll(plan) {
      case fl: FilterExec if fl.condition.toString.contains("might_contain") => fl
    }
    assert(screens.nonEmpty, s"no bloom screen filter found in:\n$plan")
    // the screen's whole subtree must be shuffle-free — grams are
    // dropped in the scan/generate stage, before they ever cost a wire
    screens.foreach { fl =>
      val shuffles = collectAll(fl.asInstanceOf[SparkPlan]) {
        case e: ShuffleExchangeLike => e
      }
      assert(shuffles.isEmpty,
        s"bloom screen must apply before any exchange:\n$fl")
    }
    spark.catalog.clearCache()
  }

  test("empty reference set screens out everything without building a sketch") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val out = BloomScreen.corpusContaminatedBloom(
      docs, docs.filter(lit(false)), n = 5)
    assert(out.count() === 0L)
    assert(out.columns.toSeq === Seq("corpus_id", "hits"))
    spark.catalog.clearCache()
  }

  test("gram-set store: write-once, serve-many, rebuild bit-identical") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val corpus = docs.filter(col("doc_id") % 2 === 0)
    val eval = docs.filter(col("doc_id") % 2 === 1)
    val store = java.nio.file.Files.createTempDirectory("graft-gramstore").toString

    val (_, sketch1) = BloomScreen.gramSetStored(eval, store, n = 5)
    val fromStore = BloomScreen.corpusContaminatedFromStore(corpus, store, n = 5)
      .as[(Long, Long)].collect().toSet
    val inline = BloomScreen.corpusContaminatedBloom(corpus, eval, n = 5)
      .as[(Long, Long)].collect().toSet
    assert(fromStore === inline, "stored and inline screens must agree")
    spark.catalog.clearCache()

    // serve-many: a second call must not rewrite the store
    val marker = new java.io.File(store, "_SUCCESS")
    val stamp = marker.lastModified()
    val gramsStamp = new java.io.File(store, "grams").lastModified()
    val (_, sketch2) = BloomScreen.gramSetStored(eval, store, n = 5)
    assert(marker.lastModified() === stamp &&
      new java.io.File(store, "grams").lastModified() === gramsStamp,
      "present store must be served, not rebuilt")
    assert(java.util.Arrays.equals(sketch1.get, sketch2.get))

    // determinism: a forced rebuild reproduces the sketch bit-for-bit
    // (a bloom's bit array is an OR of per-key bit sets — order-free)
    val store2 = java.nio.file.Files.createTempDirectory("graft-gramstore2").toString
    val (_, sketch3) = BloomScreen.gramSetStored(eval, store2, n = 5)
    assert(java.util.Arrays.equals(sketch1.get, sketch3.get),
      "deterministic build: rebuilt store must be bit-identical")
  }

  test("corpusContaminatedFromStore refuses a missing store") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val ex = intercept[IllegalArgumentException] {
      BloomScreen.corpusContaminatedFromStore(docs, "/tmp/graft-no-such-store")
    }
    assert(ex.getMessage.contains("gramSetStored"))
  }

  test("property: no false negatives on arbitrary key sets") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val keySet = Gen.choose(1, 200).flatMap(n =>
      Gen.listOfN(n, Gen.choose(Long.MinValue + 1, Long.MaxValue)))
    (0 until 15).foreach { i =>
      val keys = keySet(Gen.Parameters.default, Seed(1000L + i)).get.distinct
      val bloom = BloomScreen.buildBloom(
        keys.toDF("k"), "k", keys.size.toLong.max(1), 1L << 12).get
      val survived = keys.toDF("k")
        .filter(BloomScreen.mightContain(bloom, col("k")))
        .as[Long].collect().toSet
      assert(survived === keys.toSet,
        s"case $i: a member was screened out — bloom lost a key")
    }
  }

  test("buildBloom/mightContain: no false negatives, fpp-bounded false positives") {
    val members = spark.range(0, 1000).select((col("id") * 7L).as("k"))
    val bloom = BloomScreen.buildBloom(members, "k", 1000L, 1L << 16).get
    val probed = spark.range(0, 7000).select(col("id").as("k"))
      .filter(BloomScreen.mightContain(bloom, col("k")))
      .as[Long].collect().toSet
    val truth = (0L until 1000L).map(_ * 7L).filter(_ < 7000L).toSet
    assert(truth.subsetOf(probed), "a bloom filter never loses a member")
    val fp = probed.size - truth.size
    assert(fp < 700, s"~1% fpp sketch should not flag $fp of 6000 non-members")
  }
}
