package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.Text
import graft.functions.expr.{ShingleHashes, SimHash48}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String

/** Property: the one-pass codegen kernels agree with the Column-
  * expression formulations on arbitrary token lists — the contract that
  * lets either implementation back the same oracle. (Raw scalacheck
  * generators with a fixed seed, sampled in a loop — the scalatestplus
  * bridge is not on the offline classpath.) */
class TextHashPropertySpec extends SparkTestBase {
  import spark.implicits._

  private val token = Gen.choose(1, 8).flatMap(n =>
    Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
  private val tokenList = Gen.choose(1, 14).flatMap(n => Gen.listOfN(n, token))

  private def samples(count: Int): Seq[List[String]] =
    (0 until count).flatMap(i =>
      tokenList(Gen.Parameters.default, Seed(42L + i)))

  private def arrData(toks: Seq[String]): ArrayData =
    ArrayData.toArrayData(toks.map(UTF8String.fromString).toArray)

  test("ShingleHashes ≡ distinct md5-prefix of zip_with shingles (property)") {
    val cases = samples(20)
    val texts = cases.map(_.mkString(" "))
    val viaColumns = texts.toDF("text")
      .select(array_distinct(transform(
        Text.wordShingles(col("text"), 3),
        g => conv(substring(md5(g), 1, 15), 16, 10).cast("long"))).as("sh"))
      .as[Seq[Long]].collect()
    cases.zip(viaColumns).foreach { case (toks, expect) =>
      val got = ShingleHashes.compute(arrData(toks), 3, 15).toLongArray().toSet
      assert(got === expect.toSet, s"tokens: $toks")
    }
  }

  test("SimHash48 ≡ majority vote over distinct-token hashes (property)") {
    val cases = samples(20)
    val texts = cases.map(_.mkString(" "))
    val viaColumns = texts.toDF("text")
      .select(Text.simhash(col("text")).as("sh"))
      .as[Long].collect()
    cases.zip(viaColumns).foreach { case (toks, expect) =>
      assert(SimHash48.compute(arrData(toks)) === expect, s"tokens: $toks")
    }
  }

  test("custom expressions compile under strict codegen (no interpreter fallback)") {
    // With fallback disabled, a Janino compile error in doGenCode fails the
    // query instead of silently degrading to interpreted eval — this pins
    // the generated Java for every custom expression in the hot path.
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val conf = spark.conf
    val prevFallback = conf.getOption("spark.sql.codegen.fallback")
    val prevFactory = conf.getOption("spark.sql.codegen.factoryMode")
    conf.set("spark.sql.codegen.fallback", "false")
    conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val docs = Seq((1L, "the quick brown fox jumps over the lazy dog"),
        (2L, "pack my box with five dozen liquor jugs")).toDF("doc_id", "text")
      val toks = docs.select(col("doc_id"), Text.tokens(col("text")).as("toks"))
      val out = toks.select(
        ColumnBridge.column(SimHash48(ColumnBridge.expr(col("toks")))).as("sh"),
        size(ColumnBridge.column(ShingleHashes(
          ColumnBridge.expr(col("toks")), 3, 15))).as("nsh"))
        .collect()
      assert(out.length === 2)
      assert(out.forall(r => r.getLong(0) != 0L && r.getInt(1) > 0))
      val coeffs = Text.minhashCoeffs(4)
      val mh = toks.select(ColumnBridge.column(
        graft.functions.expr.MinHashSignature(ColumnBridge.expr(col("toks")), 3,
          coeffs.map(_._1).toArray, coeffs.map(_._2).toArray)).as("sig"))
        .as[Seq[Long]].collect()
      assert(mh.forall(_.length === 4))
      val vd = Seq((Seq(1.0f, 2.0f), Seq(3.0f, 4.0f))).toDF("a", "b")
        .select(ColumnBridge.column(graft.functions.expr.VectorDot(
          ColumnBridge.expr(col("a")), ColumnBridge.expr(col("b")))).as("d"))
        .as[Double].head()
      assert(math.abs(vd - 11.0) < 1e-9)
      // NON-NULLABLE input (array() constructor): ev.isNull is the
      // literal `false` — the regression case where an unconditional
      // isNull assignment fails Janino and falls back silently
      val vdNn = spark.range(1).select(ColumnBridge.column(
        graft.functions.expr.VectorDot(
          ColumnBridge.expr(array(lit(1.0d), lit(2.0d))),
          ColumnBridge.expr(array(lit(3.0d), lit(4.0d))))).as("d"))
        .as[Double].head()
      assert(math.abs(vdNn - 11.0) < 1e-9)
      val pqcb = Array(0.0, 0.0, 10.0, 10.0, 5.0, 5.0, 0.0, 0.0)
      val pqRow = Seq((1L, Seq(1.0f, 1.0f, 4.0f, 4.0f))).toDF("id", "v")
        .select(
          ColumnBridge.column(graft.functions.expr.PqEncode(
            ColumnBridge.expr(col("v")), 2, 2, pqcb)).as("codes"),
          ColumnBridge.column(graft.functions.expr.PqDistTable(
            ColumnBridge.expr(col("v")), 2, 2, pqcb)).as("tab"))
        .select(col("codes"), ColumnBridge.column(graft.functions.expr.PqAdc(
          ColumnBridge.expr(col("codes")), ColumnBridge.expr(col("tab")), 2)).as("d"))
        .as[(Seq[Int], Double)].head()
      assert(pqRow._1 === Seq(0, 0) && pqRow._2 > 0.0)
      // IVF-PQ kernels: cell assignment + residual encode/table
      val cents = Array(0.0, 0.0, 0.0, 0.0, 10.0, 10.0, 10.0, 10.0) // 2 cells, dim 4
      val ivfRow = Seq((1L, Seq(9.0f, 9.0f, 11.0f, 11.0f))).toDF("id", "v")
        .select(col("v"),
          ColumnBridge.column(graft.functions.expr.NearestCell(
            ColumnBridge.expr(col("v")), cents, 4)).as("cell"),
          size(ColumnBridge.column(graft.functions.expr.CellDists(
            ColumnBridge.expr(col("v")), cents, 4))).as("nd"))
        .select(col("cell"), col("nd"),
          ColumnBridge.column(graft.functions.expr.PqEncodeRes(
            ColumnBridge.expr(col("v")), ColumnBridge.expr(col("cell")),
            cents, 4, 2, 2, pqcb)).as("rcodes"),
          size(ColumnBridge.column(graft.functions.expr.PqDistTableRes(
            ColumnBridge.expr(col("v")), ColumnBridge.expr(col("cell")),
            cents, 4, 2, 2, pqcb))).as("ntab"))
        .as[(Int, Int, Seq[Int], Int)].head()
      assert(ivfRow._1 === 1, "(9,9,11,11) sits in cell 1 (centroid 10s)")
      assert(ivfRow._2 === 2 && ivfRow._4 === 4)
      // residual vs cell-1 centroid = (-1,-1,1,1): sub0 (-1,-1) → code 0
      // ((0,0) beats (10,10)); sub1 (1,1) → code 1 ((0,0) beats (5,5))
      assert(ivfRow._3 === Seq(0, 1))
      // cosine-argmax assignment kernel (the k-means / IVF corpus side):
      // direction matters, magnitude doesn't — (0.1, 0.1, 0, 0) aligns
      // with the (10, 10, 0, 0) centroid despite the nearer-by-L2 origin
      val cosCents = Array(10.0, 10.0, 0.0, 0.0, 0.0, 0.0, 10.0, 10.0)
      val cosRow = Seq((1L, Seq(0.1f, 0.1f, 0.0f, 0.0f)),
          (2L, Seq(0.0f, 0.0f, 5.0f, 5.0f))).toDF("id", "v")
        .select(col("id"), ColumnBridge.column(
          graft.functions.expr.NearestCentroidCos(
            ColumnBridge.expr(col("v")), cosCents, 4)).as("cell"))
        .as[(Long, Int)].collect().toMap
      assert(cosRow === Map(1L -> 0, 2L -> 1))
    } finally {
      prevFallback.fold(conf.unset("spark.sql.codegen.fallback"))(
        conf.set("spark.sql.codegen.fallback", _))
      prevFactory.fold(conf.unset("spark.sql.codegen.factoryMode"))(
        conf.set("spark.sql.codegen.factoryMode", _))
    }
  }

  test("duplicatedSpans ≡ brute-force span accounting on random corpora (property)") {
    // tiny alphabet so cross-doc span collisions actually occur
    val tok = Gen.oneOf("aa", "bb", "cc", "dd")
    val docGen = Gen.choose(2, 10).flatMap(n => Gen.listOfN(n, tok))
    val corpusGen = Gen.choose(4, 8).flatMap(n => Gen.listOfN(n, docGen))
    (0 until 6).foreach { i =>
      val corpus = corpusGen(Gen.Parameters.default, Seed(7L + i)).get
      val df = corpus.zipWithIndex
        .map { case (toks, id) => (id.toLong, toks.mkString(" ")) }
        .toDF("doc_id", "text")
      val got = graft.ops.TextStats.duplicatedSpans(df, spanLen = 3)
        .as[(Long, Long, Long, Double)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
      // brute force: distinct 3-token spans per doc, cross-doc counts
      val spans = corpus.zipWithIndex.map { case (toks, id) =>
        id.toLong -> toks.sliding(3).filter(_.size == 3)
          .map(_.mkString(" ")).toSet
      }.filter(_._2.nonEmpty)
      val docCount = spans.flatMap(_._2).groupBy(identity)
        .view.mapValues(_.size).toMap
      val expect = spans.map { case (id, ss) =>
        id -> ((ss.size.toLong, ss.count(docCount(_) >= 2).toLong))
      }.toMap
      assert(got === expect, s"corpus $i: $corpus")
    }
  }

  test("bigramScores: bounds hold and a full vocabulary scores hit_frac 1 (property)") {
    val tok = Gen.oneOf("x", "y", "z")
    val docGen = Gen.choose(2, 8).flatMap(n => Gen.listOfN(n, tok))
    val corpusGen = Gen.choose(3, 6).flatMap(n => Gen.listOfN(n, docGen))
    (0 until 4).foreach { i =>
      val corpus = corpusGen(Gen.Parameters.default, Seed(21L + i)).get
      val df = corpus.zipWithIndex
        .map { case (toks, id) => (id.toLong, toks.mkString(" ")) }
        .toDF("doc_id", "text")
      // 9 possible bigrams over a 3-token alphabet: vocabSize 9 holds all
      val model = graft.ops.TextStats.bigramModel(df, vocabSize = 9)
      model.foreach { case (bg, p) =>
        assert(p > 0.0 && p <= 1.0, s"conditional prob out of range: $bg -> $p")
      }
      val rows = graft.ops.TextStats.bigramScores(df, model)
        .as[(Long, Long, Double, Double)].collect()
      rows.foreach { case (id, n, hit, mean) =>
        assert(n >= 1, s"doc $id")
        assert(hit === 1.0, s"full vocab must cover doc $id's bigrams")
        assert(mean > 0.0 && mean <= 1.0, s"doc $id mean $mean")
      }
    }
  }
}
