package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import graft.functions.Text
import graft.functions.expr.MinHashSignature

/** The codegen'd whole-signature MinHash expression: equality with the
  * explode + k×min-aggregate reference formulation (the DuckDB-oracle
  * contract), null behavior for short docs, and both execution paths. */
class MinHashSignatureSpec extends SparkTestBase {
  import spark.implicits._

  private val k = 8
  private val coeffs = Text.minhashCoeffs(k)

  private def sigExpr(toksCol: String) =
    ColumnBridge.column(MinHashSignature(
      ColumnBridge.expr(col(toksCol)), 3,
      coeffs.map(_._1).toArray, coeffs.map(_._2).toArray))

  test("matches the explode + min-aggregate formulation exactly") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs"),
      (3L, "the quick brown fox jumps over the lazy cat")).toDF("doc_id", "text")
    val viaExpr = docs
      .select(col("doc_id"), Text.tokens(col("text")).as("toks"))
      .select(col("doc_id"), sigExpr("toks").as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    // reference shape: explode shingles, hash, k mins
    val ex = docs
      .select(col("doc_id"), explode_outer(
        Text.wordShingles(col("text"), 3)).as("g"))
      .select(col("doc_id"),
        conv(substring(md5(col("g")), 1, 7), 16, 10).cast("long").as("h"))
    val minima = coeffs.zipWithIndex.map { case ((a, b), i) =>
      min(pmod(col("h") * lit(a) + lit(b), lit(Text.MH_P))).as(s"m$i")
    }
    val viaAgg = ex.groupBy(col("doc_id"))
      .agg(minima.head, minima.tail: _*)
      .select(col("doc_id"), array((0 until k).map(i => col(s"m$i")): _*).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(viaExpr === viaAgg)
    assert(viaExpr(1L) !== viaExpr(2L), "different docs differ")
    assert(viaExpr(1L).zip(viaExpr(3L)).count { case (a, b) => a == b } > 0,
      "near-dup docs share signature positions")
  }

  test("fewer than shingleLen tokens yields a NULL signature") {
    val docs = Seq((1L, "only two"), (2L, "a full three tokens")).toDF("doc_id", "text")
    val out = docs
      .select(col("doc_id"), Text.tokens(col("text")).as("toks"))
      .select(col("doc_id"), sigExpr("toks").as("sig"))
    val rows = out.collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(rows === Map(1L -> true, 2L -> false))
  }

  test("interpreted eval path agrees with codegen") {
    // force the interpreted path through the expression's eval directly
    val toks = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      Array("a", "b", "c", "d").map(org.apache.spark.unsafe.types.UTF8String.fromString))
    val viaEval = MinHashSignature.compute(
      toks, 3, coeffs.map(_._1).toArray, coeffs.map(_._2).toArray)
    val viaDf = Seq((1L, "a b c d")).toDF("doc_id", "text")
      .select(Text.tokens(col("text")).as("toks"))
      .select(sigExpr("toks").as("sig"))
      .as[Seq[Long]].head()
    assert(viaEval.toLongArray().toSeq === viaDf)
  }
}
