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
}
