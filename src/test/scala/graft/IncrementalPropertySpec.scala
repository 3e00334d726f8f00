package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.streaming.DqStream

/** Property form of the round-10 incremental contracts: for ARBITRARY
  * batch splits, the incremental result must equal the one-shot batch
  * result — the 3-slice fixture tests pin one split; these sample
  * many. (Raw scalacheck generators with fixed seeds, sampled in a
  * loop — the scalatestplus bridge is not on the offline classpath.) */
class IncrementalPropertySpec extends SparkTestBase {
  import spark.implicits._

  private def gen[A](g: Gen[A], seed: Long): A =
    g(Gen.Parameters.default, Seed(seed)).get

  test("simhashStoreAppend ≡ one-shot simhashNearDup under random batch splits (property)") {
    // small vocab so near-dups are common; doc = 4-10 tokens
    val token = Gen.oneOf("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta")
    val doc = Gen.choose(4, 10).flatMap(n =>
      Gen.listOfN(n, token).map(_.mkString(" ")))
    (0 until 4).foreach { round =>
      val texts = gen(Gen.listOfN(40, doc), 100L + round)
      val docs = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val nBatches = 1 + round % 3 + 1 // 2..4 batches (and one 2 again)
      val assign = gen(Gen.listOfN(40, Gen.choose(0, nBatches - 1)), 200L + round)
      val dir = java.nio.file.Files.createTempDirectory(s"prop_ss_$round").toString
      val emitted = (0 until nBatches).map { b =>
        val ids = assign.zipWithIndex.collect { case (a, i) if a == b => i.toLong }
        graft.ops.Dedup.simhashStoreAppend(
          docs.filter(col("doc_id").isin(ids: _*)), dir, f"b$b%03d")
          .as[(Long, Long, Long)].collect().toSet
      }
      val oneShot = graft.ops.Dedup.simhashNearDup(docs, maxHamming = 3)
        .as[(Long, Long, Long)].collect().toSet
      assert(emitted.map(_.size).sum === emitted.reduce(_ ++ _).size,
        s"round $round: a pair emitted from two batches (split $assign)")
      assert(emitted.reduce(_ ++ _) === oneShot,
        s"round $round: incremental != one-shot (split $assign)")
    }
  }

  test("DqStream streamed report ≡ batchReport under random splits and data (property)") {
    val dim = Seq(1L, 2L, 3L, 4L).toDF("c_id")
    val checks = Seq(
      DqStream.NullCheck("nulls", "v"),
      DqStream.NonPositiveCheck("nonpos", "q"),
      DqStream.DupKeyCheck("dups", "k"),
      DqStream.OrphanCheck("orphans", "v", dim, "c_id"),
      DqStream.RangeCheck("range", "q", 0.0, 5.0),
      DqStream.MatchCheck("fmt", "v", "[1-3]"))
    val row = for {
      k <- Gen.choose(1L, 12L)           // collisions likely
      v <- Gen.oneOf(Gen.const(null: java.lang.Long),
        Gen.choose(1L, 6L).map(Long.box)) // nulls + some orphans (5,6)
      q <- Gen.choose(-2L, 8L)
    } yield (Long.box(k), v, Long.box(q))
    (0 until 4).foreach { round =>
      val rows = gen(Gen.listOfN(30, row), 300L + round)
      val df = rows.toDF("k", "v", "q")
      val nBatches = 2 + round % 3
      val assign = gen(Gen.listOfN(30, Gen.choose(0, nBatches - 1)), 400L + round)
      val dir = java.nio.file.Files.createTempDirectory(s"prop_dq_$round").toString
      (0 until nBatches).foreach { b =>
        val slice = rows.zip(assign).collect { case (r, a) if a == b => r }
        DqStream.processBatch(slice.toDF("k", "v", "q"), dir, f"b$b", checks)
      }
      val streamed = DqStream.report(spark, dir, checks)
        .as[(String, Long)].collect().toMap
      val oneShot = DqStream.batchReport(df, checks)
        .as[(String, Long)].collect().toMap
      assert(streamed === oneShot,
        s"round $round: $streamed != $oneShot (split $assign)")
    }
  }
}
