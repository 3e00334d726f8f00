package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.ops.Linkage

/** Properties of blocked linkage on random name tables (raw scalacheck
  * generators with fixed seeds):
  *  - best-match agrees with a brute-force within-block minimum
  *    (distance first, master id on ties);
  *  - blocking soundness: records added in OTHER blocks never change
  *    any verdict (the property that lets block count scale freely);
  *  - pair symmetry: blockedPairs equals the brute-force within-block
  *    pair set with id_a < id_b.
  */
class LinkagePropertySpec extends SparkTestBase {
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def names(seed: Long, count: Int): Seq[String] = {
    val g = Gen.choose(3, 7).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    (0 until count).flatMap(i => g(Gen.Parameters.default, Seed(seed + i)))
  }

  test("blockedBestMatch ≡ brute-force within-block minimum (property)") {
    for (s <- 1 to 3) {
      val master = names(100L * s, 14).zipWithIndex
        .map { case (nm, i) => (i.toLong + 1, i % 2, nm) }
      val probes = names(5000L * s, 8).zipWithIndex
        .map { case (nm, i) => (100L + i, i % 2, nm) }
      val got = Linkage.blockedBestMatch(
          probes.toDF("pid", "blk", "pname"), master.toDF("id", "blk", "name"),
          Seq("blk"), "pid", "pname", "id", "name", maxDist = 2)
        .collect()
        .map(r => r.getAs[Long]("probe_id") ->
          ((r.getAs[Long]("master_id"), r.getAs[Long]("dist"),
            r.getAs[Long]("n_candidates")))).toMap
      val expect = probes.flatMap { case (pid, blk, pname) =>
        val cand = master.filter(m => m._2 == blk && lev(pname, m._3) <= 2)
          .map(m => (lev(pname, m._3).toLong, m._1))
        if (cand.isEmpty) None
        else {
          val best = cand.min // (dist, id) lexicographic = the contract
          Some(pid -> ((best._2, best._1, cand.size.toLong)))
        }
      }.toMap
      assert(got === expect, s"seed $s")
      spark.catalog.clearCache()
    }
  }

  test("blocking soundness: foreign-block records never change verdicts") {
    val master = names(42L, 12).zipWithIndex
      .map { case (nm, i) => (i.toLong + 1, 0, nm) }
    val probes = names(4242L, 6).zipWithIndex
      .map { case (nm, i) => (100L + i, 0, nm) }
    def run(m: Seq[(Long, Int, String)]) = Linkage.blockedBestMatch(
        probes.toDF("pid", "blk", "pname"), m.toDF("id", "blk", "name"),
        Seq("blk"), "pid", "pname", "id", "name", maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val base = run(master)
    // inject EXACT COPIES of every probe name into a different block —
    // would dominate every verdict if blocking leaked
    val decoys = probes.zipWithIndex.map { case ((_, _, nm), i) => (900L + i, 7, nm) }
    assert(run(master ++ decoys) === base)
  }

  test("blockedPairs ≡ brute-force within-block pairs (property)") {
    for (s <- 1 to 3) {
      val recs = names(300L * s, 16).zipWithIndex
        .map { case (nm, i) => (i.toLong + 1, i % 3, nm) }
      val got = Linkage.blockedPairs(recs.toDF("id", "blk", "name"),
          Seq("blk"), "id", "name", maxDist = 1)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val expect = (for {
        a <- recs; b <- recs
        if a._1 < b._1 && a._2 == b._2 && lev(a._3, b._3) <= 1
      } yield (a._1, b._1)).toSet
      assert(got === expect, s"seed $s")
      spark.catalog.clearCache()
    }
  }
}
