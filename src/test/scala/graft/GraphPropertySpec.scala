package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.ops.Graph

/** Properties of the graph family on random undirected graphs (raw
  * scalacheck generators with fixed seeds — the scalatestplus bridge is
  * not on the offline classpath):
  *  - PageRank mass conservation (every node has out-degree ≥ 1 under
  *    the undirected invariant, so no mass leaks);
  *  - invariance under edge duplication (the collapse step is part of
  *    the contract);
  *  - equivariance under node relabeling (ranks depend on structure,
  *    not id values — the property that makes the fixed-point-long
  *    arithmetic trustworthy: a relabeled graph must produce the SAME
  *    rank multiset, bit-for-bit);
  *  - personalized PageRank totals: reset mass is conserved and
  *    off-seed-component nodes hold exactly zero.
  */
class GraphPropertySpec extends SparkTestBase {
  import spark.implicits._

  /** random undirected edge set over ≤ n nodes, both directions emitted */
  private def undirected(seed: Long, n: Int, m: Int): Seq[(Long, Long)] = {
    val pair = for {
      a <- Gen.choose(1, n); b <- Gen.choose(1, n) if a != b
    } yield (math.min(a, b).toLong, math.max(a, b).toLong)
    val pairs = (0 until m).flatMap(i => pair(Gen.Parameters.default, Seed(seed + i)))
    (pairs ++ pairs.map(_.swap)).distinct
  }

  test("pageRank: mass conserved and positive on random undirected graphs") {
    for (s <- 1 to 4) {
      val es = undirected(1000L * s, n = 12, m = 18)
      val ranks = Graph.pageRank(es.toDF("src", "dst"), "src", "dst", iters = 5)
        .collect().map(_.getDouble(1))
      assert(math.abs(ranks.sum - 1.0) < 1e-9, s"seed $s: mass ${ranks.sum}")
      assert(ranks.forall(_ > 0), s"seed $s: every node keeps base mass")
      spark.catalog.clearCache()
    }
  }

  test("pageRank: invariant under edge duplication; equivariant under relabeling") {
    val es = undirected(77L, n = 10, m = 14)
    val base = Graph.pageRank(es.toDF("src", "dst"), "src", "dst", iters = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    spark.catalog.clearCache()
    val dup = Graph.pageRank((es ++ es ++ es).toDF("src", "dst"),
      "src", "dst", iters = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(dup === base, "duplicated edges must collapse to the same ranks")
    spark.catalog.clearCache()
    // relabel ids by an order-breaking bijection: x -> 1000 - x
    val rel = Graph.pageRank(es.map(p => (1000L - p._1, 1000L - p._2))
        .toDF("src", "dst"), "src", "dst", iters = 4)
      .collect().map(r => (1000L - r.getLong(0)) -> r.getDouble(1)).toMap
    assert(rel === base,
      "relabeled graph must produce bit-identical ranks per node")
    spark.catalog.clearCache()
  }

  test("personalizedPageRank: reset mass conserved; off-component exactly zero") {
    for (s <- 1 to 3) {
      // two disjoint components: nodes 1..8 and 101..108
      val a = undirected(500L * s, n = 8, m = 10)
      val b = undirected(900L * s, n = 8, m = 10).map(p => (p._1 + 100, p._2 + 100))
      val nodesA = a.map(_._1).toSet
      val seeds = nodesA.take(2).toSeq.map(Tuple1(_))
      val ranks = Graph.personalizedPageRank((a ++ b).toDF("src", "dst"),
          "src", "dst", seeds.toDF("part"), "part", iters = 5)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val (onA, onB) = ranks.partition(_._1 <= 100)
      assert(onB.values.forall(_ === 0.0),
        s"seed $s: unreachable component must hold exactly zero")
      assert(math.abs(onA.values.sum - 1.0) < 1e-9,
        s"seed $s: component mass ${onA.values.sum}")
      spark.catalog.clearCache()
    }
  }

  test("katzCentrality: bit-identical under relabeling; dyadic grid exactness") {
    val es = undirected(321L, n = 10, m = 14)
    val base = Graph.katzCentrality(es.toDF("src", "dst"), "src", "dst", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    spark.catalog.clearCache()
    val rel = Graph.katzCentrality(es.map(p => (1000L - p._1, 1000L - p._2))
        .toDF("src", "dst"), "src", "dst", iters = 3)
      .collect().map(r => (1000L - r.getLong(0)) -> r.getDouble(1)).toMap
    assert(rel === base, "plain double sums must still be order-free exact")
    // every value is an exact multiple of 4^-3 (the dyadic grid claim)
    base.values.foreach { v =>
      assert(v * 64.0 == math.rint(v * 64.0), s"$v is off the 1/64 grid")
    }
    spark.catalog.clearCache()
  }

  test("triangleCounts and kCore: equivariant under ARBITRARY relabeling") {
    // both are pure graph invariants — no tie-break leaks into the
    // output — so ANY bijection must map results exactly. phi is
    // non-monotone (multiplication mod a prime scrambles order).
    def phi(x: Long): Long = (x * 37L) % 1009L
    for (s <- 1 to 3) {
      val es = undirected(2000L * s, n = 14, m = 22)
      val esP = es.map { case (a, b) => (phi(a), phi(b)) }
      val tri = Graph.triangleCounts(es.toDF("src", "dst"), "src", "dst")
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      spark.catalog.clearCache()
      val triP = Graph.triangleCounts(esP.toDF("src", "dst"), "src", "dst")
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      spark.catalog.clearCache()
      assert(tri.map { case (k, v) => phi(k) -> v } === triP,
        s"seed $s: triangle counts must follow the relabeling")
      val core = Graph.kCore(es.toDF("src", "dst"), "src", "dst", k = 3L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      spark.catalog.clearCache()
      val coreP = Graph.kCore(esP.toDF("src", "dst"), "src", "dst", k = 3L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      spark.catalog.clearCache()
      assert(core.map { case (k, v) => phi(k) -> v } === coreP,
        s"seed $s: the k-core must follow the relabeling")
    }
  }

  test("labelPropagation: equivariant under MONOTONE relabeling") {
    // the smallest-label tie-break makes LPA a function of the id ORDER,
    // so equivariance holds exactly for order-preserving maps (and that
    // is the right property to pin: a non-monotone map may change which
    // label wins a tie, by design)
    def phi(x: Long): Long = 3 * x + 7
    for (s <- 1 to 3) {
      val es = undirected(3000L * s, n = 12, m = 16)
      val esP = es.map { case (a, b) => (phi(a), phi(b)) }
      val l = Graph.labelPropagation(es.toDF("src", "dst"), "src", "dst", 3)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      spark.catalog.clearCache()
      val lP = Graph.labelPropagation(esP.toDF("src", "dst"), "src", "dst", 3)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      spark.catalog.clearCache()
      assert(l.map { case (k, v) => (phi(k), phi(v)) } === lP,
        s"seed $s: labels must follow an order-preserving relabeling")
    }
  }
}
