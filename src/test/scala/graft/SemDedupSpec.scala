package graft

import org.apache.spark.sql.functions._
import graft.ops.{Dedup, SemDedup}

/** Semantic dedup: kernel-assignment parity with a SQL argmin,
  * keep-lowest-id pruning on a hand-built fixture, and composition over
  * the adaptive near-dup path. */
class SemDedupSpec extends SparkTestBase {
  import spark.implicits._

  // two far-apart cluster anchors in 4-d plus members at known cosines
  private val dim = 4
  private val cents: Array[Double] =
    Array(1.0, 0.0, 0.0, 0.0, /* cell 0 */
          0.0, 0.0, 0.0, 1.0) /* cell 1 */

  private def fixture = Seq(
    // cell 0: 1↔2 near (cos=1 after normalization), 3 orthogonal-ish
    (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
    (2L, Seq(2.0f, 0.0f, 0.0f, 0.0f)),
    (3L, Seq(0.9f, 0.9f, 0.0f, 0.0f)),
    // cell 1: 4↔5 near; 6 distinct
    (4L, Seq(0.0f, 0.0f, 0.1f, 1.0f)),
    (5L, Seq(0.0f, 0.0f, 0.1f, 1.0f)),
    (6L, Seq(0.0f, 1.0f, 0.0f, 1.2f)),
  ).toDF("vec_id", "embedding")

  test("assignCells matches a brute-force argmin over the model") {
    val got = SemDedup.assignCells(fixture, cents, dim)
      .select(col("vec_id"), col("cell")).as[(Long, Int)].collect().toMap
    assert(got === Map(1L -> 0, 2L -> 0, 3L -> 0, 4L -> 1, 5L -> 1, 6L -> 1))
  }

  test("semDedup keeps the lowest id of every near pair, per cell") {
    val out = SemDedup.semDedup(fixture, cents, dim, tau = 0.95)
      .as[(Long, Int)].collect().toMap
    // dropped: 2 (near 1 in cell 0), 5 (near 4 in cell 1)
    assert(out === Map(1L -> 0, 3L -> 0, 4L -> 1, 6L -> 1))
  }

  test("cells partition the pruning: near vectors in different cells both survive") {
    val split = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f, 0.9f)),  // cell 0 (closer to e_1)
      (2L, Seq(0.9f, 0.0f, 0.0f, 1.0f)),  // cell 1 — cos(1,2) ≈ 0.99 but never compared
    ).toDF("vec_id", "embedding")
    val out = SemDedup.semDedup(split, cents, dim, tau = 0.9)
      .as[(Long, Int)].collect().toMap
    assert(out === Map(1L -> 0, 2L -> 1))
  }

  test("semDedupDiverse keeps the pair member farthest from its centroid") {
    // cell 0 centroid is e1: vec 1 sits ON it, vec 2 is the same
    // direction but farther out in magnitude... direction is what cosine
    // sees, so craft radial difference via an off-axis component
    val duo = Seq(
      (1L, Seq(1.0f, 0.05f, 0.0f, 0.0f)),  // near centroid (small d2)
      (2L, Seq(1.0f, 0.40f, 0.0f, 0.0f)),  // same direction-ish, larger d2
    ).toDF("vec_id", "embedding")
    // cos(1,2) ≈ 0.93 — a near pair at tau 0.9; default keeps id 1,
    // the diverse rule keeps id 2 (farther from the centroid)
    val byId = SemDedup.semDedup(duo, cents, dim, tau = 0.9)
      .as[(Long, Int)].collect().map(_._1).toSet
    assert(byId === Set(1L))
    val diverse = SemDedup.semDedupDiverse(duo, cents, dim, tau = 0.9)
      .select(col("vec_id")).as[Long].collect().toSet
    assert(diverse === Set(2L),
      "the diversity rule keeps the edge example, not the cluster core")
    // non-near vectors survive under both rules
    val all = duo.unionAll(Seq((9L, Seq(0.0f, 0.0f, 0.0f, 1.0f)))
      .toDF("vec_id", "embedding"))
    assert(SemDedup.semDedupDiverse(all, cents, dim, tau = 0.9)
      .select(col("vec_id")).as[Long].collect().toSet === Set(2L, 9L))
  }

  test("crossSemContaminated: multi-probe catches cross-cell leakage a single probe misses") {
    // corpus c101 lands in cell 0 (L2), its near-duplicate probe p1 in
    // cell 1 — only p1's SECOND-nearest cell reaches it
    val corpus = Seq(
      (101L, Seq(1.0f, 0.0f, 0.0f, 0.8f)),  // cell 0; cos(·, p1) ≈ 0.976
      (102L, Seq(0.0f, 0.0f, 0.0f, 1.0f)),  // cell 1; orthogonal to probes
      (103L, Seq(0.0f, 0.0f, 0.9f, 1.0f)),  // cell 1; cos(·, p1) ≈ 0.58
    ).toDF("vec_id", "embedding")
    val probes = Seq(
      (1L, Seq(0.8f, 0.0f, 0.0f, 1.0f)),    // nearest cell 1, second cell 0
      (2L, Seq(0.0f, 1.0f, 0.0f, 0.0f)),    // far from everything
    ).toDF("vec_id", "embedding")
    val two = SemDedup.crossSemContaminated(corpus, probes, cents, dim,
      tau = 0.9, nProbe = 2).as[(Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(two.keySet === Set(101L) && two(101L)._1 === 1L,
      s"only the paraphrase pair crosses tau=0.9: $two")
    assert(math.abs(two(101L)._2 - 1.6 / 1.64) < 1e-5)
    val one = SemDedup.crossSemContaminated(corpus, probes, cents, dim,
      tau = 0.9, nProbe = 1).count()
    assert(one === 0L, "nProbe=1 misses the cross-cell pair — the recall knob")
    // at a looser tau the same-cell pairs (102, p1) and (103, p1) appear
    // even with nProbe=1 (cos ≈ 0.78 and 0.58)
    val loose = SemDedup.crossSemContaminated(corpus, probes, cents, dim,
      tau = 0.5, nProbe = 1).as[(Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(loose.keySet === Set(102L, 103L))
  }

  test("on real embeddings: survivors ∪ drops = corpus, survivors have no lower-id near neighbor in-cell") {
    val emb = graft.core.Tables.embeddings(spark, sf0001)
    val model = graft.ops.Pq.centroidArray(
      graft.ops.Ann.kmeansCentroids(emb, 0L until 4L, iters = 1, dim = 64), dim = 64)
    val survivors = SemDedup.semDedup(emb, model, dim = 64, tau = 0.35)
    val n = emb.count()
    val celled = SemDedup.assignCells(emb, model, dim = 64)
    val pairs = Dedup.embeddingNearDupAdaptive(celled, tau = 0.35, blockCol = "cell", dim = 64)
    val dropped = pairs.select(col("id_b")).distinct().count()
    assert(survivors.count() === n - dropped)
    // no surviving id appears as the HIGHER side of a near pair
    val bad = survivors.join(pairs, survivors("vec_id") === pairs("id_b")).count()
    assert(bad === 0L)
  }
}
