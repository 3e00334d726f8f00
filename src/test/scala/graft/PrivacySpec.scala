package graft

import graft.ops.Privacy

/** k-anonymity / l-diversity audit semantics on hand fixtures. */
class PrivacySpec extends SparkTestBase {
  import spark.implicits._

  private val rows = Seq(
    // group (1, "A"): 3 rows, sensitive {10, 10, 20} -> n=3, l=2
    (1, "A", 10L), (1, "A", 10L), (1, "A", 20L),
    // group (1, "B"): 1 row, uniform -> n=1, l=1
    (1, "B", 10L),
    // group (2, "A"): 4 rows, all distinct -> n=4, l=4
    (2, "A", 1L), (2, "A", 2L), (2, "A", 3L), (2, "A", 4L)
  ).toDF("nation", "seg", "bal")

  test("group counts, distinct-sensitive counts, and both risk flags") {
    val audit = Privacy.kAnonymityAudit(rows, Seq("nation", "seg"), "bal",
        k = 3L, l = 2L)
      .collect().map(r => (r.getInt(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(audit((1, "A")) === ((3L, 2L, 0L, 0L)), "meets both thresholds")
    assert(audit((1, "B")) === ((1L, 1L, 1L, 1L)), "fails k AND l")
    assert(audit((2, "A")) === ((4L, 4L, 0L, 0L)))
  }

  test("k-anonymity alone misses a uniform-sensitive group; l-diversity flags it") {
    // 5 rows sharing a quasi-id, sensitive uniform: k=3 satisfied, l=2 not
    val uniform = Seq.fill(5)((9, "X", 42L)).toDF("nation", "seg", "bal")
    val r = Privacy.kAnonymityAudit(uniform, Seq("nation", "seg"), "bal",
      k = 3L, l = 2L).collect().head
    assert(r.getLong(2) === 5L && r.getLong(4) === 0L, "k passes")
    assert(r.getLong(3) === 1L && r.getLong(5) === 1L,
      "uniform sensitive value is the leak k-anonymity cannot see")
  }

  test("no row-level output: result grain is the quasi-identifier domain") {
    val audit = Privacy.kAnonymityAudit(rows, Seq("nation", "seg"), "bal", 2L, 2L)
    assert(audit.columns.toSeq ===
      Seq("nation", "seg", "n", "l", "k_risk", "l_risk"))
    assert(audit.count() === 3L)
  }

  test("randomizedResponse: debias identity holds exactly; estimate tracks truth at scale") {
    import org.apache.spark.sql.functions.col
    val df = (1L to 8000L).map(i => (i, "g", i % 5 == 0)) // 20% true
      .toDF("uid", "grp", "bit")
    val r = Privacy.randomizedResponse(df, Seq("grp"),
        "bit", "uid", "s1", kNum = 1, kBits = 2).collect().head
    val (n, obs, est, truth) = (r.getAs[Long]("n"), r.getAs[Long]("obs"),
      r.getAs[Double]("est_true"), r.getAs[Long]("true_pos"))
    assert(n === 8000L && truth === 1600L)
    // the estimator IS the stated identity over the observed count
    assert(est === (obs.toDouble - 0.25 * n.toDouble) / 0.5)
    // with ~8000 reports at p=1/4, std err ≈ sqrt(n·p(1−p))/(1−2p) ≈ 77;
    // allow 4 sigma
    assert(math.abs(est - truth) < 320.0, s"est $est vs truth $truth")
    // per-report plausible deniability: some reports actually flipped
    assert(obs !== truth, "the mechanism must actually add noise")
  }

  test("randomizedResponse: flips are a pure function of (uid, salt); p outside (0, 1/2) rejected") {
    import org.apache.spark.sql.functions.col
    val df = (1L to 100L).map(i => (i, "g", i % 2 == 0)).toDF("uid", "grp", "bit")
    val a = Privacy.randomizedResponse(df, Seq("grp"), "bit", "uid", "sX", 1, 2)
      .collect().head.getAs[Long]("obs")
    val b = Privacy.randomizedResponse(df, Seq("grp"), "bit", "uid", "sX", 1, 2)
      .collect().head.getAs[Long]("obs")
    assert(a === b, "same salt must reproduce the same reports")
    intercept[IllegalArgumentException] {
      Privacy.randomizedResponse(df, Seq("grp"), "bit", "uid", "s", 2, 2)
    }
  }
}
