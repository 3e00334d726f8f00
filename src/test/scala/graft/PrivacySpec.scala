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
}
