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
}
