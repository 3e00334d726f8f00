package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.graftbridge.{ColumnBridge, DatasetBridge}
import org.apache.spark.sql.types.LongType
import graft.plans.AsOfJoin

/** AS-OF (temporal) join API over the custom [[graft.plans.AsOfJoin]]
  * operator: for each left row, the LATEST right row with equal keys and
  * `rightTime <= leftTime` (within `tolerance`, when given). Inner
  * semantics — unmatched left rows are dropped, mirroring DuckDB's
  * `ASOF JOIN` (which is also the oracle for `q_asof`).
  *
  * Requires the session to carry [[graft.GraftExtensions]] (it injects
  * the planner strategy); [[graft.core.GraftSession]] sessions do.
  * Time columns must be LongType (the engine's epoch-µs convention).
  */
object AsOf {
  def join(left: DataFrame, right: DataFrame,
           leftKeys: Seq[Column], rightKeys: Seq[Column],
           leftTime: Column, rightTime: Column,
           tolerance: Option[Long] = None): DataFrame = {
    require(leftKeys.nonEmpty && leftKeys.length == rightKeys.length,
      "as-of join needs matching non-empty key lists")
    val lt = ColumnBridge.expr(leftTime); val rt = ColumnBridge.expr(rightTime)
    require(lt.dataType == LongType && rt.dataType == LongType,
      s"as-of time columns must be LongType (epoch-µs), got ${lt.dataType}/${rt.dataType}")
    DatasetBridge.ofRows(left.sparkSession, AsOfJoin(
      DatasetBridge.analyzed(left), DatasetBridge.analyzed(right),
      leftKeys.map(ColumnBridge.expr), rightKeys.map(ColumnBridge.expr),
      lt, rt, tolerance))
  }

  /** Forward AS-OF: for each left row, the EARLIEST right row with equal
    * keys and `rightTime >= leftTime` (within `tolerance`). Implemented
    * by time negation over the backward operator — earliest-after on t
    * is latest-before on −t — so it reuses the same sort-merge exec and
    * costs one extra projection per side. Tolerance maps exactly:
    * (−t_l) − (−t_r) ≤ tol  ⇔  t_r − t_l ≤ tol. */
  def joinForward(left: DataFrame, right: DataFrame,
                  leftKeys: Seq[Column], rightKeys: Seq[Column],
                  leftTime: Column, rightTime: Column,
                  tolerance: Option[Long] = None): DataFrame = {
    val ln = left.withColumn("_asof_neg_l", -leftTime)
    val rn = right.withColumn("_asof_neg_r", -rightTime)
    join(ln, rn, leftKeys, rightKeys,
      ln("_asof_neg_l"), rn("_asof_neg_r"), tolerance)
      .drop("_asof_neg_l", "_asof_neg_r")
  }
}
