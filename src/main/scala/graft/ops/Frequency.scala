package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import graft.functions.expr.MisraGries

/** Frequent-items (heavy hitters) over a grouped corpus — the sketch
  * analog of the exact `Deltas.count`/`threshold` path for columns
  * whose cardinality makes an exact count a full-key-set shuffle.
  *
  * Built on the [[MisraGries]] native aggregate: O(capacity) state per
  * group, map-side combine, deterministic results (see the expression's
  * exact-regime contract — `q_heavy_hitters` oracle-checks it). The
  * summary array comes out of the aggregate already ranked, so top-k
  * is a `slice` + `posexplode` projection: NO window, no extra
  * exchange beyond the one group-by shuffle of O(capacity) summaries.
  */
object Frequency {

  /** The raw MG summary column: array<struct<item,cnt>> sorted
    * (cnt desc, item asc), at most `capacity` entries. */
  def mgSummary(item: Column, capacity: Int): Column =
    ColumnBridge.column(
      MisraGries(ColumnBridge.expr(item), capacity).toAggregateExpression())

  /** Top-k most frequent `itemCol` values per `groupCols` group.
    * Output: (groupCols..., item, cnt, rank) with rank 1 = most
    * frequent; ties rank by item ascending. Exact whenever each
    * group's distinct-item count is ≤ capacity; otherwise cnt is a
    * lower bound within N/(capacity+1) of truth. */
  def heavyHitters(df: DataFrame, groupCols: Seq[String], itemCol: String,
                   capacity: Int, k: Int): DataFrame = {
    require(k >= 1 && k <= capacity, s"need 1 <= k=$k <= capacity=$capacity")
    val gcols = groupCols.map(col)
    df.groupBy(gcols: _*)
      .agg(mgSummary(col(itemCol).cast("string"), capacity).as("hh"))
      .select(gcols :+ posexplode(slice(col("hh"), 1, k)): _*)
      .select(gcols ++ Seq(col("col.item").as("item"), col("col.cnt").as("cnt"),
        (col("pos") + 1).cast("long").as("rank")): _*)
  }
}
