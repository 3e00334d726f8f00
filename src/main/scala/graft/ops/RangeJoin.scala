package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range) join at scale: match points `t` into intervals
  * `[start, end]` sharing join keys.
  *
  * Spark plans a raw non-equi join condition as a nested-loop join —
  * O(|points|·|intervals|) per key and a broadcast of one whole side.
  * The standard scale shape is BUCKETING: quantize time into
  * `bucketWidth`-sized cells, explode each interval onto the cells it
  * overlaps (`sequence` — codegen'd, ≤ ⌈len/width⌉+1 rows per
  * interval), equi-join points on (keys, cell) — one hash shuffle —
  * and refine with the exact BETWEEN predicate. Pick `bucketWidth`
  * near the typical interval length: one shuffled row per interval per
  * overlapped cell vs candidate precision trade.
  */
object RangeJoin {

  /** Join `points` (with `pointTime`) into `intervals` (with
    * `[start, end]`, inclusive) on equal `pointKeys`/`intervalKeys`,
    * emitting all matching pairs. All time columns are LongType
    * (epoch-µs convention). Output columns = interval columns ++ point
    * columns (both sides' non-key payloads must be distinctly named). */
  def bucketedInterval(points: DataFrame, intervals: DataFrame,
                       pointKeys: Seq[String], intervalKeys: Seq[String],
                       pointTime: Column, start: Column, end: Column,
                       bucketWidth: Long): DataFrame = {
    require(pointKeys.length == intervalKeys.length && pointKeys.nonEmpty)
    val w = lit(bucketWidth)
    val iv = intervals.withColumn("_cell",
      explode(sequence(floor(start / w).cast("long"), floor(end / w).cast("long"))))
    val pt = points.withColumn("_cell", floor(pointTime / w).cast("long"))
    val keyCond = pointKeys.zip(intervalKeys)
      .map { case (p, i) => pt(p) === iv(i) }
      .reduce(_ && _)
    iv.join(pt, keyCond && iv("_cell") === pt("_cell")
        && pointTime >= start && pointTime <= end)
      .drop("_cell")
  }
}
