package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout clustering for multi-column scan pruning — the write-side
  * half of "pushdown reaches the scan": parquet keeps min/max stats per
  * row group, so a range-partitioned sort on ONE column leaves every
  * other column's per-file range at full width (predicates on it prune
  * nothing). Interleaving the bits of two key columns into a Morton
  * (Z-order) value and range-partitioning on THAT bounds both columns'
  * ranges per file — both predicates prune (the layout behind Delta's
  * OPTIMIZE ZORDER; `LayoutSpec` measures the range narrowing).
  *
  * The interleave is the classic magic-number bit spread — pure integer
  * ops, whole-stage codegen, and bit-identical in any engine with shifts
  * (`q_zorder` mirrors it 1:1 in DuckDB SQL).
  */
object Layout {

  /** Spread the low 16 bits of `x` to even bit positions 0,2,..,30. */
  private def spread16(x: Column): Column = {
    val a = x.bitwiseAND(lit(0xFFFFL))
    val b = a.bitwiseOR(shiftleft(a, 8)).bitwiseAND(lit(0x00FF00FFL))
    val c = b.bitwiseOR(shiftleft(b, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val d = c.bitwiseOR(shiftleft(c, 2)).bitwiseAND(lit(0x33333333L))
    d.bitwiseOR(shiftleft(d, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton code of the low 16 bits of two non-negative keys
    * (`a` on even bits, `b` on odd). Wider keys: normalize to 16-bit
    * rank buckets first — pruning needs locality, not full precision. */
  def morton2(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** Small-files compaction: re-layout a parquet directory into
    * ~`targetBytes` output files (the OPTIMIZE half of lakehouse table
    * maintenance — a streaming sink that commits every trigger leaves
    * thousands of KB-files whose open/footer cost dominates scans).
    * File count = ceil(current on-disk bytes / targetBytes), parquet
    * compression carrying over ≈1:1. Returns the repartitioned frame —
    * caller writes it (optionally through [[zorderBy]] first: compact
    * AND cluster in the same rewrite). Round-robin repartition, not
    * coalesce: coalesce(n) would chain upstream parallelism down to n
    * for every stage before the write. */
  def compactionPartitions(spark: org.apache.spark.sql.SparkSession,
                           dir: String, targetBytes: Long): Int = {
    require(targetBytes > 0)
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(path).getLength
    math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
  }

  def compact(df: DataFrame, dir: String, targetBytes: Long): DataFrame =
    df.repartition(compactionPartitions(df.sparkSession, dir, targetBytes))

  /** Cluster `df` for scans filtering on BOTH `a` and `b`: range-
    * partition + sort by the interleaved key, so each output file holds
    * a small rectangle of the (a, b) space. Map-only apart from the one
    * range exchange any re-layout needs; write the result with
    * `.write.parquet` to materialize the layout. */
  def zorderBy(df: DataFrame, a: String, b: String,
               numPartitions: Int): DataFrame = {
    val z = morton2(col(a), col(b)).as("_z")
    df.withColumn("_z", z)
      .repartitionByRange(numPartitions, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
  }
}
