package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multiset-with-signed-multiplicities algebra.
  *
  * The reference's core collection is a multiset of records with `isize`
  * multiplicities, and its defining operation is delta consolidation: sum
  * multiplicities per distinct record, drop zeros (reference coll.rs:89-101,
  * flow.rs:137-145). Here the encoding is a `DataFrame` with a `mult: Long`
  * column; consolidation is a hash aggregation — Spark gives partial
  * (map-side) aggregation and AQE-coalesced shuffles for free, so the same
  * operation distributes across a cluster instead of a driver-side BTreeMap.
  *
  * All ops are pure Column expressions → whole-stage codegen, no UDFs.
  */
object Deltas {

  val MULT = "mult"

  private def dataCols(df: DataFrame): Seq[Column] =
    df.columns.filterNot(_ == MULT).map(col).toSeq

  /** Lift a plain DataFrame into the delta encoding with multiplicity 1. */
  def lift(df: DataFrame): DataFrame =
    if (df.columns.contains(MULT)) df else df.withColumn(MULT, lit(1L))

  /** Consolidate: net multiplicity per distinct record, zeros eliminated
    * (reference coll.rs:89-101 `Coll::add_assign`). One shuffle on the full
    * record; map-side combine keeps the shuffle proportional to distinct
    * records per partition, not input rows.
    */
  def consolidate(df: DataFrame): DataFrame = {
    val d = lift(df)
    d.groupBy(dataCols(d): _*)
      .agg(sum(MULT).as(MULT))
      .filter(col(MULT) =!= 0L)
  }

  /** Flip multiplicity signs (reference flow.rs:364-366 `negate`);
    * `a concat b.negate` = EXCEPT ALL after consolidation. */
  def negate(df: DataFrame): DataFrame =
    lift(df).withColumn(MULT, -col(MULT))

  /** Multiset union: adds multiplicities (reference flow.rs:411-442). */
  def concat(a: DataFrame, b: DataFrame): DataFrame =
    lift(a).unionByName(lift(b))

  /** Per-record multiplicity transform (reference flow.rs:453-457
    * `threshold`); `f` sees the consolidated multiplicity. */
  def threshold(df: DataFrame, f: Column => Column): DataFrame =
    consolidate(df)
      .withColumn(MULT, f(col(MULT)).cast("long"))
      .filter(col(MULT) =!= 0L)

  /** Force multiplicity to 1 for every present record
    * (reference flow.rs:447-449 `distinct` / `distinct_total`). */
  def distinct(df: DataFrame): DataFrame =
    threshold(df, m => when(m > 0L, 1L).otherwise(0L))

  /** Per-element count: the record plus its net multiplicity
    * (reference flow.rs:460-462 `Flow::count`). */
  def count(df: DataFrame): DataFrame = consolidate(df)

  /** Snapshot differencing: deltas that turn `old` into `new`
    * (reference machine.rs:169-181 drain_deltas, batch profile). */
  def diff(newDf: DataFrame, oldDf: DataFrame): DataFrame =
    consolidate(concat(lift(newDf), negate(lift(oldDf))))
}
