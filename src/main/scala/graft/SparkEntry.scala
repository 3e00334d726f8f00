package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.Queries

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator family in SURVEY.md §2 (and the training-data ops) is
  * represented by an entry in [[queries]] with a matching DuckDB oracle in
  * [[oracleSql]]; implementations live in graft.queries.Queries with the
  * oracle SQL kept adjacent to each Spark pipeline.
  */
object SparkEntry {

  /** Flagship query (the reference's machine-dashboard view, SURVEY.md
    * §3.3) on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Queries.qDashboard._2._1(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.all.map { case (name, (impl, _)) => name -> impl }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Queries whose semantics are not
    * SQL-mirrorable (approximate sketches) carry a null sentinel and are
    * omitted — the driver records a rows-only check for those.
    *
    * Artifact-store paths are targeted at sf0.01 (the driver's gate);
    * [[graft.queries.Queries.oracleSqlFor]] retargets them for any
    * other scale (Verify substitutes its actual sfDir). */
  def oracleSql: Map[String, String] = Queries.oracleSqlFor("sf0.01")
}
