package graft.core

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's required configuration.
  *
  * The knobs mirror what a 1000-executor deployment would set cluster-wide;
  * local tests only shrink parallelism numbers, never semantics:
  *   - UTC session timezone (reference events are epoch-µs UTC,
  *     reference machine-dashboard/model.rs `timestamp with time zone`).
  *   - `nanosAsLong`: the event log's parquet uses INT64 TIMESTAMP(NANOS)
  *     which Spark does not read natively; we read the raw long and
  *     normalize in [[Tables]].
  *   - AQE on: runtime coalescing + skew-join splitting is the scale story
  *     for the 100 TB target (replaces hand-tuned partition counts).
  */
object GraftSession {

  /** Apply engine defaults onto an existing builder. */
  def tune(b: SparkSession.Builder, shufflePartitions: Int): SparkSession.Builder =
    b.withExtensions(new graft.GraftExtensions) // native kernels + AS-OF strategy
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      // allow shuffled-hash join when its size conditions hold instead
      // of always preferring sort-merge (optimization guide §9/§3.1):
      // SHJ skips the per-partition sorts; the planner's size gates and
      // AQE's skew handling still bound the build side. Measured r16:
      // −8–11% on the SMJ-bearing mid-tier queries (q_hybrid_rrf,
      // q_semdedup), neutral elsewhere; results strategy-independent
      // (full oracle sweep re-verified under this setting).
      .config("spark.sql.join.preferSortMergeJoin", "false")
      // InferFiltersFromConstraints turns every non-outer explode(expr)
      // into a pushed-down `size(expr) > 0 AND isnotnull(expr)` BELOW
      // the projection that computes expr — for the interpreted
      // higher-order shingle pipelines that means re-evaluating the
      // whole array expression 2 extra times per row (measured ~2× on
      // the dedup queries). The inferred isnotnull join-key filters it
      // also generates are covered by parquet stats and join semantics.
      .config("spark.sql.constraintPropagation.enabled", "false")
      .config("spark.ui.enabled", "false")

  def local(cores: Int = 32): SparkSession = {
    val s = tune(
      SparkSession.builder().master(s"local[$cores]"),
      shufflePartitions = cores
    ).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
