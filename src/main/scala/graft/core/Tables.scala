package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Canonical loaders for the test corpus (TESTDATA.md) and the event
  * envelope normalization.
  *
  * The reference consumes an append-only event log with envelope fields
  * (source/stream/lamport/offset/timestamp/payload — reference
  * machine-dashboard/logic.rs:16-23, runner.rs:299). The driver corpus's
  * `events` table plays that role here: `event_id` is the total order
  * (lamport analog), `user_id` the stream/entity key, `event_type` the
  * payload tag, `props` the JSON payload.
  *
  * Scale note: at 100 TB the event log would be date-partitioned parquet;
  * every loader here returns a plain scan so Catalyst can push filters
  * and prune columns/partitions — no caching, no collect.
  */
object Tables {

  private def read(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // nanosAsLong is session-level; ensure it even if the caller built a
    // bare session (harmless if already set).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** Scan with a parallelism floor for CPU-heavy downstream pipelines.
    * A parquet scan parallelizes at ROW-GROUP granularity; a small or
    * coarsely-written file yields one task, serializing all per-row
    * compute (tokenization, shingling, hashing) on one core. When the
    * scan under-splits relative to the session, redistribute once —
    * the rows crossing the wire are the raw scan output, far smaller
    * than the work they unlock. At production scale the scan yields
    * thousands of splits and this is a no-op. */
  private def readParallel(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = read(spark, sfDir, name)
    val target = spark.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < math.max(2, target / 2)) df.repartition(target)
    else df
  }

  def region(s: SparkSession, d: String): DataFrame   = read(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = read(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = read(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = read(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = read(s, d, "part")
  // relational tables stay plain scans: their per-row compute is a few
  // arithmetic ops, so a redistribution exchange costs more than the
  // single-split scan it would parallelize (measured 2x slower on q1/q5);
  // the parallelism floor pays off only where per-row work dominates
  // (tokenization/hashing over documents/embeddings)
  def orders(s: SparkSession, d: String): DataFrame   = read(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = read(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = readParallel(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = readParallel(s, d, "embeddings")

  /** Raw events scan (ts left as the stored ns Long). */
  def read_events_raw(s: SparkSession, d: String): DataFrame =
    read(s, d, "events")

  /** Events with the envelope normalized:
    *   - `ts_ns`   raw INT64 nanoseconds (as stored),
    *   - `ts_us`   epoch microseconds (the reference's native precision,
    *               FIXTURES.md §1),
    *   - `ts`      TimestampType at µs, truncated from ns,
    *   - `k`       the payload's order key extracted from `props` JSON.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = read(s, d, "events")
    raw
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts_us", expr("ts_ns DIV 1000")) // integer div: / would go through double and lose ns precision
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
  }
}
