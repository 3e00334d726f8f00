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

  /** One warning per JVM when a non-UTC session timezone is pinned. */
  private val tzWarned = new java.util.concurrent.atomic.AtomicBoolean(false)

  private def read(spark: SparkSession, sfDir: String, name: String): DataFrame =
    readPath(spark, s"$sfDir/$name.parquet")

  /** Single entry point for every parquet scan this object issues —
    * session-level read conf lives here, not at call sites. */
  private[graft] def readPath(spark: SparkSession, path: String): DataFrame = {
    // nanosAsLong is session-level; ensure it even if the caller built a
    // bare session (harmless if already set).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // The engine's time semantics are epoch-µs (the reference's native
    // precision) — tz-free by definition. Every session-tz-dependent
    // derivation downstream (NTZ→instant casts in normalizeEvents,
    // to_date/date_format in queries) is only correct under UTC, which
    // GraftSession.tune pins; pin it here too so a BARE session gets
    // identical values instead of silently tz-shifted ones. The
    // partition key stays tz-free arithmetic regardless (storedTsDay) —
    // this is defense-in-depth, not the only guard.
    //
    // PUBLIC API CONTRACT: this mutation is SESSION-GLOBAL — it also
    // affects non-Graft timestamp queries run later in the same
    // session. A deliberately non-UTC session gets one warning (not
    // one per scan) rather than a silent clobber; Graft's own
    // correctness requires the pin, so it is applied regardless.
    val tz = spark.conf.get("spark.sql.session.timeZone")
    if (tz != "UTC") {
      if (tzWarned.compareAndSet(false, true))
        System.err.println(
          s"[graft] pinning spark.sql.session.timeZone=UTC for the session (was $tz); " +
          "Graft time semantics are tz-free epoch-µs — see Tables.readPath")
      spark.conf.set("spark.sql.session.timeZone", "UTC")
    }
    spark.read.parquet(path)
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

  /** Raw events scan (ts left exactly as stored). */
  def read_events_raw(s: SparkSession, d: String): DataFrame =
    read(s, d, "events")

  /** Events with the envelope normalized, independent of how the corpus
    * writer encoded the timestamp. Observed encodings of the stored `ts`:
    *   - INT64 TIMESTAMP(NANOS): surfaces as a raw nanos Long under
    *     `nanosAsLong` (or a writer emitting a plain BIGINT of nanos),
    *   - parquet `timestamp[us]` (±UTC adjustment): surfaces as
    *     TimestampType or TimestampNTZType.
    * We branch on the SCANNED dtype, not on an assumption about the file,
    * so a testdata regeneration cannot break the surface. Output columns:
    *   - `ts_ns`   epoch nanoseconds (exact when stored as nanos,
    *               µs-precision otherwise),
    *   - `ts_us`   epoch microseconds (the reference's native precision,
    *               FIXTURES.md §1),
    *   - `ts`      TimestampType at µs,
    *   - `k`       the payload's order key extracted from `props` JSON.
    */
  def events(s: SparkSession, d: String): DataFrame =
    normalizeEvents(read(s, d, "events"))

  /** S2 look-back: events at-or-after `cutoffUs`, with the cutoff applied
    * to the STORED column so the predicate reaches the parquet scan
    * (`PushedFilters` → file/row-group pruning at 100 TB). A filter on a
    * derived column (`ts_us`) cannot push down; this helper translates the
    * µs cutoff into the file's own encoding before normalization. */
  def eventsSince(s: SparkSession, d: String, cutoffUs: Long): DataFrame =
    normalizeEvents(storedTsAtLeast(read(s, d, "events"), cutoffUs))

  /** The µs cutoff translated into the scan's OWN ts encoding, so the
    * predicate constant-folds to a literal of the stored type and
    * reaches the parquet reader as a PushedFilter. */
  private def storedTsAtLeast(raw: DataFrame, cutoffUs: Long): DataFrame =
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.filter(col("ts") >= cutoffUs * 1000L)
      case dt => // timestamp-typed: constant-folds to a literal of the scan's own type
        raw.filter(col("ts") >= timestamp_micros(lit(cutoffUs)).cast(dt))
    }

  /** UTC day of the stored ts, in the file's own encoding — the
    * partition key [[writeEventsPartitioned]] lays the log out by.
    *
    * Deliberately SESSION-TIMEZONE-FREE: the key is pure epoch-day
    * arithmetic (`date_from_unix_date(epoch_us DIV 86_400e6)`), never
    * `to_date(timestamp)` — the latter converts through the session
    * timezone, so a bare non-UTC session would lay the log out on
    * shifted day boundaries and [[eventsSincePartitioned]]'s UTC
    * cutoff could then prune a directory still holding rows at/after
    * the cutoff (silent row loss). `unix_micros` reads the instant's
    * UTC micros regardless of session tz; NTZ wall-times are treated
    * as UTC (the corpus convention). Domain is post-1970, so integer
    * DIV ≡ floor here. */
  private def storedTsDay(raw: DataFrame): org.apache.spark.sql.Column =
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => // raw nanos
        expr("date_from_unix_date(CAST(ts DIV 86400000000000 AS INT))")
      case org.apache.spark.sql.types.TimestampNTZType =>
        // NTZ→date is wall-clock truncation, tz-free by construction
        to_date(col("ts"))
      case _ => // instant-typed: unix_micros is tz-free
        expr("date_from_unix_date(CAST(unix_micros(ts) DIV 86400000000 AS INT))")
    }

  /** Rewrite the flat events file into the `dt=<DATE>`-partitioned
    * layout a 100 TB log actually ships in (the Scale note above). The
    * stored `ts` column keeps its original encoding — partitioning
    * changes the directory layout, never the value encoding, so both
    * readers below keep their dtype branch. */
  def writeEventsPartitioned(s: SparkSession, d: String, outPath: String): Unit = {
    val raw = read(s, d, "events")
    raw.withColumn("dt", storedTsDay(raw))
      .write.mode("overwrite").partitionBy("dt").parquet(outPath)
  }

  /** [[eventsSince]] over a [[writeEventsPartitioned]] layout — the
    * look-back cutoff lands TWICE, once per pruning tier:
    *   - on the `dt` PARTITION column (`PartitionFilters`): directories
    *     before the cutoff's UTC day are pruned at listing time and
    *     never become scan splits — the tier that makes a 30-day
    *     look-back on a 10-year log read 1% of it;
    *   - on the stored `ts` column (`PushedFilters`): row-group stats
    *     prune inside the surviving partitions (day granularity is
    *     coarse; the cutoff usually falls mid-day).
    * PartitionPruneSpec asserts both filters and the strict-subset
    * directory read on each ts encoding. */
  def eventsSincePartitioned(s: SparkSession, path: String, cutoffUs: Long): DataFrame = {
    val raw = readPath(s, path)
    val cutoffDay = java.time.LocalDate.ofEpochDay(
      Math.floorDiv(cutoffUs, 86400000000L))
    // LocalDate literal: a DateType value is a plain epoch-day count, so
    // the partition-filter compare is tz-free end to end (the dt key
    // itself is tz-free — see storedTsDay).
    val pruned = raw.filter(col("dt") >= lit(cutoffDay))
    normalizeEvents(storedTsAtLeast(pruned, cutoffUs)).drop("dt")
  }

  private def normalizeEvents(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val withUs = raw.schema("ts").dataType match {
      case LongType =>
        raw
          .withColumnRenamed("ts", "ts_ns")
          .withColumn("ts_us", expr("ts_ns DIV 1000")) // integer div: / would go through double and lose ns precision
          .withColumn("ts", timestamp_micros(col("ts_us")))
      case TimestampType | TimestampNTZType =>
        // NTZ → TIMESTAMP is value-identity under the pinned UTC session;
        // unix_micros is defined on TIMESTAMP only, hence the cast.
        raw
          .withColumn("ts", col("ts").cast(TimestampType))
          .withColumn("ts_us", unix_micros(col("ts")))
          .withColumn("ts_ns", col("ts_us") * 1000L)
      case other =>
        throw new IllegalArgumentException(
          s"events.ts has unsupported type $other (expected BIGINT nanos or a timestamp)")
    }
    withUs.withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
  }
}
