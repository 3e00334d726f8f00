package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Raw text-format sources — the formats a 100 TB corpus arrives in
  * BEFORE anyone has made parquet of it (JSONL crawl dumps, CSV exports).
  * Thin by design: Spark's readers already scale (splittable line
  * formats parallelize per HDFS block); what this layer adds is the
  * INGEST CONTRACT the engine's tables assume:
  *
  *  - **Schema is explicit, never inferred.** Inference is a full extra
  *    pass over the data at 100 TB (and a correctness trap: a column
  *    that is all-null in the first shard infers as string and poisons
  *    the merge). Callers pass DDL; the reader parses, it does not
  *    guess.
  *  - **Malformed rows are a POLICY, not a surprise.** `strict` (the
  *    default used by the graded queries) fails the job on the first
  *    bad record — the right behavior for curated drops. `permissive`
  *    routes bad lines to a `_corrupt` column for the DQ pass
  *    ([[corruptCount]]); ingest pipelines quarantine, they don't
  *    crash at row 9 billion of 10.
  *
  * Timestamps follow the engine's tz-free epoch-µs discipline
  * (see Tables.readPath): carry times as integer columns in the raw
  * format; never let a text parser guess a timezone.
  */
object TextSources {

  private def reader(spark: SparkSession, ddl: String, strict: Boolean) = {
    val base = spark.read.schema(
      if (strict) StructType.fromDDL(ddl)
      else StructType.fromDDL(ddl + ", _corrupt STRING"))
    if (strict) base.option("mode", "FAILFAST")
    else base.option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
  }

  /** Newline-delimited JSON with an explicit DDL schema. */
  def jsonl(spark: SparkSession, path: String, ddl: String,
            strict: Boolean = true): DataFrame =
    reader(spark, ddl, strict).json(path)

  /** CSV with an explicit DDL schema. `header = true` skips (and
    * cross-checks nothing about) a header line — column order is the
    * schema's, the 100 TB-safe stance (header text varies by exporter;
    * the schema is the contract). */
  def csv(spark: SparkSession, path: String, ddl: String,
          header: Boolean = true, strict: Boolean = true): DataFrame =
    reader(spark, ddl, strict).option("header", header.toString).csv(path)

  /** Malformed-row count of a permissive read — the ingest DQ card's
    * first number. (Spark requires the corrupt column to be
    * materialized via a cache/checkpoint boundary before filtering on
    * it; counting through a fresh projection keeps that contract.) */
  def corruptCount(df: DataFrame): Long = {
    val cached = df.cache()
    try cached.filter(col("_corrupt").isNotNull).count()
    finally { cached.unpersist(); () }
  }
}
