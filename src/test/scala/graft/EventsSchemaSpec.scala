package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Envelope contract pin: `Tables.events` must yield the same normalized
  * schema (`ts_us: BIGINT`, `ts_ns: BIGINT`, `ts: TIMESTAMP`, `k: BIGINT`)
  * and the same VALUES no matter how the corpus writer encoded the stored
  * timestamp. Round 6 lost 20 queries to a silent testdata regeneration
  * (INT64 nanos → parquet timestamp[us]); this suite makes that class of
  * breakage a test failure instead of a runtime surprise.
  *
  * Covered encodings:
  *   1. whatever `/root/testdata` currently ships (the production read),
  *   2. a synthesized raw-BIGINT-nanos file (how TIMESTAMP(NANOS) surfaces
  *      under `nanosAsLong`, and how a long-writing producer looks),
  *   3. a synthesized TIMESTAMP (µs, UTC-adjusted) file,
  *   4. a synthesized TIMESTAMP_NTZ file (pyarrow timestamp[us] without
  *      UTC adjustment — the current testdata's encoding).
  */
class EventsSchemaSpec extends SparkTestBase {
  import graft.core.Tables

  private def assertNormalized(df: org.apache.spark.sql.DataFrame): Unit = {
    val s = df.schema
    assert(s("ts_us").dataType == LongType, s"ts_us must be BIGINT, got ${s("ts_us").dataType}")
    assert(s("ts_ns").dataType == LongType, s"ts_ns must be BIGINT, got ${s("ts_ns").dataType}")
    assert(s("ts").dataType == TimestampType, s"ts must be TIMESTAMP, got ${s("ts").dataType}")
    assert(s("k").dataType == LongType, s"k must be BIGINT, got ${s("k").dataType}")
  }

  test("real testdata: normalized schema + ts_us agrees with the stored timestamp") {
    val ev = Tables.events(spark, sf0001)
    assertNormalized(ev)
    // golden cross-check against the raw scan, independent of encoding:
    // epoch-µs of the first event by event_id must equal ts_us.
    val raw = Tables.read_events_raw(spark, sf0001)
    val expectedUs = raw.schema("ts").dataType match {
      case LongType => raw.orderBy("event_id").select(expr("ts DIV 1000")).head().getLong(0)
      case _ => raw.orderBy("event_id")
        .select(unix_micros(col("ts").cast(TimestampType))).head().getLong(0)
    }
    val gotUs = ev.orderBy("event_id").select("ts_us").head().getLong(0)
    assert(gotUs == expectedUs, s"first-row ts_us $gotUs != stored $expectedUs")
    assert(gotUs > 1600000000000000L && gotUs < 2000000000000000L,
      s"ts_us $gotUs not in a plausible 2020..2033 epoch-µs range — unit slip?")
  }

  // one logical row rendered into each physical encoding; every branch
  // must normalize it to the identical (ts_us, ts_ns-at-µs, k) values
  private val usVal = 1705708800123456L // 2024-01-20T00:00:00.123456Z

  private def writeAndRead(dirName: String)(writeDf: String => Unit): org.apache.spark.sql.DataFrame = {
    val dir = java.nio.file.Files.createTempDirectory(dirName).toString
    writeDf(dir)
    Tables.events(spark, dir)
  }

  private def checkOneRow(ev: org.apache.spark.sql.DataFrame, expectNs: Long): Unit = {
    assertNormalized(ev)
    val r = ev.select("ts_us", "ts_ns", "k").head()
    assert(r.getLong(0) == usVal, s"ts_us ${r.getLong(0)} != $usVal")
    assert(r.getLong(1) == expectNs, s"ts_ns ${r.getLong(1)} != $expectNs")
    assert(r.getLong(2) == 7L)
  }

  test("synthesized BIGINT-nanos encoding normalizes identically") {
    import spark.implicits._
    val ev = writeAndRead("graft-ev-ns") { dir =>
      Seq((1L, usVal * 1000L + 789L, 42L, "view", 1.0, """{"k":7}"""))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
    }
    // nanos branch keeps sub-µs digits in ts_ns and truncates ts_us
    checkOneRow(ev, usVal * 1000L + 789L)
  }

  test("synthesized TIMESTAMP (µs) encoding normalizes identically") {
    import spark.implicits._
    val ev = writeAndRead("graft-ev-ts") { dir =>
      Seq((1L, usVal, 42L, "view", 1.0, """{"k":7}"""))
        .toDF("event_id", "us", "user_id", "event_type", "value", "props")
        .withColumn("ts", timestamp_micros(col("us"))).drop("us")
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
    }
    checkOneRow(ev, usVal * 1000L)
  }

  test("synthesized TIMESTAMP_NTZ encoding normalizes identically") {
    import spark.implicits._
    val ev = writeAndRead("graft-ev-ntz") { dir =>
      Seq((1L, usVal, 42L, "view", 1.0, """{"k":7}"""))
        .toDF("event_id", "us", "user_id", "event_type", "value", "props")
        .withColumn("ts", timestamp_micros(col("us")).cast(TimestampNTZType)).drop("us")
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
    }
    checkOneRow(ev, usVal * 1000L)
  }

  test("eventsSince pushes the cutoff to the scan and matches a post-filter") {
    val cutoff = 1705708800000000L
    val viaSince = Tables.eventsSince(spark, sf0001, cutoff)
    val viaPost = Tables.events(spark, sf0001).filter(col("ts_us") >= cutoff)
    assert(viaSince.count() == viaPost.count())
    // the predicate must appear in PushedFilters on the parquet scan
    val plan = viaSince.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [") && plan.contains("GreaterThanOrEqual(ts"),
      s"cutoff not pushed to scan:\n$plan")
  }
}
