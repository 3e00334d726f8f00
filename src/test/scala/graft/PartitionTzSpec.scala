package graft

import org.apache.spark.sql.functions._
import graft.core.Tables

/** The ADVICE-medium row-loss repro, pinned as a test: a BARE NON-UTC
  * session writing and reading the `dt=<DATE>`-partitioned events
  * layout must get exactly the rows a UTC session gets.
  *
  * The historical bug: the partition key was derived via
  * `to_date(timestamp)`, which converts through the session timezone.
  * Under e.g. America/Los_Angeles (UTC-8), a row at 00:30:00Z lands in
  * the PREVIOUS day's directory; [[Tables.eventsSincePartitioned]]'s
  * cutoff-day prune (`dt >= utcCutoffDay`) then drops that directory
  * even though it holds rows at/after the cutoff — silent row loss.
  * The fix makes the key pure epoch-day arithmetic
  * (`date_from_unix_date(unix_micros DIV 86_400e6)`), tz-free on both
  * the write and the prune side; this suite runs the whole write+read
  * round-trip under a non-UTC session and asserts row-for-row equality
  * with the flat (never-partitioned) read. */
class PartitionTzSpec extends SparkTestBase {
  import spark.implicits._

  private val dayUs = 86400000000L
  private val day0Us = 1705708800000000L // 2024-01-20T00:00:00Z
  private val nDays = 4

  // rows deliberately clustered around UTC midnights: ±90 and +30 min
  private def baseUs = (0 until nDays * 3).map { i =>
    val off = Seq(-5400000000L, 1800000000L, 5400000000L)(i % 3)
    (i.toLong, day0Us + (i / 3 + 1) * dayUs + off,
      (i % 2).toLong, "view", 1.0, s"""{"k":${i % 5}}""")
  }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  private def check(tag: String)(encode: org.apache.spark.sql.Column): Unit = {
    val base = java.nio.file.Files.createTempDirectory(tag).toString
    baseUs.withColumn("ts", encode)
      .write.mode("overwrite").parquet(s"$base/events.parquet")
    val part = s"$base/events_by_day"
    // cutoff = exactly a UTC midnight, so the 00:30Z row one directory
    // earlier under a tz-shifted key is the canary
    val cutoffUs = day0Us + 2 * dayUs
    val tzKey = "spark.sql.session.timeZone"
    val saved = spark.conf.get(tzKey)
    val rows =
      try {
        spark.conf.set(tzKey, "America/Los_Angeles")
        Tables.writeEventsPartitioned(spark, base, part)
        Tables.eventsSincePartitioned(spark, part, cutoffUs)
          .select("event_id", "ts_us", "k")
          .collect().map(_.toString).sorted.toSeq
      } finally spark.conf.set(tzKey, saved)
    // oracle: the flat read under the pinned (UTC) session — ts_us
    // filtering is pure integer arithmetic, tz-free by construction
    val want = Tables.eventsSince(spark, base, cutoffUs)
      .select("event_id", "ts_us", "k")
      .collect().map(_.toString).sorted.toSeq
    assert(want.nonEmpty, "fixture must keep rows past the cutoff")
    assert(rows === want,
      "non-UTC partitioned round-trip must equal the UTC flat read " +
        "(a missing row here is the to_date session-tz prune bug)")
    // and the layout itself must be on UTC day boundaries: the 00:30Z
    // row of the cutoff day must sit in the cutoff day's directory
    val dirs = new java.io.File(part).listFiles()
      .filter(_.getName.startsWith("dt=")).map(_.getName).sorted.toSeq
    assert(dirs.contains("dt=2024-01-22"),
      s"expected a UTC day directory for the cutoff day, got $dirs")
  }

  test("BIGINT-nanos encoding: non-UTC session loses no rows") {
    check("evtz-ns")(col("ts") * 1000L)
  }

  test("timestamp encoding: non-UTC session loses no rows") {
    check("evtz-ts")(timestamp_micros(col("ts")))
  }

  test("timestamp_ntz encoding: non-UTC session loses no rows") {
    check("evtz-ntz")(timestamp_micros(col("ts")).cast("timestamp_ntz"))
  }
}
