package graft

import org.apache.spark.sql.functions._
import graft.core.Tables

/** The 100 TB look-back claim, proven on the partitioned layout: a
  * `dt=<DATE>`-partitioned events log read through
  * [[Tables.eventsSincePartitioned]] must (1) equal the flat
  * [[Tables.eventsSince]] read value-for-value, (2) carry the cutoff as
  * BOTH a PartitionFilter (directory prune) and a PushedFilter
  * (row-group prune), and (3) physically read a STRICT subset of the
  * day directories — on each stored ts encoding (BIGINT nanos and
  * parquet timestamp), since the testdata has shipped both. */
class PartitionPruneSpec extends SparkTestBase {
  import spark.implicits._

  private val dayUs = 86400000000L
  private val day0Us = 1705708800000000L // 2024-01-20T00:00:00Z
  private val nDays = 10

  // 10 days × 20 events, spread through each day
  private def baseUs = (0 until nDays * 20).map { i =>
    (i.toLong, day0Us + (i / 20) * dayUs + (i % 20) * 3600000000L,
      (i % 7).toLong, "view", 1.0, s"""{"k":${i % 5}}""")
  }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  private def parquetFiles(dir: java.io.File): Int =
    Option(dir.listFiles()).getOrElse(Array.empty).map { f =>
      if (f.isDirectory) parquetFiles(f)
      else if (f.getName.endsWith(".parquet")) 1 else 0
    }.sum

  private def check(tag: String)(encode: org.apache.spark.sql.Column): Unit = {
    val base = java.nio.file.Files.createTempDirectory(tag).toString
    baseUs.withColumn("ts", encode)
      .write.mode("overwrite").parquet(s"$base/events.parquet")
    val part = s"$base/events_by_day"
    Tables.writeEventsPartitioned(spark, base, part)
    val dtDirs = new java.io.File(part).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("dt="))
    assert(dtDirs.length === nDays, s"one directory per day: ${dtDirs.length}")

    // cutoff strictly INSIDE day 6: days 0-5 prune away entirely, day 6
    // prunes rows (the PushedFilters tier), days 7-9 pass whole
    val cutoffUs = day0Us + 6 * dayUs + 5 * 3600000000L + 1L
    val got = Tables.eventsSincePartitioned(spark, part, cutoffUs)
      .select("event_id", "ts_us", "ts_ns", "k")
    val gotRows = got.collect().map(_.toString).sorted.toSeq
    val wantRows = Tables.eventsSince(spark, base, cutoffUs)
      .select("event_id", "ts_us", "ts_ns", "k")
      .collect().map(_.toString).sorted.toSeq
    assert(gotRows.nonEmpty && gotRows === wantRows,
      "partitioned look-back must equal the flat eventsSince read")

    // 1) static proof — both pruning tiers in the executed plan
    val plan = got.queryExecution.executedPlan.toString
    val pf = plan.linesIterator.find(_.contains("PartitionFilters"))
      .getOrElse(fail("no PartitionFilters line in the executed plan"))
    assert("dt#\\d+".r.findFirstIn(pf).isDefined && pf.contains(">="),
      s"the day cutoff must be a partition filter: $pf")
    val pushed = plan.linesIterator.find(_.contains("PushedFilters"))
      .getOrElse(fail("no PushedFilters line in the executed plan"))
    assert(pushed.contains("GreaterThanOrEqual(ts,"),
      s"the ts cutoff must push into the parquet scan: $pushed")

    // 2) runtime proof — the collect() above populated the scan metrics:
    // exactly the files under dt >= 2024-01-26 were read (4 of 10 days)
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p.collect {
      case s: FileSourceScanExec => Seq(s)
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec => scans(q.plan)
    }.flatten
    val filesRead = scans(got.queryExecution.executedPlan)
      .headOption.getOrElse(fail("no FileSourceScanExec in the plan"))
      .metrics("numFiles").value
    val keptFiles = dtDirs.filter(_.getName >= "dt=2024-01-26")
      .map(parquetFiles).sum
    val totalFiles = dtDirs.map(parquetFiles).sum
    assert(filesRead === keptFiles.toLong && filesRead < totalFiles,
      s"expected exactly the $keptFiles surviving-day files of $totalFiles read, got $filesRead")
  }

  test("BIGINT-nanos encoding: day directories prune, ts pushes down") {
    check("evpart-ns")(col("ts") * 1000L)
  }

  test("timestamp encoding: day directories prune, ts pushes down") {
    check("evpart-ts")(timestamp_micros(col("ts")))
  }
}
