package graft

import java.nio.file.{Files, Paths}

/** Per-query `explain("formatted")` dumps to individual files — the
  * optimization rounds' before/after evidence (plans/r16/<q>_before.txt).
  *
  * Usage: runMain graft.PlanDump <outDir> <suffix> [names...]
  *   writes <outDir>/<name>_<suffix>.txt for each query name.
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1 — join strategies flip with
  * input size, so optimization evidence is dumped at the BENCH scale),
  * SPARK_GRAFT_CPUS (default 32, the bench shape).
  *
  * Iterative/store queries EXECUTE work while the DataFrame is being
  * constructed (loop rounds are checkpointed eagerly); their final plan
  * is small (LogicalRDD leaves per round) — the loop-body shape for
  * those is audited via the probe mains instead.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <suffix> <names...>")
    val outDir = Paths.get(args(0))
    val suffix = args(1)
    val names = args.drop(2)
    Files.createDirectories(outDir)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession.tune(
      org.apache.spark.sql.SparkSession.builder().master(s"local[$cpus]"),
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      try {
        val df = fn(spark, d)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(outDir.resolve(s"${name}_$suffix.txt"), plan)
        println(s"[plandump] wrote $name (${plan.linesIterator.size} lines)")
      } catch {
        case t: Throwable =>
          println(s"[plandump] FAILED $name: ${t.getMessage}")
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
