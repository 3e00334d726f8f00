package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query plan dump: `runMain graft.tools.PlanQ <name> [sfDir]`.
  * Prints the formatted physical plan — the inner loop for checking
  * PushedFilters / Exchange counts without the full PLANS.md sweep. */
object PlanQ {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = graft.core.GraftSession.tune(
      SparkSession.builder().master("local[4]"), 4).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(graft.SparkEntry.queries(name)(spark, sfDir).queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    spark.stop()
  }
}
