package graft.tools

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Ad-hoc single-query correctness dump: `runMain graft.tools.DumpQ
  * <name> [sfDir] [outDir]` — writes the query's parquet and an
  * oracle_sql.json holding just that oracle, in the exact layout
  * `tools/check.py` (the local replica of the driver's DuckDB gate)
  * consumes. The inner loop for oracle iteration without paying the
  * full Verify sweep. */
object DumpQ {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val outDir = if (args.length > 2) args(2) else "/tmp/graft_dumpq"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = graft.core.GraftSession.tune(
      SparkSession.builder().master(s"local[$cpus]"),
      shufflePartitions = cpus.toInt
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    graft.SparkEntry.queries(name)(spark, sfDir)
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val sql = graft.queries.Queries.oracleSqlFor(sfDir).get(name)
    val json = sql.map(s => s"${q(name)}: ${q(s)}").mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    println(s"[dumpq] $name -> $outDir" + (if (sql.isEmpty) " (no oracle)" else ""))
    spark.stop()
  }
}
