package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val outDir = args(1)
    // optional extra args: run (and emit oracle SQL for) ONLY these
    // queries — the fast loop for checking one new query against the
    // oracle without a 90-query sweep. No extra args = driver contract.
    val only = args.drop(2).toSet
    val selected =
      if (only.isEmpty) SparkEntry.queries
      else SparkEntry.queries.filter { case (n, _) => only(n) }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = graft.core.GraftSession.tune(
      SparkSession.builder().master(s"local[$cpus]"),
      shufflePartitions = cpus.toInt
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // A failed query must be VISIBLE in the artifacts, not just absent:
    // in round 6 twenty queries errored and the correctness file read
    // "93/93 pass" because failures left no trace beyond stderr. Every
    // failure is collected here and written to errors.json next to the
    // dumps (and echoed to stdout) so a regression can't masquerade as a
    // green round.
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    selected.foreach { case (name, fn) =>
      // pre-delete the query's output dir: a failed query must not leave
      // a previous run's parquet behind to be compared as if fresh
      val dir = new java.io.File(s"$outDir/$name")
      if (dir.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(dir)
      }
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        errors(name) = s"${e.getClass.getSimpleName}: ${e.getMessage}"
        println(s"[verify] FAILED $name: ${errors(name)}")
      }
      // ops may persist intermediates with caller-owned lifetime (e.g.
      // the df-capped ngram signature table) — release between queries
      // so 66 queries don't stack pinned storage in one session
      spark.catalog.clearCache()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // oracle SQL retargeted at THIS run's sf dir — artifact-store reads
    // in the SQL follow the codebookPath layout, so the sf0.1 sweep
    // runs unmodified (sf-parametric, not sf0.01-hardcoded)
    val json = graft.queries.Queries.oracleSqlFor(sfDir)
      .filter { case (k, _) => only.isEmpty || only(k) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // errors.json is ALWAYS written ({} on a clean run) so its absence is
    // itself a signal (old Verify / crashed run), and its presence with
    // entries is a hard red flag the driver and judge can both read.
    val errJson = errors
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/errors.json"), errJson)
    val failed = errors.keys.toSeq
    println(s"[verify] done: ${selected.size - failed.size}/${selected.size} wrote, " +
      (if (failed.isEmpty) "0 failed" else s"FAILED ${failed.size}: ${failed.mkString(", ")}"))
    // exit 0 even on per-query failures: the driver must still compare
    // the queries that DID dump (a non-zero exit could zero the round);
    // errors.json + the stdout FAILED lines carry the red flag.
    spark.stop()
  }
}
