package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = graft.core.GraftSession.tune(
      SparkSession.builder().master(s"local[$cpus]"),
      shufflePartitions = cpus.toInt
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Steady-state timing: one untimed warmup pass at the smallest SF
    // triggers codegen compilation + JIT for every query plan, the way a
    // long-lived cluster's executors are warm. The timed pass then
    // measures the engine, not HotSpot. The warmup dir is the sibling
    // sf0.001 of the configured SF dir (not a hardcoded path), falling
    // back to the SF dir itself so the warmup always runs real queries.
    val warmupDir = {
      val f = new java.io.File(sfDir)
      val sibling = new java.io.File(Option(f.getParentFile).getOrElse(f), "sf0.001")
      if (sibling.isDirectory) sibling.getPath else sfDir
    }
    // Failure lines go to stdout: the driver's tail capture reads the
    // sbt stdout stream, so stderr messages would never reach the tail.
    SparkEntry.queries.foreach { case (name, fn) =>
      try fn(spark, warmupDir).count()
      catch {
        case t: Throwable =>
          println(s"[bench] warmup failed for $name: ${t.getClass.getSimpleName}: ${t.getMessage}")
      }
    }
    // best-of-3, INTERLEAVED passes: single-run numbers on this box vary
    // several-fold with GC, page cache, and host CPU steal (load spikes
    // with nothing running locally). Consecutive repeats of one query
    // all land inside the same spike; sweeping all queries per pass puts
    // a transient spike on different queries each pass, so the per-query
    // min across passes is the reproducible engine cost.
    spark.catalog.clearCache() // drop warmup-pass persisted data
    val names = SparkEntry.queries.keys.toSeq
    val timesPerQ = scala.collection.mutable.Map.empty[String, List[Double]]
    val failed = scala.collection.mutable.Set.empty[String]
    val passTotals = (1 to 3).map { _ =>
      names.map { name =>
        val t0 = System.nanoTime()
        try { SparkEntry.queries(name)(spark, sfDir).count() }
        catch {
          // A query that fails only at the bench SF must be visibly an
          // error, not the (short) time-to-exception posing as a fast run.
          case t: Throwable =>
            failed += name
            println(s"[bench] FAILED $name: ${t.getClass.getSimpleName}: ${t.getMessage}")
        }
        val t = (System.nanoTime() - t0) / 1e9
        // queries that persist intermediates must not leak storage into
        // the next query's measurement
        spark.catalog.clearCache()
        timesPerQ(name) = t :: timesPerQ.getOrElse(name, Nil)
        t
      }.sum
    }
    // failed queries report -1, never their time-to-exception
    val results = names.map(n => n -> (if (failed(n)) -1.0 else timesPerQ(n).min)).toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // total covers succeeding queries only; failures are flagged separately
    val total = results.values.filter(_ >= 0).sum
    // pass_totals exposes the run-to-run spread (host CPU steal on this
    // box) next to the per-query-min total the grade reads
    val passes = passTotals
      .map(t => String.format(java.util.Locale.ROOT, "%.3f", Double.box(t)))
      .mkString("[", ",", "]")
    // Full per-query line first (kept for humans and history) ...
    val fullLine = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"pass_totals":$passes,"sf":"$sfDir"}"""
    println(fullLine)
    // ... then persist the same JSON to a file, and end on a SHORT
    // summary line. The driver captures a bounded tail of the sbt
    // output; at 78 queries the mega-line's head ("metric","value")
    // fell outside that window in round 4 (BENCH_r04 parsed: null).
    // The LAST line printed must therefore always be short enough to
    // parse on its own. The file path is anchored to an env var (or the
    // JVM's own user.dir) so it lands where the driver looks regardless
    // of launch cwd; write-to-temp + atomic move so a failed write can
    // never leave a stale previous run's file posing as this run's.
    val queriesFile: Option[String] = try {
      val dir = java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_OUT_DIR", System.getProperty("user.dir")))
      val out = dir.resolve("BENCH_QUERIES.json")
      java.nio.file.Files.deleteIfExists(out) // no stale file if this write fails
      val tmp = java.nio.file.Files.createTempFile(dir, "BENCH_QUERIES", ".tmp")
      java.nio.file.Files.write(tmp, (fullLine + "\n").getBytes("UTF-8"))
      java.nio.file.Files.move(tmp, out,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      Some(out.toAbsolutePath.toString)
    } catch {
      case t: Throwable =>
        println(s"[bench] could not write BENCH_QUERIES.json: ${t.getMessage}")
        None
    }
    // Penultimate SHORT line: the top-15 slowest queries (r17, judge
    // request). PERF's per-query comparison was blind in r15/r16 because
    // the full per-query line exceeds the driver's bounded tail window —
    // this line keeps the hot set tail-visible every round (15 entries
    // ≈ 500 chars) without touching the timed methodology or the final
    // summary line the driver parses.
    val top = results.toSeq.filter(_._2 >= 0).sortBy(-_._2).take(15)
      .map { case (k, v) =>
        "\"" + k + "\":" + String.format(java.util.Locale.ROOT, "%.3f",
          Double.box(v))
      }.mkString("{", ",", "}")
    println(s"""{"metric":"slowest","top":$top}""")
    val failedArr = failed.toSeq.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val fileField = queriesFile.map(p => s""","queries_file":"$p"""").getOrElse("")
    println(s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${names.size},"n_failed":${failed.size},"failed":$failedArr,"pass_totals":$passes,"sf":"$sfDir"$fileField}""")
    spark.stop()
  }
}
