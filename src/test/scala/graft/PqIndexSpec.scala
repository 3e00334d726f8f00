package graft

import org.apache.spark.sql.functions._
import graft.ops.Pq

/** Durable IVF-PQ inverted file: write-once encode partitioned by cell,
  * probe-time partition pruning, result parity with the inline index. */
class PqIndexSpec extends SparkTestBase {

  private def setup() = {
    val emb = graft.core.Tables.embeddings(spark, sf0001)
    val nCells = 8
    val cents = Pq.centroidArray(
      emb.filter(col("vec_id") < nCells)
        .select(col("vec_id").cast("long").as("c_id"),
          expr("transform(embedding, x -> cast(x as double))").as("c_v")),
      dim = 64)
    val cb = Pq.trainResidualCodebooksSampled(emb, cents,
      dim = 64, m = 8, k = 16, iters = 2, sampleCap = 512)
    (emb, cents, cb)
  }

  test("index round-trip: stored-index probe ≡ inline ivfPqTopK, scan prunes to probed cells") {
    val (emb, cents, cb) = setup()
    val dir = java.nio.file.Files.createTempDirectory("pq_index").toString
    Pq.writeIndex(emb, cents, dim = 64, m = 8, k = 16, codebook = cb,
      path = dir)
    // cell directories exist (partitioned layout)
    val cellDirs = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell="))
    assert(cellDirs.length === 8, s"one directory per cell: ${cellDirs.length}")

    val queries = emb.filter(col("vec_id") < 5)
    val fromIndex = Pq.ivfPqTopKFromIndex(spark, dir, queries, topK = 3,
      centroids = cents, dim = 64, m = 8, k = 16, codebook = cb, nProbe = 2)
    val inline = Pq.ivfPqTopK(emb, queries, topK = 3,
      centroids = cents, dim = 64, m = 8, k = 16, codebook = cb, nProbe = 2)

    import spark.implicits._
    val a = fromIndex.select("q_id", "n_id", "rank")
      .as[(Long, Long, Long)].collect().toSet
    val b = inline.select("q_id", "n_id", "rank")
      .as[(Long, Long, Long)].collect().toSet
    assert(a === b, "stored index returns the same neighbors as inline encode")

    // the probe-cell filter reaches the scan as a PARTITION filter —
    // non-probed cell directories are never read
    val plan = fromIndex.queryExecution.executedPlan.toString
    val pf = plan.linesIterator.find(_.contains("PartitionFilters"))
    assert(pf.exists(_.contains("cell")),
      s"probe cells must prune partitions, got: $pf")
  }

  test("indexAppend: new vectors land in their cells, probes find them, replay is a no-op") {
    import spark.implicits._
    val (emb, cents, cb) = setup()
    val dir = java.nio.file.Files.createTempDirectory("pq_index_append").toString
    // seed with everything EXCEPT two held-out vectors
    Pq.writeIndex(emb.filter(col("vec_id") >= 10), cents,
      dim = 64, m = 8, k = 16, codebook = cb, path = dir)
    val heldOut = emb.filter(col("vec_id") < 2)
    Pq.indexAppend(heldOut, cents, dim = 64, m = 8, k = 16, codebook = cb,
      path = dir, batchTag = "b1")
    val rowsAfter = spark.read.parquet(dir).count()
    // replayed append: marker makes it a no-op
    Pq.indexAppend(heldOut, cents, dim = 64, m = 8, k = 16, codebook = cb,
      path = dir, batchTag = "b1")
    assert(spark.read.parquet(dir).count() === rowsAfter)
    // the appended rows are probe-VISIBLE through the partition-pruned
    // path: the grown index must answer exactly like a from-scratch
    // index over the union (PQ distances are approximate, so parity
    // with the rebuild — not exact self-match — is the invariant)
    val ref = java.nio.file.Files.createTempDirectory("pq_index_ref").toString
    Pq.writeIndex(emb.filter(col("vec_id") >= 10 || col("vec_id") < 2), cents,
      dim = 64, m = 8, k = 16, codebook = cb, path = ref)
    def probe(p: String) = Pq.ivfPqTopKFromIndex(spark, p,
        heldOut, topK = 3,
        centroids = cents, dim = 64, m = 8, k = 16, codebook = cb, nProbe = 2)
      .select("q_id", "n_id", "rank").as[(Long, Long, Long)].collect().toSet
    val grown = probe(dir)
    assert(grown === probe(ref), "grown index answers like the rebuild")
    val appendedIds = spark.read.parquet(dir)
      .filter(col("n_id") < 2).select("n_id").as[Long].collect().toSet
    assert(appendedIds === Set(0L, 1L),
      s"appended rows present in the partitioned layout: $appendedIds")
    val a = spark.read.parquet(dir).select("n_id", "cell", "codes")
      .collect().map(_.toString).sorted
    val b = spark.read.parquet(ref).select("n_id", "cell", "codes")
      .collect().map(_.toString).sorted
    assert(a.sameElements(b), "append ≡ rebuild (frozen model, deterministic encode)")
    // FLAT compaction refuses the partitioned layout instead of
    // flattening it; the cell-aware path is compactPartitioned
    intercept[IllegalArgumentException] {
      graft.ops.Stores.compact(spark, dir)
    }
  }

  test("compactPartitioned: fewer files per cell, identical probes, markers survive") {
    import spark.implicits._
    val (emb, cents, cb) = setup()
    val dir = java.nio.file.Files.createTempDirectory("pq_compact").toString
    Pq.writeIndex(emb.filter(col("vec_id") >= 10), cents,
      dim = 64, m = 8, k = 16, codebook = cb, path = dir)
    // several appends → several file sets per touched cell (the
    // small-files accrual compaction exists to reverse)
    (0 until 3).foreach { b =>
      Pq.indexAppend(emb.filter(col("vec_id") >= (b * 3) && col("vec_id") < (b * 3 + 3)),
        cents, dim = 64, m = 8, k = 16, codebook = cb,
        path = dir, batchTag = s"b$b")
    }
    def cellFiles() = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell="))
      .map(d => d.getName ->
        d.listFiles().count(_.getName.endsWith(".parquet"))).toMap
    def probe() = Pq.ivfPqTopKFromIndex(spark, dir,
        emb.filter(col("vec_id") < 5), topK = 3,
        centroids = cents, dim = 64, m = 8, k = 16, codebook = cb, nProbe = 2)
      .select("q_id", "n_id", "rank").as[(Long, Long, Long)].collect().toSet
    val filesBefore = cellFiles()
    val rowsBefore = spark.read.parquet(dir)
      .select("n_id", "cell", "codes").collect().map(_.toString).sorted.toSeq
    val probeBefore = probe()
    assert(filesBefore.values.max > 1, "precondition: appends accrued files")

    val total = graft.ops.Stores.compactPartitioned(spark, dir)
    val filesAfter = cellFiles()
    assert(total === filesAfter.values.sum)
    assert(filesAfter.keySet === filesBefore.keySet, "cell dirs preserved")
    assert(filesAfter.values.forall(_ === 1),
      s"tiny cells compact to one file each: $filesAfter")
    assert(filesAfter.values.sum < filesBefore.values.sum)
    val rowsAfter = spark.read.parquet(dir)
      .select("n_id", "cell", "codes").collect().map(_.toString).sorted.toSeq
    assert(rowsAfter === rowsBefore, "compaction must not change rows")
    assert(probe() === probeBefore, "probe results identical after compaction")
    // partition pruning still works on the compacted layout
    val pruned = Pq.ivfPqTopKFromIndex(spark, dir,
      emb.filter(col("vec_id") === 17), topK = 3,
      centroids = cents, dim = 64, m = 8, k = 16, codebook = cb, nProbe = 1)
    val pf = pruned.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("PartitionFilters"))
    assert(pf.exists(_.contains("cell")), s"pruning survives compaction: $pf")
    // markers survive → a replayed append is still a no-op
    val markers = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("_appended_")).map(_.getName).toSet
    assert(markers === Set("_appended_b0", "_appended_b1", "_appended_b2"))
    Pq.indexAppend(emb.filter(col("vec_id") >= 0 && col("vec_id") < 3),
      cents, dim = 64, m = 8, k = 16, codebook = cb, path = dir, batchTag = "b0")
    assert(spark.read.parquet(dir)
      .select("n_id", "cell", "codes").collect().map(_.toString).sorted.toSeq
      === rowsAfter, "post-compaction replay must no-op on the carried marker")

    // crash window 1: an UNCOMMITTED rewrite tmp (crash before the
    // commit marker) — the dot prefix must hide it from reads (a bare
    // cell=X sibling name would read back as a phantom partition), the
    // recovery pass must DISCARD it, and the originals are untouched
    // because nothing is ever deleted without a marker
    val someCell = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell=")).head
    val junk = new java.io.File(dir, "._swap_" + someCell.getName)
    junk.mkdirs()
    spark.read.parquet(someCell.getPath).limit(1)
      .write.mode("overwrite").parquet(junk.getPath)
    spark.catalog.refreshByPath(dir)
    assert(spark.read.parquet(dir)
      .select("n_id", "cell", "codes").collect().map(_.toString).sorted.toSeq
      === rowsAfter, "a dot-prefixed leftover must be invisible to reads")
    graft.ops.Stores.compactPartitioned(spark, dir)
    assert(!junk.exists(), "uncommitted leftover discarded")
    assert(spark.read.parquet(dir)
      .select("n_id", "cell", "codes").collect().map(_.toString).sorted.toSeq
      === rowsAfter)

    // crash window 2 (the non-atomic-rename hazard the old
    // delete-then-rename-dir protocol could NOT survive): a COMMITTED
    // swap — complete stripped tmp + commit marker — that crashed
    // midway through the per-file replacement: one original cell file
    // already deleted, one tmp file copied into place but not yet
    // removed from tmp (an object-store rename = copy + delete that
    // lost its delete). Recovery must finish the swap: rows are exactly
    // the rewrite, nothing lost, nothing doubled.
    val victim = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell=")).head
    val tmp = new java.io.File(dir, "._swap_" + victim.getName)
    spark.read.parquet(victim.getPath).repartition(2)
      .write.mode("overwrite").parquet(tmp.getPath)
    tmp.listFiles()
      .filter(f => f.getName.startsWith("_") || f.getName.startsWith("."))
      .foreach(_.delete())
    val gen = 1 + victim.listFiles().map(_.getName).collect {
      case n if n.startsWith("swap") && n.contains("-") =>
        n.stripPrefix("swap").takeWhile(_.isDigit).toLong
    }.foldLeft(0L)(math.max)
    new java.io.File(dir, s"._swapcommit_${gen}_" + victim.getName)
      .createNewFile()
    val origs = victim.listFiles().filter(_.getName.endsWith(".parquet"))
    assert(origs.head.delete(), "simulate: one original already deleted")
    val half = tmp.listFiles().filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(half.toPath,
      new java.io.File(victim, s"swap$gen-" + half.getName).toPath)
    spark.catalog.refreshByPath(dir)
    graft.ops.Stores.compactPartitioned(spark, dir)
    assert(!tmp.exists(), "committed tmp consumed")
    assert(!new java.io.File(dir).listFiles()
      .exists(_.getName.startsWith("._swapcommit_")), "marker cleared")
    assert(spark.read.parquet(dir)
      .select("n_id", "cell", "codes").collect().map(_.toString).sorted.toSeq
      === rowsAfter, "recovery completes the crashed swap, rows restored")
    assert(probe() === probeBefore, "probes unchanged after both recoveries")
  }

  test("nProbe=1, one query: scan reads a STRICT subset of the cell directories") {
    // At nProbe=2 with 10 probes the IN-list covers all 8 cells, so the
    // round-trip test above can't distinguish real pruning from a no-op
    // filter. One query at nProbe=1 probes exactly one cell; both the
    // plan's IN-list and the post-run files-read metric must show the
    // other 7 directories untouched.
    val (emb, cents, cb) = setup()
    val dir = java.nio.file.Files.createTempDirectory("pq_index1").toString
    Pq.writeIndex(emb, cents, dim = 64, m = 8, k = 16, codebook = cb,
      path = dir)
    val totalFiles = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell="))
      .map(_.listFiles().count(_.getName.endsWith(".parquet"))).sum

    val oneQuery = emb.filter(col("vec_id") === 17)
    // keep ONE DataFrame (one QueryExecution) for both the collect and
    // the plan/metric inspection — a derived .select would execute its
    // own plan copy and leave this one's metrics at zero
    val fromIndex = Pq.ivfPqTopKFromIndex(spark, dir, oneQuery, topK = 3,
      centroids = cents, dim = 64, m = 8, k = 16, codebook = cb, nProbe = 1)
      .select("q_id", "n_id", "rank")
    val got = fromIndex.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val inline = Pq.ivfPqTopK(emb, oneQuery, topK = 3,
      centroids = cents, dim = 64, m = 8, k = 16, codebook = cb, nProbe = 1)
      .select("q_id", "n_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === inline, "nProbe=1 stored probe matches inline")

    // 1) static proof: the PartitionFilters IN-list names exactly 1 cell
    val plan = fromIndex.queryExecution.executedPlan.toString
    val pfLine = plan.linesIterator.find(_.contains("PartitionFilters"))
      .getOrElse(fail("no PartitionFilters line in the executed plan"))
    val inList = "cell#\\d+L? IN \\(([^)]*)\\)".r.findFirstMatchIn(pfLine)
      .orElse("cell#\\d+L? = (\\d+)".r.findFirstMatchIn(pfLine))
      .getOrElse(fail(s"no cell IN-list/equality in: $pfLine"))
    val nCellsProbed = inList.group(1).split(",").count(_.trim.nonEmpty)
    assert(nCellsProbed === 1,
      s"one query at nProbe=1 must probe exactly 1 of 8 cells, got $nCellsProbed: $pfLine")

    // 2) runtime proof: the scan's files-read metric is a strict subset
    // of the index's parquet files (the collect() above populated it)
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    // AQE hides the physical tree behind AdaptiveSparkPlanExec and (in
    // Spark 4) per-stage QueryStageExec leaves — unwrap both
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p.collect {
      case s: FileSourceScanExec => Seq(s)
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec => scans(q.plan)
    }.flatten
    val scanMetrics = scans(fromIndex.queryExecution.executedPlan)
      .collectFirst {
        case s if s.relation.location.rootPaths.exists(_.toString.contains(
          new java.io.File(dir).getName)) => s.metrics
      }
      .getOrElse(fail("no FileSourceScanExec over the index path"))
    val filesRead = scanMetrics("numFiles").value
    assert(filesRead > 0 && filesRead < totalFiles,
      s"expected a strict subset of $totalFiles index files read, got $filesRead")
  }
}
