package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.hadoop.fs.{FileSystem, Path => HPath}

/** Maintenance for the parquet artifact stores (signature tables, span
  * sets, int8 vectors, IVF-PQ cells): the append lifecycle
  * ([[Dedup.minhashStoreAppend]], [[Dedup.spanSetStoredAppend]],
  * [[graft.streaming.NearDupStream.selfMaintaining]]) lands one file
  * set per batch, and 10⁴ batches mean 10⁴ small files — listing and
  * scan cost grows with batch COUNT instead of data size, the classic
  * small-files failure. [[compact]] rewrites a store into
  * size-targeted files while preserving its append markers, so the
  * loop can keep running against the compacted store. */
object Stores {

  /** The `path`'s filesystem from the session's Hadoop conf — the one
    * indirection that makes every store check/commit below work on any
    * Hadoop-visible filesystem (local, HDFS, object-store connectors),
    * not just `java.io.File`'s local disk. */
  def fileSystem(spark: SparkSession, path: String): FileSystem =
    new HPath(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Whether `path/name` exists (Hadoop FS). */
  def exists(spark: SparkSession, path: String, name: String): Boolean =
    fileSystem(spark, path).exists(new HPath(path, name))

  def requireStore(spark: SparkSession, path: String, hint: String): Unit =
    require(exists(spark, path, "_SUCCESS"), s"no store at $path — $hint")

  /** EXACTLY-ONCE batch append into a parquet store, replay- and
    * crash-safe where a bare `mode("append")` + marker is not: a crash
    * between the append and the marker write would double-post the
    * batch's rows on retry. Protocol (all steps idempotent, marker
    * LAST):
    *
    *  1. no-op if `_appended_<batchTag>` exists (redelivery);
    *  2. `write(stagingDir)` materializes the batch under
    *     `path/_staging_<batchTag>` (caller uses mode OVERWRITE so a
    *     partial previous attempt is replaced wholesale; the leading
    *     underscore hides the dir from parquet reads of `path`);
    *  3. any `append-<batchTag>-*` data files from a previous
    *     partially-renamed attempt are deleted (deterministic names
    *     make the cleanup exact);
    *  4. each staged data file renames into the store under
    *     `append-<batchTag>-<i>-<name>` — partition subdirectories
    *     (`cell=…`) are preserved relative to the staging root, so
    *     hive-partitioned stores keep pruning;
    *  5. the marker is created (the commit point), then staging is
    *     deleted.
    *
    * A crash anywhere before 5 leaves a retry that converges on the
    * identical file set; after 5, retries no-op. Single-writer per
    * batchTag (the store contract the streaming loops already hold). */
  def appendCommit(spark: SparkSession, path: String, batchTag: String)
                  (write: String => Unit): Unit = {
    val fs = fileSystem(spark, path)
    val store = new HPath(path)
    val marker = new HPath(store, s"_appended_$batchTag")
    val staging = new HPath(store, s"_staging_$batchTag")
    if (fs.exists(marker)) {
      // Redelivery after a crash BETWEEN step 5's marker create and the
      // staging delete would otherwise leak the staged copy forever
      // (the underscore prefix hides it from reads, so nothing else
      // ever reclaims it). The delete is idempotent and still behind
      // the marker, so the commit semantics are unchanged.
      fs.delete(staging, true)
      return
    }
    write(staging.toString)
    val prefix = s"append-$batchTag-"
    def dataFilesUnder(root: HPath): Seq[(HPath, String)] = {
      def walk(p: HPath, rel: String): Seq[(HPath, String)] =
        fs.listStatus(p).toSeq.flatMap { st =>
          val name = st.getPath.getName
          if (st.isDirectory) {
            if (name.startsWith("_") || name.startsWith(".")) Nil
            else walk(st.getPath, if (rel.isEmpty) name else s"$rel/$name")
          } else if (name.startsWith("_") || name.startsWith(".")) Nil
          else Seq((st.getPath, rel))
        }
      walk(root, "")
    }
    // 3. exact cleanup of a prior partially-renamed attempt
    dataFilesUnder(store).foreach { case (p, _) =>
      if (p.getName.startsWith(prefix)) fs.delete(p, false)
    }
    // 4. stage → store renames (deterministic names, relative dirs kept)
    dataFilesUnder(staging).sortBy { case (p, rel) => (rel, p.getName) }
      .zipWithIndex.foreach { case ((p, rel), i) =>
        val destDir = if (rel.isEmpty) store else new HPath(store, rel)
        if (!rel.isEmpty) fs.mkdirs(destDir)
        val dest = new HPath(destDir, f"$prefix$i%05d-${p.getName}")
        require(fs.rename(p, dest), s"append commit: rename $p -> $dest failed")
      }
    // 5. commit point
    fs.create(marker, true).close()
    fs.delete(staging, true)
    ()
  }

  /** Targeted store REWRITE — the takedown/retraction lifecycle
    * ([[graft.ops.Retention]]'s file-targeted deletes, applied to the
    * row-level case an append store needs: remove one document's
    * signatures/fingerprints/pairs from a store that is otherwise
    * append-only). Keeps only rows satisfying `keep`; same two-phase
    * swap as [[compact]], and the `_appended_*` markers are CARRIED —
    * a replayed batch must still no-op after a retraction, or
    * at-least-once delivery would re-insert the retracted rows from a
    * redelivered batch that contained them (the marker is the record
    * that the batch landed; retraction is a later, separate fact).
    * Single-writer contract as everywhere; run between batches.
    * Returns the kept row count. */
  def rewriteWhere(spark: SparkSession, path: String,
                   keep: org.apache.spark.sql.Column): Long = {
    val dir = new java.io.File(path)
    require(new java.io.File(dir, "_SUCCESS").isFile, s"no store at $path")
    require(!Option(dir.listFiles()).getOrElse(Array.empty).exists(f =>
      f.isDirectory && f.getName.contains("=")),
      s"$path is hive-partitioned — retract per partition or rebuild")
    val markers = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.startsWith("_appended_"))
      .map(_.getName)
    val tmp = path + "_retracting"
    val kept = spark.read.parquet(path).filter(keep)
    val n = kept.count()
    kept.write.mode("overwrite").parquet(tmp)
    markers.foreach(m => new java.io.File(tmp, m).createNewFile())
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(dir)
    require(new java.io.File(tmp).renameTo(dir),
      s"retraction swap failed: could not rename $tmp to $path")
    spark.catalog.refreshByPath(path)
    n
  }

  /** Rewrite `path` into ⌈bytes / targetFileBytes⌉ files.
    *
    * Procedure: write the compacted copy to a sibling dir, then swap
    * (delete original, rename copy) carrying the `_appended_*` markers
    * over — a replayed batch must still find its marker AFTER
    * compaction or it would re-append rows the compacted files already
    * hold. Local-filesystem directory swap (this environment's store
    * contract, like the `_SUCCESS`-probe lifecycle); on object storage
    * the same two phases are a table-format transaction (rewrite +
    * atomic manifest swap). Span-store delta sidecars live OUTSIDE the
    * store dir and stay valid: they record hash sets, which compaction
    * preserves by construction.
    *
    * Readers racing the swap see a missing dir for the rename instant —
    * the streams that own these stores read them inside foreachBatch
    * bodies, and compaction is run BETWEEN batches (same single-writer
    * contract the appends already assume). Returns the new file count. */
  def compact(spark: SparkSession, path: String,
              targetFileBytes: Long = 128L * 1024 * 1024): Int = {
    val dir = new java.io.File(path)
    require(new java.io.File(dir, "_SUCCESS").isFile, s"no store at $path")
    require(!Option(dir.listFiles()).getOrElse(Array.empty).exists(f =>
      f.isDirectory && f.getName.contains("=")),
      s"$path is hive-partitioned (e.g. the IVF-PQ index) — a flat " +
        "rewrite would destroy partition pruning; use compactPartitioned")
    val dataFiles = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
    val totalBytes = dataFiles.map(_.length()).sum
    val n = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    val markers = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.startsWith("_appended_"))
      .map(_.getName)
    val tmp = path + "_compacting"
    spark.read.parquet(path).repartition(n)
      .write.mode("overwrite").parquet(tmp)
    markers.foreach { m =>
      new java.io.File(tmp, m).createNewFile()
    }
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(dir)
    require(new java.io.File(tmp).renameTo(dir),
      s"compaction swap failed: could not rename $tmp to $path")
    // the swapped dir is a NEW file set at the same path: drop any plan
    // or cache still pointing at the deleted files
    spark.catalog.refreshByPath(path)
    n
  }

  /** [[compact]] for HIVE-PARTITIONED stores (the IVF-PQ index layout:
    * `cell=<k>/` directories fed by [[graft.ops.Pq.indexAppend]], which
    * accrues one small file set per batch exactly like the flat stores
    * did). Each partition directory is rewritten INDEPENDENTLY into
    * ⌈bytes / targetFileBytes⌉ files and swapped in place — the
    * directory name carries the partition value, so pruning is
    * preserved by construction, and the root's `_appended_*` markers
    * are never touched (they live outside the partition dirs), so a
    * replayed batch still no-ops after compaction.
    *
    * Crash windows, all convergent on re-run: the per-cell rewrite
    * lands in a DOT-PREFIXED sibling (`._compact_cell=<k>` — hidden
    * from every parquet read; a bare `cell=<k>_compacting` name would
    * be parsed as a PHANTOM PARTITION VALUE by the next hive-layout
    * scan), the swap is delete-then-rename, and the recovery pass at
    * the top completes or discards leftovers: a leftover WITH its
    * cell dir still present is a partial rewrite (discard, redo); a
    * leftover WITHOUT its cell dir means the crash hit between the
    * delete and the rename, and the leftover is by construction the
    * complete stripped rewrite (the delete only ever runs after the
    * write finished) — rename it into place. A crash between cells
    * leaves some compacted and some not: row-identical either way.
    * Same single-writer, run-between-batches contract as everywhere.
    * Returns the total data-file count across partitions. */
  def compactPartitioned(spark: SparkSession, path: String,
                         targetFileBytes: Long = 128L * 1024 * 1024): Int = {
    val dir = new java.io.File(path)
    require(new java.io.File(dir, "_SUCCESS").isFile, s"no store at $path")
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    val TMP = "._compact_"
    // recovery pass: converge leftovers from a crashed prior run
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith(TMP))
      .foreach { tmp =>
        val cd = new java.io.File(dir, tmp.getName.stripPrefix(TMP))
        if (!cd.exists())
          require(tmp.renameTo(cd),
            s"compaction recovery failed: could not rename $tmp to $cd")
        else rm(tmp)
      }
    val cellDirs = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.contains("=") &&
        !f.getName.startsWith("."))
    require(cellDirs.nonEmpty,
      s"$path has no partition directories — use compact for flat stores")
    var total = 0
    cellDirs.foreach { cd =>
      val files = Option(cd.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      val n = math.max(1,
        math.ceil(files.map(_.length()).sum.toDouble / targetFileBytes).toInt)
      if (files.length > n) {
        val tmp = new java.io.File(dir, TMP + cd.getName)
        // the cell's files carry the non-partition columns only; the
        // rewrite keeps that shape and the dir name keeps the value
        spark.read.parquet(cd.getPath).repartition(n)
          .write.mode("overwrite").parquet(tmp.getPath)
        // strip parquet job artifacts (_SUCCESS) so the swapped dir is
        // exactly what partitionBy would have written; MUST run before
        // the delete — recovery relies on a cell-less leftover being
        // the finished, stripped rewrite
        Option(tmp.listFiles()).getOrElse(Array.empty)
          .filter(f => f.getName.startsWith("_") || f.getName.startsWith("."))
          .foreach(rm)
        rm(cd)
        require(tmp.renameTo(cd),
          s"cell compaction swap failed: could not rename $tmp to $cd")
        total += n
      } else total += files.length
    }
    spark.catalog.refreshByPath(path)
    total
  }
}
