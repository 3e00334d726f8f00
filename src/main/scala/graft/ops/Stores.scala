package graft.ops

import org.apache.spark.sql.SparkSession

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
        "rewrite would destroy partition pruning; compact per partition " +
        "or rebuild via its writer")
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
}
