package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Targeted record deletion over an immutable parquet corpus — the
  * takedown / right-to-erasure primitive of a training-data pipeline.
  *
  * At 100 TB you cannot rewrite the corpus to drop a handful of
  * documents; the only viable shape is FILE-TARGETED: find the files
  * that actually contain the doomed keys (a key-column-pruned scan —
  * parquet min/max + dictionary row-group stats make this cheap, and a
  * [[Layout.zorderBy]]-clustered corpus localizes each key to few
  * files), rewrite only those files without the matching rows, and
  * leave every other file byte-identical.
  *
  * The swap here is plain filesystem rename (write replacements to a
  * staging dir → delete originals → move in) — mechanically what Delta
  * and Iceberg DELETE do, minus their transactional commit log. Wrap
  * the swap in a table-format commit for concurrent readers; the
  * Spark-side work (pruned discovery, minimal rewrite) is identical.
  */
object Retention {

  /** The files that contain at least one of `keys`. */
  def affectedFiles(spark: SparkSession, dir: String, keyCol: String,
                    keys: Seq[Any]): Seq[String] = {
    import spark.implicits._
    spark.read.parquet(dir)
      .filter(col(keyCol).isin(keys: _*))
      .select(input_file_name())
      .distinct().as[String].collect().toSeq.sorted
  }

  /** Delete all rows with `keyCol` in `keys`, rewriting ONLY affected
    * files. Returns (files rewritten, rows deleted). */
  def deleteByKeys(spark: SparkSession, dir: String, keyCol: String,
                   keys: Seq[Any]): (Int, Long) = {
    val affected = affectedFiles(spark, dir, keyCol, keys)
    if (affected.isEmpty) return (0, 0L)

    val slice = spark.read.parquet(affected: _*)
    val total = slice.count()
    val keep = slice.filter(!col(keyCol).isin(keys: _*))
    val kept = keep.count()

    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = new Path(dir, s"_rewrite_${java.util.UUID.randomUUID}")
    // one output file per rewritten input keeps the layout's granularity
    keep.repartition(affected.size).write.parquet(staging.toString)

    affected.foreach(f => fs.delete(new Path(new java.net.URI(f).getPath), false))
    val stagedFiles = fs.listStatus(staging).map(_.getPath)
      .filter(_.getName.endsWith(".parquet"))
    stagedFiles.foreach { p =>
      fs.rename(p, new Path(dir, p.getName))
    }
    fs.delete(staging, true)
    (affected.size, total - kept)
  }
}
