package graft

import org.apache.spark.sql.functions._
import graft.ops.Stores

/** The append-commit protocol's crash windows, pinned directly (the
  * streaming E2Es exercise the happy path; these force each window). */
class StoresSpec extends SparkTestBase {
  import spark.implicits._

  private def newStore(): String = {
    val dir = java.nio.file.Files.createTempDirectory("stores_spec").toString
    Seq((1L, 10L)).toDF("k", "v").limit(0)
      .write.mode("overwrite").parquet(dir)
    dir
  }

  private def append(dir: String, tag: String, rows: Seq[(Long, Long)]): Unit =
    Stores.appendCommit(spark, dir, tag) { staging =>
      rows.toDF("k", "v").coalesce(1)
        .write.mode("overwrite").parquet(staging)
    }

  test("crash between marker create and staging delete: redelivery reclaims the staged copy") {
    val dir = newStore()
    append(dir, "b0", Seq((1L, 10L), (2L, 20L)))
    val committed = spark.read.parquet(dir).as[(Long, Long)].collect().sorted.toSeq

    // Simulate the crash window: the marker exists (commit point
    // passed) but the staging dir was never deleted.
    val staging = new java.io.File(dir, "_staging_b0")
    assert(!staging.exists(), "clean commit leaves no staging dir")
    val stray = new java.io.File(staging, "leftover.parquet")
    assert(staging.mkdirs() && stray.createNewFile())

    // Redelivery: must no-op on data AND reclaim the staged copy.
    append(dir, "b0", Seq((1L, 10L), (2L, 20L)))
    assert(!staging.exists(),
      "marker-exists path must delete the leaked staging dir")
    val after = spark.read.parquet(dir).as[(Long, Long)].collect().sorted.toSeq
    assert(after === committed, "redelivery must not change the store")
  }

  test("crash mid-rename: retry converges on the exact file set (no double rows)") {
    val dir = newStore()
    append(dir, "b0", Seq((1L, 10L)))
    // Simulate a partial attempt of b1: a data file with b1's
    // deterministic prefix already sits in the store, but no marker.
    val partial = new java.io.File(dir, "append-b1-99999-part-orphan.parquet")
    Seq((7L, 70L)).toDF("k", "v").coalesce(1)
      .write.mode("overwrite").parquet(partial.getParent + "/_tmp_orphan")
    val src = new java.io.File(dir, "_tmp_orphan").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    assert(src.renameTo(partial))
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(dir, "_tmp_orphan"))

    append(dir, "b1", Seq((2L, 20L), (3L, 30L)))
    val rows = spark.read.parquet(dir).as[(Long, Long)].collect().sorted.toSeq
    assert(rows === Seq((1L, 10L), (2L, 20L), (3L, 30L)),
      s"retry must replace the partial attempt's files exactly, got $rows")
  }
}
