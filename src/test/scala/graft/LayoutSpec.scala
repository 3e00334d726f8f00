package graft

import org.apache.spark.sql.functions._
import graft.ops.Layout

/** Z-order layout: the Morton interleave is correct, and clustering by
  * it actually narrows BOTH key columns' per-file min/max ranges — the
  * measurable property parquet row-group pruning depends on. */
class LayoutSpec extends SparkTestBase {
  import spark.implicits._

  test("morton2 interleaves bits (hand-computed values)") {
    val out = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (5L, 3L),
      (0xFFFFL, 0xFFFFL))
      .toDF("a", "b")
      .select(Layout.morton2(col("a"), col("b")).as("z"))
      .as[Long].collect().toSeq
    // a → even bits, b → odd bits:
    // (5,3) = 101 ⊗ 011 → b2 a2 b1 a1 b0 a0 = 0 1 1 0 1 1 = 27
    assert(out === Seq(0L, 1L, 2L, 3L, 27L, 0xFFFFFFFFL))
  }

  test("compaction: many small files → few target-sized files, data intact") {
    val dir = java.nio.file.Files.createTempDirectory("graft-compact").toString
    // simulate a per-trigger streaming sink: 40 tiny files
    (0 until 40).foreach { i =>
      spark.range(i * 100L, (i + 1) * 100L).toDF("id")
        .coalesce(1).write.mode("append").parquet(s"$dir/t")
    }
    val before = new java.io.File(s"$dir/t").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(before === 40)
    val src = spark.read.parquet(s"$dir/t")
    val totalBytes = new java.io.File(s"$dir/t").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length).sum
    Layout.compact(src, s"$dir/t", targetBytes = totalBytes / 4)
      .write.parquet(s"$dir/compacted")
    val after = new java.io.File(s"$dir/compacted").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(after >= 4 && after <= 6, s"~4 target-sized files, got $after")
    assert(spark.read.parquet(s"$dir/compacted").count() === 4000)
  }

  test("z-order bounds both columns' per-partition ranges; single-column sort does not") {
    val grid = (for (x <- 0 until 100; y <- 0 until 100) yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val parts = 16

    def avgWidth(df: org.apache.spark.sql.DataFrame, c: String): Double = {
      val w = df.withColumn("p", spark_partition_id())
        .groupBy("p").agg((max(col(c)) - min(col(c))).as("w"))
        .agg(avg("w")).as[Double].collect().head
      w
    }

    val byX = grid.repartitionByRange(parts, col("x"))
    val byZ = Layout.zorderBy(grid, "x", "y", parts)

    val xOrderY = avgWidth(byX, "y") // x-sorted files: y spans ~everything
    val zX = avgWidth(byZ, "x")
    val zY = avgWidth(byZ, "y")
    assert(xOrderY > 90.0, s"single-column layout leaves y unpruned ($xOrderY)")
    assert(zX < 60.0, s"z-order must bound x per partition, got $zX")
    assert(zY < 60.0, s"z-order must bound y per partition, got $zY")
  }
}
