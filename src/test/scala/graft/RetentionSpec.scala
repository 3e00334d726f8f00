package graft

import org.apache.spark.sql.functions._
import graft.ops.Retention

/** File-targeted deletion: only files containing doomed keys are
  * rewritten; the rest of the corpus stays byte-identical. */
class RetentionSpec extends SparkTestBase {
  import spark.implicits._

  test("deleteByKeys rewrites only affected files, untouched bytes identical") {
    val dir = java.nio.file.Files.createTempDirectory("graft-retention").toString
    // 10 files, ids 0-99 / 100-199 / ... (one id range per file)
    (0 until 10).foreach { i =>
      spark.range(i * 100L, (i + 1) * 100L).toDF("id")
        .coalesce(1).write.mode("append").parquet(s"$dir/t")
    }
    def files() = new java.io.File(s"$dir/t").listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> (f.length, f.lastModified)).toMap
    val before = files()
    assert(before.size === 10)

    // doomed keys live in exactly two files (ranges 1xx and 7xx)
    val doomed = Seq(150L, 151L, 777L)
    val hit = Retention.affectedFiles(spark, s"$dir/t", "id", doomed)
    assert(hit.size === 2, s"row-group stats should prune to 2 files, got $hit")

    val (rewritten, deleted) =
      Retention.deleteByKeys(spark, s"$dir/t", "id", doomed)
    assert(rewritten === 2 && deleted === 3L)

    val after = files()
    val untouched = before.keySet.intersect(after.keySet)
    assert(untouched.size === 8, "8 of 10 files must survive the rewrite")
    untouched.foreach { n =>
      assert(before(n) === after(n), s"untouched file $n must not change")
    }
    val left = spark.read.parquet(s"$dir/t")
    assert(left.count() === 997)
    assert(left.filter(col("id").isin(doomed: _*)).count() === 0)
  }
}
