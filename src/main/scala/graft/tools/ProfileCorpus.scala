package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.Text
import graft.core.Tables
import graft.ops.Dedup

/** Stage timing for q_corpus_pipeline (scratch). */
object ProfileCorpus {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = graft.core.GraftSession.tune(
      SparkSession.builder().master("local[32]"), shufflePartitions = 32
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s = $r"); r
    }
    (1 to 3).foreach { rep =>
      println(s"=== rep $rep ===")
      val docs = Tables.documents(spark, sfDir)
      val kept = docs
        .withColumn("fp", Text.fingerprint(col("text")))
        .withColumn("keep_id", min(col("doc_id")).over(Window.partitionBy(col("fp"))))
        .filter(col("doc_id") === col("keep_id"))
        .drop("fp", "keep_id")
      t("kept (exact dedup)")(kept.count())
      val nearDupIds = Dedup.minhashLsh(kept, tau = 0.5,
        shingleLen = 3, bands = 8, rowsPerBand = 4)
        .select(col("id_b").as("doc_id")).distinct()
      t("nearDupIds")(nearDupIds.count())
      val depuped = kept.join(nearDupIds, Seq("doc_id"), "left_anti")
      t("anti join")(depuped.count())
      val out = depuped
        .withColumn("q", Text.qualityScore(col("text")))
        .filter(col("q") >= 0.5)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(Text.tokenCount(col("text")).cast("long")).as("sum_tokens"),
          sum(col("q").cast("decimal(9,6)")).cast("double").as("sum_quality"))
      t("full")(out.count())
    }
    spark.stop()
  }
}
