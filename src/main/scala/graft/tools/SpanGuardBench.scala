package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc A/B for the hot-span guard formulations on a pre-built scaled
  * corpus: `runMain graft.tools.SpanGuardBench [docsPath] [reps]`.
  * Times duplicatedSpans window vs guard and spanDedup window vs guard
  * on the same input, interleaved, min-of-reps. */
object SpanGuardBench {
  def main(args: Array[String]): Unit = {
    val path = if (args.nonEmpty) args(0) else "/root/repo/tmp/scale_docs_32"
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = graft.core.GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(path)
    println(s"docs=${docs.count()}")
    def t(tag: String)(f: => Long): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val n = f
        spark.catalog.clearCache()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"$tag: min=${ts.map(_._1).min}%.2f s all=${ts.map(x => f"${x._1}%.2f").mkString(",")} rows=${ts.head._2}")
    }
    t("dup_spans window")(graft.ops.TextStats.duplicatedSpans(docs, 5).count())
    t("dup_spans guard ")(graft.ops.TextStats.duplicatedSpans(docs, 5, hotSpanGuard = true).count())
    t("span_dedup window")(graft.ops.Dedup.spanDedup(docs, 5).count())
    t("span_dedup guard ")(graft.ops.Dedup.spanDedup(docs, 5, hotSpanGuard = true).count())
    spark.stop()
  }
}
