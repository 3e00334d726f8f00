package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-by-stage cost attribution for the co-purchase edge build —
  * the lineage every graph query pays before its own algorithm starts
  * (r17 optimization evidence). Times each materialization boundary of
  * [[graft.ops.Graph.copurchaseEdges]] separately, then the build as a
  * whole, with the executed plan of the heavy pair-distinct step.
  * Usage: runMain graft.EdgeProbe (sf via SPARK_GRAFT_SF_DIR).
  */
object EdgeProbe {
  private def time[A](f: => A): (Double, A) = {
    val t0 = System.nanoTime(); val a = f
    ((System.nanoTime() - t0) / 1e9, a)
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession
      .tune(SparkSession.builder().master("local[32]"), 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK

    (1 to 2).foreach { pass =>
      println(s"==== pass $pass ====")
      spark.catalog.clearCache()
      val baskets = graft.core.Tables.lineitem(spark, d)
        .select(col("l_orderkey").as("basket"), col("l_partkey").as("item"))
      val (tScan, nRaw) = time(baskets.count())
      println(f"raw_scan $tScan%.3f s rows=$nRaw")

      val sets0 = baskets.groupBy("basket")
        .agg(collect_set(col("item")).as("items")).persist(lvl)
      val (t1, nSets) = time(sets0.count())
      println(f"sets0 $t1%.3f s rows=$nSets")

      val b = sets0.select(col("basket"), explode(col("items")).as("item"))
      val freq = b.groupBy("item").agg(count(lit(1)).as("supp"))
        .filter(col("supp") >= 5).select("item").persist(lvl)
      val (t2, nFreq) = time(freq.count())
      println(f"freq $t2%.3f s rows=$nFreq")

      val fsets = b.join(freq, "item")
        .groupBy("basket").agg(collect_set(col("item")).as("items"))
        .persist(lvl)
      val (t3, nF) = time(fsets.count())
      println(f"fsets $t3%.3f s rows=$nF")

      val pairs = fsets
        .select(explode(col("items")).as("src"), col("items"))
        .select(col("src"), explode(col("items")).as("dst"))
        .filter(col("src") < col("dst"))
      val (t4, nP) = time(pairs.count())
      println(f"pair_emit(count-only) $t4%.3f s rows=$nP")

      val half = pairs.distinct().persist(lvl)
      val (t5, nH) = time(half.count())
      println(f"half_distinct $t5%.3f s rows=$nH")

      val full = half.unionAll(
        half.select(col("dst").as("src"), col("src").as("dst")))
      val (t6, nE) = time(full.count())
      println(f"mirror_count $t6%.3f s rows=$nE")
      spark.catalog.clearCache()

      // whole build end-to-end for reference
      val (tAll, nAll) = time {
        graft.ops.Graph.copurchaseEdges(
          graft.core.Tables.lineitem(spark, d)
            .select(col("l_orderkey"), col("l_partkey")),
          "l_orderkey", "l_partkey", 5).count()
      }
      println(f"whole_build $tAll%.3f s rows=$nAll")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
