package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Same-session A/B of the co-purchase edge-build shapes (r16
  * optimization evidence under host-steal noise): alternates the OLD
  * full-pair distinct against the NEW canonical-half + persisted
  * mirror, 3 passes each, fresh cache per pass. */
object EdgeAB {
  private def time[A](f: => A): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession
      .tune(SparkSession.builder().master("local[32]"), 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK

    def base(): DataFrame = {
      val li = graft.core.Tables.lineitem(spark, d)
        .select(col("l_orderkey"), col("l_partkey"))
      li.select(col("l_orderkey").as("basket"), col("l_partkey").as("item"))
        .groupBy("basket").agg(collect_set(col("item")).as("items"))
        .persist(MEMORY_AND_DISK)
    }
    def fsetsOf(sets0: DataFrame): DataFrame = {
      val b = sets0.select(col("basket"), explode(col("items")).as("item"))
      val freq = b.groupBy("item").agg(count(lit(1)).as("supp"))
        .filter(col("supp") >= 5).select("item")
      b.join(freq, "item")
        .groupBy("basket").agg(collect_set(col("item")).as("items"))
    }
    def oldShape(): Long = {
      val fsets = fsetsOf(base())
      fsets.select(explode(col("items")).as("src"), col("items"))
        .select(col("src"), explode(col("items")).as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct().count()
    }
    def newShape(): Long = {
      val fsets = fsetsOf(base())
      val half = fsets.select(explode(col("items")).as("src"), col("items"))
        .select(col("src"), explode(col("items")).as("dst"))
        .filter(col("src") < col("dst"))
        .distinct().persist(MEMORY_AND_DISK)
      half.unionAll(half.select(col("dst").as("src"), col("src").as("dst")))
        .count()
    }
    // warmup both
    oldShape(); spark.catalog.clearCache()
    newShape(); spark.catalog.clearCache()
    (1 to 3).foreach { i =>
      val tO = time(oldShape()); spark.catalog.clearCache()
      val tN = time(newShape()); spark.catalog.clearCache()
      println(f"pass$i old $tO%.3f s; new(half-persist) $tN%.3f s")
    }
    spark.stop()
  }
}
