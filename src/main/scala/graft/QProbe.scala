package graft
import org.apache.spark.sql.SparkSession
object QProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.tune(SparkSession.builder().master("local[32]"), 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    args.foreach { name =>
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = SparkEntry.queries(name)(spark, d).count()
        println(f"$name pass$i ${(System.nanoTime()-t0)/1e9}%.3f rows=$n")
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
