package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Same-JVM A/B of the r17 size-gated state broadcasts on the loop ops:
  * toggles spark.graft.broadcastStateRows between 0 (off — the r16
  * shuffle plan) and the default gate, alternating passes so JIT and
  * page-cache warmth cannot favor one arm. Usage: runMain graft.KcAB
  * [queryName ...] (default q_kcore).
  */
object KcAB {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession
      .tune(SparkSession.builder().master("local[32]"), 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    val names = if (args.nonEmpty) args.toSeq else Seq("q_kcore")
    names.foreach { name =>
      (1 to 3).foreach { i =>
        Seq("0", "4000000").foreach { gate =>
          spark.conf.set("spark.graft.broadcastStateRows", gate)
          val t0 = System.nanoTime()
          val n = SparkEntry.queries(name)(spark, d).count()
          println(f"$name gate=$gate pass$i ${(System.nanoTime() - t0) / 1e9}%.3f rows=$n")
          spark.catalog.clearCache()
        }
      }
    }
    spark.stop()
  }
}
