package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Piece-by-piece cost attribution for q_betweenness (r17 optimization
  * evidence): re-runs betweennessSeeded's exact stages over q_betweenness's
  * inputs with a wall-clock per stage and the AQE-final executed plan of
  * the backward contribution join — the bench's single number cannot
  * separate the forward BFS levels from the backward dependency join, and
  * the initial explain cannot show runtime join conversions.
  * Usage: runMain graft.BwProbe (sf via SPARK_GRAFT_SF_DIR, default sf0.1).
  */
object BwProbe {
  private def time[A](f: => A): (Double, A) = {
    val t0 = System.nanoTime(); val a = f
    ((System.nanoTime() - t0) / 1e9, a)
  }
  private def finalPlan(df: DataFrame): String =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.executedPlan.toString

  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession
      .tune(SparkSession.builder().master("local[32]"), 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val Q = 1073741824.0
    val li = graft.core.Tables.lineitem(spark, d)
      .select(col("l_orderkey"), col("l_partkey"))
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK

    (1 to 2).foreach { pass =>
      println(s"==== pass $pass ====")
      spark.catalog.clearCache()
      val (tB, _) = time {
        val edges = graft.ops.Graph.copurchaseEdges(li, "l_orderkey",
          "l_partkey", 5)
        edges.count()
      }
      println(f"edge_build(count) $tB%.3f s")
      spark.catalog.clearCache()

      // ---- betweennessSeeded stages, inlined ----
      val edges = graft.ops.Graph.copurchaseEdges(li, "l_orderkey",
        "l_partkey", 5)
      val seeds = graft.core.Tables.lineitem(spark, d)
        .select(col("l_partkey").as("part")).distinct()
        .filter(col("part") % 97 === 0)
      val e = edges.select(col("src"), col("dst")).persist(lvl)
      val (tE, nE) = time(e.count())
      println(f"persist_e $tE%.3f s edges=$nE")
      val s0 = seeds.select(col("part").as("seed")).distinct()
        .join(e.select(col("src").as("seed")).distinct(), Seq("seed"),
          "left_semi")
      var reached = s0.select(col("seed"), col("seed").as("node"))
        .localCheckpoint(true)
      var level = s0.select(col("seed"), col("seed").as("node"),
        lit(1L).as("sig")).localCheckpoint(true)
      println(f"seeds=${level.count()}")
      val levels = scala.collection.mutable.ArrayBuffer(level)
      val maxHops = 2
      (1 to maxHops).foreach { t =>
        val (tF, next) = time {
          level.withColumnRenamed("node", "src")
            .join(e, "src")
            .groupBy(col("seed"), col("dst").as("node"))
            .agg(sum(col("sig")).as("sig"))
            .join(reached, Seq("seed", "node"), "left_anti")
            .localCheckpoint(true)
        }
        val (tG, _) = time {
          if (t < maxHops) {
            val grown = reached.unionAll(next.select("seed", "node"))
              .localCheckpoint(true)
            reached = grown
          }
        }
        println(f"fwd_level$t $tF%.3f s (+grown $tG%.3f s) rows=${next.count()}")
        level = next
        levels += next
      }
      val (tS, lMax) = time {
        val sizes = levels.map(_.limit(1).count())
        sizes.lastIndexWhere(_ > 0L)
      }
      println(f"sizes $tS%.3f s lMax=$lMax")
      // backward
      var delta = levels(lMax).withColumn("num", lit(0L))
      val perLevel = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
      perLevel += delta.select(col("node"), col("num"))
      (lMax - 1 to 1 by -1).foreach { t =>
        val succ = delta.select(col("seed"), col("node").as("w"),
          col("sig").as("sig_w"), col("num").as("num_w"))
        val contrib = levels(t)
          .join(e.select(col("src").as("node"), col("dst").as("w")),
            Seq("node"))
          .join(succ, Seq("seed", "w"))
          .select(col("seed"), col("node"),
            floor(col("sig").cast("double") / col("sig_w").cast("double")
              * (lit(1.0) + col("num_w").cast("double") / lit(Q)) * lit(Q))
              .cast("long").as("c"))
          .groupBy("seed", "node").agg(sum(col("c")).as("num"))
        val (tD, nd) = time {
          levels(t).join(contrib, Seq("seed", "node"), "left")
            .select(col("seed"), col("node"), col("sig"),
              coalesce(col("num"), lit(0L)).as("num"))
            .localCheckpoint(true)
        }
        println(f"bwd_level$t $tD%.3f s rows=${nd.count()}")
        if (pass == 2 && t == 1)
          println("== backward level FINAL plan ==\n" + finalPlan(nd))
        delta = nd
        if (t >= 1) perLevel += nd.select(col("node"), col("num"))
      }
      val (tA, out) = time {
        val r = perLevel.reduce(_ unionAll _)
          .groupBy("node").agg(sum(col("num")).as("num"))
          .select(col("node"),
            (col("num").cast("double") / lit(Q)).as("betweenness"))
          .select(col("node").as("part"),
            round(col("betweenness"), 6).as("betweenness"))
          .orderBy(col("part"))
        r.count()
      }
      println(f"final_agg $tA%.3f s rows=$out")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
