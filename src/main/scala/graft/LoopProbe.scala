package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-round cost attribution for the iterative graph loops (r16
  * optimization evidence): executes a single pageRank / kCore / LPA
  * round over pre-persisted co-purchase edges and prints the AQE-FINAL
  * executed plan plus wall time per piece — the initial `explain` of a
  * loop round cannot show runtime SMJ→BHJ conversions, and the bench's
  * per-query numbers cannot separate the round's joins from its
  * aggregations. Usage: runMain graft.LoopProbe (sf via
  * SPARK_GRAFT_SF_DIR, default sf0.1).
  */
object LoopProbe {
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
    val li = graft.core.Tables.lineitem(spark, d)
      .select(col("l_orderkey"), col("l_partkey"))
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val edges = graft.ops.Graph.copurchaseEdges(li, "l_orderkey",
      "l_partkey", 5).persist(lvl)
    val (tB, nE) = time(edges.count())
    println(f"edge_build $tB%.3f s edges=$nE")
    // warm pass so JIT/codegen don't pollute the round timings
    edges.count()

    // ---- pageRank round pieces (edgesDistinct shape) ----
    val deg = edges.groupBy("src").agg(count(lit(1)).cast("long").as("deg"))
      .persist(lvl)
    val nodes = deg.select(col("src").as("node")).persist(lvl)
    val (tN, n) = time(nodes.count())
    val eDeg = edges.join(deg, "src").persist(lvl)
    val (tED, _) = time(eDeg.count())
    println(f"pr_prep deg+nodes $tN%.3f s; eDeg $tED%.3f s; n=$n")
    var ranks = nodes.withColumn("rank", lit(1.0 / n))
    (1 to 2).foreach { it =>
      val contribs = eDeg
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"),
          floor((col("rank") / col("deg")) * lit(1e18)).cast("long").as("c"))
      val inMass = contribs.groupBy("node").agg(sum(col("c")).as("in_mass"))
      val joined = nodes.join(inMass, Seq("node"), "left")
        .select(col("node"),
          (lit(0.15 / n) + lit(0.85) *
            (coalesce(col("in_mass"), lit(0L)).cast("double") / lit(1e18)))
            .as("rank"))
      val (tR, next) = time(joined.localCheckpoint(true))
      println(f"pr_round$it $tR%.3f s")
      if (it == 2) println("== pageRank round FINAL plan ==\n" +
        finalPlan(joined))
      ranks = next
    }

    // ---- kCore round pieces ----
    var cur = edges.localCheckpoint(true)
    (1 to 2).foreach { round =>
      val keep = cur.groupBy("src").agg(count(lit(1)).as("_d"))
        .filter(col("_d") >= 80L).select(col("src").as("node"))
      val nxt = cur
        .join(keep.select(col("node").as("src")), Seq("src"), "left_semi")
        .join(keep.select(col("node").as("dst")), Seq("dst"), "left_semi")
        .select("src", "dst")
      val (tK, nk) = time(nxt.localCheckpoint(true))
      println(f"kcore_round$round $tK%.3f s")
      if (round == 2) println("== kCore round FINAL plan ==\n" +
        finalPlan(nxt))
      cur = nk
    }

    // ---- LPA round pieces ----
    var labels = nodes.select(col("node"), col("node").as("label"))
    (1 to 2).foreach { it =>
      val counts = edges.join(labels.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node"), col("label"))
        .agg(count(lit(1)).as("cnt"))
      val top = counts.groupBy(col("node"))
        .agg(max_by(col("label"),
          struct(col("cnt"), (-col("label")).as("nl"))).as("label"))
      val nxt = nodes.join(top, Seq("node"), "left")
        .select(col("node"), coalesce(col("label"), col("node")).as("label"))
      val (tL, nl) = time(nxt.localCheckpoint(true))
      println(f"lpa_round$it $tL%.3f s")
      if (it == 2) println("== LPA round FINAL plan ==\n" + finalPlan(nxt))
      labels = nl
    }
    spark.stop()
  }
}
