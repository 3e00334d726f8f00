package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Cost attribution for the iterative graph family (the bench's most
  * expensive block): separates the shared co-purchase EDGE BUILD from
  * the per-iteration loop cost, by timing (a) the edge relation forced
  * alone, then (b) pageRank at two iteration counts on the SAME
  * pre-persisted edges — per-round = (t_hi − t_lo)/(hi − lo), loop
  * overhead amortizes out — and (c) kCore / labelPropagation end-to-end
  * on those edges (build excluded). Grounds the "per-round join
  * dominates at scale, job overhead amortizes" extrapolation in
  * numbers instead of assertion.
  *
  * Usage: runMain graft.GraphProbe   (sf dir via SPARK_GRAFT_SF_DIR)
  */
object GraphProbe {
  private def time[A](f: => A): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession
      .tune(SparkSession.builder().master("local[32]"), 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val li = graft.core.Tables.lineitem(spark, d)
      .select(col("l_orderkey"), col("l_partkey"))
    // edge build, forced alone (persist mirrors what the ops do)
    val edges = graft.ops.Graph.copurchaseEdges(
        li, "l_orderkey", "l_partkey", minItemSupport = 5)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tBuild = time(edges.count())
    val nE = edges.count()
    println(f"edge_build $tBuild%.3f s  edges=$nE")
    // pageRank per-round cost: two iteration counts on the SAME edges
    val lo = 2; val hi = 8
    val tLo = time(graft.ops.Graph
      .pageRank(edges, "src", "dst", iters = lo).count())
    val tHi = time(graft.ops.Graph
      .pageRank(edges, "src", "dst", iters = hi).count())
    val perRound = (tHi - tLo) / (hi - lo)
    println(f"pagerank iters=$lo $tLo%.3f s; iters=$hi $tHi%.3f s; " +
      f"per_round ${perRound}%.3f s; fixed ${tLo - lo * perRound}%.3f s")
    // lpa: per-round the same way (iters is a parameter)
    val tL2 = time(graft.ops.Graph
      .labelPropagation(edges, "src", "dst", iters = 2).count())
    val tL6 = time(graft.ops.Graph
      .labelPropagation(edges, "src", "dst", iters = 6).count())
    println(f"lpa iters=2 $tL2%.3f s; iters=6 $tL6%.3f s; " +
      f"per_round ${(tL6 - tL2) / 4}%.3f s; " +
      f"fixed ${tL2 - 2 * (tL6 - tL2) / 4}%.3f s")
    // kCore: fixed-point peeling — loop cost = end-to-end on pre-built
    // edges at two thresholds (rounds differ with k)
    val tK80 = time(graft.ops.Graph
      .kCore(edges, "src", "dst", k = 80L).count())
    val tK40 = time(graft.ops.Graph
      .kCore(edges, "src", "dst", k = 40L).count())
    println(f"kcore k=80 $tK80%.3f s; k=40 $tK40%.3f s (build excluded)")
    // walks: per-hop cost (each hop = one equi-join on the indexed
    // adjacency; should be linear in walkLen)
    val tW3 = time(graft.ops.Graph
      .deterministicWalks(edges, "src", "dst", 3, "p").count())
    val tW6 = time(graft.ops.Graph
      .deterministicWalks(edges, "src", "dst", 6, "p").count())
    println(f"walks L=3 $tW3%.3f s; L=6 $tW6%.3f s; " +
      f"per_hop ${(tW6 - tW3) / 3}%.3f s")
    spark.stop()
  }
}
