package graft.ops

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Distributed graph analytics over plain edge lists.
  *
  * Beyond the reference surface: the co-purchase / co-occurrence graphs the
  * engine already builds (Baskets.frequentPairs, TextStats.cooccurrence,
  * Dedup.duplicateClusters' edge lists) invite centrality queries; this is
  * the iterative companion to the union-find clustering in
  * Dedup.duplicateClusters.
  *
  * Algorithm: PageRank (Brin & Page 1998, "The anatomy of a large-scale
  * hypertextual Web search engine") with a FIXED iteration count so the
  * result is a deterministic function of the edge list — the oracle can
  * replay the same unrolled recurrence.
  *
  * Scale: each iteration is exactly one shuffle-join (edges ⋈ ranks on src)
  * plus one aggregation (contributions by dst). The (src, dst, deg) edge
  * relation is persisted ONCE and reused by every iteration, so the per-
  * iteration cost is |E| shuffled bytes — never a cartesian, never
  * driver-side iteration over nodes. Rank state is 16 bytes per node.
  * Contribution sums run in DECIMAL(28,18) so the per-node inbound mass is
  * order-free exact (the q1_agg convention): the final ranks are
  * bit-identical across partitionings, engines, and retries.
  */
object Graph {

  /** PageRank over a DIRECTED edge list; pass both directions for an
    * undirected graph (then every node has out-degree >= 1, so no dangling-
    * mass correction is needed — this helper requires that invariant and
    * filters rank mass to nodes that appear as a source).
    *
    * @param edges   two columns, (srcCol, dstCol); duplicates are collapsed
    * @param iters   fixed number of power iterations (deterministic output)
    * @param damping PageRank damping factor d; rank = (1-d)/n + d * inMass
    * @return (node, rank) — one row per distinct node, rank a raw double
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int, damping: Double = 0.85): DataFrame = {
    val spark = edges.sparkSession
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst")).distinct()
    val deg = e.groupBy("src").agg(count(lit(1)).cast("long").as("deg"))
    // (src, dst, deg) is the loop-invariant relation: persist once, reuse
    // every iteration (re-shuffling |E| per iteration is the naive cost).
    val eDeg = e.join(deg, "src")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("node")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = nodes.count() // one driver scalar (node count), not row data
    val base = (1.0 - damping) / n

    var ranks = nodes.withColumn("rank", lit(1.0 / n))
    var prev: DataFrame = null
    for (_ <- 1 to iters) {
      val contribs = eDeg
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"),
          // order-free exact inbound mass: decimal partial aggregates
          (col("rank") / col("deg")).cast("decimal(28,18)").as("c"))
      val next = contribs.groupBy("node")
        .agg(sum(col("c")).as("in_mass"))
        .select(col("node"),
          (lit(base) + lit(damping) * col("in_mass").cast("double")).as("rank"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      next.count() // materialize before releasing the previous iteration
      if (prev != null) prev.unpersist()
      prev = next
      ranks = next
    }
    eDeg.unpersist()
    nodes.unpersist()
    ranks
  }

  /** Co-purchase edge list from (basket, item) rows: undirected item pairs
    * that share a basket, emitted in BOTH directions, with the same
    * min-item-support prefilter as Baskets.frequentPairs so the per-basket
    * pair blow-up is bounded by frequent items only (the df-cap pattern —
    * rare long-tail items never enter the quadratic step).
    */
  def copurchaseEdges(baskets: DataFrame, basketCol: String, itemCol: String,
                      minItemSupport: Long): DataFrame = {
    val b = baskets.select(col(basketCol).as("basket"), col(itemCol).as("item"))
      .distinct()
    val freq = b.groupBy("item").agg(count(lit(1)).as("supp"))
      .filter(col("supp") >= minItemSupport)
      .select("item")
    val fb = b.join(freq, "item").select("basket", "item")
    fb.as("x").join(fb.as("y"),
        col("x.basket") === col("y.basket") && col("x.item") =!= col("y.item"))
      .select(col("x.item").as("src"), col("y.item").as("dst"))
      .distinct()
  }
}
