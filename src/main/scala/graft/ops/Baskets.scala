package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Frequent-pair mining (market-basket co-occurrence) — the classic
  * self-join-explosion operator, bounded the A-Priori way: an item pair
  * can only be frequent if BOTH items are frequent alone (Agrawal &
  * Srikant, VLDB 1994), so the per-basket pair explosion runs over the
  * FREQUENT-item projection of each basket, never the raw one. The same
  * prune discipline as the n-gram df cap, pointed at the opposite tail:
  * the df cap drops too-common keys, A-Priori drops too-rare ones —
  * both exist to keep a self-join's per-key fan-out plan-bounded.
  *
  * Plan: one distinct (basket, item) exchange, one item-support
  * aggregate, the support filter, then a basket-keyed self-join whose
  * two sides hash-partition identically (one exchange each, no sort),
  * and a pair-keyed count. Per-basket cost is L² over the basket's
  * FREQUENT-item count L; `maxBasketSize` is the hot-basket guard for
  * corpora with degenerate mega-baskets (a crawl session with 10⁶
  * items would otherwise own 10¹² pair rows — the same reasoning as
  * the span family's hot-span guard). At 100 TB: supports are additive
  * longs (map-side partial agg), nothing driver-sized, no broadcast of
  * corpus-scale state. */
object Baskets {

  /** (item_a, item_b, support, supp_a, supp_b, lift) for every pair of
    * frequent items co-occurring in ≥ `minPairSupport` baskets.
    * lift = P(ab) / (P(a)·P(b)) = support·n_baskets / (supp_a·supp_b):
    * > 1 ⇒ the items attract, < 1 ⇒ they repel. */
  def frequentPairs(baskets: DataFrame, basketCol: String, itemCol: String,
                    minItemSupport: Long, minPairSupport: Long,
                    maxBasketSize: Option[Int] = None): DataFrame = {
    require(minItemSupport >= 1 && minPairSupport >= 1, "supports must be >= 1")
    val b = baskets
      .select(col(basketCol).as("basket"), col(itemCol).as("item"))
      .distinct()
    val freq = b.groupBy(col("item"))
      .agg(count(lit(1)).as("supp"))
      .filter(col("supp") >= minItemSupport)
    val fb0 = b.join(freq, "item")
    // hot-basket guard: drop baskets whose FREQUENT-item count exceeds
    // the cap (guard applies after the A-Priori projection — a huge
    // basket of rare items is already gone)
    val fb = maxBasketSize.fold(fb0) { cap =>
      fb0.join(
        fb0.groupBy(col("basket")).agg(count(lit(1)).as("bsz"))
          .filter(col("bsz") <= cap).select("basket"),
        Seq("basket"), "left_semi")
    }
    val nBaskets = b.agg(countDistinct(col("basket")).as("n_baskets"))
    fb.as("x").join(fb.as("y"),
        col("x.basket") === col("y.basket") && col("x.item") < col("y.item"))
      .groupBy(col("x.item").as("item_a"), col("y.item").as("item_b"),
        col("x.supp").as("supp_a"), col("y.supp").as("supp_b"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minPairSupport)
      .crossJoin(nBaskets) // 1-row: the q_funnel_steps base-row shape
      .select(col("item_a"), col("item_b"), col("support"),
        col("supp_a"), col("supp_b"),
        round(col("support").cast("double") * col("n_baskets")
          / (col("supp_a").cast("double") * col("supp_b")), 6).as("lift"))
  }
}
