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

  /** INCREMENTAL pair-count store — the additive-statistics lifecycle
    * ([[Pca.momentsStored]]'s idea on retail data): co-occurrence
    * counts, item supports, and the basket total are all SUMS over
    * basket-disjoint batches, so each order batch appends only ITS
    * counts (one self-join over the batch, never the history) and the
    * report aggregates the store. Thresholds and lift apply at REPORT
    * time over the summed supports — the A-Priori prune cannot run per
    * batch (an item rare in one batch may be frequent overall), so the
    * store keeps raw counts; store volume is linear in data (distinct
    * pairs per batch ≤ Σ L_b²). One table, one commit per batch: rows
    * are discriminated by shape — (item_a, item_b, n) pair counts,
    * (item_a, NULL, n) item supports, (NULL, NULL, n) basket count —
    * through a single [[Stores.appendCommit]]. The commit is
    * exactly-once on COMPLETION (a retried crash converges to the
    * identical file set), but a crash MID-rename can leave a readable
    * store holding part of the batch's rows until the retry runs —
    * reports between a crash and its retry would mix partial
    * statistics, so the contract is the streaming loops': single
    * writer per tag, retry a failed append before the next report.
    * Caller guarantees basket-disjointness across batchTags (the
    * id-uniqueness contract every append store carries). */
  def pairStoreAppend(baskets: DataFrame, path: String, batchTag: String): DataFrame = {
    val spark = baskets.sparkSession
    val b = baskets.select(col("basket"), col("item")).distinct()
    val pairRows = b.as("x").join(b.as("y"),
        col("x.basket") === col("y.basket") && col("x.item") < col("y.item"))
      .groupBy(col("x.item").as("item_a"), col("y.item").as("item_b"))
      .agg(count(lit(1)).as("n"))
    // The NULL discriminators must carry the batch's OWN item dtype —
    // a hard-coded cast("long") breaks string-SKU catalogs (the union
    // would widen item_a to string on one branch and fail or coerce on
    // the other).
    val itemType = b.schema("item").dataType
    val nullItem = lit(null).cast(itemType)
    val itemRows = b.groupBy(col("item").as("item_a"))
      .agg(count(lit(1)).as("n"))
      .select(col("item_a"), nullItem.as("item_b"), col("n"))
    val totalRow = b.agg(countDistinct(col("basket")).as("n"))
      .select(nullItem.as("item_a"), nullItem.as("item_b"), col("n"))
    if (!Stores.exists(spark, path, "_SUCCESS"))
      pairRows.limit(0).write.mode("overwrite").parquet(path) // empty bootstrap
    Stores.appendCommit(spark, path, batchTag) { staging =>
      pairRows.unionAll(itemRows).unionAll(totalRow)
        .write.mode("overwrite").parquet(staging)
    }
    spark.read.parquet(path)
  }

  /** Frequent-pair report from a [[pairStoreAppend]] store: sum the
    * per-batch counts, then the same thresholds/lift as
    * [[frequentPairs]]. Equals a from-scratch [[frequentPairs]] run
    * over the union of all appended batches (additivity — the oracle
    * for q_copurchase_stored certifies it end-to-end). */
  def frequentPairsFromStore(spark: org.apache.spark.sql.SparkSession,
                             path: String, minItemSupport: Long,
                             minPairSupport: Long): DataFrame = {
    val st = spark.read.parquet(path)
    val pairs = st.filter(col("item_b").isNotNull)
      .groupBy(col("item_a"), col("item_b")).agg(sum(col("n")).as("support"))
      .filter(col("support") >= minPairSupport)
    val items = st.filter(col("item_b").isNull && col("item_a").isNotNull)
      .groupBy(col("item_a")).agg(sum(col("n")).as("supp"))
      .filter(col("supp") >= minItemSupport)
    val nBaskets = st.filter(col("item_a").isNull && col("item_b").isNull)
      .agg(sum(col("n")).as("n_baskets"))
    pairs
      .join(items.select(col("item_a"), col("supp").as("supp_a")), "item_a")
      .join(items.select(col("item_a").as("item_b"), col("supp").as("supp_b")),
        "item_b")
      .crossJoin(nBaskets)
      .select(col("item_a"), col("item_b"), col("support"),
        col("supp_a"), col("supp_b"),
        round(col("support").cast("double") * col("n_baskets")
          / (col("supp_a").cast("double") * col("supp_b")), 6).as("lift"))
  }

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
