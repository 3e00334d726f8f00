package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.functions.Text

/** Deterministic sampling and corpus-composition primitives.
  *
  * A 100 TB training-data pipeline cannot use `rand()`-based sampling:
  * re-runs must reproduce the same corpus bit-for-bit (for cache reuse,
  * audits, and incremental rebuilds), and the keep/drop decision must be
  * computable anywhere — map-side, with no coordination. Every op here
  * derives its randomness from `md5(seed ++ key)` (the engine's standard
  * 60-bit hash, [[Text.hash64]]), so sampling is a pure, codegen'd
  * projection/filter: no shuffle for Bernoulli/mix, one bounded shuffle
  * for stratified/positioned variants.
  *
  * The reference has no sampling surface (its views are exact); these are
  * part of the beyond-the-reference training-data toolkit, in the same
  * oracle-checked style.
  */
object Sampling {

  /** Keep/drop decisions are made on a fixed 10^6 lattice: hash maps each
    * key to a uniform unit in [0, 1e6); a fraction f keeps units
    * < f·1e6. Coarser than a double but exactly mirrorable in SQL. */
  val SCALE = 1000000L

  /** Uniform unit in [0, SCALE) as a pure function of (seed, key). */
  def hashUnit(key: Column, seed: Int): Column =
    pmod(Text.hash64(key.cast("string"), seed), lit(SCALE))

  /** Deterministic Bernoulli sample: keep a row iff its key's hash unit
    * falls below fraction·SCALE. Map-only (a codegen'd filter directly
    * over the scan — no shuffle, no state); rerunning with the same seed
    * reproduces the exact sample, and disjoint seeds give independent
    * samples for held-out splits. */
  def bernoulli(df: DataFrame, fraction: Double, keyCol: String,
                seed: Int = 42): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction in [0,1], got $fraction")
    // round, don't truncate: 0.29 * 1e6 is 289999.99…
    df.filter(hashUnit(col(keyCol), seed) < lit(math.round(fraction * SCALE)))
  }

  /** Deterministic k-per-stratum sample — the batch analog of a per-key
    * reservoir: within each stratum, the k keys with the smallest hash
    * units win (hash order IS the random order, but reproducible).
    *
    * Hot strata at scale: the row_number ≤ k filter is recognized by
    * Catalyst's rank-limit rewrite, which plants a PARTIAL
    * WindowGroupLimit below the exchange — every map task pre-prunes to
    * its local top-k per stratum before shuffling, so the per-stratum
    * sort sees at most k·partitions rows, never the whole stratum. (A
    * hand-rolled two-phase prune replicated exactly this and cost one
    * extra exchange — verified in the physical plan.)
    */
  def stratifiedK(df: DataFrame, strataCols: Seq[String], k: Int,
                  keyCol: String, seed: Int = 42): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val w = Window.partitionBy(strataCols.map(col): _*)
      .orderBy(col("_h"), col(keyCol))
    df.withColumn("_h", hashUnit(col(keyCol), seed))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k)
      .drop("_h", "_rn")
  }

  /** Per-group QUALITY cap — the C4/RefinedWeb "at most k documents per
    * domain, best first" rule: rank within each group by (scoreCol
    * DESC, keyCol ASC — the tiebreak makes the cut deterministic) and
    * keep rank ≤ k. Over-represented boilerplate domains are truncated
    * to their k best docs; small domains pass through whole.
    *
    * Differs from [[stratifiedK]] in WHAT survives: stratifiedK keeps a
    * hash-random k per stratum (unbiased sample), this keeps the TOP-k
    * by a quality signal (curation). Same scale shape: Catalyst plans
    * the rank filter as two-phase WindowGroupLimit, so every map task
    * prunes to its local top-k before the per-group exchange — a hot
    * domain never sorts whole partitions. */
  def capPerGroup(df: DataFrame, groupCol: String, scoreCol: String,
                  k: Int, keyCol: String): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(scoreCol).desc, col(keyCol).asc)
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k)
      .drop("_rn")
  }

  /** Weighted corpus mixing: per-group target rates, with rates > 1
    * upsampling by duplication. A row in group g with weight w emits
    * floor(w) copies plus one more iff its hash unit < frac(w)·SCALE —
    * so expected multiplicity is exactly w, decided row-locally.
    *
    * Output gains a `copy` column (0-based duplicate index) so
    * downstream stages can tell replicas apart. Groups absent from
    * `weights` get weight 0 (dropped). The weights table is broadcast —
    * the corpus never shuffles. */
  def weightedMix(df: DataFrame, groupCol: String, weights: Map[String, Double],
                  keyCol: String, seed: Int = 42): DataFrame = {
    require(weights.values.forall(_ >= 0), "weights must be >= 0")
    val spark = df.sparkSession
    val wrows = weights.toSeq.sortBy(_._1).map { case (g, w) =>
      (g, math.floor(w).toLong, math.round((w - math.floor(w)) * SCALE))
    }
    import spark.implicits._
    val wdf = wrows.toDF(groupCol, "_whole", "_fracThr")
    val copies = (col("_whole")
      + when(hashUnit(col(keyCol), seed) < col("_fracThr"), 1L).otherwise(0L))
    df.join(broadcast(wdf), Seq(groupCol))
      .withColumn("_copies", copies)
      .filter(col("_copies") > 0)
      .withColumn("copy", explode(sequence(lit(0L), col("_copies") - 1)))
      .drop("_whole", "_fracThr", "_copies")
  }

  /** Temperature-balanced corpus mixing — the n^α source re-weighting of
    * multilingual / multi-source LM training (α=1 keeps natural
    * proportions, α→0 approaches uniform-per-group; GPT-3/PaLM use
    * α ≈ 0.3–0.7): group g's share of the output is n_g^α / Σ n^α, at
    * an expected output size of `totalFraction`·N rows. Rates are
    * computed on the driver from the per-group counts (one tiny agg —
    * #groups rows) and delegated to [[weightedMix]], so the corpus-side
    * work is the same map-only copies projection; rates > 1 upsample
    * rare groups by duplication.
    *
    * Cross-engine exactness: for α = 0.5 the weight math is `sqrt` —
    * correctly rounded by IEEE-754, unlike `pow`/`ln` — and the fold
    * over groups runs in group-ascending order, so the oracle replays
    * the rate computation bit-for-bit (other α work but carry pow's
    * engine-dependent last ulp; keep them out of hash-checked paths). */
  def temperatureMix(df: DataFrame, groupCol: String, alpha: Double,
                     totalFraction: Double, keyCol: String,
                     seed: Int = 42): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha in (0,1], got $alpha")
    require(totalFraction > 0, s"totalFraction must be > 0, got $totalFraction")
    def powA(x: Double) = if (alpha == 0.5) math.sqrt(x) else math.pow(x, alpha)
    // NULL groups are dropped, matching the delegate's contract (a null
    // group key never matches the weights join) — and a null in sortBy
    // would NPE the driver-side rate fold
    val counts = df.filter(col(groupCol).isNotNull)
      .groupBy(col(groupCol).cast("string").as("g"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    val ntot = counts.map(_._2).sum.toDouble
    var sw = 0.0
    counts.foreach { case (_, n) => sw += powA(n.toDouble) } // group-asc fold
    val rates = counts.map { case (g, n) =>
      g -> ((totalFraction * ntot) * (powA(n.toDouble) / sw)) / n.toDouble
    }
    weightedMix(df, groupCol, rates.toMap, keyCol, seed)
  }

  /** Token-budget mixing — fit a TOKEN budget, not a row fraction: the
    * "how many epochs of each source" arithmetic of LM data recipes.
    * Source s gets budget share tok_s^α / Σ tok^α (temperature over
    * token MASS — α=1 natural, α→0 uniform-per-source), so each of its
    * docs repeats at epochs_s = (budget · share_s) / tok_s; >1 means
    * multiple epochs of a rare source, <1 downsamples an abundant one.
    * At α=1 every source's epoch count collapses to budget/Σtok — the
    * "one mixing ratio for the whole corpus" identity.
    *
    * Per-source token totals are one tiny aggregate (#sources rows) to
    * the driver; the corpus-side work is [[weightedMix]]'s map-only
    * copies projection — the corpus never shuffles. Same cross-engine
    * exactness discipline as [[temperatureMix]]: α = 0.5 uses sqrt
    * (IEEE-correctly-rounded, unlike pow/ln) and the share fold runs
    * group-ascending, so an oracle replays the epoch math bit-for-bit. */
  def budgetMix(df: DataFrame, groupCol: String, tokensCol: String,
                budgetTokens: Long, alpha: Double, keyCol: String,
                seed: Int = 42): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha in (0,1], got $alpha")
    require(budgetTokens > 0, s"budgetTokens must be > 0, got $budgetTokens")
    def powA(x: Double) = if (alpha == 0.5) math.sqrt(x) else math.pow(x, alpha)
    val counts = df.filter(col(groupCol).isNotNull)
      .groupBy(col(groupCol).cast("string").as("g"))
      .agg(sum(col(tokensCol)).as("tok"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    var sw = 0.0
    counts.foreach { case (_, t) => sw += powA(t.toDouble) } // group-asc fold
    val rates = counts.map { case (g, t) =>
      g -> (budgetTokens.toDouble * (powA(t.toDouble) / sw)) / t.toDouble
    }
    weightedMix(df, groupCol, rates.toMap, keyCol, seed)
  }

  /** Weighted sample WITHOUT replacement (sequential Poisson / Ohlsson
    * order sampling): each row gets priority `u / w` (its hash unit over
    * its weight) and the k smallest priorities win — heavier rows draw
    * proportionally smaller priorities, approximating πps inclusion.
    *
    * The priority is ONE IEEE division of exactly-representable
    * operands (integer hash unit, caller-supplied weight), so ranks are
    * bit-identical across engines — the property that lets
    * `q_weighted_sample` hash-match DuckDB (the usual u^(1/w) / −ln(u)/w
    * keys need pow/ln, which carry no cross-engine rounding guarantee).
    * Physical shape: `orderBy(priority).limit(k)` plans as
    * TakeOrderedAndProject — per-partition k-row heaps, no global sort,
    * no single-partition window. */
  def weightedK(df: DataFrame, k: Int, keyCol: String, weightCol: String,
                seed: Int = 42): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // weight null/0 ⇒ NEVER selected. Without the filter, Spark's
    // non-ANSI divide yields a NULL priority that sorts NULLS FIRST —
    // such rows would unconditionally WIN sample slots (and DuckDB,
    // sorting NULLS LAST, would disagree).
    df.filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn("_pri",
        hashUnit(col(keyCol), seed).cast("double") / col(weightCol))
      .orderBy(col("_pri"), col(keyCol))
      .limit(k)
      .drop("_pri")
  }

  /** Deterministic train/validation/test assignment: the hash unit is cut
    * at the cumulative fraction boundaries, so every row gets exactly one
    * split label, reruns reproduce the assignment, and growing one split
    * never moves rows between the OTHERS (a row's unit is fixed; only
    * boundary shifts re-label). Map-only, coordination-free — the only
    * splitting discipline that survives a distributed 100 TB corpus
    * rebuild. `fractions` must sum to 1. */
  def splits(df: DataFrame, fractions: Seq[(String, Double)], keyCol: String,
             seed: Int = 42): DataFrame = {
    require(fractions.nonEmpty && fractions.forall(_._2 >= 0))
    val total = fractions.map(_._2).sum
    require(math.abs(total - 1.0) < 1e-9, s"fractions must sum to 1, got $total")
    val bounds = fractions.scanLeft(0L) { case (acc, (_, f)) =>
      acc + math.round(f * SCALE)
    }.tail
    val unit = hashUnit(col(keyCol), seed)
    val labeled = fractions.map(_._1).zip(bounds).init
      .foldRight(lit(fractions.last._1)) { case ((name, hi), els) =>
        when(unit < hi, name).otherwise(els)
      }
    df.withColumn("split", labeled)
  }

  /** Leakage-safe train/val/test assignment: the split unit is the
    * near-duplicate CLUSTER, not the document. A naive per-doc split
    * puts a doc in eval while its near-twin trains — the benchmark-
    * leakage failure mode that survives even perfect decontamination
    * of EXTERNAL eval sets. Here every doc hashes on its duplicate-
    * cluster representative (`clusters` = the (id, cluster_id) frame
    * from [[Dedup.duplicateClusters]]; unclustered docs — the
    * overwhelming majority — group as themselves via left join +
    * coalesce), so connected docs always land in the SAME split.
    *
    * Cost: ONE join against the cluster table (duplicate-graph-sized,
    * orders of magnitude under the corpus — Catalyst/AQE broadcasts it
    * when it fits, falls back to a shuffle join when a pathological dup
    * rate inflates it), then the same map-only hash-cut as [[splits]]
    * with its determinism and boundary-monotonicity contract — on the
    * group key. Output adds `split_group` (the unit that hashed) and
    * `split`. */
  def leakageSafeSplits(docs: DataFrame, clusters: DataFrame,
                        fractions: Seq[(String, Double)], keyCol: String,
                        seed: Int = 42): DataFrame = {
    val grouped = docs
      .join(clusters.select(col("id").as(keyCol), col("cluster_id")),
        Seq(keyCol), "left")
      .withColumn("split_group",
        coalesce(col("cluster_id"), col(keyCol).cast("long")))
      .drop("cluster_id")
    splits(grouped, fractions, "split_group", seed)
  }

  /** Deterministic global shuffle for training export: rows ordered by
    * hash unit (ties by key) with an explicit 0-based `pos` — the record
    * order a trainer would consume.
    *
    * Scalably: range-partition + sort locally (an ordinary distributed
    * sort — no single-partition window), then assign positions by
    * offsetting each partition with the total row count of the
    * partitions before it (one extra count pass over the sorted data;
    * the classic zipWithIndex shape). Only per-partition counts travel
    * to the driver. */
  def shuffledExport(df: DataFrame, keyCol: String, seed: Int = 42): DataFrame = {
    val spark = df.sparkSession
    val sorted = df
      .withColumn("_h", hashUnit(col(keyCol), seed))
      .repartitionByRange(col("_h"), col(keyCol))
      .sortWithinPartitions(col("_h"), col(keyCol))
    val rdd = sorted.drop("_h").rdd.zipWithIndex().map { case (row, i) =>
      Row.fromSeq(row.toSeq :+ i)
    }
    val schema = sorted.drop("_h").schema.add("pos", LongType, nullable = false)
    spark.createDataFrame(rdd, schema)
  }

  /** Trainer-facing sharded export: rows in the [[shuffledExport]]
    * order, cut into fixed-size shards — `shard = pos div shardSize`,
    * `pos_in_shard = pos % shardSize`. Deterministic end to end (the
    * order is the reproducible hash order), so a rebuilt export is the
    * SAME export; write with `partitionBy("shard")` for one file set
    * per shard. Map-only on top of the position assignment. */
  def exportShards(df: DataFrame, shardSize: Int, keyCol: String,
                   seed: Int = 42): DataFrame = {
    require(shardSize >= 1, s"shardSize must be >= 1, got $shardSize")
    shuffledExport(df, keyCol, seed)
      .withColumn("shard", expr(s"pos div $shardSize"))
      .withColumn("pos_in_shard", expr(s"pos % $shardSize"))
  }

  /** Per-shard manifest — the verifiable artifact a rebuilt or
    * transferred export is checked against: row count, position range,
    * and a CONTENT fingerprint (md5 over the shard's per-row
    * fingerprints concatenated in shard order). Content hashing is
    * deliberate: parquet bytes are not canonical (encoder/metadata
    * variance), so byte checksums can't certify a rebuild — the
    * ordered row-fingerprint chain can, in any engine. State per
    * group is shardSize rows by construction, so the aggregate is
    * bounded no matter how big the export. */
  def shardManifest(shards: DataFrame, fpCol: String): DataFrame =
    shards.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("pos")).as("min_pos"), max(col("pos")).as("max_pos"),
        md5(array_join(transform(
          array_sort(collect_list(struct(col("pos"), col(fpCol).as("fp")))),
          x => x.getField("fp")), "")).as("content_fp"))

  /** Neyman-optimal sample-size allocation (Neyman 1934: sampling a
    * fixed budget across strata minimizes the estimator's variance when
    * n_h ∝ N_h·σ_h) — the planner an eval-set builder runs before
    * [[stratifiedK]]: high-variance strata (mixed-quality crawl
    * sources) get proportionally more of the label budget than uniform
    * ones; proportional-to-size allocation wastes budget on big uniform
    * strata.
    *
    * Engine-replayable by construction, which naive implementations are
    * NOT: σ_h needs one sqrt (IEEE correctly rounded — fine), but
    * summing the double weights across strata is ORDER-DEPENDENT, and
    * two engines disagreeing in the 15th digit can flip a largest-
    * remainder rank. So the weight is floored to an INTEGER
    * (⌊N_h·σ_h·2^scaleBits⌋) immediately after the one per-stratum
    * double step, and everything downstream — the weight total, the
    * floor allocations, the remainders, the leftover distribution — is
    * exact integer/decimal arithmetic with stratum-ascending tiebreaks.
    * Moments use decimal(38,0) sums (order-free); variance is the one
    * division. Σ alloc = budget exactly (largest-remainder invariant).
    *
    * Strata tables are model-sized, so the ranking window is a
    * driver-trivial aggregate; the corpus itself is touched once by the
    * moment aggregation (map-side combinable).
    *
    * @return per stratum: n_rows, weight_scaled, alloc (Σ = budget)
    */
  def neymanAllocation(df: DataFrame, strataCols: Seq[String],
                       valueExpr: String, budget: Long,
                       scaleBits: Int = 20): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    require(scaleBits >= 0 && scaleBits <= 40, "scaleBits in [0, 40]")
    val gc = strataCols.map(col)
    val m = df
      .select((gc :+ expr(s"cast(($valueExpr) as decimal(18,0))").as("v")): _*)
      .groupBy(gc: _*)
      .agg(count(lit(1)).cast("long").as("n_rows"),
        sum(col("v")).cast("decimal(18,0)").as("sv"),
        sum(col("v") * col("v")).cast("decimal(27,0)").as("sv2"))
    // population variance (N_h·Σv² − (Σv)²) / N_h², then the ONE double
    // step σ·N_h·2^bits, floored to the integer weight. The decimal
    // widths are chosen so every intermediate TYPE stays ≤ 38 digits in
    // BOTH engines (DuckDB rejects wider products at analysis time):
    // 10+27+1 and 18+18+1 — the documented envelope (per-stratum
    // Σv ≤ 1e18, Σv² ≤ 1e27, N ≤ 1e10)
    val varExpr =
      ((col("n_rows").cast("decimal(10,0)") * col("sv2")).cast("decimal(38,0)")
        - (col("sv") * col("sv")).cast("decimal(38,0)"))
        .cast("double") /
      (col("n_rows") * col("n_rows")).cast("double")
    val weighted = m.withColumn("weight_scaled",
      floor(sqrt(varExpr) * col("n_rows").cast("double") *
        lit(math.pow(2.0, scaleBits.toDouble))).cast("long"))
    val total = weighted
      .agg(sum(col("weight_scaled")).cast("decimal(38,0)").as("wtot"))
    val based = weighted.crossJoin(broadcast(total)) // one-row side
      // exact floor division: decimal `/` rounds the quotient at its
      // result scale (can flip a floor near an integer), so take the
      // exact modulo FIRST and divide the exactly-divisible difference
      .withColumn("bw",
        lit(budget).cast("decimal(38,0)") * col("weight_scaled"))
      .withColumn("rem",
        when(col("wtot") > 0, col("bw") % col("wtot"))
          .otherwise(lit(0L)).cast("decimal(38,0)"))
      .withColumn("base",
        when(col("wtot") > 0,
          ((col("bw") - col("rem")) / col("wtot")).cast("long"))
          .otherwise(lit(0L)))
    // leftover = budget − Σ base, handed to the largest remainders
    // (stratum-ascending tiebreak keeps ranks engine-stable)
    val leftover = based
      .agg((lit(budget) - coalesce(sum(col("base")), lit(0L))).as("left"))
    based.crossJoin(broadcast(leftover))
      .withColumn("rk", row_number().over(
        Window.orderBy((col("rem").desc +: gc.map(_.asc)): _*)))
      .withColumn("alloc",
        (col("base") + when(col("rk") <= col("left"), 1L).otherwise(0L))
          .cast("long"))
      .select((gc :+ col("n_rows") :+ col("weight_scaled") :+ col("alloc")): _*)
  }
}
