package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Text

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
  * public arXiv:2302.03169): rank raw-corpus documents by how
  * target-like they are under two hashed bag-of-n-gram language models.
  * Each document's importance weight is Σ over its gram occurrences of
  * λ_b = log p_target(b) − log p_raw(b), where b is the gram's hash
  * bucket and both models are add-1-smoothed bucket frequencies. Top
  * weights ≈ the target distribution; the paper resamples by weight,
  * the deterministic profile here selects top-n (weight, id) — the
  * reproducible-at-100TB form of the same ranking.
  *
  * Scale shape: training is two corpus scans that each collapse to a
  * `buckets`-row aggregate (the exchange carries ≤ buckets rows per
  * task), and only the two B-sized count vectors land on the driver —
  * model-sized by definition, the centroid/codebook convention. Scoring
  * is one scan: map-side gram explode + hash, a broadcast join against
  * the B-row λ table, and a per-doc partial-aggregated sum. λ is
  * rounded to 6 dp and carried as DECIMAL so per-doc sums are exact
  * integer arithmetic in scaled space — order-free across partitions
  * and engines (the oracle-exactness discipline: no float summation).
  */
object Dsir {

  /** (id, gram) occurrence rows: unigrams + bigrams, the paper's
    * feature set. Multiplicity preserved — weights count occurrences. */
  private def gramRows(docs: DataFrame, idCol: String,
                       textCol: String): DataFrame = {
    val toks = Text.tokens(col(textCol))
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol).as("id"),
        explode(concat(toks, Text.shinglesFromTokens(toks, 2))).as("gram"))
  }

  /** Gram → feature bucket. hash64 is 60-bit nonnegative, so pmod ≡ %.
    * DuckDB mirror: `CAST('0x'||substr(md5('0'||g),1,15) AS BIGINT) % B`. */
  private def bucketOf(gram: Column, buckets: Int): Column =
    pmod(Text.hash64(gram, 0), lit(buckets.toLong))

  /** Train the per-bucket log-ratio table: (bucket, llr DECIMAL(12,6))
    * with λ_b = log((ct_b+1)/(Nt+B)) − log((cr_b+1)/(Nr+B)). All
    * `buckets` rows materialize (absent grams get the smoothing-floor
    * ratio), so scoring joins never miss. StrictMath.log keeps the
    * driver-side constant fold bit-identical across JVMs — rebuild ≡
    * reuse for the stored lifecycle. */
  def trainLogRatios(target: DataFrame, raw: DataFrame, buckets: Int,
                     textCol: String = "text"): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    val spark = target.sparkSession
    def counts(df: DataFrame): Map[Long, Long] = {
      val toks = Text.tokens(col(textCol))
      df.filter(col(textCol).isNotNull)
        .select(explode(concat(toks, Text.shinglesFromTokens(toks, 2))).as("gram"))
        .select(bucketOf(col("gram"), buckets).as("bucket"))
        .groupBy(col("bucket")).count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    val ct = counts(target); val cr = counts(raw)
    val nt = ct.values.sum.toDouble + buckets
    val nr = cr.values.sum.toDouble + buckets
    val rows = (0 until buckets).map { b =>
      val l = StrictMath.log((ct.getOrElse(b.toLong, 0L) + 1.0) / nt) -
        StrictMath.log((cr.getOrElse(b.toLong, 0L) + 1.0) / nr)
      (b.toLong, new java.math.BigDecimal(l)
        .setScale(6, java.math.RoundingMode.HALF_UP))
    }
    import spark.implicits._
    rows.toDF("bucket", "llr")
      .select(col("bucket"), col("llr").cast("decimal(12,6)").as("llr"))
  }

  /** Write-iff-absent stored λ table (the codebook lifecycle, keyed on
    * `_SUCCESS`): train once, score every increment from the store. */
  def ratiosStored(target: DataFrame, raw: DataFrame, buckets: Int,
                   path: String, textCol: String = "text"): DataFrame = {
    if (!Stores.exists(target.sparkSession, path, "_SUCCESS"))
      trainLogRatios(target, raw, buckets, textCol)
        .write.mode("overwrite").parquet(path)
    target.sparkSession.read.parquet(path)
  }

  /** Per-doc importance weight: one scan — gram explode map-side, a
    * broadcast join against the B-row λ table, one partial-aggregated
    * decimal sum per doc. Output (idCol, weight DECIMAL(18,6),
    * n_grams). */
  def score(docs: DataFrame, ratios: DataFrame, buckets: Int,
            idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    gramRows(docs, idCol, textCol)
      .select(col("id"), bucketOf(col("gram"), buckets).as("bucket"))
      .join(broadcast(ratios), Seq("bucket"))
      .groupBy(col("id"))
      .agg(sum(col("llr")).cast("decimal(18,6)").as("weight"),
        count(lit(1)).as("n_grams"))
      .select(col("id").as(idCol), col("weight"), col("n_grams"))

  /** Map-only scoring — the λ table folded to one map constant, the
    * weight an ordered decimal fold over the doc's own gram array: ZERO
    * exchanges, so it runs unchanged on a stream (stateless, append
    * mode) and never shuffles a 100 TB corpus just to score it.
    * Decimal addition is exact, so this is bit-equal to [[score]]. */
  def scoreMapOnly(docs: DataFrame, ratios: DataFrame, buckets: Int,
                   idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame = {
    val lut = ratios.collect()
      .map(r => r.getLong(0) -> r.getDecimal(1)).toMap
    val lutCol = typedlit(lut)
    val toks = Text.tokens(col(textCol))
    val grams = concat(toks, Text.shinglesFromTokens(toks, 2))
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol), grams.as("grams"))
      .select(col(idCol),
        aggregate(col("grams"),
          lit(new java.math.BigDecimal(0)).cast("decimal(18,6)"),
          (acc, g) => (acc + element_at(lutCol, bucketOf(g, buckets))
            .cast("decimal(12,6)")).cast("decimal(18,6)"))
          .as("weight"),
        size(col("grams")).cast("long").as("n_grams"))
  }
}
