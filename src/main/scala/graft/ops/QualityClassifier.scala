package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Text

/** Hashed Naive-Bayes document-quality classifier — the "distill a
  * heuristic into a model" pattern behind the fastText/CCNet-style
  * quality filters used on web-scale corpora: label a corpus with a
  * cheap rule, train a linear model over HASHED token features, then
  * score everything (including future crawls) with the model alone.
  *
  * Exactness discipline (the [[TextStats]] convention): every number
  * that crosses the engine boundary is integer arithmetic. Per-bucket
  * weights are Laplace-smoothed good-fractions in parts-per-million
  * computed with BIGINT integer division — (10⁶·(good+1)) div (tot+2)
  * — and a document's score is (Σ weights) div n_tokens, so train and
  * score replay bit-exactly in any engine with 64-bit integers (no
  * ln, no float accumulation — the same linear-vs-log choice as
  * tfidf's idf; the NB weight stays monotone in the log-odds).
  *
  * 100 TB shape: training is ONE tokenize→hash→aggregate corpus pass
  * into a `buckets`-sized table (map-side partial agg collapses each
  * partition to ≤buckets rows before the exchange; the model is
  * driver-sized BY CONSTRUCTION — `buckets` entries regardless of
  * corpus size, the PQ-codebook rule). Scoring is map-only: the model
  * rides as one `typedlit` map constant — no join, no shuffle, and
  * fresh data is scored without touching the training corpus. */
object QualityClassifier {

  /** Default weight for a bucket never seen in training: the Laplace
    * prior (0+1)·10⁶ div (0+2). */
  val PriorPpm = 500000L

  private def bucketOf(term: Column, buckets: Int, seed: Int): Column =
    pmod(Text.hash64(term, seed), lit(buckets.toLong))

  /** Train: label each doc with the heuristic ([[Text.qualityScore]] ≥
    * labelThreshold — the rounded score, already proven hash-identical
    * cross-engine), hash token OCCURRENCES into `buckets`, and return
    * (bucket → weight_ppm, cut_ppm).
    *
    * The decision cut is NOT ½: the label can correlate with document
    * LENGTH (it does for the q_quality heuristic), which skews the
    * token-weighted class prior — a token drawn at random is more
    * likely to come from a long (good) doc. The neutral decision point
    * is therefore the corpus-wide token-weighted good rate, computed
    * from the same bucket counts (Σg/Σt) at zero extra cost; a doc
    * scores "good" when its tokens look better than the average
    * token. */
  def train(docs: DataFrame, buckets: Int = 1024, seed: Int = 11,
            labelThreshold: Double = 0.68,
            textCol: String = "text"): (Map[Long, Long], Long) = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    val counts = docs.filter(col(textCol).isNotNull)
      .select(Text.tokens(col(textCol)).as("toks"),
        when(Text.qualityScore(col(textCol)) >= labelThreshold, 1L)
          .otherwise(0L).as("good"))
      .select(col("good"), explode(col("toks")).as("term"))
      .groupBy(bucketOf(col("term"), buckets, seed).as("bucket"))
      .agg(sum(col("good")).as("g"), count(lit(1)).as("t"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // BigInt: 10⁶·count overflows a Long once token counts pass ~9·10¹²
    // — the 100 TB regime; driver-side, so exact big-integer math is free
    def ppm(num: Long, den: Long): Long =
      ((BigInt(1000000) * (num + 1)) / BigInt(den + 2)).toLong
    val trained = counts.map { case (b, g, t) => b -> ppm(g, t) }.toMap
    val cutPpm = ppm(counts.map(_._2).sum, counts.map(_._3).sum)
    // total over the bucket space: untrained buckets carry the prior,
    // so scoring is total on any input
    ((0L until buckets.toLong).map(b => b -> trained.getOrElse(b, PriorPpm)).toMap,
      cutPpm)
  }

  /** The train-once model lifecycle (the stored-centroids shape):
    * train and export iff the store marker is absent — weights as a
    * (bucket, w) parquet side-table, the learned cut as a one-row
    * `cut/` table — then serve (model, cut) FROM the store. The
    * trainer is deterministic (integer aggregation is order-free), so
    * a rebuilt store is value-identical to a reused one; scoring a
    * fresh crawl pays one driver-sized parquet read, never a training
    * pass over the original corpus. */
  def modelStored(docs: DataFrame, path: String, buckets: Int = 1024,
                  seed: Int = 11, labelThreshold: Double = 0.68,
                  textCol: String = "text"): (Map[Long, Long], Long) = {
    val spark = docs.sparkSession
    import spark.implicits._
    val wPath = Stores.child(path, "weights")
    val cPath = Stores.child(path, "cut")
    if (!Stores.exists(spark, path, "_SUCCESS")) {
      val (model, cut) = train(docs, buckets, seed, labelThreshold, textCol)
      model.toSeq.sortBy(_._1).toDF("bucket", "w")
        .coalesce(1).write.mode("overwrite").parquet(wPath)
      Seq(cut).toDF("cut_ppm").coalesce(1).write.mode("overwrite").parquet(cPath)
      Stores.touch(spark, path, "_SUCCESS")
    }
    val model = spark.read.parquet(wPath)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cut = spark.read.parquet(cPath).head.getLong(0)
    (model, cut)
  }

  /** Score: mean bucket weight over the doc's token sequence, integer
    * ppm; pred = 1 iff score_ppm ≥ cutPpm. One map-only projection.
    * Output: (doc_id, n_toks, score_ppm, pred). */
  def score(docs: DataFrame, model: Map[Long, Long], buckets: Int = 1024,
            seed: Int = 11, cutPpm: Long = 500000L,
            idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val m = typedlit(model)
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol), Text.tokens(col(textCol)).as("toks"))
      .select(col(idCol), size(col("toks")).cast("long").as("n_toks"),
        aggregate(col("toks"), lit(0L), (acc, t) =>
          acc + coalesce(element_at(m, bucketOf(t, buckets, seed)),
            lit(PriorPpm))).as("sw"))
      .select(col(idCol), col("n_toks"),
        expr("sw div n_toks").as("score_ppm"))
      .withColumn("pred",
        when(col("score_ppm") >= cutPpm, 1L).otherwise(0L))
  }
}
