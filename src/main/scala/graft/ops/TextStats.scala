package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Text

/** Corpus-level term statistics: document frequency and tf-idf term
  * ranking — the primitives behind keyword extraction, stopword
  * discovery, and contamination screens over a training corpus.
  *
  * Shape at scale: one explode of the token array, one (doc, term)
  * aggregation (shuffle on doc — bounded by corpus size), one term
  * aggregation for document frequency (shuffle on term — bounded by
  * vocabulary), and a broadcast of the corpus size. The document-
  * frequency side is vocabulary-sized, so it broadcasts back onto the
  * (doc, term) side instead of shuffling the corpus again.
  *
  * Idf is the LINEAR form N/df, not log(N/df): every score is then one
  * IEEE division of exact integers — bit-identical across engines (a
  * requirement of the DuckDB hash-compare; `ln` carries no
  * correct-rounding guarantee). Rankings only need idf to be monotonic
  * in 1/df, which both forms are.
  */
object TextStats {

  /** (doc, term) term frequencies over normalized whitespace tokens.
    * explode_OUTER: a non-outer explode triggers InferFiltersFromGenerate,
    * which duplicates the whole tokenization into a scan-level
    * `size(split(...)) > 0` filter — one extra evaluation per row
    * (split never returns an empty array, so outer ≡ inner here). */
  def termFrequencies(docs: DataFrame, idCol: String = "doc_id",
                      textCol: String = "text"): DataFrame =
    docs.select(col(idCol).as("id"), Text.tokens(col(textCol)).as("toks"))
      .select(col("id"), explode_outer(col("toks")).as("term"))
      // a NULL text row survives explode_outer as a null term — drop it
      // explicitly (the filter sits on the generator OUTPUT attribute,
      // so it cannot be substituted down into the tokenization)
      .filter(col("term").isNotNull)
      .groupBy(col("id"), col("term"))
      .agg(count(lit(1)).as("tf"))

  /** Per-term document frequency (number of docs containing the term). */
  def documentFrequency(docs: DataFrame, idCol: String = "doc_id",
                        textCol: String = "text"): DataFrame =
    termFrequencies(docs, idCol, textCol)
      .groupBy(col("term")).agg(count(lit(1)).as("df"))

  /** Top-k terms per document by tf-idf (linear idf). Ranking ties break
    * by term ascending. Output: (id, term, tf, df, tfidf, rank).
    *
    * Single corpus pass: df is a window count over the tf rows
    * (one row per (doc, term), so rows-per-term IS the document
    * frequency) rather than a second `termFrequencies` pass — the
    * tokenize+explode+aggregate chain, the expensive part, runs once.
    * The term-partitioned window shuffles the already-aggregated tf
    * rows (far smaller than the raw corpus the two-pass form re-scans);
    * the vocabulary never materializes as a separate join side. */
  def tfidfTopK(docs: DataFrame, k: Int, idCol: String = "doc_id",
                textCol: String = "text"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val tf = termFrequencies(docs, idCol, textCol)
    val n = docs.select(count(lit(1)).as("n_docs"))
    val scored = tf
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("term"))))
      .crossJoin(broadcast(n))
      .withColumn("tfidf",
        col("tf").cast("double") * col("n_docs") / col("df"))
    val w = Window.partitionBy(col("id"))
      .orderBy(col("tfidf").desc, col("term").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("id"), col("term"), col("tf"), col("df"),
        col("tfidf"), col("rank"))
  }

  /** Corpus unigram model: top-`vocabSize` tokens by frequency (ties →
    * token ascending) with their corpus probability c/N. One
    * tokenize+explode+agg pass, vocabulary-sized TakeOrdered extraction
    * — the "train" half of the CCNet-style lexical-likelihood filter.
    * Returns the model as a driver-local (term → prob) map plus the
    * total token count (the model is V entries — driver-sized by
    * definition, like the PQ codebooks). */
  def unigramModel(docs: DataFrame, vocabSize: Int,
                   textCol: String = "text"): (Seq[(String, Double)], Long) = {
    require(vocabSize >= 1, s"vocabSize must be >= 1, got $vocabSize")
    val counts = docs
      .select(explode_outer(Text.tokens(col(textCol))).as("term"))
      .filter(col("term").isNotNull)
      .groupBy(col("term")).agg(count(lit(1)).as("c"))
    val total = counts.agg(sum(col("c"))).head().getLong(0)
    val vocab = counts.orderBy(col("c").desc, col("term").asc)
      .limit(vocabSize).collect()
      .map(r => r.getString(0) -> r.getLong(1).toDouble / total.toDouble)
    (vocab.toSeq, total)
  }

  /** Per-doc lexical likelihood under a unigram model — the ln-free
    * analog of unigram perplexity (the same linear-vs-log choice as
    * tfidf's idf: `ln` has no cross-engine correct-rounding guarantee,
    * so the score is the MEAN TOKEN PROBABILITY — each term one exact
    * IEEE division c/N, summed in document order — plus the
    * out-of-vocabulary fraction, the strongest single gibberish
    * signal). Monotone ranking for quality filtering either way.
    *
    * Scoring is ONE map-only projection: the model rides along as a
    * single `typedlit` map constant (no join, no shuffle — the 100 TB
    * shape), the per-doc fold runs left-to-right over the token array,
    * and every output is exact-integer arithmetic plus one division.
    * Output: (id, n_toks, oov_frac, mean_tok_prob). */
  def unigramScores(docs: DataFrame, vocab: Seq[(String, Double)],
                    idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame = {
    val model = typedlit(vocab.toMap)
    docs.select(col(idCol).as("id"), Text.tokens(col(textCol)).as("toks"))
      .select(col("id"), size(col("toks")).as("n_toks"),
        size(filter(col("toks"), t => element_at(model, t).isNull))
          .as("n_oov"),
        aggregate(col("toks"), lit(0.0d),
          (acc, t) => acc + coalesce(element_at(model, t), lit(0.0d)))
          .as("sp"))
      .select(col("id"), col("n_toks").cast("long").as("n_toks"),
        round(col("n_oov").cast("double") / col("n_toks"), 6).as("oov_frac"),
        round(col("sp") / col("n_toks"), 6).as("mean_tok_prob"))
  }
}
