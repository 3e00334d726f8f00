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
}
