package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Text

/** Distributed BPE merge training (the tokenizer-building pass of a
  * training-data pipeline; the algorithm of Sennrich et al. 2016).
  *
  * Scale shape: the corpus is touched ONCE — a tokenize/explode/count
  * pass collapsing 100 TB of text to a VOCABULARY-sized word-frequency
  * table (the classic BPE trick: a word's symbol sequence only depends
  * on the word, so training iterates over distinct words weighted by
  * frequency, never over documents). Each merge round is then one
  * hash aggregation over that table plus a driver-side argmax of ONE
  * row (model-sized, the same lifecycle as the k-means / PQ codebook
  * trainers); the merge application is a per-row fold, map-only. Round
  * state is persisted and the previous round unpersisted, so round r
  * costs one vocab-table pass, not r of them.
  */
object Bpe {

  /** One corpus pass: distinct words with corpus frequencies. */
  def wordCounts(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(explode(Text.tokens(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** Adjacent symbol pairs as (l, r) structs — zip_with over the
    * shifted array, one evaluation per row (the shingle contract). */
  private def adjacentPairs(sym: Column): Column =
    filter(
      zip_with(sym, slice(sym, lit(2), greatest(size(sym) - 1, lit(0))),
        (a, b) => struct(a.as("l"), b.as("r"))),
      p => p.getField("r").isNotNull)

  /** Greedy left-to-right, non-overlapping application of merge
    * (l, r) -> l+r to a symbol array — true BPE semantics: a symbol
    * produced by this round's merge never re-merges with the following
    * symbol in the same round ("aaa" under (a,a) gives [aa, a]). */
  def applyMerge(sym: Column, l: String, r: String): Column =
    aggregate(sym, array().cast("array<string>"),
      (acc, cur) => when(size(acc) > 0
          && element_at(acc, -1) === lit(l) && cur === lit(r),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
        .otherwise(concat(acc, array(cur))))

  /** Character-level symbol init: one array element per char. */
  def initSymbols(words: DataFrame): DataFrame =
    words.select(col("word"), col("freq"), split(col("word"), "").as("sym"))

  /** Train `k` merges. Returns (rank, left, right, pairFreq) in learn
    * order; stops early when no pair remains (fully merged corpus).
    * Ties break (freq desc, left asc, right asc) — fixed so any engine
    * re-deriving the merges lands on the same table. */
  def trainMerges(docs: DataFrame, k: Int, textCol: String = "text")
      : Seq[(Int, String, String, Long)] = {
    var cur = initSymbols(wordCounts(docs, textCol)).persist()
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var r = 1
    var done = false
    while (r <= k && !done) {
      val top = cur.select(explode(adjacentPairs(col("sym"))).as("p"), col("freq"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("f"))
        .orderBy(col("f").desc, col("l"), col("r"))
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val (l, rr, f) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        out += ((r, l, rr, f))
        val next = cur.withColumn("sym", applyMerge(col("sym"), l, rr)).persist()
        next.count() // materialize before dropping the previous round
        cur.unpersist()
        cur = next
        r += 1
      }
    }
    cur.unpersist()
    out.toSeq
  }

  /** Merges as a DataFrame (rank, left, right, freq) for export. */
  def trainMergesDf(docs: DataFrame, k: Int, textCol: String = "text"): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    trainMerges(docs, k, textCol).toDF("rank", "left", "right", "freq")
      .select(col("rank").cast("long").as("rank"), col("left"), col("right"),
        col("freq"))
  }

  /** Tokenize words with a learned merge list: the encode side of the
    * tokenizer. Map-only: the merge table is a plan constant applied in
    * learn order (BPE encode applies merges by rank, greedily within
    * each rank). */
  def encode(words: DataFrame, merges: Seq[(String, String)]): DataFrame =
    words.withColumn("sym",
      merges.foldLeft(split(col("word"), "")) { case (c, (l, r)) =>
        applyMerge(c, l, r)
      })

  /** Write-iff-absent merge-table store (the tokenizer artifact
    * lifecycle: train once, encode forever). Deterministic retrain ≡
    * reuse, so an oracle re-deriving the merges agrees with a consumer
    * reading the store. */
  def mergesStored(docs: DataFrame, k: Int, path: String,
                   textCol: String = "text"): DataFrame = {
    if (!Stores.exists(docs.sparkSession, path, "_SUCCESS"))
      trainMergesDf(docs, k, textCol).write.mode("overwrite").parquet(path)
    docs.sparkSession.read.parquet(path)
  }

  /** Per-document BPE token count as a pure column expression — the
    * map-only, stateless form for streams and ride-along projections:
    * no explode, no join, no exchange. Re-encodes every word
    * OCCURRENCE, so in batch the vocab-amortized broadcast-join form
    * [[tokenCountPerDoc]] wins; on a stream this form needs zero state
    * and composes with any other per-row transform. */
  def tokenCountCol(text: Column, merges: Seq[(String, String)]): Column =
    aggregate(transform(Text.tokens(text), w =>
      size(merges.foldLeft(split(w, "")) { case (c, (l, r)) =>
        applyMerge(c, l, r)
      }).cast("long")),
      lit(0L), (a, x) => a + x)

  /** Per-document BPE token count under a stored merge table: encode
    * runs once per DISTINCT word (vocab-sized), then a broadcast join
    * maps every word occurrence to its token count — the corpus side
    * is one explode + partial-aggregated sum, never re-encoded. */
  def tokenCountPerDoc(docs: DataFrame, merges: Seq[(String, String)],
                       idCol: String = "doc_id",
                       textCol: String = "text"): DataFrame = {
    val vocab = encode(wordCounts(docs, textCol).select(col("word")), merges)
      .select(col("word"), size(col("sym")).cast("long").as("n_tok"))
    docs.select(col(idCol), explode(Text.tokens(col(textCol))).as("word"))
      .join(broadcast(vocab), Seq("word"))
      .groupBy(col(idCol))
      .agg(sum(col("n_tok")).as("n_bpe_tokens"))
  }
}
