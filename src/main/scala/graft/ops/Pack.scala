package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: assign documents to fixed-token-budget training
  * sequences ("bins") by contiguous fill — the standard pre-tokenization
  * packing pass that turns a document corpus into equal-budget training
  * rows.
  *
  * Contiguous fill is the distributed-friendly packing policy: within a
  * partition column (e.g. language or source shard), documents are laid
  * out in a deterministic order and a running token total is cut every
  * `budget` tokens. A document straddling a cut opens the next bin
  * (no document splitting here — `offset_in_bin` tells the tokenizer
  * where the overflow lands so it can truncate or spill). Everything is
  * one window aggregation per shard: no driver loop, no state, exact
  * integer math.
  *
  * First-fit-decreasing packs tighter but is inherently sequential per
  * bin set; at 100 TB the shard-parallel contiguous fill is the policy
  * that scales, and shards bound the window partitions.
  */
object Pack {

  /** Per-document bin assignment.
    *
    * Output: the input columns plus
    *   - `n_tokens`      document token count (from `tokensCol`),
    *   - `bin`           0-based bin index within the shard,
    *   - `offset_in_bin` token offset where this document starts in its
    *                     bin (cum-before modulo budget).
    */
  def contiguous(df: DataFrame, budget: Long, shardCol: String,
                 orderCol: String, tokensCol: String): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    val w = Window.partitionBy(col(shardCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("_cum_before",
        coalesce(sum(col(tokensCol).cast("long")).over(w), lit(0L)))
      .withColumn("bin", floor(col("_cum_before") / budget).cast("long"))
      .withColumn("offset_in_bin", pmod(col("_cum_before"), lit(budget)))
      .drop("_cum_before")
  }

  /** Fixed-window document chunking with overlap — the tokenizer-prep
    * pass that turns long documents into model-sized pieces. Chunk
    * starts are `0, step, 2·step, …` over the token array
    * (`step = maxTokens − overlap`); each chunk takes up to `maxTokens`
    * tokens (the last one clips at the document end).
    *
    * Map-only: tokens, the start sequence, the explode and the slice all
    * happen inside one projection pipeline over the scan — no shuffle,
    * no state, so it runs at scan bandwidth on any corpus size.
    *
    * Output: (id, chunk_idx, n_chunk_tokens, chunk) — chunk is the
    * space-joined token window. */
  def chunk(docs: DataFrame, maxTokens: Int, overlap: Int,
            idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(maxTokens >= 1, s"maxTokens must be >= 1, got $maxTokens")
    require(overlap >= 0 && overlap < maxTokens,
      s"overlap must be in [0, maxTokens), got $overlap")
    val step = maxTokens - overlap
    docs
      .select(col(idCol).as("id"),
        graft.functions.Text.tokens(col(textCol)).as("toks"))
      .select(col("id"), col("toks"), size(col("toks")).as("n"))
      // explode_outer (see termFrequencies): inner explode would clone
      // the sequence expression into an inferred scan filter
      .select(col("id"), col("toks"), col("n"),
        explode_outer(sequence(lit(0), greatest(col("n") - 1, lit(0)),
          lit(step))).as("start"))
      .filter(col("start") < col("n")) // zero-token doc guard
      .select(col("id"),
        floor(col("start") / step).cast("long").as("chunk_idx"),
        least(col("n") - col("start"), lit(maxTokens)).cast("long")
          .as("n_chunk_tokens"),
        array_join(slice(col("toks"), col("start") + 1, lit(maxTokens)), " ")
          .as("chunk"))
  }

  /** Curriculum / batching buckets: ntile over document length within a
    * shard — equal-population length bands (shortest n-th, …, longest
    * n-th), the standard length-grouping pass before batch assembly so
    * co-batched sequences waste minimal padding. Deterministic via the
    * id tie-break. One rank window per shard; shards bound the sort. */
  def lengthBuckets(df: DataFrame, nBuckets: Int, shardCol: String,
                    tokensCol: String, idCol: String): DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    df.withColumn("bucket", ntile(nBuckets).over(
      Window.partitionBy(col(shardCol))
        .orderBy(col(tokensCol), col(idCol))).cast("long"))
  }

  /** Bin-level summary (documents per bin, fill level): the sanity view a
    * packing job materializes next to the assignment. */
  def binStats(packed: DataFrame, shardCol: String): DataFrame =
    packed.groupBy(col(shardCol), col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).cast("long").as("fill_tokens"))
}
