package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Training-order operators: what ORDER should the curated corpus be
  * seen in? Two complementary signals:
  *
  *  - [[novelty]] — how much of a document's n-gram mass is FIRST SEEN
  *    at that document (in a fixed corpus order): high-novelty docs
  *    carry new information, near-zero-novelty docs are template
  *    re-treads even when no dedup rule fired. One gram-keyed shuffle;
  *    never all-pairs.
  *  - [[interleavedOrder]] — round-robin curriculum: rank docs within
  *    each source by quality, then interleave ranks across sources so
  *    every prefix of the training order has the same source mix.
  *    The global position is ARITHMETIC — `(rank−1)·S + source_index`
  *    — not a global row_number: no single-partition window, no total
  *    sort; at 100 TB the order materializes at export as an ordinary
  *    sort key.
  */
object Curriculum {

  /** Per-doc novelty vs the corpus prefix in `idCol` order: of the
    * doc's DISTINCT n-gram set, the fraction whose corpus-wide first
    * occurrence (min doc id) is this doc. Docs too short for one
    * n-gram are absent from the output (no gram set to score).
    *
    * Scale shape: explode distinct grams per doc (linear in corpus
    * tokens), one aggregation keyed by gram for the first-occurrence
    * table, one join back on gram, one per-doc partial-agg count.
    * The gram key is the only exchange; skewed universal grams are
    * bounded by per-doc DISTINCTness. */
  def novelty(docs: DataFrame, n: Int = 2, idCol: String = "doc_id",
              textCol: String = "text"): DataFrame = {
    val dg = docs.select(col(idCol),
        explode(array_distinct(
          Text.shinglesFromTokens(Text.tokens(col(textCol)), n))).as("gram"))
    val first = dg.groupBy(col("gram")).agg(min(col(idCol)).as("first_doc"))
    dg.join(first, Seq("gram"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("total_grams"),
        sum(when(col("first_doc") === col(idCol), 1L).otherwise(0L))
          .as("novel_grams"))
      .select(col(idCol), col("novel_grams"), col("total_grams"),
        round(col("novel_grams") / col("total_grams"), 6).as("novelty"))
  }

  /** Quality-ranked, source-interleaved curriculum position.
    *
    * Within each `srcCol` group, docs rank by (`scoreCol` desc, id asc)
    * — a per-source window, partitioned by the group key like every
    * grouped op here. Sources get a dense index 0..S−1 in name order
    * (S = source count — dimension-sized; computed with one tiny
    * distinct + window over S rows, not over the corpus). The global
    * curriculum position is then `(rank−1)·S + src_idx`: a pure
    * per-row expression — positions are unique, and sorting by them
    * yields best-of-each-source first, round-robin thereafter. */
  def interleavedOrder(docs: DataFrame, srcCol: String, scoreCol: String,
                       idCol: String = "doc_id"): DataFrame = {
    val srcW = Window.orderBy(col(srcCol))
    val srcIdx = docs.select(col(srcCol)).distinct()
      .withColumn("src_idx", row_number().over(srcW) - lit(1))
    val nSrc = srcIdx.count()
    val rankW = Window.partitionBy(col(srcCol))
      .orderBy(col(scoreCol).desc, col(idCol))
    docs.join(broadcast(srcIdx), Seq(srcCol))
      .withColumn("rank", row_number().over(rankW))
      .withColumn("position",
        (col("rank") - lit(1)).cast("long") * lit(nSrc) + col("src_idx"))
      .select(col(idCol), col(srcCol), col(scoreCol),
        col("rank").cast("long").as("rank"), col("position"))
  }
}
