package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Text

/** WordPiece-style subword tokenizer: frequency-seeded vocabulary +
  * greedy longest-match-first encoding (the public WordPiece/BERT
  * inference rule, Schuster & Nakajima 2012; complements the learned
  * merge list in [[Bpe]]).
  *
  * Everything is RELATIONAL — including the greedy matcher:
  *
  *  1. VOCAB: substring candidates (length ≤ maxLen) of each distinct
  *     word, occurrence-weighted by word frequency; top-N by weight via
  *     `orderBy.limit` (TakeOrderedAndProject — distributed partial
  *     top-k, no single-partition window), unioned with every single
  *     character so encoding always terminates.
  *  2. JUMP TABLE: positions × candidate lengths JOIN the vocab on the
  *     substring — an ordinary equi-join that scales to any vocab size
  *     (a 32k-piece production vocab is just a bigger join side; no
  *     broadcast literal map, no per-row linear scan).
  *  3. WALK: greedy longest-match is `pos → pos + step(pos)` until the
  *     word ends. The per-word step array is grouped back from the
  *     join and the walk is ONE in-order `aggregate` fold over it —
  *     elements not on the greedy chain fail the `pos` guard and pass
  *     through. O(len) per DISTINCT word; documents never re-encode a
  *     word (the word→count map joins back to the exploded corpus,
  *     partial-agg sum per doc — the [[Bpe.tokenCountPerDoc]] shape).
  *
  * Unknown characters (possible when encoding text the vocab was not
  * built from) take the step-1 fallback and count one piece — byte-
  * fallback semantics. The DuckDB oracle replays the identical jump
  * table + walk as a recursive CTE; all arithmetic is integer, so
  * results hash-match exactly.
  */
object Wordpiece {

  /** Substring candidates with occurrence weights: every (start, len ≤
    * maxLen) substring of each distinct word contributes that word's
    * corpus frequency per occurrence. */
  /** The corpus word-frequency table every stage shares — compute it
    * ONCE per pipeline and pass it to the `*FromWords` forms below;
    * the table is vocab-bounded, so callers persist it for pennies
    * instead of re-scanning the corpus per stage. */
  def words(docs: DataFrame, textCol: String = "text"): DataFrame =
    Bpe.wordCounts(docs, textCol)
      // empty words (blank documents tokenize to [""]) must not reach
      // sequence(1, 0), which counts DOWN in Spark ([1, 0]); the
      // oracle's range(1, 1) is empty — filter them out on both sides
      .filter(length(col("word")) >= 1)

  def candidates(docs: DataFrame, maxLen: Int,
                 textCol: String = "text"): DataFrame =
    candidatesFromWords(words(docs, textCol), maxLen)

  def candidatesFromWords(wordsDf: DataFrame, maxLen: Int): DataFrame =
    wordsDf
      .withColumn("pos", explode(expr("sequence(1, length(word))")))
      .withColumn("l", explode(expr(s"sequence(1, $maxLen)")))
      .filter(col("pos") + col("l") - lit(1) <= length(col("word")))
      .select(expr("substring(word, pos, l)").as("piece"), col("freq"))
      .groupBy(col("piece")).agg(sum(col("freq")).as("weight"))

  /** Vocabulary: top `vocabSize` candidates by (weight desc, piece asc)
    * ∪ all single characters (guaranteed coverage). */
  def vocab(docs: DataFrame, maxLen: Int, vocabSize: Int,
            textCol: String = "text"): DataFrame =
    vocabFromWords(words(docs, textCol), maxLen, vocabSize)

  def vocabFromWords(wordsDf: DataFrame, maxLen: Int,
                     vocabSize: Int): DataFrame = {
    val cand = candidatesFromWords(wordsDf, maxLen)
    val top = cand.orderBy(col("weight").desc, col("piece")).limit(vocabSize)
    top.union(cand.filter(length(col("piece")) === 1)).distinct()
  }

  /** Greedy longest-match piece count per distinct word of the corpus:
    * (word, n_pieces). `vocabDf` must have a `piece` column. */
  def wordPieceCounts(docs: DataFrame, vocabDf: DataFrame, maxLen: Int,
                      textCol: String = "text"): DataFrame =
    wordPieceCountsFromWords(words(docs, textCol), vocabDf, maxLen)

  def wordPieceCountsFromWords(wordsDf: DataFrame, vocabDf: DataFrame,
                               maxLen: Int): DataFrame = {
    val allPos = wordsDf.select(col("word"))
      .withColumn("pos", explode(expr("sequence(1, length(word))")))
    val jump = allPos
      .withColumn("l", explode(expr(s"sequence(1, $maxLen)")))
      .filter(col("pos") + col("l") - lit(1) <= length(col("word")))
      .withColumn("piece", expr("substring(word, pos, l)"))
      .join(vocabDf.select(col("piece")), Seq("piece"))
      .groupBy(col("word"), col("pos")).agg(max(col("l")).as("step"))
    allPos.join(jump, Seq("word", "pos"), "left")
      .groupBy(col("word"))
      .agg(sort_array(collect_list(struct(col("pos"),
        coalesce(col("step"), lit(1)).as("step")))).as("steps"))
      .withColumn("n_pieces", expr(
        """aggregate(steps, named_struct('p', 1, 'c', CAST(0 AS BIGINT)),
          |  (acc, e) -> IF(e.pos = acc.p,
          |    named_struct('p', acc.p + e.step, 'c', acc.c + CAST(1 AS BIGINT)),
          |    acc),
          |  acc -> acc.c)""".stripMargin))
      .select(col("word"), col("n_pieces"))
  }

  /** Per-document WordPiece token count: encode once per distinct word,
    * broadcast the vocab-sized word→count map onto the exploded corpus,
    * partial-agg sum per doc. */
  def tokenCountPerDoc(docs: DataFrame, vocabDf: DataFrame, maxLen: Int,
                       idCol: String = "doc_id",
                       textCol: String = "text"): DataFrame = {
    val wc = wordPieceCounts(docs, vocabDf, maxLen, textCol)
    docs.select(col(idCol), explode(Text.tokens(col(textCol))).as("word"))
      .join(broadcast(wc), Seq("word"))
      .groupBy(col(idCol))
      .agg(sum(col("n_pieces")).as("n_wp_tokens"))
  }

  /** The full vocab+encode pipeline with the corpus scanned exactly
    * TWICE (word counts; final per-doc explode) — the distinct-word
    * table is computed once, persisted (vocab-bounded), and shared by
    * candidate enumeration, the jump table, and the count join. */
  def tokenCountPerDocEndToEnd(docs: DataFrame, maxLen: Int, vocabSize: Int,
                               idCol: String = "doc_id",
                               textCol: String = "text"): DataFrame = {
    val w = words(docs, textCol).persist()
    val v = vocabFromWords(w, maxLen, vocabSize)
    val wc = wordPieceCountsFromWords(w, v, maxLen)
    docs.select(col(idCol), explode(Text.tokens(col(textCol))).as("word"))
      .join(broadcast(wc), Seq("word"))
      .groupBy(col(idCol))
      .agg(sum(col("n_pieces")).as("n_wp_tokens"))
  }
}
