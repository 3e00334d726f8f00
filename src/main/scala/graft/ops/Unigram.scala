package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Unigram-LM subword tokenizer (the SentencePiece default model,
  * Kudo 2018), completing the tokenizer trio next to [[Bpe]] (learned
  * merges) and [[Wordpiece]] (greedy longest-match): pieces carry log
  * probabilities and a word's tokenization is the max-likelihood
  * segmentation (Viterbi), trained by hard-EM (Viterbi-EM) rounds.
  *
  * Everything is RELATIONAL, distinct-word amortized:
  *
  *  - CANDIDATES: positions × lengths equi-join the score table on the
  *    substring — the [[Wordpiece]] jump-table shape (any vocab size).
  *  - VITERBI: one in-order `aggregate` fold per distinct word over
  *    end positions 1..len; the state carries the DP arrays
  *    (best-log-prob per prefix, best segmentation per prefix). Ties
  *    on log-prob break toward the LONGER piece — fixed, so any
  *    engine replaying the DP from the stored scores lands on the
  *    identical segmentation (the DuckDB oracle replays it as a
  *    recursive CTE; q_unigram_tokens hash-matches).
  *  - HARD-EM: E-step = Viterbi-segment the distinct-word table under
  *    current scores (freq-weighted piece counts), M-step = re-
  *    normalize log probs. Single-character pieces never leave the
  *    vocab (coverage floor), unseen chars at encode time take a
  *    fixed-penalty byte fallback. Viterbi-EM monotonically improves
  *    corpus Viterbi log-likelihood (UnigramSpec pins it).
  *
  * Scale shape: the corpus is touched once per op (word counts /
  * final per-doc join); every EM round runs over the DISTINCT-WORD
  * table (vocab-bounded) with one piece-keyed aggregation — model-
  * sized work, like the BPE trainer's merge rounds.
  */
object Unigram {

  private val FALLBACK_LS = -20.0

  /** Seed scores: log(weight / Σweight) over the [[Wordpiece]]
    * candidate top-`vocabSize` ∪ all single chars. */
  def seedScores(docs: DataFrame, maxLen: Int, vocabSize: Int,
                 textCol: String = "text"): DataFrame =
    seedScoresFromWords(Wordpiece.words(docs, textCol), maxLen, vocabSize)

  def seedScoresFromWords(wordsDf: DataFrame, maxLen: Int,
                          vocabSize: Int): DataFrame = {
    val v = Wordpiece.vocabFromWords(wordsDf, maxLen, vocabSize)
    val total = v.agg(sum(col("weight"))).head().getLong(0)
    v.select(col("piece"),
      log(col("weight").cast("double") / lit(total.toDouble)).as("ls"))
  }

  /** Per-distinct-word Viterbi under a (piece, ls) score table:
    * (word, freq, pieces array<string>, ll). The DP fold:
    * best(e) = max over candidate pieces ending at e of
    * best(e−l) + ls(piece); tie → longer piece; no candidate (unknown
    * char) → single-char fallback at [[FALLBACK_LS]]. */
  def viterbiWords(words: DataFrame, scores: DataFrame, maxLen: Int)
      : DataFrame = {
    val cand = words.select(col("word"))
      .withColumn("pos", explode(expr("sequence(1, length(word))")))
      .withColumn("l", explode(expr(s"sequence(1, $maxLen)")))
      .filter(col("pos") + col("l") - lit(1) <= length(col("word")))
      .withColumn("piece", expr("substring(word, pos, l)"))
      .join(scores.select(col("piece"), col("ls")), Seq("piece"))
      .select(col("word"), (col("pos") + col("l") - lit(1)).as("e"),
        col("l"), col("ls"))
    val byWord = words
      .join(cand.groupBy(col("word"))
          .agg(collect_list(struct(col("e"), col("l"), col("ls"))).as("cands")),
        Seq("word"), "left")
      .withColumn("cands", coalesce(col("cands"),
        expr("CAST(array() AS ARRAY<STRUCT<e: INT, l: INT, ls: DOUBLE>>)")))
    // the candidate max (selv) and its arg (sell) are recomputed inline
    // (SQL lambdas have no let-binding); both are pure and tiny
    val selv = s"""coalesce(
      |  array_max(transform(filter(cands, c -> c.e = e),
      |    c -> element_at(acc.best, e - c.l + 1) + c.ls)),
      |  element_at(acc.best, e) + CAST($FALLBACK_LS AS DOUBLE))""".stripMargin
    val sell = s"""coalesce(
      |  array_max(transform(filter(cands, c -> c.e = e AND
      |      (element_at(acc.best, e - c.l + 1) + c.ls) = ($selv)),
      |    c -> c.l)),
      |  1)""".stripMargin
    byWord.withColumn("vit", expr(
      s"""aggregate(
         |  sequence(1, length(word)),
         |  named_struct(
         |    'best', array(CAST(0.0 AS DOUBLE)),
         |    'seg', array(CAST(array() AS ARRAY<STRING>))),
         |  (acc, e) -> named_struct(
         |    'best', concat(acc.best, array($selv)),
         |    'seg', concat(acc.seg, array(concat(
         |      element_at(acc.seg, e - ($sell) + 1),
         |      array(substring(word, e - ($sell) + 1, ($sell))))))),
         |  acc -> named_struct(
         |    'pieces', element_at(acc.seg, -1),
         |    'll', element_at(acc.best, -1)))""".stripMargin))
      .select(col("word"), col("freq"),
        col("vit.pieces").as("pieces"), col("vit.ll").as("ll"))
  }

  /** One hard-EM round: Viterbi piece counts (freq-weighted) →
    * re-normalized log probs. Single-char pieces stay in the vocab at
    * a half-count floor even when unused; multi-char pieces with zero
    * count are pruned. */
  def emRound(words: DataFrame, scores: DataFrame, maxLen: Int): DataFrame = {
    val counts = viterbiWords(words, scores, maxLen)
      .select(col("freq"), explode(col("pieces")).as("piece"))
      .groupBy(col("piece")).agg(sum(col("freq")).as("cnt"))
    val total = counts.agg(sum(col("cnt"))).head().getLong(0)
    val chars = scores.filter(length(col("piece")) === 1).select(col("piece"))
    val kept = counts
      .join(chars.withColumn("is_char", lit(true)), Seq("piece"), "full")
    kept.select(col("piece"),
      log(coalesce(col("cnt").cast("double"), lit(0.5)) / lit(total.toDouble))
        .as("ls"))
  }

  /** Train `rounds` hard-EM rounds from the seed, write-iff-absent to
    * `path` (the tokenizer-artifact lifecycle; deterministic retrain ≡
    * reuse, so the oracle can replay from the store). */
  def trainStored(spark: SparkSession, docs: DataFrame, maxLen: Int,
                  vocabSize: Int, rounds: Int, path: String,
                  textCol: String = "text"): DataFrame = {
    if (!Stores.exists(spark, path, "_SUCCESS")) {
      // one corpus scan: the persisted distinct-word table feeds the
      // seed vocab and every EM round
      val words = Wordpiece.words(docs, textCol).persist()
      var scores = seedScoresFromWords(words, maxLen, vocabSize)
      (1 to rounds).foreach { _ => scores = emRound(words, scores, maxLen) }
      scores.coalesce(1).write.mode("overwrite").parquet(path)
      words.unpersist()
    }
    docs.sparkSession.read.parquet(path)
  }

  /** Per-document Viterbi token count under a trained score table:
    * segment once per distinct word, broadcast-join the word→count map
    * onto the exploded corpus, partial-agg sum per doc. */
  def tokenCountPerDoc(docs: DataFrame, scores: DataFrame, maxLen: Int,
                       idCol: String = "doc_id",
                       textCol: String = "text"): DataFrame = {
    val words = Wordpiece.words(docs, textCol)
    val wc = viterbiWords(words, scores, maxLen)
      .select(col("word"), size(col("pieces")).cast("long").as("n_pieces"))
    docs.select(col(idCol), explode(Text.tokens(col(textCol))).as("word"))
      .join(broadcast(wc), Seq("word"))
      .groupBy(col(idCol))
      .agg(sum(col("n_pieces")).as("n_unigram_tokens"))
  }
}
