package graft

import org.apache.spark.sql.functions._

import graft.ops.{Bpe, Unigram}

/** Unigram-LM tokenizer: Viterbi DP fixtures, tie and fallback rules,
  * hard-EM likelihood improvement, and per-doc count consistency. */
class UnigramSpec extends SparkTestBase {
  import spark.implicits._

  private def wordsDf(ws: (String, Long)*) = ws.toDF("word", "freq")

  test("viterbi picks the max-likelihood segmentation") {
    val scores = Seq(
      ("ab", -1.0), ("a", -2.0), ("b", -2.0), ("c", -2.5), ("abc", -4.9))
      .toDF("piece", "ls")
    val got = Unigram.viterbiWords(wordsDf("abc" -> 1L), scores, maxLen = 4)
      .select(col("pieces"), col("ll")).as[(Seq[String], Double)].head()
    // ab|c = -3.5 beats abc = -4.9 and a|b|c = -6.5
    assert(got._1 === Seq("ab", "c"))
    assert(math.abs(got._2 - (-3.5)) < 1e-12)
  }

  test("log-prob ties break toward the longer piece") {
    val scores = Seq(
      ("ab", -1.0), ("c", -2.5), ("abc", -3.5), ("a", -9.0), ("b", -9.0))
      .toDF("piece", "ls")
    // ab|c = -3.5 exactly equals abc = -3.5 → single piece wins
    val got = Unigram.viterbiWords(wordsDf("abc" -> 1L), scores, maxLen = 4)
      .select(col("pieces")).as[Seq[String]].head()
    assert(got === Seq("abc"))
  }

  test("unknown characters take the fixed-penalty byte fallback") {
    val scores = Seq(("a", -1.0), ("b", -1.0)).toDF("piece", "ls")
    val got = Unigram.viterbiWords(wordsDf("azb" -> 1L), scores, maxLen = 4)
      .select(col("pieces"), col("ll")).as[(Seq[String], Double)].head()
    assert(got._1 === Seq("a", "z", "b"))
    assert(math.abs(got._2 - (-1.0 - 20.0 - 1.0)) < 1e-12)
  }

  test("hard-EM round does not degrade corpus Viterbi log-likelihood") {
    val docs = graft.core.Tables.documents(spark, sf0001)
    val words = Bpe.wordCounts(docs).filter(length(col("word")) >= 1)
    def totalLl(scores: org.apache.spark.sql.DataFrame): Double =
      Unigram.viterbiWords(words, scores, maxLen = 4)
        .agg(sum(col("ll") * col("freq"))).as[Double].head()
    val seed = Unigram.seedScores(docs, maxLen = 4, vocabSize = 200)
    val r1 = Unigram.emRound(words, seed, maxLen = 4)
    val r2 = Unigram.emRound(words, r1, maxLen = 4)
    val (l0, l1, l2) = (totalLl(seed), totalLl(r1), totalLl(r2))
    // the unused-char floor adds ~0.5/total of improper mass, hence the
    // epsilon; the improvement itself is orders larger
    assert(l1 >= l0 - 1e-3, s"EM round 1: $l0 -> $l1")
    assert(l2 >= l1 - 1e-3, s"EM round 2: $l1 -> $l2")
    assert(l1 > l0 + 1.0, "round 1 should improve LL substantially")
  }

  test("viterbi log-likelihood dominates the single-char segmentation") {
    // Viterbi maximizes over ALL segmentations, so per word its LL must
    // be >= the all-single-chars segmentation's LL (chars are always in
    // the seed vocab) — a corpus-wide optimality property, not a fixture
    val docs = graft.core.Tables.documents(spark, sf0001)
    val words = graft.ops.Wordpiece.words(docs).persist()
    val scores = Unigram.seedScoresFromWords(words, maxLen = 4, vocabSize = 200)
    val vit = Unigram.viterbiWords(words, scores, maxLen = 4)
      .select(col("word"), col("ll"))
    val charLl = words.select(col("word"),
        explode(split(col("word"), "")).as("piece"))
      .filter(length(col("piece")) === 1)
      .join(scores, Seq("piece"))
      .groupBy(col("word")).agg(sum(col("ls")).as("char_ll"))
    val viol = vit.join(charLl, Seq("word"))
      .filter(col("ll") < col("char_ll") - lit(1e-9)).count()
    assert(viol === 0)
    words.unpersist(); ()
  }

  test("per-doc counts equal the direct per-word Viterbi sum") {
    val docs = Seq((1L, "ab ab c"), (2L, "abc")).toDF("doc_id", "text")
    val scores = Seq(
      ("ab", -1.0), ("a", -2.0), ("b", -2.0), ("c", -2.5), ("abc", -4.9))
      .toDF("piece", "ls")
    val got = Unigram.tokenCountPerDoc(docs, scores, maxLen = 4)
      .as[(Long, Long)].collect().toMap
    assert(got(1L) === 1L + 1L + 1L, "ab(1) + ab(1) + c(1)")
    assert(got(2L) === 2L, "ab|c")
  }
}
