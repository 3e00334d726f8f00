package graft

import org.apache.spark.sql.functions._

import graft.ops.Wordpiece

/** WordPiece greedy tokenizer: vocab seeding, the relational
  * jump-table + fold walk, and byte-fallback semantics. */
class WordpieceSpec extends SparkTestBase {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("vocab: occurrence-weighted substrings, single chars always kept") {
    // "aaab" x2, "ab" x1  → piece "a" occurs 3+3+3? count occurrences:
    // aaab: a(3 positions), aa(2), aaa(1), aab(1), ab(1), aaab(1), b(1)...
    val d = docs(1L -> "aaab aaab ab")
    val v = Wordpiece.vocab(d, maxLen = 4, vocabSize = 2).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // single chars survive even when outside the top-2
    assert(v.contains("a") && v.contains("b"))
    // occurrence weighting: "a" = 3+3+1 per-word occurrences × freq
    assert(v("a") === 2L * 3 + 1L * 1)
    assert(v("b") === 2L * 1 + 1L * 1)
    // top-2 by weight: "a" (7) and... "aa" = 2×2 = 4 vs "b" = 3: "aa" wins
    assert(v.contains("aa"))
  }

  test("greedy longest-match-first: hand fixtures") {
    val words = Seq("hashing", "hash", "shin", "x").toDF("text")
      .withColumn("doc_id", lit(1L))
    val vocab = Seq("hash", "ing", "shin", "h", "a", "s", "i", "n", "g", "x")
      .toDF("piece")
    val got = Wordpiece.wordPieceCounts(words, vocab, maxLen = 4)
      .as[(String, Long)].collect().toMap
    // "hashing" → hash|ing  (greedy takes 4-char "hash" at pos 1, then
    // "ing"): 2 pieces — NOT s|hin|… (longest-at-position rule)
    assert(got("hashing") === 2L)
    assert(got("hash") === 1L)
    assert(got("shin") === 1L)
    assert(got("x") === 1L)
  }

  test("unknown characters take the step-1 byte fallback") {
    val words = Seq("azb").toDF("text").withColumn("doc_id", lit(1L))
    val vocab = Seq("a", "b").toDF("piece") // no 'z'
    val got = Wordpiece.wordPieceCounts(words, vocab, maxLen = 4)
      .as[(String, Long)].collect().toMap
    assert(got("azb") === 3L, "a|z(fallback)|b")
  }

  test("per-doc counts: distinct-word amortization agrees with direct sum") {
    val d = docs(
      1L -> "abc abc xy",
      2L -> "abc",
      3L -> "")
    val vocab = Seq("abc", "ab", "x", "y", "a", "b", "c").toDF("piece")
    val got = Wordpiece.tokenCountPerDoc(d, vocab, maxLen = 4)
      .as[(Long, Long)].collect().toMap
    assert(got(1L) === 1L + 1L + 2L, "abc(1)+abc(1)+x|y(2)")
    assert(got(2L) === 1L)
    assert(!got.contains(3L), "blank doc has no countable words")
  }

  test("a longer piece never splits worse than its own prefix chain") {
    // self-consistency on real data: every distinct corpus word encodes
    // to at least 1 and at most length(word) pieces
    val d = graft.core.Tables.documents(spark, sf0001)
    val v = Wordpiece.vocab(d, maxLen = 4, vocabSize = 200)
    val wc = Wordpiece.wordPieceCounts(d, v, maxLen = 4)
      .withColumn("len", length(col("word")))
    val bad = wc.filter(col("n_pieces") < 1 ||
      col("n_pieces") > col("len")).count()
    assert(bad === 0)
  }
}
