package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.ops.{Unigram, Wordpiece}

/** Property: the RELATIONAL tokenizer kernels (jump-table + fold walk;
  * Viterbi-as-fold) agree with independent imperative reference
  * implementations on arbitrary words and vocabularies — including
  * vocabularies missing single chars (fallback paths). Raw scalacheck
  * generators with fixed seeds (the scalatestplus bridge is not on the
  * offline classpath). */
class TokenizerPropertySpec extends SparkTestBase {
  import spark.implicits._

  private val word = Gen.choose(1, 12).flatMap(n =>
    Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', 'd')).map(_.mkString))

  private def sampleWords(count: Int, seedBase: Long): Seq[String] =
    (0 until count).flatMap(i =>
      word(Gen.Parameters.default, Seed(seedBase + i))).distinct

  /** Pseudo-random but deterministic piece subset + scores: keep a
    * substring with probability ~1/2 by hash parity; score from the
    * hash too — the same map feeds the DF and the reference. */
  private def vocabFor(words: Seq[String], maxLen: Int,
                       dropChars: Boolean): Map[String, Double] = {
    val pieces = words.flatMap { w =>
      for {
        s <- 0 until w.length
        l <- 1 to math.min(maxLen, w.length - s)
      } yield w.substring(s, s + l)
    }.distinct
    pieces.filter { p =>
      val h = scala.util.hashing.MurmurHash3.stringHash(p, 17)
      if (p.length == 1) !dropChars || (h & 3) != 0 // drop ~1/4 of chars
      else (h & 1) == 0
    }.map(p => p -> -(1.0 +
      (scala.util.hashing.MurmurHash3.stringHash(p, 31) & 0xff) / 64.0)).toMap
  }

  private def refGreedy(w: String, vocab: Set[String], maxLen: Int): Long = {
    var pos = 0; var n = 0L
    while (pos < w.length) {
      var l = math.min(maxLen, w.length - pos)
      while (l > 1 && !vocab.contains(w.substring(pos, pos + l))) l -= 1
      pos += l; n += 1
    }
    n
  }

  private def refViterbi(w: String, scores: Map[String, Double],
                         maxLen: Int): (Double, Int) = {
    val best = Array.fill(w.length + 1)(0.0)
    val cnt = Array.fill(w.length + 1)(0)
    for (e <- 1 to w.length) {
      var bv = Double.NegativeInfinity; var bl = 0
      for (l <- 1 to math.min(maxLen, e)) {
        scores.get(w.substring(e - l, e)).foreach { ls =>
          val v = best(e - l) + ls
          if (v > bv || (v == bv && l > bl)) { bv = v; bl = l }
        }
      }
      if (bl == 0) { bv = best(e - 1) - 20.0; bl = 1 }
      best(e) = bv; cnt(e) = cnt(e - bl) + 1
    }
    (best(w.length), cnt(w.length))
  }

  test("relational greedy walk ≡ imperative greedy (random vocab, fallback)") {
    Seq(false, true).foreach { dropChars =>
      val words = sampleWords(40, if (dropChars) 1000L else 2000L)
      val vocab = vocabFor(words, maxLen = 4, dropChars)
      val wordsDf = words.map(w => (w, 1L)).toDF("word", "freq")
      val vocabDf = vocab.keys.toSeq.toDF("piece")
      val got = Wordpiece.wordPieceCountsFromWords(wordsDf, vocabDf, maxLen = 4)
        .as[(String, Long)].collect().toMap
      words.foreach { w =>
        assert(got(w) === refGreedy(w, vocab.keySet, 4),
          s"word '$w' dropChars=$dropChars vocab=${vocab.keySet.toSeq.sorted}")
      }
    }
  }

  test("relational Viterbi fold ≡ imperative DP (random vocab, fallback)") {
    Seq(false, true).foreach { dropChars =>
      val words = sampleWords(40, if (dropChars) 3000L else 4000L)
      val scores = vocabFor(words, maxLen = 4, dropChars)
      val wordsDf = words.map(w => (w, 1L)).toDF("word", "freq")
      val scoresDf = scores.toSeq.toDF("piece", "ls")
      val got = Unigram.viterbiWords(wordsDf, scoresDf, maxLen = 4)
        .select(col("word"), size(col("pieces")).as("n"), col("ll"))
        .as[(String, Int, Double)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      words.foreach { w =>
        val (ll, n) = refViterbi(w, scores, 4)
        val (gn, gll) = got(w)
        assert(gn === n, s"count for '$w' dropChars=$dropChars")
        assert(math.abs(gll - ll) < 1e-12, s"ll for '$w' dropChars=$dropChars")
      }
    }
  }
}
