package graft

import org.apache.spark.sql.functions._
import graft.ops.Bpe

/** BPE merge training units: the classic low/lower/newest/widest
  * fixture with hand-computed merges, and the greedy left-to-right
  * non-overlap semantics of a single merge application. */
class BpeSpec extends SparkTestBase {

  import spark.implicits._

  private def docsOf(wordFreqs: (String, Int)*) = {
    // one document per word occurrence keeps the word-count pass honest
    wordFreqs.flatMap { case (w, n) => Seq.fill(n)(w) }
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
  }

  test("classic fixture learns (e,s), (es,t), (l,o) in order") {
    // low×5 lower×2 newest×6 widest×3:
    //   round 1: (e,s) 9 ties (s,t) 9 -> left-asc tie-break picks (e,s)
    //   round 2: (es,t) 9
    //   round 3: (l,o) 7 ties (o,w) 7 -> (l,o)
    val docs = docsOf("low" -> 5, "lower" -> 2, "newest" -> 6, "widest" -> 3)
    val merges = Bpe.trainMerges(docs, k = 3)
    assert(merges === Seq((1, "e", "s", 9L), (2, "es", "t", 9L), (3, "l", "o", 7L)))
  }

  test("applyMerge is greedy left-to-right, non-overlapping") {
    val df = Seq((1L, Seq("a", "a", "a")), (2L, Seq("a", "a", "a", "a")),
        (3L, Seq("b", "a", "a")))
      .toDF("id", "sym")
      .select(col("id"), Bpe.applyMerge(col("sym"), "a", "a").as("m"))
      .as[(Long, Seq[String])].collect().toMap
    assert(df(1L) === Seq("aa", "a"), "aaa -> [aa, a], no re-merge")
    assert(df(2L) === Seq("aa", "aa"))
    assert(df(3L) === Seq("b", "aa"))
  }

  test("early stop when the corpus is fully merged") {
    val docs = docsOf("ab" -> 3)
    val merges = Bpe.trainMerges(docs, k = 5)
    assert(merges === Seq((1, "a", "b", 3L)), "one merge exhausts all pairs")
  }

  test("encode applies merges in rank order") {
    val words = Seq(("lowest", 1L)).toDF("word", "freq")
    val out = Bpe.encode(words, Seq("e" -> "s", "es" -> "t", "l" -> "o"))
      .select(col("sym")).as[Seq[String]].head()
    assert(out === Seq("lo", "w", "est"))
  }

  test("map-only tokenCountCol equals the broadcast-join form on real docs") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val merges = Bpe.trainMerges(docs, k = 4).map(m => (m._2, m._3))
    val joined = Bpe.tokenCountPerDoc(docs, merges)
      .as[(Long, Long)].collect().toMap
    val mapOnly = docs.select(col("doc_id"),
        Bpe.tokenCountCol(col("text"), merges).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(joined === mapOnly)
  }
}
