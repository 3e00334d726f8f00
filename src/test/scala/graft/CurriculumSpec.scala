package graft

import org.apache.spark.sql.functions._

import graft.ops.Curriculum

/** Novelty scoring and interleaved curriculum ordering. */
class CurriculumSpec extends SparkTestBase {
  import spark.implicits._

  test("novelty: first-seen grams credit the earliest doc") {
    val d = Seq(
      (1L, "a b c"),      // grams: "a b", "b c" — both first here
      (2L, "a b x"),      // "a b" seen, "b x" novel → 1/2
      (3L, "a b c"),      // both seen → 0/2
      (4L, "q")           // no bigram — absent from output
    ).toDF("doc_id", "text")
    val got = Curriculum.novelty(d, n = 2)
      .select(col("doc_id"), col("novel_grams"), col("total_grams"))
      .as[(Long, Long, Long)].collect()
      .map { case (id, nov, tot) => id -> ((nov, tot)) }.toMap
    assert(got(1L) === ((2L, 2L)))
    assert(got(2L) === ((1L, 2L)))
    assert(got(3L) === ((0L, 2L)))
    assert(!got.contains(4L))
  }

  test("novelty counts DISTINCT grams per doc (self-repetition ignored)") {
    val d = Seq((1L, "a b a b a b")).toDF("doc_id", "text")
    // bigrams: "a b","b a","a b","b a","a b" → distinct {"a b","b a"}
    val r = Curriculum.novelty(d, n = 2).as[(Long, Long, Long, Double)].head()
    assert(r === ((1L, 2L, 2L, 1.0)))
  }

  test("interleave: round-robin across sources, best-quality first") {
    val d = Seq(
      (1L, "s1", 0.9), (2L, "s1", 0.5), (3L, "s1", 0.7),
      (4L, "s2", 0.8), (5L, "s2", 0.6)
    ).toDF("doc_id", "source", "score")
    val got = Curriculum.interleavedOrder(d, "source", "score")
      .orderBy(col("position"))
      .select(col("doc_id"), col("position"))
      .as[(Long, Long)].collect()
    // src_idx: s1=0, s2=1; ranks s1: 1,3,2 → positions 0,2,4; s2: 4,5 → 1,3
    assert(got.toSeq === Seq((1L, 0L), (4L, 1L), (3L, 2L), (5L, 3L), (2L, 4L)))
  }

  test("interleave positions are unique and prefix-balanced on real data") {
    val docs = graft.core.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("source"),
        graft.functions.Text.qualityScore(col("text")).as("q"))
    val out = Curriculum.interleavedOrder(docs, "source", "q")
    val n = out.count()
    assert(out.select(col("position")).distinct().count() === n)
    // in any prefix of length S·k the sources appear exactly k times each
    val s = out.select(col("source")).distinct().count()
    val k = 5
    val prefix = out.filter(col("position") < s * k)
      .groupBy(col("source")).count().as[(String, Long)].collect()
    assert(prefix.length === s && prefix.forall(_._2 === k))
  }
}
