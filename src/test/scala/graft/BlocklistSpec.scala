package graft

import org.apache.spark.sql.functions._
import graft.ops.Blocklist

class BlocklistSpec extends SparkTestBase {
  import spark.implicits._

  private val terms = Seq(("bad", "cat1"), ("very bad", "cat2"))
    .toDF("term", "category")

  test("unigram and bigram hits count occurrences per category") {
    val docs = Seq(
      (1L, "bad things and very bad things and Bad again"),
      (2L, "nothing to see"),
      (3L, "bad")).toDF("doc_id", "text")
    val out = Blocklist.screen(docs, terms).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    // doc 1: "bad" x3 (normalized lowercase), "very bad" x1
    assert(out((1L, "cat1")) === 3L)
    assert(out((1L, "cat2")) === 1L)
    assert(!out.contains((2L, "cat1")) && !out.contains((2L, "cat2")))
    assert(out((3L, "cat1")) === 1L, "single-token doc: no bigrams, unigram still hits")
  }

  test("null text is skipped; survivors via left_anti") {
    val docs = Seq((1L, "bad"), (2L, null.asInstanceOf[String]), (3L, "fine"))
      .toDF("doc_id", "text")
    val hits = Blocklist.screen(docs, terms)
    val survivors = docs.join(hits, Seq("doc_id"), "left_anti")
      .select("doc_id").as[Long].collect().sorted
    assert(survivors.toSeq === Seq(2L, 3L))
  }

  test("plan: blocklist side is broadcast, no corpus-side shuffle before the count agg") {
    val docs = Seq((1L, "bad bad")).toDF("doc_id", "text")
    val plan = Blocklist.screen(docs, terms).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"terms must broadcast:\n$plan")
  }
}
