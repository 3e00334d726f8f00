package graft

import org.apache.spark.sql.functions._
import graft.functions.Text

/** Units for the curation-rule family: Gopher signals (values + the
  * map-only plan contract), corpus-diff status logic, weighted-quantile
  * crossing rule. The oracle queries hash-check these end-to-end; the
  * specs pin the semantics on hand-computed fixtures so a refactor
  * can't silently shift a rule boundary. */
class CurationSpec extends SparkTestBase {

  import spark.implicits._

  private def signals(rows: (Long, String)*) = {
    val docs = rows.toSeq.toDF("doc_id", "text")
    docs.select(col("doc_id"), Text.tokens(col("text")).as("toks"))
      .withColumn("sh", Text.shinglesFromTokens(col("toks"), 2))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_words"),
        Text.tokenLenSum(col("toks")).as("len_sum"),
        Text.alphaWordCount(col("toks")).as("alpha_words"),
        Text.stopwordHitsFromTokens(col("toks"), Text.EN_STOPWORDS).as("stop_hits"))
  }

  test("Gopher signal arithmetic on a hand-computed doc") {
    val out = signals((1L, "The cat and the hat 42"))
      .as[(Long, Long, Long, Long, Long)].head()
    // tokens: the, cat, and, the, hat, 42
    assert(out === ((1L, 6L, 3 + 3 + 3 + 3 + 3 + 2L, 5L, 3L)))
  }

  test("signal computation is map-only: no exchange in the plan") {
    val plan = signals((1L, "a b"), (2L, "c d"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"signals must not shuffle:\n$plan")
  }

  test("BPE streaming token count is map-only too") {
    val docs = Seq((1L, "low lower")).toDF("doc_id", "text")
    val plan = docs.select(
        graft.ops.Bpe.tokenCountCol(col("text"), Seq("l" -> "o")).as("n"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"column encode must not shuffle:\n$plan")
  }

  test("weighted-quantile crossing: first value whose 2*cum >= total") {
    // weights 1,1,4 on values 10,20,30: total 6; cum at 20 is 2 (2*2<6),
    // cum at 30 is 6 -> weighted median is 30 even though 20 is the
    // unweighted median
    val df = Seq((1L, 10L, 1L), (2L, 20L, 1L), (3L, 30L, 4L))
      .toDF("id", "v", "wt")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("v"), col("id"))
    val tot = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(1))
    val med = df.withColumn("cum", sum(col("wt")).over(w))
      .withColumn("tot", sum(col("wt")).over(tot))
      .agg(min(when(col("cum") * 2L >= col("tot"), col("v"))).as("m"))
      .as[Long].head()
    assert(med === 30L)
  }

  test("corpus-diff status logic covers all four states") {
    val v1 = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "fp_a")
    val v2 = Seq((2L, "b"), (3L, "c2"), (4L, "d")).toDF("doc_id", "fp_b")
    val st = v1.join(v2, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("fp_b").isNull, "removed")
          .when(col("fp_a").isNull, "added")
          .when(col("fp_a") =!= col("fp_b"), "changed")
          .otherwise("unchanged").as("status"))
      .as[(Long, String)].collect().toMap
    assert(st === Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"))
  }

  test("neymanAllocation: sums to budget exactly; variance drives the split; degenerate strata allowed") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // two equal-size strata: "wild" values 0/200 alternating (sigma 100),
    // "flat" constant 100 (sigma 0) -> the whole budget goes to wild
    val rows = (0 until 200).map { i =>
      if (i < 100) ("wild", if (i % 2 == 0) 0L else 200L)
      else ("flat", 100L)
    }.toDF("s", "v")
    val out = graft.ops.Sampling
      .neymanAllocation(rows, Seq("s"), "v", budget = 50L)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("alloc")).toMap
    assert(out("wild") === 50L && out("flat") === 0L)
    // three strata with distinct sigmas: sum is exactly the budget and
    // ordering follows N_h * sigma_h
    val mixed = ((0 until 90).map(i => ("a", (i % 3).toLong * 50L)) ++
      (0 until 90).map(i => ("b", (i % 2).toLong * 10L)) ++
      (0 until 90).map(_ => ("c", 7L))).toDF("s", "v")
    val m = graft.ops.Sampling
      .neymanAllocation(mixed, Seq("s"), "v", budget = 97L)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("alloc")).toMap
    assert(m.values.sum === 97L, s"largest remainder must conserve: $m")
    assert(m("a") > m("b") && m("b") > m("c"), s"allocation must follow sigma: $m")
  }
}
