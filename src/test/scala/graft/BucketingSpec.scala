package graft

import org.apache.spark.sql.functions._

/** Bucketed co-located joins — the shuffle-elimination story for the
  * 100 TB target: a fact table bucketed on its join key joins a
  * same-bucketed dimension with NO Exchange in the plan, so the join
  * cost is a per-bucket merge instead of a full re-shuffle of the fact.
  * (The reference has no notion of physical layout at all — its
  * "arrangement" is rebuilt in memory per process, SURVEY §4.2; bucketed
  * parquet is the durable, cluster-wide equivalent.) */
class BucketingSpec extends SparkTestBase {

  test("same-bucketed tables join with zero exchanges; counts match the plain join") {
    val ord = graft.core.Tables.orders(spark, sf0001)
    val li = graft.core.Tables.lineitem(spark, sf0001)
    val plainCount = li.join(ord, col("l_orderkey") === col("o_orderkey")).count()

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    ord.write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("b_orders")
    li.write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("b_lineitem")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the merge path
    try {
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"), col("l_orderkey") === col("o_orderkey"))
      assert(joined.count() === plainCount, "bucketed join must match plain join")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle either side:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected a merge/hash join over co-located buckets:\n$plan")
      assert(plan.contains("SelectedBucketsCount") || plan.contains("Bucketed: true"),
        s"scan must report bucketed layout:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
