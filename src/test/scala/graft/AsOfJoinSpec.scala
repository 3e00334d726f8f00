package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ops.AsOf

/** The custom AS-OF join operator (logical node → strategy → sort-merge
  * exec): latest right row with equal key and time ≤ left time. */
class AsOfJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("latest prior right row per left row; unmatched lefts dropped") {
    val l = Seq((1L, 10L), (1L, 20L), (2L, 15L)).toDF("id", "t")
    val r = Seq((1L, 5L, "a"), (1L, 12L, "b"), (2L, 99L, "c")).toDF("rid", "rt", "v")
    val out = AsOf.join(l, r, Seq(l("id")), Seq(r("rid")), l("t"), r("rt"))
      .select(col("id"), col("t"), col("rt"), col("v"))
      .as[(Long, Long, Long, String)].collect().sortBy(x => (x._1, x._2))
    // (2,15) has no right row at or before t=15 → dropped (inner)
    assert(out.toSeq === Seq((1L, 10L, 5L, "a"), (1L, 20L, 12L, "b")))
  }

  test("tolerance bounds the look-back") {
    val l = Seq((1L, 100L)).toDF("id", "t")
    val r = Seq((1L, 10L, "old")).toDF("rid", "rt", "v")
    val near = AsOf.join(l, r, Seq(l("id")), Seq(r("rid")), l("t"), r("rt"),
      tolerance = Some(90L))
    assert(near.count() === 1, "within tolerance")
    val l2 = Seq((1L, 100L)).toDF("id", "t")
    val r2 = Seq((1L, 10L, "old")).toDF("rid", "rt", "v")
    val far = AsOf.join(l2, r2, Seq(l2("id")), Seq(r2("rid")), l2("t"), r2("rt"),
      tolerance = Some(50L))
    assert(far.count() === 0, "latest match older than tolerance → no row")
  }

  test("forward variant: earliest right row at-or-after; tolerance bounds look-ahead") {
    val l = Seq((1L, 10L), (1L, 20L), (2L, 50L)).toDF("id", "t")
    val r = Seq((1L, 12L, "a"), (1L, 30L, "b"), (2L, 40L, "c")).toDF("rid", "rt", "v")
    val out = AsOf.joinForward(l, r, Seq(l("id")), Seq(r("rid")), l("t"), r("rt"))
      .select(col("id"), col("t"), col("rt"), col("v"))
      .as[(Long, Long, Long, String)].collect().sortBy(x => (x._1, x._2))
    // (1,10)→(12,a) earliest-after; (1,20)→(30,b); (2,50) has nothing after
    assert(out.toSeq === Seq((1L, 10L, 12L, "a"), (1L, 20L, 30L, "b")))
    val l2 = Seq((1L, 10L)).toDF("id", "t")
    val r2 = Seq((1L, 100L, "late")).toDF("rid", "rt", "v")
    assert(AsOf.joinForward(l2, r2, Seq(l2("id")), Seq(r2("rid")),
      l2("t"), r2("rt"), tolerance = Some(50L)).count() === 0,
      "earliest match beyond the look-ahead tolerance → no row")
    // equal times match in both directions (<= / >= contract)
    val l3 = Seq((1L, 10L)).toDF("id", "t")
    val r3 = Seq((1L, 10L, "same")).toDF("rid", "rt", "v")
    assert(AsOf.joinForward(l3, r3, Seq(l3("id")), Seq(r3("rid")),
      l3("t"), r3("rt")).count() === 1)
  }

  test("equals the window-based formulation on the events table") {
    val ev1 = graft.core.Tables.events(spark, sf0001)
    val ev2 = graft.core.Tables.events(spark, sf0001)
    val p = ev1.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts_us"))
    val v = ev2.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts_us").as("v_ts"))
    val viaOp = AsOf.join(p, v, Seq(p("user_id")), Seq(v("v_user")),
        p("ts_us"), v("v_ts"))
      .select(col("event_id"), col("v_ts"))
      .as[(Long, Long)].collect().toMap
    // reference: join all priors, keep max v_ts per purchase
    val viaWindow = p.join(v, p("user_id") === v("v_user") && v("v_ts") <= p("ts_us"))
      .groupBy(col("event_id")).agg(max(col("v_ts")).as("v_ts"))
      .as[(Long, Long)].collect().toMap
    assert(viaOp === viaWindow)
    assert(viaOp.nonEmpty, "fixture must exercise matches")
  }

  test("multi-partition correctness: keys spread over shuffle partitions") {
    val l = (0L until 400L).map(i => (i % 97, i * 10 + 5)).toDF("id", "t")
    val r = (0L until 400L).map(i => (i % 97, i * 7)).toDF("rid", "rt")
    val out = AsOf.join(l, r, Seq(l("id")), Seq(r("rid")), l("t"), r("rt"))
      .select(col("id"), col("t"), col("rt"))
      .as[(Long, Long, Long)].collect()
    val rRows = (0L until 400L).map(i => (i % 97, i * 7))
    val expected = (0L until 400L).map(i => (i % 97, i * 10 + 5)).flatMap {
      case (k, t) =>
        val c = rRows.filter(x => x._1 == k && x._2 <= t)
        if (c.isEmpty) None else Some((k, t, c.map(_._2).max))
    }
    assert(out.sortBy(x => (x._1, x._2)).toSeq === expected.sortBy(x => (x._1, x._2)))
  }
}
