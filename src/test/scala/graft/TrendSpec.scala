package graft

import graft.ops.Trend

/** Per-group least-squares trend: closed-form exactness and the NULL
  * degenerate-denominator contract. */
class TrendSpec extends SparkTestBase {
  import spark.implicits._

  test("perfect line recovers slope/intercept exactly with r2 = 1") {
    val df = Seq(("g", 0L, 1L), ("g", 1L, 3L), ("g", 2L, 5L))
      .toDF("grp", "x", "y")
    val r = Trend.linearTrend(df, Seq("grp"), "x", "y").collect().head
    assert(r.getAs[Long]("n") === 3L)
    assert(r.getAs[Double]("slope") === 2.0)
    assert(r.getAs[Double]("intercept") === 1.0)
    assert(r.getAs[Double]("r2") === 1.0)
  }

  test("hand-computed noisy fit; groups are independent") {
    // (0,0),(1,2),(2,1): n=3 Σx=3 Σy=3 Σxy=4 Σx²=5 Σy²=5
    // slope=(12−9)/(15−9)=0.5, intercept=(3−0.5·3)/3=0.5,
    // r²=9/(6·6)=0.25
    val df = (Seq(("a", 0L, 0L), ("a", 1L, 2L), ("a", 2L, 1L)) ++
      Seq(("b", 0L, 5L), ("b", 1L, 5L), ("b", 2L, 5L))).toDF("grp", "x", "y")
    val m = Trend.linearTrend(df, Seq("grp"), "x", "y").collect()
      .map(r => r.getAs[String]("grp") -> r).toMap
    assert(m("a").getAs[Double]("slope") === 0.5)
    assert(m("a").getAs[Double]("intercept") === 0.5)
    assert(m("a").getAs[Double]("r2") === 0.25)
    // constant y: slope 0, r² NULL (zero y-variance), not NaN
    assert(m("b").getAs[Double]("slope") === 0.0)
    assert(m("b").isNullAt(m("b").fieldIndex("r2")))
  }

  test("degenerate x (all equal) reports NULL slope/intercept, never Inf") {
    val df = Seq(("g", 7L, 1L), ("g", 7L, 9L)).toDF("grp", "x", "y")
    val r = Trend.linearTrend(df, Seq("grp"), "x", "y").collect().head
    assert(r.isNullAt(r.fieldIndex("slope")))
    assert(r.isNullAt(r.fieldIndex("intercept")))
    assert(r.isNullAt(r.fieldIndex("r2")))
  }

  test("null x or y rows are excluded from the fit") {
    val df = Seq(("g", Some(0L), Some(1L)), ("g", Some(1L), Some(3L)),
      ("g", None, Some(9L)), ("g", Some(5L), None))
      .toDF("grp", "x", "y")
    val r = Trend.linearTrend(df, Seq("grp"), "x", "y").collect().head
    assert(r.getAs[Long]("n") === 2L && r.getAs[Double]("slope") === 2.0)
  }
}
