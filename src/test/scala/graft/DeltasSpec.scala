package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.core.Deltas

/** Delta-consolidation algebra (reference coll.rs:89-101 invariants):
  * per-record multiplicity sums, zero elimination, negate/threshold. */
class DeltasSpec extends SparkTestBase {

  import spark.implicits._

  private def deltaDf(rows: Seq[(String, Long)]) =
    rows.toDF("k", Deltas.MULT)

  test("consolidate sums multiplicities and drops zeros") {
    val df = deltaDf(Seq(("a", 1L), ("a", 2L), ("b", 1L), ("b", -1L), ("c", -2L)))
    val out = Deltas.consolidate(df).as[(String, Long)].collect().toMap
    assert(out === Map("a" -> 3L, "c" -> -2L)) // b nets to zero → eliminated
  }

  test("negate + concat = EXCEPT ALL in delta space") {
    val a = Seq("x", "x", "y").toDF("k")
    val b = Seq("x", "z").toDF("k")
    val out = Deltas.consolidate(Deltas.concat(a, Deltas.negate(b)))
      .as[(String, Long)].collect().toMap
    assert(out === Map("x" -> 1L, "y" -> 1L, "z" -> -1L))
  }

  test("threshold caps multiplicity; distinct forces 1") {
    val df = Seq("a", "a", "a", "b").toDF("k")
    val capped = Deltas.threshold(df, m => least(m, lit(2L)))
      .as[(String, Long)].collect().toMap
    assert(capped === Map("a" -> 2L, "b" -> 1L))
    val dist = Deltas.distinct(df).as[(String, Long)].collect().toMap
    assert(dist === Map("a" -> 1L, "b" -> 1L))
  }

  test("diff produces the deltas that turn old into new (drain_deltas batch analog)") {
    val old = Seq("a", "a", "b").toDF("k")
    val nu = Seq("a", "c").toDF("k")
    val out = Deltas.consolidate(Deltas.diff(nu, old)).as[(String, Long)]
      .collect().toMap
    assert(out === Map("a" -> -1L, "b" -> -1L, "c" -> 1L))
  }

  test("property: consolidation preserves total multiplicity per key") {
    val gen = Gen.listOfN(30, Gen.zip(Gen.oneOf("a", "b", "c", "d"),
      Gen.chooseNum(-3L, 3L)))
    (0 until 20).foreach { i =>
      val rows = gen.apply(Gen.Parameters.default, Seed(i.toLong)).get
      val expected = rows.groupBy(_._1).view
        .mapValues(_.map(_._2).sum).filter(_._2 != 0).toMap
      val out = Deltas.consolidate(deltaDf(rows)).as[(String, Long)]
        .collect().toMap
      assert(out === expected, s"seed $i")
    }
  }
}
