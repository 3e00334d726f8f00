package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.ops.{Shards, Decay}

/** Properties of the r13 integer-exact ops over arbitrary inputs (raw
  * scalacheck generators with fixed seeds — the scalatestplus bridge is
  * not on the offline classpath). */
class ShardDecayPropertySpec extends SparkTestBase {
  import spark.implicits._

  private def longs(count: Int, seedBase: Long): Seq[Long] =
    (0 until count).flatMap(i =>
      Gen.choose(Long.MinValue / 2, Long.MaxValue / 2)
        .apply(Gen.Parameters.default, Seed(seedBase + i)))

  test("rendezvous: for ANY keys/salt/N, growing N -> N+1 only moves keys to the NEW shard (property)") {
    Seq(("saltA", 3), ("saltB", 7), ("saltC", 15)).foreach { case (salt, n) =>
      val keys = longs(300, salt.hashCode.toLong).toDF("k")
      val moved = keys.select(
          Shards.rendezvousShard(col("k"), n, salt).as("a"),
          Shards.rendezvousShard(col("k"), n + 1, salt).as("b"))
        .filter(col("a") =!= col("b"))
      assert(moved.filter(col("b") =!= n).count() === 0L,
        s"salt=$salt n=$n: a moved key landed on an OLD shard — " +
          "rendezvous stability violated")
      // and every assignment is in range
      val bad = keys.select(Shards.rendezvousShard(col("k"), n, salt).as("s"))
        .filter(col("s") < 0 || col("s") >= n).count()
      assert(bad === 0L)
    }
  }

  test("decay: split/merge additivity holds for ANY partition of the rows (property)") {
    val ts = longs(200, 99L).map(v => math.abs(v % 100000L))
    val rows = ts.zipWithIndex.map { case (t, i) => (s"g${i % 3}", t) }
    val all = rows.toDF("g", "ts")
    // asOf = a period boundary − 1: the exact-ts cut (one-shot) and the
    // period-resolution cut (store) provably agree there for ANY rows
    // (the scaladoc's granularity contract)
    val oneShot = Decay.decayedCounts(all, Seq("g"), "ts", 49999L, 1000L)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("decayed_scaled")).toMap
    // three arbitrary 4-way splits, each must refold to the one-shot
    Seq(3, 7, 13).foreach { m =>
      // hash-derived 4-way partition (exact: every row lands in exactly
      // one split), different partition per m
      val splits = (0 until 4).map(p =>
        all.filter(pmod(hash(col("g"), col("ts"), lit(m)), lit(4)) === p))
      val merged = splits.map(Decay.decayedBuckets(_, Seq("g"), "ts", 1000L))
        .reduce(_ unionAll _)
        .groupBy("g", "period").agg(sum("cnt").cast("long").as("cnt"))
      val folded = Decay.decayedFromBuckets(merged, Seq("g"), 49999L, 1000L)
        .collect().map(r => r.getString(0) -> r.getAs[Long]("decayed_scaled")).toMap
      assert(folded === oneShot, s"split m=$m diverged")
    }
  }

  test("decay: the scaled weight is exactly 2^(B-b) for every bucket in range (property)") {
    val B = 20
    val rows = (0 to 25).map(b => ("g", 100000L - b.toLong * 100L)).toDF("g", "ts")
    val out = Decay.decayedFromBuckets(
      Decay.decayedBuckets(rows, Seq("g"), "ts", 100L),
      Seq("g"), 100000L, 100L, maxBuckets = B).collect().head
    val expect = (0 to 25).map(b => if (b <= B) 1L << (B - b) else 0L).sum
    assert(out.getAs[Long]("decayed_scaled") === expect)
  }
}
