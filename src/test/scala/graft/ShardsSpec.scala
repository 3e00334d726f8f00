package graft

import org.apache.spark.sql.functions._
import graft.ops.Shards

class ShardsSpec extends SparkTestBase {
  import spark.implicits._

  private val keys = spark.range(0L, 2000L).toDF("k")

  test("assignment is total, in-range, and deterministic") {
    val a = keys.select(col("k"), Shards.rendezvousShard(col("k"), 8, "s").as("shard"))
    val byShard = a.groupBy("shard").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(byShard.keySet.subsetOf((0 until 8).toSet))
    assert(byShard.values.sum === 2000L)
    // balanced within loose binomial bounds (md5 uniformity)
    byShard.values.foreach(n => assert(n > 150 && n < 350, s"skewed: $byShard"))
    val b = keys.select(Shards.rendezvousShard(col("k"), 8, "s").as("shard"))
      .groupBy("shard").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(b === byShard, "same keys + salt must assign identically")
  }

  test("growing the ring N -> N+1 moves only keys won by the new shard (~1/(N+1))") {
    val a = keys.select(col("k"),
      Shards.rendezvousShard(col("k"), 8, "s").as("s8"),
      Shards.rendezvousShard(col("k"), 9, "s").as("s9"))
    val moved = a.filter(col("s8") =!= col("s9"))
    // every moved key must land on the NEW shard (id 8) — the rendezvous
    // invariant mod-sharding lacks; and the moved fraction is ~1/9
    assert(moved.filter(col("s9") =!= 8).count() === 0L)
    val m = moved.count()
    assert(m > 2000 / 9 / 2 && m < 2000 / 9 * 2, s"moved $m of 2000")
  }

  test("weighted: load tracks capacity ratios; growing one capacity moves only keys to that shard") {
    val caps = Seq(4, 2, 1, 1)
    val a = keys.select(
      graft.ops.Shards.rendezvousShardWeighted(col("k"), caps, "w").as("s"))
      .groupBy("s").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(a.keySet.subsetOf(Set(0, 1, 2, 3)) && a.values.sum === 2000L)
    // expected 1000/500/250/250 — binomial-loose bounds
    assert(a(0) > 800 && a(0) < 1200, s"$a")
    assert(a(1) > 380 && a(1) < 650, s"$a")
    // capacity bump 4:2:1:1 -> 4:2:2:1 (shard 2 gains a slot): every
    // moved key must land on shard 2
    val b = keys.select(col("k"),
      graft.ops.Shards.rendezvousShardWeighted(col("k"), caps, "w").as("s1"),
      graft.ops.Shards.rendezvousShardWeighted(col("k"), Seq(4, 2, 2, 1), "w")
        .as("s2"))
    assert(b.filter(col("s1") =!= col("s2") && col("s2") =!= 2).count() === 0L)
  }

  test("per-ring shard bound is loud") {
    intercept[IllegalArgumentException] {
      Shards.rendezvousShard(col("k"), 17, "s")
    }
    ()
  }
}
