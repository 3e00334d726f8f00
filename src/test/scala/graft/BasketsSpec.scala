package graft

import org.apache.spark.sql.functions._
import graft.ops.Baskets

/** A-Priori pair mining: the prune and the hot-basket guard (the oracle
  * query q_copurchase pins end-to-end values; these pin the bounds). */
class BasketsSpec extends SparkTestBase {
  import spark.implicits._

  private def pairs(df: org.apache.spark.sql.DataFrame) =
    df.select("item_a", "item_b", "support")
      .as[(Long, Long, Long)].collect().toSet

  test("a-priori: pairs of infrequent items never reach the self-join") {
    // items 1,2 co-occur 3x (frequent); item 9 co-occurs with 1 twice
    // but appears only twice overall — below minItemSupport 3
    val b = Seq(
      (10L, 1L), (10L, 2L), (10L, 9L),
      (11L, 1L), (11L, 2L), (11L, 9L),
      (12L, 1L), (12L, 2L)).toDF("basket", "item")
    val got = pairs(Baskets.frequentPairs(b, "basket", "item",
      minItemSupport = 3, minPairSupport = 2))
    assert(got === Set((1L, 2L, 3L)), s"got $got")
  }

  test("lift: attracting pair > 1, independent-ish pair below it") {
    val b = (Seq.tabulate(8)(i => Seq((i.toLong, 1L), (i.toLong, 2L))).flatten ++
      Seq((8L, 1L), (9L, 2L), (10L, 3L), (11L, 3L), (0L, 3L), (1L, 3L)))
      .toDF("basket", "item")
    val out = Baskets.frequentPairs(b, "basket", "item", 2, 2)
      .select($"item_a", $"item_b", $"lift").as[(Long, Long, Double)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    // 1 and 2 co-occur in 8 of their 9 baskets each — strong attraction
    assert(out((1L, 2L)) > 1.0, s"lift ${out((1L, 2L))}")
  }

  test("incremental pair store: batch appends sum to the from-scratch mining; replay is a no-op") {
    val dir = java.nio.file.Files.createTempDirectory("basket_store").toString
    val rnd = new scala.util.Random(5)
    val rows = (0 until 400).map(_ => (rnd.nextInt(60).toLong, rnd.nextInt(25).toLong))
    val b = rows.toDF("basket", "item")
    // three basket-disjoint slices appended separately
    (0 until 3).foreach { i =>
      graft.ops.Baskets.pairStoreAppend(
        b.filter(pmod($"basket", lit(3)) === i), dir, s"s$i")
    }
    val storeRows = spark.read.parquet(dir).count()
    // replayed batch: marker makes it a no-op
    graft.ops.Baskets.pairStoreAppend(
      b.filter(pmod($"basket", lit(3)) === 1), dir, "s1")
    assert(spark.read.parquet(dir).count() === storeRows)
    val fromStore = graft.ops.Baskets
      .frequentPairsFromStore(spark, dir, minItemSupport = 3, minPairSupport = 2)
      .select("item_a", "item_b", "support", "supp_a", "supp_b", "lift")
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSet
    val scratch = graft.ops.Baskets
      .frequentPairs(b, "basket", "item", minItemSupport = 3, minPairSupport = 2)
      .select("item_a", "item_b", "support", "supp_a", "supp_b", "lift")
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSet
    assert(fromStore === scratch, "additive store report ≡ from-scratch mining")
    assert(fromStore.nonEmpty)
  }

  test("string-SKU catalog: the store's NULL discriminators carry the item dtype") {
    val dir = java.nio.file.Files.createTempDirectory("basket_sku").toString
    val b = Seq(
      (1L, "SKU-A"), (1L, "SKU-B"), (2L, "SKU-A"), (2L, "SKU-B"),
      (3L, "SKU-A"), (3L, "SKU-B"), (3L, "SKU-C")).toDF("basket", "item")
    graft.ops.Baskets.pairStoreAppend(b, dir, "b0")
    val st = spark.read.parquet(dir)
    assert(st.schema("item_a").dataType ===
      org.apache.spark.sql.types.StringType, "store keeps the SKU dtype")
    val got = graft.ops.Baskets
      .frequentPairsFromStore(spark, dir, minItemSupport = 2, minPairSupport = 2)
      .select("item_a", "item_b", "support")
      .as[(String, String, Long)].collect().toSet
    assert(got === Set(("SKU-A", "SKU-B", 3L)), s"got $got")
  }

  test("hot-basket guard drops the mega-basket's pair explosion, keeps the rest") {
    val normal = Seq((1L, 100L), (1L, 101L), (2L, 100L), (2L, 101L))
    // every mega item is FREQUENT (each also sits alone in its own
    // singleton basket), so the guard sees the mega-basket at its full
    // 40-frequent-item size; no pair co-occurs outside basket 99
    val mega = (0 until 40).flatMap(i =>
      Seq((99L, 200L + i), (300L + i, 200L + i)))
    val b = (normal ++ mega).toDF("basket", "item")
    val unguarded = pairs(Baskets.frequentPairs(b, "basket", "item", 2, 1))
      .map(p => (p._1, p._2))
    assert(unguarded.contains((200L, 201L)) && unguarded.contains((100L, 101L)))
    val guarded = pairs(Baskets.frequentPairs(b, "basket", "item", 2, 1,
      maxBasketSize = Some(10))).map(p => (p._1, p._2))
    assert(guarded.contains((100L, 101L)), "normal baskets keep their pairs")
    // 200-201 co-occur ONLY inside the mega-basket — the guard cuts them
    assert(!guarded.contains((200L, 201L)),
      s"mega-basket pairs must be gone, got $guarded")
  }
}
