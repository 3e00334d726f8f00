package graft

import scala.util.Random

import org.apache.spark.sql.functions._
import graft.ops.Frequency

/** Misra-Gries native aggregate: exact-regime equality with a plain
  * grouped count, the deterministic under-count bound when capacity is
  * exceeded, and partitioning-invariance in the exact regime (the
  * property the q_heavy_hitters oracle relies on). */
class MisraGriesSpec extends SparkTestBase {
  import spark.implicits._

  test("exact regime: distinct <= capacity reproduces the exact counts") {
    val rnd = new Random(42)
    val rows = Seq.fill(5000)(("g" + rnd.nextInt(3), "u" + rnd.nextInt(40)))
    val df = rows.toDF("g", "item")

    val mg = Frequency.heavyHitters(df, Seq("g"), "item", capacity = 64, k = 40)
      .select("g", "item", "cnt").as[(String, String, Long)].collect().toSet
    val exact = df.groupBy("g", "item").agg(count(lit(1)).as("cnt"))
      .as[(String, String, Long)].collect().toSet
    assert(mg === exact, "capacity 64 > 40 distinct → every count exact")
  }

  test("exact regime is partitioning-invariant") {
    val rnd = new Random(7)
    val rows = Seq.fill(4000)(("u" + rnd.nextInt(100), 1))
    val a = Frequency.heavyHitters(rows.toDF("item", "x").repartition(1),
      Seq.empty, "item", capacity = 128, k = 100)
      .select("item", "cnt", "rank").collect().map(_.toSeq).toSeq
    val b = Frequency.heavyHitters(rows.toDF("item", "x").repartition(13),
      Seq.empty, "item", capacity = 128, k = 100)
      .select("item", "cnt", "rank").collect().map(_.toSeq).toSeq
    assert(a === b, "no decrement fires → layout cannot matter")
    assert(a.size === 100)
  }

  test("property: exact-regime summary is split-invariant (direct buffer merges)") {
    // Drive update/merge directly (no Spark job per case): for arbitrary
    // item streams with distinct <= capacity, ANY split into partial
    // buffers merged in ANY grouping must equal the exact counts —
    // the invariant the distributed exchange relies on.
    import org.scalacheck.{Gen, rng}
    val gen = for {
      n <- Gen.choose(1, 300)
      items <- Gen.listOfN(n, Gen.choose(0, 30).map(i => s"u$i")) // ≤31 distinct
      cuts <- Gen.choose(1, 6)
    } yield (items, cuts)
    (0 until 40).foreach { i =>
      val (items, cuts) = gen(Gen.Parameters.default, rng.Seed(7L + i)).get
      val agg = graft.functions.expr.MisraGries(
        org.apache.spark.sql.catalyst.expressions.BoundReference(0,
          org.apache.spark.sql.types.StringType, nullable = true), 64)
      val parts = items.grouped(math.max(1, items.size / cuts)).toSeq
      val merged = parts.map { chunk =>
        val buf = agg.createAggregationBuffer()
        chunk.foreach { s =>
          agg.update(buf, org.apache.spark.sql.catalyst.InternalRow(
            org.apache.spark.unsafe.types.UTF8String.fromString(s)))
        }
        buf
      }.reduce(agg.merge)
      val got = merged.map { case (k, v) => k.toString -> v }.toMap
      val expect = items.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      assert(got === expect, s"case $i: split into ${parts.size} buffers")
    }
  }

  test("over capacity: counts are lower bounds within N/(capacity+1), " +
    "heavy items always survive") {
    // zipf-ish skew: item i appears ~ 4000/i times, 200 distinct items,
    // capacity 50 — far over capacity
    val rows = (1 to 200).flatMap(i => Seq.fill(4000 / i)(s"i$i"))
    val n = rows.size.toLong
    val capacity = 50
    val bound = n / (capacity + 1L)

    val truth = rows.groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
    val mg = Frequency.heavyHitters(rows.toDF("item").withColumn("g", lit(1)),
      Seq("g"), "item", capacity = capacity, k = capacity)
      .select("item", "cnt").as[(String, Long)].collect().toMap

    mg.foreach { case (item, cnt) =>
      val t = truth(item)
      assert(cnt <= t, s"$item: reported $cnt must not exceed true $t")
      assert(t - cnt <= bound, s"$item: undercount ${t - cnt} beyond N/(c+1)=$bound")
    }
    truth.filter(_._2 > bound).keys.foreach { item =>
      assert(mg.contains(item), s"guaranteed-heavy item $item missing")
    }
  }

  test("streaming trending: the summary accumulates across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, String)]
    val agg = mem.toDF().toDF("etype", "user")
      .groupBy(col("etype"))
      .agg(Frequency.mgSummary(col("user"), 8).as("hh"))
      .select(col("etype"), expr("transform(hh, e -> struct(e.item, e.cnt))").as("hh"))

    // update-mode: capture the latest emitted summary per key
    val latest = scala.collection.mutable.Map.empty[String, Seq[(String, Long)]]
    val q = agg.writeStream.outputMode("update")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        df.collect().foreach { r =>
          latest(r.getString(0)) = r.getSeq[org.apache.spark.sql.Row](1)
            .map(e => (e.getString(0), e.getLong(1)))
        }
        ()
      }
      .start()
    try {
      mem.addData(("click", "u1"), ("click", "u1"), ("click", "u2"), ("view", "u9"))
      q.processAllAvailable()
      assert(latest("click") === Seq(("u1", 2L), ("u2", 1L)))
      mem.addData(("click", "u2"), ("click", "u2"), ("click", "u2"))
      q.processAllAvailable()
      assert(latest("click") === Seq(("u2", 4L), ("u1", 2L)),
        "batch-2 counts merge into batch-1 state, re-ranked")
      assert(latest("view") === Seq(("u9", 1L)), "untouched key keeps its state")
    } finally q.stop()
  }

  test("mg_summary is callable from SQL and arrives ranked") {
    val prev = TestSpark.spark
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    val s = graft.core.GraftSession.tune(
      org.apache.spark.sql.SparkSession.builder().master("local[2]")
        .withExtensions(new GraftExtensions),
      shufflePartitions = 2).getOrCreate()
    try {
      val out = s.sql(
        """SELECT mg_summary(x, 10) AS hh FROM VALUES
          |  ('a'),('b'),('a'),('c'),('a'),('b') AS t(x)""".stripMargin)
        .selectExpr("inline(hh)")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(out === Seq(("a", 3L), ("b", 2L), ("c", 1L)),
        "sorted cnt desc, item asc")
    } finally {
      org.apache.spark.sql.SparkSession.setDefaultSession(prev)
      org.apache.spark.sql.SparkSession.setActiveSession(prev)
    }
  }
}
