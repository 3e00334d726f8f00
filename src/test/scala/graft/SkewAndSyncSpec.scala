package graft

import org.apache.spark.sql.functions._
import graft.ops.SkewJoin
import graft.sink.{BatchIncremental, ColumnSpec, JdbcDeltaSink, TableSpec}

class SkewAndSyncSpec extends SparkTestBase {

  import spark.implicits._

  test("saltedJoin equals the plain join on skewed data") {
    // hot key: 5000 rows of k=1, tail of others
    val big = ((1 to 5000).map(i => (1L, i.toLong)) ++
      (1 to 50).map(i => (i.toLong + 1, i.toLong))).toDF("k", "v")
    val small = (1L to 60L).map(k => (k, s"dim$k")).toDF("k", "name")
    val plain = big.join(small, "k")
    val salted = SkewJoin.saltedJoin(big, small, Seq("k"), salts = 8)
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("saltedSum equals plain aggregation") {
    val df = ((1 to 5000).map(_ => ("hot", 1L)) ++
      (1 to 100).map(i => (s"k$i", i.toLong))).toDF("k", "v")
    val plain = df.groupBy("k").agg(sum("v").as("s")).as[(String, Long)]
      .collect().toMap
    val salted = SkewJoin.saltedSum(df, Seq("k"), "v", salts = 8, "s")
      .as[(String, Long)].collect().toMap
    assert(salted === plain)
  }

  test("BatchIncremental.sync applies only the diff (drain_deltas batch analog)") {
    val sink = new JdbcDeltaSink(
      "jdbc:derby:memory:batchsync;create=true",
      TableSpec("view_t", 1, Seq(
        ColumnSpec("k", "VARCHAR(32)"), ColumnSpec("n", "BIGINT"))))
    sink.bootstrap()

    val snap1 = Seq(("a", 1L), ("b", 2L)).toDF("k", "n")
    val applied1 = BatchIncremental.sync(spark, snap1, sink, Map("s" -> 1L), 0L)
    assert(applied1 === 2)
    assert(sink.readRows().map(r => (r(0), r(1))).toSet === Set(("a", 1L), ("b", 2L)))

    // next epoch: a updated (1→5), b unchanged, c new → 3 delta rows
    val snap2 = Seq(("a", 5L), ("b", 2L), ("c", 9L)).toDF("k", "n")
    val applied2 = BatchIncremental.sync(spark, snap2, sink, Map("s" -> 2L), 1L)
    assert(applied2 === 3, "only churn crosses: retract a@1, insert a@5, insert c@9")
    assert(sink.readRows().map(r => (r(0), r(1))).toSet
      === Set(("a", 5L), ("b", 2L), ("c", 9L)))
    assert(sink.getOffsets() === Map("s" -> 2L))

    // idempotent redelivery of the same epoch: skipped txn, and the
    // return pins the documented contract (0 — the streamed diff is
    // never consumed for a replayed batchId)
    val applied3 = BatchIncremental.sync(spark, snap2, sink, Map("s" -> 2L), 1L)
    assert(applied3 === 0L)
    assert(sink.readRows().size === 3)
  }

  test("foreachBatch writer tracks per-source offsets from _source/_offset columns") {
    val sink = new JdbcDeltaSink(
      "jdbc:derby:memory:offsets;create=true",
      TableSpec("offs_t", 1, Seq(
        ColumnSpec("k", "VARCHAR(32)"), ColumnSpec("n", "BIGINT"))))
    sink.bootstrap()
    val df = Seq(
      ("a", 1L, 1L, "srcA", 10L), ("b", 2L, 1L, "srcA", 12L),
      ("c", 3L, 1L, "srcB", 7L))
      .toDF("k", "n", "mult", "_source", "_offset")
    sink.foreachBatchWriter()(df, 0L)
    assert(sink.getOffsets() === Map("srcA" -> 12L, "srcB" -> 7L),
      "max offset per source, written in the same txn as the rows")
    assert(sink.readRows().size === 3)
  }
}
