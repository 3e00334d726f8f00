package graft

import graft.streaming.{Delta, Monotonic}

/** Exact golden fixtures from the reference's monotonic-operator tests
  * (flow.rs:616-640, FIXTURES.md §4): i32 inputs, key = x % 5, batch →
  * consolidated delta assertions. */
class MonotonicSpec extends SparkTestBase {

  /** Batch-feed harness mirroring machine.rs:183-189 `assert`: feed a
    * batch through per-key state, consolidate emitted deltas. */
  private class MaxHarness {
    private var state = Map.empty[Int, Int]
    def feed(xs: Seq[Int]): Seq[(Int, Long)] = {
      val out = scala.collection.mutable.ListBuffer.empty[Delta[Int]]
      xs.groupBy(_ % 5).foreach { case (k, vs) =>
        val (next, deltas) = Monotonic.maxByUpdates[Int, Int](
          vs.map(Delta(_, 1L)).iterator, state.get(k),
          (inc, cand) => inc >= cand)
        next.foreach(v => state += k -> v)
        out ++= deltas
      }
      consolidate(out.toSeq)
    }
  }

  private class RepHarness {
    private var state = Map.empty[Int, (Int, Long)]
    def feed(xs: Seq[Int]): Seq[(Int, Long)] = {
      val out = scala.collection.mutable.ListBuffer.empty[Delta[Int]]
      xs.groupBy(_ % 5).foreach { case (k, vs) =>
        val (next, deltas) = Monotonic.representativeUpdates[Int](
          vs.map(Delta(_, 1L)).iterator, state.get(k))
        next match {
          case Some(s) => state += k -> s
          case None => state -= k
        }
        out ++= deltas
      }
      consolidate(out.toSeq)
    }
  }

  private def consolidate(ds: Seq[Delta[Int]]): Seq[(Int, Long)] =
    ds.groupBy(_.record).view.mapValues(_.map(_.mult).sum)
      .filter(_._2 != 0).toSeq.sorted

  test("monotonic_max_by golden sequence (flow.rs:616-628)") {
    val h = new MaxHarness
    assert(h.feed(Seq(1)) === Seq(1 -> 1L))
    assert(h.feed(Seq(1)) === Seq.empty) // duplicate of current max: no delta
    assert(h.feed(Seq(11, 2)) === Seq(1 -> -1L, 2 -> 1L, 11 -> 1L))
    assert(h.feed(Seq(6, 7)) === Seq(2 -> -1L, 7 -> 1L)) // 6 < 11 same key: no-op
  }

  test("monotonic_representative_by golden sequence (flow.rs:630-640)") {
    val h = new RepHarness
    assert(h.feed(Seq(1)) === Seq(1 -> 1L))
    assert(h.feed(Seq(1)) === Seq.empty)
    assert(h.feed(Seq(11, 2)) === Seq(2 -> 1L)) // 11 joins key 1: rep stays 1
    assert(h.feed(Seq(6, 7)) === Seq.empty)     // both keys already represented
  }

  test("max removal panics (append-only contract, flow.rs:306-310)") {
    intercept[IllegalStateException] {
      Monotonic.maxByUpdates[Int, Int](
        Iterator(Delta(5, 1L), Delta(5, -1L)), None, (a, b) => a >= b)
    }
  }

  test("representative removal panics (flow.rs:343-348)") {
    intercept[IllegalStateException] {
      Monotonic.representativeUpdates[Int](
        Iterator(Delta(5, 1L), Delta(7, 1L), Delta(5, -1L)), None)
    }
    // removing even the LAST rep copy panics too — the reference asserts
    // mult != 0; a representative, once emitted, is never retracted
    intercept[IllegalStateException] {
      Monotonic.representativeUpdates[Int](
        Iterator(Delta(5, 1L), Delta(5, -1L)), None)
    }
    // non-representative retraction is ignored without state change
    // (flow.rs:350-352: prev != data → no output, no mult update)
    val (st, out) = Monotonic.representativeUpdates[Int](
      Iterator(Delta(5, 1L), Delta(7, 1L), Delta(7, -1L)), None)
    assert(st === Some((5, 1L)) && out === List(Delta(5, 1L)))
    // first-seen delta with m>1 stores count 1, not m (flow.rs:339-341):
    // a single retraction of the representative already panics
    val (st2, _) = Monotonic.representativeUpdates[Int](
      Iterator(Delta(5, 3L)), None)
    assert(st2 === Some((5, 1L)))
    intercept[IllegalStateException] {
      Monotonic.representativeUpdates[Int](
        Iterator(Delta(5, 3L), Delta(5, -1L)), None)
    }
  }

  test("streaming M1 over MemoryStream emits retraction+insertion per new max") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Delta[Int]]
    val out = Monotonic.maxByStream[Int, Int](mem.toDS(), _ % 5)
    val q = out.writeStream.outputMode("update").format("memory")
      .queryName("m1_test").start()
    try {
      mem.addData(Delta(1, 1L)); q.processAllAvailable()
      mem.addData(Delta(11, 1L), Delta(2, 1L)); q.processAllAvailable()
      val rows = spark.sql("SELECT record, mult FROM m1_test")
        .as[(Int, Long)].collect().toSeq
      // batch 1: +1 ; batch 2: -1 +11 +2
      assert(consolidate(rows.map { case (r, m) => Delta(r, m) })
        === Seq(2 -> 1L, 11 -> 1L)) // net state: 1 retracted
      assert(rows.contains((1, -1L)), "retraction of old max must be emitted")
    } finally q.stop()
  }
}

/** Streaming M2 (representativeStream) through MemoryStream. */
class MonotonicStreamSpec extends SparkTestBase {
  test("streaming M2 keeps first-seen representative; non-rep records are invisible") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    import graft.streaming.{Delta, Monotonic}
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Delta[Int]]
    val out = Monotonic.representativeStream[Int, Int](mem.toDS(), _ % 5)
    val q = out.writeStream.outputMode("update").format("memory")
      .queryName("m2_stream").start()
    try {
      mem.addData(Delta(1, 1L), Delta(11, 1L)); q.processAllAvailable() // same key 1
      mem.addData(Delta(11, -1L), Delta(1, 1L)); q.processAllAvailable() // non-rep retract + rep copy
      val rows = spark.sql("SELECT record, mult FROM m2_stream")
        .as[(Int, Long)].collect().toList
      assert(rows === List((1, 1L)),
        "first-seen rep emitted exactly once; 11's add/retract invisible")
    } finally q.stop()
  }

  test("simhashGroups finds identical-signature duplicate groups") {
    import spark.implicits._
    val docs = Seq((1L, "same text here"), (2L, "same text here"),
      (3L, "different content")).toDF("doc_id", "text")
    val g = graft.ops.Dedup.simhashGroups(docs).as[(Long, Long, Long)].collect()
    assert(g.toList === List((g.head._1, 1L, 2L)), "one group: keep doc 1, 2 members")
  }
}
