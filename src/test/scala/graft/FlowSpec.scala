package graft

import graft.flow.Flow

/** Operator-surface semantics of the typed Flow/GroupedFlow facade
  * (SURVEY.md §2.2-2.5 operator contracts). */
class FlowSpec extends SparkTestBase {

  private def flowOf[T: org.apache.spark.sql.Encoder](xs: T*): Flow[T] =
    Flow(spark.createDataset(xs))

  import spark.implicits._

  test("P1/P3/P6: filter, map, flatMap") {
    val f = flowOf(1, 2, 3, 4, 5)
    assert(f.filter(_ % 2 == 1).ds.collect().sorted === Array(1, 3, 5))
    assert(f.map(_ * 10).ds.collect().sorted === Array(10, 20, 30, 40, 50))
    assert(f.flatMap(x => Seq.fill(x)(x)).ds.count() === 15)
  }

  test("G3 reduceSortedStreaming ≡ reduceSorted; groups stream in order") {
    val rnd = new scala.util.Random(5)
    val rows = Seq.fill(3000)((rnd.nextInt(7), rnd.nextInt(100000)))
    val f = flowOf(rows: _*)

    // same contract as reduceSorted: full group, ascending order
    val viaVector = f.groupBy(_._1)
      .reduceSorted((k, vs) => Seq(k -> vs.map(_._2).mkString(",")))
      .ds.collect().toMap
    val viaStream = f
      .reduceSortedStreaming(_._1)((k, it) =>
        Seq(k -> it.map(_._2).mkString(",")))
      .ds.collect().toMap
    assert(viaStream === viaVector,
      "engine-sorted streaming groups must equal the in-memory sort")

    // the group is an ITERATOR: an early-terminating consumer (first
    // element = per-key min) must not need the whole group, and the
    // remainder must be drained so the next key is intact
    val firsts = f.reduceSortedStreaming(_._1)((k, it) => Seq(k -> it.next()._2))
      .ds.collect().toMap
    val mins = rows.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).min }
    assert(firsts === mins, "head of the sorted stream is the per-key min")
  }

  test("P8 observe: named metrics ride the action (no extra job)") {
    import org.apache.spark.sql.functions._
    val collected = new java.util.concurrent.atomic.AtomicReference[Map[String, Any]](Map.empty)
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit = {
        qe.observedMetrics.get("flow_stats").foreach { row =>
          collected.set(row.getValuesMap(Seq("n", "max_v")))
        }
      }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, ex: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val out = flowOf(1, 5, 2, 9, 3)
        .observe("flow_stats", count(lit(1)).as("n"), max(col("value")).as("max_v"))
        .filter(_ > 2)
        .ds.collect()
      assert(out.sorted === Array(3, 5, 9))
      // listener delivery is asynchronous
      val deadline = System.nanoTime() + 10e9.toLong
      while (collected.get.isEmpty && System.nanoTime() < deadline) Thread.sleep(50)
      assert(collected.get === Map("n" -> 5L, "max_v" -> 9),
        "metrics observe the PRE-filter flow on the same pass")
    } finally spark.listenerManager.unregister(listener)
  }

  test("U1/U2: concat is bag union (keeps duplicates)") {
    val a = flowOf(1, 2); val b = flowOf(2, 3)
    assert(a.concat(b).ds.collect().sorted === Array(1, 2, 2, 3))
    assert(Flow.concatMany(Seq(a, b, a)).ds.count() === 6)
  }

  test("A1: distinct forces multiplicity 1") {
    assert(flowOf(1, 1, 2, 2, 2, 3).distinct().ds.collect().sorted === Array(1, 2, 3))
  }

  test("G1/G4/G5/G6: groupBy count/min/max") {
    val f = flowOf(1, 2, 3, 4, 5, 6, 7) // key = x % 2
    val g = f.groupBy(_ % 2)
    assert(g.count().ds.collect().toMap === Map(0 -> 3L, 1 -> 4L))
    assert(f.groupBy(_ % 2).min().ds.collect().toMap === Map(0 -> 2, 1 -> 1))
    assert(f.groupBy(_ % 2).max().ds.collect().toMap === Map(0 -> 6, 1 -> 7))
  }

  test("G7: maxBy keeps the whole record maximizing f (reference argmax)") {
    val f = flowOf(("a", 1), ("a", 9), ("a", 5), ("b", 3))
    val top = f.groupBy(_._1).maxBy(_._2).ds.collect().toMap
    assert(top === Map("a" -> ("a", 9), "b" -> ("b", 3)))
  }

  test("G3: reduceSorted presents the group in ascending order (sorted-arrangement contract)") {
    // the reference's sorted-group guarantee (flow.rs:522-528): emit the
    // values in the order the closure saw them — must be sorted
    val f = flowOf((1, 30), (1, 10), (1, 20), (2, 5))
    val seen = f.groupBy(_._1)
      .reduceSorted[(Int, String)] { (k, vs) =>
        Iterator.single((k, vs.map(_._2).mkString("-")))
      }(implicitly, Ordering.by(_._2))
      .ds.collect().toMap
    assert(seen === Map(1 -> "10-20-30", 2 -> "5"))
  }

  test("G9/G10/G11/G13: distinct-per-key, ungroup, regroup") {
    val f = flowOf((1, "x"), (1, "x"), (1, "y"), (2, "x"))
    val g = f.groupBy(_._1)
    assert(g.distinct().ds.count() === 3)
    assert(g.ungroup().ds.count() === 4)
    assert(g.ungroupWith((k, v) => s"$k${v._2}").ds.collect().sorted
      === Array("1x", "1x", "1y", "2x"))
    val re = g.regroup((k, v) => (v._2, k)).count().ds.collect().toMap
    assert(re === Map("x" -> 3L, "y" -> 1L))
  }

  test("J1/J2: keyed equi-join emits f(k, v1, v2) per pair") {
    val a = flowOf((1, "a1"), (1, "a2"), (2, "b")).groupBy(_._1)
    val b = flowOf((1, "x"), (3, "z")).groupBy(_._1)
    val out = a.joinSingle(b)((k, l, r) => (k, l._2, r._2)).ds.collect().toSet
    assert(out === Set((1, "a1", "x"), (1, "a2", "x")))
    // multi-output join closure (J1 doubles as per-pair flatten)
    val multi = a.join(b)((k, l, r) => Seq((k, l._2), (k, r._2))).ds.count()
    assert(multi === 4)
  }

  test("P2/P4 statefulSequential: cross-record mutable state in pinned order") {
    import spark.implicits._
    // running maximum with retraction-style dedup: needs cross-record
    // state with NO key — the reference's filter_mut shape
    val f = flowOf(3, 1, 4, 1, 5, 2)
    val out = f.statefulSequential(Ordering[Int]) { it =>
      var best = Int.MinValue
      it.flatMap { x => if (x > best) { best = x; Some(x) } else None }
    }.ds.collect().toSeq
    assert(out === Seq(1, 2, 3, 4, 5), "ascending-order traversal emits each new max")
    val desc = f.statefulSequential(Ordering[Int].reverse) { it =>
      var best = Int.MinValue
      it.flatMap { x => if (x > best) { best = x; Some(x) } else None }
    }.ds.collect().toSeq
    assert(desc === Seq(5), "descending-order traversal emits only the global max")
  }
}
