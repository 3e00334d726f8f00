package graft

import graft.ops.Sessionize
import graft.ops.Sessionize.{Started, Stopped, Interval}
import graft.flow.Flow

/** Reference machine-usage sequential-matcher semantics
  * (machine-usage/logic.rs:29-52). */
class SessionizeSpec extends SparkTestBase {

  test("basic start→stop pairing with duration") {
    val out = Sessionize.matchIntervals(Seq(
      Started("o1", 100L), Stopped("o1", 250L)))
    assert(out === List(Interval("o1", 100L, 150L)))
  }

  test("restart overwrites unmatched earlier start (BTreeMap insert semantics)") {
    val out = Sessionize.matchIntervals(Seq(
      Started("o1", 100L), Started("o1", 200L), Stopped("o1", 300L)))
    assert(out === List(Interval("o1", 200L, 100L))) // later start wins
  }

  test("unmatched stop is dropped; interleaved orders match independently") {
    val out = Sessionize.matchIntervals(Seq(
      Stopped("oX", 50L), // no open start: ignored
      Started("o1", 100L), Started("o2", 110L),
      Stopped("o2", 200L), Stopped("o1", 400L)))
    assert(out.toSet === Set(
      Interval("o2", 110L, 90L), Interval("o1", 100L, 300L)))
  }

  test("stop matched at most once (reference removes the entry)") {
    val out = Sessionize.matchIntervals(Seq(
      Started("o1", 100L), Stopped("o1", 200L), Stopped("o1", 300L)))
    assert(out === List(Interval("o1", 100L, 100L)))
  }

  test("distributed: reduceSorted group closure reproduces the matcher per key") {
    import spark.implicits._
    // (machine, lamport, kind, order, at)
    val events = Seq(
      ("m1", 1L, "start", "a", 100L), ("m1", 2L, "stop", "a", 180L),
      ("m1", 3L, "start", "b", 200L), ("m2", 1L, "start", "a", 50L),
      ("m2", 2L, "stop", "a", 90L), ("m1", 4L, "stop", "b", 260L))
    val out = Flow(spark.createDataset(events))
      .groupBy(_._1)
      .reduceSorted[(String, String, Long, Long)] { (machine, vs) =>
        Sessionize.matchIntervals(vs.map {
          case (_, _, "start", o, at) => Started(o, at)
          case (_, _, _, o, at) => Stopped(o, at)
        }).map(iv => (machine, iv.order, iv.startedAt, iv.durationMicros))
      }(implicitly, Ordering.by(_._2)) // lamport order (causal contract)
      .ds.collect().toSet
    assert(out === Set(
      ("m1", "a", 100L, 80L), ("m1", "b", 200L, 60L), ("m2", "a", 50L, 40L)))
  }
}
