package graft

import graft.examples._

/** End-to-end parity tests for the reference's three example queries
  * against hand-computed outputs (SURVEY §5 adopted strategy, item 2). */
class ExamplesSpec extends SparkTestBase {

  implicit lazy val s = spark

  private def ev(machine: String, lamport: Long, started: Boolean,
                 order: String, at: Long) =
    MachineEvent("src1", machine, lamport, at, started, order)

  private val fixture = Seq(
    ev("Drill1", 1, started = true, "4711", 1000L),
    ev("Drill1", 2, started = false, "4711", 5000L),
    ev("Drill1", 3, started = true, "4712", 9000L),
    ev("Drill2", 4, started = true, "4713", 2000L),
    ev("Lathe1", 5, started = true, "9999", 100L), // filtered: not a Drill
  )

  test("dashboard: current status per machine, argmax by (since, lamport)") {
    import spark.implicits._
    val out = Examples.dashboard(spark.createDataset(fixture)).collect().toSet
    assert(out === Set(
      DashboardEntry("Drill1", "working", Some("4712"), 9000L),
      DashboardEntry("Drill2", "working", Some("4713"), 2000L)))
  }

  test("dashboard: stop event replaces the row with idle + NULL order") {
    import spark.implicits._
    val withStop = fixture :+ ev("Drill2", 6, started = false, "4713", 7000L)
    val out = Examples.dashboard(spark.createDataset(withStop)).collect().toSet
    assert(out.contains(DashboardEntry("Drill2", "idle", None, 7000L)))
  }

  test("usage: completed Started→Stopped pairs in lamport order") {
    import spark.implicits._
    val out = Examples.usage(spark.createDataset(fixture)).collect().toSet
    // only Drill1/4711 completed (4712 and 4713 still open)
    assert(out === Set(UsageEntry("Drill1", "4711", 1000L, 4000L)))
  }

  test("usage semantics survive the hot-key streaming reduce (G3 scale path)") {
    import spark.implicits._
    import graft.ops.Sessionize
    // a larger randomized stream: 6 machines × 80 events, lamports
    // shuffled so arrival order ≠ causal order (the reference's whole
    // reason for sorted groups)
    val rnd = new scala.util.Random(13)
    val events = (1 to 6).flatMap { m =>
      rnd.shuffle((1 to 80).toList).zipWithIndex.map { case (lam, i) =>
        ev(s"Drill$m", lam, started = i % 2 == 0, s"o${lam / 3}", lam * 1000L)
      }
    }
    val ds = spark.createDataset(rnd.shuffle(events))
    val expected = Examples.usage(ds).collect().toSet

    val streamed = graft.flow.Flow(ds)
      .filter(_.streamName.startsWith("Drill"))
      .map(e => (e.streamName, e.lamport, e.started, e.order, e.timestampMicros))
      // tuple ordering = (machine, lamport, …); machine is constant
      // within a group, so the engine sort IS lamport order
      .reduceSortedStreaming(_._1) { (machine, it) =>
        Sessionize.matchIntervals(it.map {
          case (_, _, true, order, at)  => Sessionize.Started(order, at)
          case (_, _, false, order, at) => Sessionize.Stopped(order, at)
        }.to(Iterable)).map(iv =>
          UsageEntry(machine, iv.order, iv.startedAt, iv.durationMicros))
      }
      .ds.collect().toSet
    assert(streamed === expected,
      "engine-sorted streaming groups reproduce the reference example exactly")
  }

  test("production summary: first name + total pcs per (article, workstation)") {
    import spark.implicits._
    val goods = Seq(
      FinishedGoods("A1", "widget", "W1", "o1", 5L),
      FinishedGoods("A1", "widget", "W1", "o2", 3L),
      FinishedGoods("A1", "widget", "W2", "o3", 2L),
      FinishedGoods("A2", "gadget", "W1", "o4", 7L))
    val out = Examples.productionSummary(spark.createDataset(goods)).collect().toSet
    assert(out === Set(
      ProductionSummary("A1", "widget", "W1", 8L),
      ProductionSummary("A1", "widget", "W2", 2L),
      ProductionSummary("A2", "gadget", "W1", 7L)))
  }
}
