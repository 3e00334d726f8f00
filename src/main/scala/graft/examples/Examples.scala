package graft.examples

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.flow.Flow
import graft.ops.Sessionize

/** The event envelope as a typed record (reference Event<T> fields in
  * use — FIXTURES.md §1) with the MachineEvent payload decoded
  * (machine-dashboard/model.rs:9-12: Started{order} / Stopped{order}). */
final case class MachineEvent(
    source: String, streamName: String, lamport: Long, timestampMicros: Long,
    started: Boolean, order: String)

/** dashboard row (machine-dashboard/model.rs:29-45). */
final case class DashboardEntry(
    machine: String, status: String, manufacturingOrder: Option[String],
    sinceMicros: Long)

/** usage row (machine-usage/model.rs:21-33). */
final case class UsageEntry(
    machine: String, manufacturingOrder: String, startedMicros: Long,
    durationMicros: Long)

/** finished-goods input + output (finished-goods-1/model.rs:6-13, 22-34). */
final case class FinishedGoods(
    articleId: String, articleName: String, workstation: String,
    orderId: String, pcs: Long)
final case class ProductionSummary(
    articleId: String, articleName: String, workstation: String, totalPcs: Long)

/** The reference's three shipped example queries, re-expressed over the
  * typed Flow facade — a user of the reference can port each `logic.rs`
  * line-for-line against this surface.
  */
object Examples {

  /** machine-dashboard (machine-dashboard/logic.rs:6-30): filter Drill
    * machines → map to entry → per-machine argmax by (since, lamport).
    * Compiles to one hash aggregation (partial argmax per key). */
  def dashboard(events: Dataset[MachineEvent])(
      implicit s: SparkSession): Dataset[DashboardEntry] = {
    import s.implicits._
    Flow(events)
      .filter(_.streamName.startsWith("Drill"))                    // P1
      .map { e =>                                                  // P3
        (DashboardEntry(
          machine = e.streamName,
          status = if (e.started) "working" else "idle",
          manufacturingOrder = if (e.started) Some(e.order) else None,
          sinceMicros = e.timestampMicros), e.lamport)
      }
      .groupBy(_._1.machine)                                       // G1
      .maxBy { case (entry, lamport) => (entry.sinceMicros, lamport) }( // G7
        implicitly, Ordering.by(_._2), implicitly)
      .map(_._2._1)                                                // G10 ungroup
      .ds
  }

  /** machine-usage (machine-usage/logic.rs:15-57): per-machine lamport-
    * ordered interval matching (Started→Stopped pairs). */
  def usage(events: Dataset[MachineEvent])(
      implicit s: SparkSession): Dataset[UsageEntry] = {
    import s.implicits._
    Flow(events)
      .filter(_.streamName.startsWith("Drill"))
      .map(e => (e.streamName, e.lamport, e.started, e.order, e.timestampMicros))
      .groupBy(_._1)
      .reduceSorted[UsageEntry] { (machine, evs) =>                // G3: lamport-sorted group
        Sessionize.matchIntervals(evs.map {
          case (_, _, true, order, at)  => Sessionize.Started(order, at)
          case (_, _, false, order, at) => Sessionize.Stopped(order, at)
        }).map(iv => UsageEntry(machine, iv.order, iv.startedAt, iv.durationMicros))
      }(implicitly, Ordering.by(_._2))
      .ds
  }

  /** finished-goods (finished-goods-1/logic.rs:13-53): group by
    * (articleId, workstation), first articleName + Σ pcs. */
  def productionSummary(goods: Dataset[FinishedGoods])(
      implicit s: SparkSession): Dataset[ProductionSummary] = {
    import s.implicits._
    import org.apache.spark.sql.functions._
    // aggregate path (not reduceSorted): sum/first are decomposable —
    // partial aggregation beats materializing groups
    goods.groupBy(col("articleId"), col("workstation"))
      .agg(first(col("articleName")).as("articleName"),
        sum(col("pcs")).as("totalPcs"))
      .select(col("articleId"), col("articleName"), col("workstation"),
        col("totalPcs"))
      .as[ProductionSummary]
  }
}
