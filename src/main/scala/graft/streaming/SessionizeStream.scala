package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import scala.collection.mutable.ListBuffer

/** A machine's start/stop event (reference machine-usage/model.rs:8-11:
  * `Started{order}` / `Stopped{order}` with lamport + timestamp). */
final case class SessionEvent(machine: String, lamport: Long, started: Boolean,
                              order: String, atMicros: Long)

/** A completed usage interval (reference machine-usage/model.rs:21-33). */
final case class UsageRow(machine: String, order: String, startedMicros: Long,
                          durationMicros: Long)

/** Incremental interval matching — the machine-usage example
  * (machine-usage/logic.rs:15-57) as a stateful streaming operator:
  * per-machine state is the open-starts map (order → started-at), exactly
  * the reference's `BTreeMap` carried across epochs; completed intervals
  * append as they close.
  *
  * Ordering contract: within a micro-batch events sort by lamport before
  * the matcher runs; across batches the source must deliver in lamport
  * order per machine (true of the reference's event service, and of a
  * Kafka-per-key or file source in arrival order). State is
  * O(open intervals per machine) — constant for well-formed machines.
  */
object SessionizeStream {

  def usageStream(ds: Dataset[SessionEvent]): Dataset[UsageRow] = {
    implicit val stateEnc = Encoders.kryo[Map[String, Long]]
    implicit val outEnc = Encoders.product[UsageRow]
    implicit val keyEnc = Encoders.STRING
    ds.groupByKey(_.machine)
      .flatMapGroupsWithState[Map[String, Long], UsageRow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (machine: String, evs: Iterator[SessionEvent],
         state: GroupState[Map[String, Long]]) =>
          var open = state.getOption.getOrElse(Map.empty[String, Long])
          val out = ListBuffer.empty[UsageRow]
          evs.toSeq.sortBy(_.lamport).foreach { e =>
            if (e.started) open += e.order -> e.atMicros // overwrite = last unmatched start wins
            else open.get(e.order).foreach { st =>
              out += UsageRow(machine, e.order, st, e.atMicros - st)
              open -= e.order
            }
          }
          if (open.isEmpty) state.remove() else state.update(open)
          out.iterator
      }
  }
}
