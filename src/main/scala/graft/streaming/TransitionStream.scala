package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of q_transitions: per-user Markov transition events
  * maintained incrementally. State per user is O(1) FOREVER — the
  * (ts, event id, type) of the last event seen — so a year-long stream
  * holds three values per user, and each arriving event emits exactly
  * one (from, to) transition row against that state. Downstream, the
  * transition matrix is a plain streaming aggregation over the emitted
  * pairs (states²-sized), or a batch count over the sink.
  *
  * Ordering contract: transitions are defined by each user's event
  * ORDER, so the stream expects per-user in-order delivery across
  * micro-batches (the [[FunnelStream]] contract); within a batch
  * events are sorted by (ts, event id) before folding, so any
  * within-batch arrival order is fine. The contract is ENFORCED, not
  * assumed: the state keeps the last event's (ts, event id), and a
  * cross-batch late event (at-or-before the stored position) is
  * DROPPED instead of emitting a wrong-order transition — the same
  * drop-late discipline a watermark would impose. */
object TransitionStream {

  case class Transition(user_id: Long, from_type: String, to_type: String,
                        ts_us: Long)

  def transitions(events: DataFrame, idCol: String = "user_id",
                  tsCol: String = "ts_us", typeCol: String = "event_type",
                  eidCol: String = "event_id"): Dataset[Transition] = {
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events
      .select(col(idCol).cast("long").as("uid"),
        col(tsCol).cast("long").as("ts"),
        col(typeCol).cast("string").as("tp"),
        col(eidCol).cast("long").as("eid"))
      .as[(Long, Long, String, Long)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, String), Transition](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, it: Iterator[(Long, Long, String, Long)],
         state: GroupState[(Long, Long, String)]) =>
          var last = state.getOption.orNull
          val out = scala.collection.mutable.ListBuffer.empty[Transition]
          it.toSeq.sortBy(e => (e._2, e._4)).foreach { case (_, ts, tp, eid) =>
            // enforce the in-order contract: a late arrival (at-or-
            // before the stored last position) cannot define a forward
            // transition — drop it rather than emit a wrong-order pair
            if (last == null || ts > last._1 || (ts == last._1 && eid > last._2)) {
              if (last != null) out += Transition(uid, last._3, tp, ts)
              last = (ts, eid, tp)
            }
          }
          if (last != null) state.update(last)
          out.iterator
      }
  }
}
