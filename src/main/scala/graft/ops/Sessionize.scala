package graft.ops

import scala.collection.mutable

/** Interval matching — the reference's machine-usage reduction
  * (machine-usage/logic.rs:29-52): walk a key's events in causal
  * (lamport) order keeping an open-starts map; `Started(order)` inserts
  * (overwriting an unmatched earlier start for the same order),
  * `Stopped(order)` emits a completed interval if a start is open.
  *
  * This is the group-closure body for `GroupedFlow.reduceSorted` /
  * `flatMapGroups` — one group at a time, state O(open intervals).
  */
object Sessionize {

  sealed trait Ev[O] { def order: O; def at: Long }
  final case class Started[O](order: O, at: Long) extends Ev[O]
  final case class Stopped[O](order: O, at: Long) extends Ev[O]

  final case class Interval[O](order: O, startedAt: Long, durationMicros: Long)

  /** Sequential matcher over causally-ordered events of one key. */
  def matchIntervals[O](events: Iterable[Ev[O]]): List[Interval[O]] = {
    val open = mutable.Map.empty[O, Long]
    val out = mutable.ListBuffer.empty[Interval[O]]
    events.foreach {
      case Started(o, at) => open(o) = at // overwrite = last unmatched start wins
      case Stopped(o, at) => open.remove(o).foreach { startedAt =>
        out += Interval(o, startedAt, at - startedAt)
      }
    }
    out.toList
  }
}
