package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A signed-multiplicity change record — the engine's output unit
  * (reference flow.rs:137-145: deltas `(record, +n | -n)`). */
final case class Delta[T](record: T, mult: Long)

/** The reference's monotonic stateful operators (reference flow.rs:286-361):
  * streaming argmax / first-seen-representative that keep **one row of
  * state per key** instead of retaining the whole group — its only
  * hand-written optimization, and the exact shape Spark's
  * `flatMapGroupsWithState` is built for (state store per key, update
  * output mode, emit retraction+insertion deltas on change).
  *
  * Both panic in the reference when the current max / representative is
  * retracted (append-only contract, flow.rs:306-310, 343-348); here the
  * same violation throws `IllegalStateException` — retractions are
  * modeled as `Delta(v, -1)` inputs.
  *
  * Scale: state is O(distinct keys) and accessed via the state store
  * (RocksDB-backed on a real cluster); input partitioning is by key, so
  * 1000 executors shard the keyspace with no coordination.
  */
object Monotonic {

  /** M1 `monotonic_max_by` (reference flow.rs:291-321): per key `keyOf(v)`,
    * keep only the current maximum record; when a new max arrives emit
    * `(old, -1), (new, +1)`; duplicates of the current max adjust
    * multiplicity bookkeeping only.
    */
  def maxByUpdates[T, K](
      changes: Iterator[Delta[T]],
      state: Option[T],
      keep: (T, T) => Boolean // keep(incumbent, candidate) = incumbent stays
  ): (Option[T], List[Delta[T]]) = {
    var cur = state
    val out = scala.collection.mutable.ListBuffer.empty[Delta[T]]
    changes.foreach { case Delta(v, m) =>
      if (m < 0) {
        if (cur.contains(v))
          throw new IllegalStateException(
            s"monotonic_max_by: removal of current maximum $v (append-only contract, reference flow.rs:306-310)")
        // removal of a non-max record: no-op, it was never emitted
      } else if (m > 0) {
        cur match {
          case None => cur = Some(v); out += Delta(v, 1L)
          case Some(c) if keep(c, v) => () // incumbent stays
          case Some(c) => cur = Some(v); out += Delta(c, -1L) += Delta(v, 1L)
        }
      }
    }
    (cur, out.toList)
  }

  /** M2 `monotonic_representative_by` (reference flow.rs:330-361): per key,
    * the first-seen record is the representative and is emitted once. The
    * count tracks copies of the REPRESENTATIVE only (flow.rs:341-349);
    * other records in the key — additions and retractions alike — are
    * ignored without touching state (flow.rs:350-352). Dropping the rep
    * count to zero panics in the reference (`assert(*mult != 0)`,
    * flow.rs:344-348) → throws here; a once-emitted representative is
    * never retracted.
    */
  def representativeUpdates[T](
      changes: Iterator[Delta[T]],
      state: Option[(T, Long)] // (representative, count of rep copies only)
  ): (Option[(T, Long)], List[Delta[T]]) = {
    var cur = state
    val out = scala.collection.mutable.ListBuffer.empty[Delta[T]]
    changes.foreach { case Delta(v, m) =>
      cur match {
        case None =>
          // Reference inserts mult=1 on first sight regardless of the
          // delta's multiplicity (flow.rs:339-341) — one retraction must
          // already trip the removal assert, so do NOT store m here.
          if (m > 0) { cur = Some((v, 1L)); out += Delta(v, 1L) }
          else throw new IllegalStateException(
            s"monotonic_representative_by: removal from empty key state ($v)")
        case Some((rep, n)) if v == rep =>
          val n2 = n + m
          if (n2 <= 0)
            throw new IllegalStateException(
              s"monotonic_representative_by: cannot remove representative $rep from collection (reference flow.rs:343-348)")
          cur = Some((rep, n2))
        case Some(_) => () // non-representative record: ignored (flow.rs:350-352)
      }
    }
    (cur, out.toList)
  }

  /** Streaming M1 over a keyed stream of deltas. `ord` orders records; the
    * larger record (by `ord`) wins the key. */
  def maxByStream[T, K](ds: Dataset[Delta[T]], keyOf: T => K)(
      implicit ordT: Ordering[T], ke: Encoder[K], te: Encoder[T],
      oe: Encoder[Delta[T]]): Dataset[Delta[T]] =
    ds.groupByKey(d => keyOf(d.record))
      .flatMapGroupsWithState[T, Delta[T]](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (_: K, it: Iterator[Delta[T]], gs: GroupState[T]) =>
          val (next, out) = maxByUpdates[T, K](
            it, gs.getOption, (inc, cand) => ordT.gteq(inc, cand))
          next match {
            case Some(v) => gs.update(v)
            case None    => gs.remove()
          }
          out.iterator
      }

  /** Streaming M2: first-seen representative per key. */
  def representativeStream[T, K](ds: Dataset[Delta[T]], keyOf: T => K)(
      implicit ke: Encoder[K], se: Encoder[(T, Long)],
      oe: Encoder[Delta[T]]): Dataset[Delta[T]] =
    ds.groupByKey(d => keyOf(d.record))
      .flatMapGroupsWithState[(T, Long), Delta[T]](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (_: K, it: Iterator[Delta[T]], gs: GroupState[(T, Long)]) =>
          val (next, out) = representativeUpdates[T](it, gs.getOption)
          next match {
            case Some(s) => gs.update(s)
            case None    => gs.remove()
          }
          out.iterator
      }
}
