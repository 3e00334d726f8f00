package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of q_ohlc: per-(user, day) open/high/low/close
  * maintained incrementally. State per key is O(1) — two (ts, event id)
  * selection keys with their values plus high/low/count — and every
  * update is an order-free min/max SELECTION, so the result is
  * independent of arrival order and batch splits: any interleaving of
  * the same events converges to the batch aggregate's exact doubles
  * (no arithmetic on values, nothing to drift — OhlcStreamSpec pins
  * equality against the batch expressions under shuffled delivery).
  * Update-mode emission: each touched (user, day) re-emits its current
  * candle per micro-batch; the latest row per key is the live candle. */
object OhlcStream {

  case class Ohlc(user_id: Long, day: Long, open: Double, high: Double,
                  low: Double, close: Double, n_events: Long)

  /** (ts, event id) keys make open/close deterministic under ties —
    * the same struct-ordering the batch min_by/max_by uses. */
  case class St(oTs: Long, oId: Long, o: Double, hi: Double, lo: Double,
                cTs: Long, cId: Long, c: Double, n: Long)

  def ohlc(events: DataFrame, dayUs: Long = 86400000000L,
           idCol: String = "user_id", tsCol: String = "ts_us",
           valCol: String = "value", eidCol: String = "event_id")
      : Dataset[Ohlc] = {
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events
      .select(col(idCol).cast("long").as("uid"),
        col(tsCol).cast("long").as("ts"),
        col(valCol).cast("double").as("v"),
        col(eidCol).cast("long").as("eid"))
      .as[(Long, Long, Double, Long)]
    typed.groupByKey(e => (e._1, e._2 / dayUs))
      .flatMapGroupsWithState[St, Ohlc](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: (Long, Long), it: Iterator[(Long, Long, Double, Long)],
         state: GroupState[St]) =>
          var st = state.getOption.orNull
          it.foreach { case (_, ts, v, eid) =>
            st =
              if (st == null) St(ts, eid, v, v, v, ts, eid, v, 1L)
              else {
                // one predicate per selection, shared by the key AND
                // value fields — the "all three come from the winning
                // event" invariant the batch min_by(struct) gives
                val isOpen = ts < st.oTs || (ts == st.oTs && eid < st.oId)
                val isClose = ts > st.cTs || (ts == st.cTs && eid > st.cId)
                St(
                  if (isOpen) ts else st.oTs,
                  if (isOpen) eid else st.oId,
                  if (isOpen) v else st.o,
                  math.max(st.hi, v), math.min(st.lo, v),
                  if (isClose) ts else st.cTs,
                  if (isClose) eid else st.cId,
                  if (isClose) v else st.c,
                  st.n + 1L)
              }
          }
          state.update(st)
          Iterator.single(Ohlc(key._1, key._2, st.o, st.hi, st.lo, st.c, st.n))
      }
  }
}
