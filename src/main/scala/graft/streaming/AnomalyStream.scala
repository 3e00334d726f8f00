package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of q_rolling_z: per-user expanding-baseline z-score
  * anomalies with `(n, Σv, Σv²)` as the ENTIRE per-user state — three
  * numbers regardless of stream lifetime. Because the batch query's
  * cumulative frame is a sequential left-to-right accumulation, this
  * fold applies events in the same (ts, event id) order and therefore
  * computes the BIT-IDENTICAL mean/variance chain: on in-order input
  * the emitted anomaly SET equals the batch query's (same events, z
  * values agreeing to the batch's 6-decimal rounding — the stream
  * emits raw z; AnomalyStreamSpec pins it). Score-then-fold per
  * event: the current event is judged against strictly-earlier
  * history only. */
object AnomalyStream {

  case class Anomaly(event_id: Long, user_id: Long, ts_us: Long, z: Double)

  def anomalies(events: DataFrame, minN: Int = 8, zThresh: Double = 3.0,
                idCol: String = "user_id", tsCol: String = "ts_us",
                valCol: String = "value", eidCol: String = "event_id")
      : Dataset[Anomaly] = {
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events
      // skip-null = the batch semantics (count(value)/sum(value) ignore
      // nulls, so a null event never advances the baseline there either)
      .filter(col(valCol).isNotNull)
      .select(col(idCol).cast("long").as("uid"),
        col(tsCol).cast("long").as("ts"),
        col(valCol).cast("double").as("v"),
        col(eidCol).cast("long").as("eid"))
      .as[(Long, Long, Double, Long)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Double, Double), Anomaly](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, it: Iterator[(Long, Long, Double, Long)],
         state: GroupState[(Long, Double, Double)]) =>
          var (n, s, s2) = state.getOption.getOrElse((0L, 0.0, 0.0))
          val out = scala.collection.mutable.ListBuffer.empty[Anomaly]
          it.toSeq.sortBy(e => (e._2, e._4)).foreach { case (_, ts, v, eid) =>
            if (n >= minN) {
              // the exact expression chain of the batch query (mean
              // computed once, reused) so z matches bit-for-bit
              val mean = s / n
              val vr = s2 / n - mean * mean
              if (vr > 1e-12) {
                val z = (v - mean) / math.sqrt(vr)
                if (math.abs(z) > zThresh) out += Anomaly(eid, uid, ts, z)
              }
            }
            n += 1; s += v; s2 += v * v
          }
          state.update((n, s, s2))
          out.iterator
      }
  }
}
