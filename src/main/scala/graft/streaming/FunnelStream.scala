package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming ordered-FUNNEL progress — the incremental profile of the
  * batch funnel (q_funnel_steps): per user, maintain the earliest
  * strictly-ordered completion time of each step and EMIT a row the
  * moment a user advances a stage. State per user is one long per step
  * (the completion-time vector) — bounded by the funnel's length, not
  * the user's event volume, so total state is users × steps longs.
  *
  * Ordering contract: events are applied in (ts, event id) order WITHIN
  * each micro-batch (the group iterator is sorted before folding), and
  * batches arrive in source order — the same processing-order semantics
  * as the reference's lamport-ordered pipelines (SURVEY §7.4).
  * Completion times FREEZE once set: a cross-batch late event that
  * would have produced an earlier completion is ignored, so the state
  * always equals exactly what was emitted and the advance stream stays
  * internally consistent (stage N's time is always strictly after the
  * emitted stage N−1 time — silently improving state would let a later
  * emission mix improved and already-emitted times, e.g. a stage-2
  * advance timestamped before the published stage-1 advance). */
object FunnelStream {

  case class StageAdvance(user_id: Long, stage: Int, step: String, t_us: Long)

  def stageProgress(events: DataFrame, steps: Seq[String],
                    idCol: String = "user_id", typeCol: String = "event_type",
                    tsCol: String = "ts_us",
                    eidCol: String = "event_id"): Dataset[StageAdvance] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val spark = events.sparkSession
    import spark.implicits._
    val stepIdx = steps.zipWithIndex.toMap
    val typed = events
      .select(col(idCol).cast("long").as("uid"), col(typeCol).as("et"),
        col(tsCol).cast("long").as("ts"),
        col(eidCol).cast("long").as("eid"))
      .as[(Long, String, Long, Long)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[Array[Long], StageAdvance](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, it: Iterator[(Long, String, Long, Long)],
         state: GroupState[Array[Long]]) =>
          val UNSET = Long.MaxValue
          val times = state.getOption.getOrElse(Array.fill(steps.length)(UNSET))
          val out = scala.collection.mutable.ListBuffer.empty[StageAdvance]
          // apply in (ts, event_id) order so within-batch disorder
          // cannot mask a strictly-after chain
          it.toSeq.sortBy(e => (e._3, e._4)).foreach { case (_, et, ts, _) =>
            stepIdx.get(et).foreach { i =>
              val prevOk = i == 0 || (times(i - 1) != UNSET && ts > times(i - 1))
              // frozen-once-set: only an UNSET stage advances (see the
              // consistency note above)
              if (prevOk && times(i) == UNSET) {
                times(i) = ts
                out += StageAdvance(uid, i + 1, steps(i), ts)
              }
            }
          }
          state.update(times)
          out.iterator
      }
  }
}
