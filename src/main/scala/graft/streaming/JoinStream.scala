package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** STREAM-STREAM interval join — the attribution shape ("purchase
  * within H of the signup", "click within H of the impression") where
  * BOTH sides arrive continuously, completing the engine's join ladder:
  * batch keyed joins ([[graft.flow.GroupedFlow]]), as-of/range joins
  * ([[graft.plans.AsOfJoin]]), stream-static probes
  * ([[DecontamStream]], [[LinkageStream]]) — and now the both-sides-live
  * case those cannot express without re-scanning one side per batch.
  *
  * Semantics are Spark's watermarked stream-stream join: each side is
  * buffered in keyed state until the OTHER side's watermark proves no
  * partner can still arrive. The event-time range condition
  * (`rightTs` in `[leftTs, leftTs + horizon]`) is what makes the state
  * BOUNDED — with it, a left row is provably unmatchable once the right
  * watermark passes `leftTs + horizon` and is evicted; without it the
  * state would grow with stream lifetime, which is exactly the
  * unbounded-state trap the [[NearDupStream.pairsWindowed]] horizon
  * exists to avoid. Total state ≈ one horizon + one watermark delay of
  * arrival volume per side, independent of how long the job has run —
  * the 1000-executor contract: state is keyed by the join key, so it
  * shards with the shuffle, and the RocksDB provider (StateStoreSpec)
  * spills it off-heap.
  *
  * Left-outer emits the unmatched left row (null right columns) only
  * after that same provable-unmatchable point — late, but correct; a
  * row arriving after its side's watermark is dropped, the standard
  * late-data contract every windowed op in this engine shares.
  */
object JoinStream {

  /** Join two event-time streams on key equality within a time horizon.
    *
    * Column names must be disjoint between the two sides (the result
    * carries both sides' columns; Spark cannot disambiguate duplicate
    * names across stream-stream state). The sides are aliased `l`/`r`.
    *
    * @param horizon   SQL interval literal body, e.g. "10 minutes":
    *                  right rows match left rows with
    *                  `rightTs ∈ [leftTs, leftTs + horizon]`
    * @param watermark max event-time lateness tolerated on each side,
    *                  e.g. "5 minutes" — also how long eviction waits
    *                  beyond the horizon
    * @param joinType  "inner" or "left_outer"
    */
  def intervalJoin(left: DataFrame, right: DataFrame,
                   leftKey: String, rightKey: String,
                   leftTs: String, rightTs: String,
                   horizon: String, watermark: String,
                   joinType: String = "inner"): DataFrame = {
    require(Seq("inner", "left_outer").contains(joinType),
      s"joinType must be inner or left_outer, got $joinType")
    val dup = left.columns.toSet intersect right.columns.toSet
    require(dup.isEmpty,
      s"left/right column names must be disjoint, both have: $dup")
    val l = left.withWatermark(leftTs, watermark).as("l")
    val r = right.withWatermark(rightTs, watermark).as("r")
    l.join(r,
      expr(s"l.$leftKey = r.$rightKey" +
        s" AND r.$rightTs >= l.$leftTs" +
        s" AND r.$rightTs <= l.$leftTs + INTERVAL $horizon"),
      joinType)
  }
}
