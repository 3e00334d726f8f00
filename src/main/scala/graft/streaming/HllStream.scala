package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming twin of [[graft.ops.Hll.registerStoreAppend]] — a
  * continuously-maintained distinct-count sketch: each micro-batch folds
  * its values' HLL registers into the store, and
  * [[graft.ops.Hll.estimateFromStore]] answers "distinct so far" at any
  * moment without stopping the stream (the [[PcaStream]] additive-store
  * shape, with an even stronger convergence story).
  *
  * Exactly-once is TWO-LAYERED here and the second layer is free: the
  * `_appended_<tag>` marker makes a replayed batch no-op
  * ([[graft.ops.Stores.appendCommit]]), and even without it the
  * register algebra is IDEMPOTENT (union + per-bucket max — a
  * double-posted batch changes no register), so any crash interleaving
  * converges. Batch ids map to zero-padded tags (`batch_%09d`, the
  * [[SimHashStream.tagFor]] store contract).
  *
  * At 100 TB: per-batch work is one hash aggregation of the batch to
  * ≤ m rows per group; the store grows by ≤ m·|groups| rows per batch
  * independent of batch size, and reads merge by max — compact with
  * [[graft.ops.Stores.compact]] between batches like every append
  * store. */
object HllStream {

  def tagFor(batchId: Long): String = f"batch_$batchId%09d"

  /** Start-ready writer: register-sketch every micro-batch of `rows`
    * into the store at `path`, grouped by `groupCols`, sketching
    * `valueExpr`. `onBatch` (e.g. a probe/report step) runs after the
    * batch's append commits. */
  def selfMaintaining(rows: DataFrame, path: String, groupCols: Seq[String],
                      valueExpr: String, m: Int = 256)
                     (onBatch: Long => Unit = _ => ()): DataStreamWriter[Row] =
    rows.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      graft.ops.Hll.registerStoreAppend(
        batch, path, tagFor(batchId), groupCols, valueExpr, m)
      onBatch(batchId)
    }
}
