package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming twin of [[graft.ops.Cms.storeAppend]] — a continuously-
  * maintained point-frequency sketch: each micro-batch's cell counts
  * fold into the additive store, and [[graft.ops.Cms.fromStore]] +
  * [[graft.ops.Cms.probe]] answer "how often has X appeared so far"
  * at any moment — the frequency complement of [[HllStream]]'s
  * distinct counter, and the long-horizon memory behind the
  * [[graft.functions.expr.MisraGries]] per-window top-k.
  *
  * Exactly-once: SUM-merge is additive but NOT idempotent, so unlike
  * the HLL twin the `_appended_<tag>` marker is load-bearing — a
  * redelivered batch (at-least-once delivery) must no-op on it or
  * every touched cell double-counts. Batch ids map to the zero-padded
  * [[SimHashStream.tagFor]] tags.
  *
  * At 100 TB: per-batch work is one batch-vocabulary aggregation plus
  * a map-side d-way cell explode; the store grows ≤ d·w rows per batch
  * and compacts like every append store. */
object CmsStream {

  def tagFor(batchId: Long): String = f"batch_$batchId%09d"

  def selfMaintaining(rows: DataFrame, path: String, valueExpr: String,
                      depth: Int = 4, width: Int = 1024)
                     (onBatch: Long => Unit = _ => ()): DataStreamWriter[Row] =
    rows.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      graft.ops.Cms.storeAppend(batch, path, tagFor(batchId), valueExpr,
        depth, width)
      onBatch(batchId)
    }
}
