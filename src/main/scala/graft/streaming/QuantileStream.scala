package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming twin of [[graft.ops.Quantiles.storeAppend]] — a
  * continuously-maintained length/latency/score distribution: each
  * micro-batch's fixed-bucket histogram folds into the additive store,
  * and [[graft.ops.Quantiles.fromStore]] +
  * [[graft.ops.Quantiles.quantiles]] answer p50/p90/p99-so-far at any
  * moment — the distribution-drift monitor a 100 TB ingest runs per
  * arriving shard ([[HllStream]] counts distincts, [[CmsStream]] counts
  * items, this one watches the shape).
  *
  * Exactly-once: additive merge, so the `_appended_<tag>` marker is
  * load-bearing exactly as in [[CmsStream]]; zero-padded batch tags
  * per the [[SimHashStream.tagFor]] store contract. Per-batch work is
  * one histogram aggregation; the store grows ≤ range/width rows per
  * batch. */
object QuantileStream {

  def tagFor(batchId: Long): String = f"batch_$batchId%09d"

  def selfMaintaining(rows: DataFrame, path: String, valueExpr: String,
                      bucketWidth: Long)
                     (onBatch: Long => Unit = _ => ()): DataStreamWriter[Row] =
    rows.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      graft.ops.Quantiles.storeAppend(batch, path, tagFor(batchId),
        valueExpr, bucketWidth)
      onBatch(batchId)
    }

  /** GROUPED twin ([[graft.ops.Quantiles.storeAppendBy]]): one
    * histogram per (group, batch) — the per-source length monitor, and
    * the state behind the STREAMING robust-outlier gate: each batch can
    * be flagged against fences learned from everything before it
    * ([[graft.ops.Quantiles.tukeyOutliersFromStore]] inside `onBatch`,
    * reading the store BEFORE this batch folds in — or after, for
    * fences that include it; both are one call, the caller picks the
    * semantics). */
  def selfMaintainingBy(rows: DataFrame, path: String,
                        groupCols: Seq[String], valueExpr: String,
                        bucketWidth: Long)
                       (onBatch: (DataFrame, Long) => Unit = (_, _) => ())
                       : DataStreamWriter[Row] =
    rows.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      graft.ops.Quantiles.storeAppendBy(batch, path, tagFor(batchId),
        groupCols, valueExpr, bucketWidth)
      onBatch(batch, batchId)
    }
}
