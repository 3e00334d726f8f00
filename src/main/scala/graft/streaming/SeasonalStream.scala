package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming twin of [[graft.ops.Trend.seasonalStoreAppend]] — a
  * continuously-maintained seasonal profile: each micro-batch's
  * per-(group, cycle-position) count/sum folds into the additive store,
  * and [[graft.ops.Trend.seasonalFromStore]] answers "when does this
  * metric run hot, and by how much" at any moment. The seasonality
  * monitor for arriving event shards: a peak that MOVES between batches
  * (weekday traffic showing up on weekends) is an upstream-clock or
  * routing bug surfaced by shape, not by volume.
  *
  * Exactly-once: additive merge, marker-guarded per zero-padded batch
  * tag (the [[CmsStream]]/[[FdStream]] contract). Per-batch work is one
  * aggregation bounded by |groups|·period rows.
  */
object SeasonalStream {

  def tagFor(batchId: Long): String = f"batch_$batchId%09d"

  def selfMaintaining(rows: DataFrame, path: String, groupCols: Seq[String],
                      xExpr: String, yExpr: String, period: Int)
                     (onBatch: Long => Unit = _ => ()): DataStreamWriter[Row] =
    rows.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      graft.ops.Trend.seasonalStoreAppend(batch, path, tagFor(batchId),
        groupCols, xExpr, yExpr, period)
      onBatch(batchId)
    }
}
