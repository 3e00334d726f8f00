package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming twin of [[graft.ops.Abtest.readout]] — the LIVE
  * experiment dashboard: each micro-batch's per-arm unit counts,
  * conversions, and moment sums fold into the additive experiment
  * store ([[graft.ops.Abtest.momentsStoreAppend]]), and the readout
  * after any batch is BIT-IDENTICAL to the one-shot readout over
  * every unit that has arrived (the additivity the spec pins). The
  * experimenter watches rates/lift/z converge without any pipeline
  * ever rescanning unit history; [[graft.ops.Abtest.cupedFromStore]]
  * reads the variance-reduced lift from the same store.
  *
  * The stream inherits the store's CONTRACT: micro-batches must
  * partition the randomization units (shard the ingest by unit hash —
  * the natural layout when the source is the assignment log), because
  * per-unit conversion and squared moments only add across batches
  * when no unit spans two.
  *
  * Exactly-once: sums are not idempotent, so the `_appended_<tag>`
  * marker is load-bearing exactly as in [[BootstrapStream]]. Per-batch
  * state: ≤ 2 rows per batch in the store — model-sized forever. */
object AbStream {

  def tagFor(batchId: Long): String = f"batch_$batchId%09d"

  /** @param onBatch optional per-batch readout callback — when None
    *                (a pure store maintainer), the readout Spark job
    *                is SKIPPED entirely, not run and discarded */
  def selfMaintaining(rows: DataFrame, path: String, unitExpr: String,
                      convExpr: String, yExpr: String, xExpr: String,
                      salt: String)
                     (onBatch: Option[(Long, Row) => Unit] = None)
                     : DataStreamWriter[Row] =
    rows.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val spark = batch.sparkSession
      graft.ops.Abtest.momentsStoreAppend(batch, path, tagFor(batchId),
        unitExpr, convExpr, yExpr, xExpr, salt)
      onBatch.foreach(f => f(batchId,
        graft.ops.Abtest.readoutFromStore(spark, path).collect().head))
    }

  /** Streaming twin of the QTE store
    * ([[graft.ops.Abtest.quantileLiftStoreAppend]]) — the live
    * heavy-tail dashboard: each micro-batch's per-arm metric histogram
    * folds into the additive store, and
    * [[graft.ops.Abtest.quantileLiftFromStore]] after any batch equals
    * the one-shot QTE over every unit that has arrived. Same
    * unit-partitioning contract and marker discipline as
    * [[selfMaintaining]]; per-batch state: (arm × bucket) rows. */
  def selfMaintainingQte(rows: DataFrame, path: String, unitExpr: String,
                         yExpr: String, salt: String, bucketWidth: Long)
                        (onBatch: Option[(Long, Long) => Unit] = None)
                        : DataStreamWriter[Row] =
    rows.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val spark = batch.sparkSession
      graft.ops.Abtest.quantileLiftStoreAppend(batch, path, tagFor(batchId),
        unitExpr, yExpr, salt, bucketWidth)
      onBatch.foreach(f => f(batchId,
        graft.ops.Stores.freshRead(spark, path).count()))
    }
}
