package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming twin of [[graft.ops.Profile.fdStoreAppend]] — a
  * continuously-maintained functional-dependency confidence: each
  * micro-batch's (determinant, dependent) pair counts fold into the
  * additive store, and [[graft.ops.Profile.fdFromStore]] answers "does
  * det → dep still hold, at what violation cost" at any moment — the
  * DQ DRIFT monitor over the discovery-side profile (a dependency that
  * held at 0.99 and erodes batch over batch is a schema-change or
  * upstream-bug signal long before a hard check fires).
  *
  * Exactly-once: additive merge, marker-guarded per zero-padded batch
  * tag (the [[CmsStream]] contract). Per-batch work is one pair-count
  * aggregation bounded by the batch's value-combination cardinality.
  */
object FdStream {

  def tagFor(batchId: Long): String = f"batch_$batchId%09d"

  def selfMaintaining(rows: DataFrame, path: String, det: String,
                      dep: String)
                     (onBatch: Long => Unit = _ => ()): DataStreamWriter[Row] =
    rows.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      graft.ops.Profile.fdStoreAppend(batch, path, tagFor(batchId), det, dep)
      onBatch(batchId)
    }
}
