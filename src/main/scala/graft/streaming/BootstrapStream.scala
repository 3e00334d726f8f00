package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming twin of [[graft.ops.Stats.poissonBootstrap]] — a
  * continuously-maintained uncertainty estimate: each micro-batch's
  * per-replicate totals fold into the additive store
  * ([[graft.ops.Stats.bootstrapStoreAppend]]), and the readout after
  * any batch is BIT-IDENTICAL to the one-shot bootstrap over
  * everything that has arrived (replicate totals are sums of
  * per-(id, replicate)-deterministic terms, so they add across
  * disjoint batches — the additivity the spec pins). The "how sure
  * are we about the corpus mean so far" gauge next to [[HllStream]]'s
  * cardinality and [[QuantileStream]]'s shape.
  *
  * Exactly-once: sums are not idempotent, so the `_appended_<tag>`
  * marker is load-bearing exactly as in [[CmsStream]]. Per-batch
  * state: R rows per batch in the store; the readout aggregates an
  * R·batches-row relation — model-sized forever. */
object BootstrapStream {

  def tagFor(batchId: Long): String = f"batch_$batchId%09d"

  /** @param onBatch optional per-batch readout callback — when None
    *                (a pure store maintainer), the readout Spark job
    *                is SKIPPED entirely, not run and discarded */
  def selfMaintaining(rows: DataFrame, path: String, idExpr: String,
                      valueExpr: String, replicates: Int, salt: String)
                     (onBatch: Option[(Long, Row) => Unit] = None)
                     : DataStreamWriter[Row] =
    rows.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val spark = batch.sparkSession
      graft.ops.Stats.bootstrapStoreAppend(batch, path, tagFor(batchId),
        idExpr, valueExpr, replicates, salt)
      onBatch.foreach(f => f(batchId,
        graft.ops.Stats.bootstrapFromStore(spark, path).collect().head))
    }
}
