package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming maintenance of the PCA moments store — the streaming twin
  * of the batch append lifecycle ([[graft.ops.Pca.momentsStored]], the
  * q_pca_incremental shape): every micro-batch folds its OWN
  * (n, Σx, Σxxᵀ) row into the store inside `foreachBatch`, tagged by
  * batch id, so
  *
  *  - per-batch cost is one scan of the batch (map-side-combined
  *    moments, one d²-sized row appended) — historical data is never
  *    re-read;
  *  - the model refits from the store at ANY point
  *    ([[graft.ops.Pca.fitFromStore]]) without stopping the stream;
  *  - a replayed batch (foreachBatch is at-least-once) hits its
  *    `_appended_batch_<id>` marker and appends nothing — the store is
  *    exactly-once by construction, the same contract as
  *    [[NearDupStream.selfMaintaining]].
  *
  * Covariance drift monitoring falls out for free: refit per epoch and
  * compare spectra (the corpus-drift lifecycle on the embedding side).
  */
object PcaStream {

  def selfMaintaining(vecs: DataFrame, vecCol: String, dim: Int,
                      path: String): DataStreamWriter[Row] =
    vecs.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      graft.ops.Pca.momentsStored(batch.sparkSession, batch, vecCol, dim,
        path, batchTag = s"batch_$batchId")
    }
}
