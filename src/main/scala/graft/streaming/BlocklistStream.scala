package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming blocklist screen against the MAINTAINED policy store
  * ([[graft.ops.Blocklist.termStoreAppend]]/`termStoreRetract`): each
  * micro-batch is screened with the term list AS OF that batch, so a
  * policy edit (new unsafe term, appeal removal) takes effect on the
  * next batch with no pipeline restart — the
  * [[DqStream.OrphanStoreCheck]] stream-static contract applied to the
  * policy side. Batches already screened are NOT re-judged (the
  * additive report contract; re-screening history is a batch job over
  * the archive, not a stream's). Stateless: the corpus side carries no
  * watermark state; per-batch cost is the batch's token stream against
  * a list-sized broadcast. */
object BlocklistStream {

  def attach(docs: DataFrame, termsPath: String,
             idCol: String = "doc_id", textCol: String = "text")
            (onBatch: (Long, DataFrame) => Unit): DataStreamWriter[Row] =
    docs.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      onBatch(batchId,
        graft.ops.Blocklist.screenFromStore(batch, termsPath, idCol, textCol))
    }
}
