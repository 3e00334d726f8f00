package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming twin of [[graft.ops.Decay.storeAppend]] — a continuously
  * maintained freshness profile: each micro-batch's per-(group,
  * half-life period) counts fold into the additive store, and
  * [[graft.ops.Decay.decayedFromStore]] answers "recency-weighted
  * volume as of NOW" at any moment with any asOf — the signal a
  * mix-weight/eviction policy reads per arriving shard. Because store
  * rows key on ABSOLUTE periods, decay is applied only at read time:
  * the store never needs rewriting as time advances (the property that
  * separates this from stored pre-decayed scores, which stale the
  * moment they land).
  *
  * Exactly-once: additive merge, so the `_appended_<tag>` marker is
  * load-bearing exactly as in [[QuantileStream]]/[[CmsStream]];
  * zero-padded batch tags per the [[SimHashStream.tagFor]] contract.
  * Per-batch work is one count aggregation; the store grows ≤
  * |groups|·|periods touched| rows per batch. */
object DecayStream {

  def tagFor(batchId: Long): String = f"batch_$batchId%09d"

  def selfMaintaining(rows: DataFrame, path: String, groupCols: Seq[String],
                      tsUsCol: String, halfLifeUs: Long)
                     (onBatch: Long => Unit = _ => ()): DataStreamWriter[Row] =
    rows.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      graft.ops.Decay.storeAppend(batch, path, tagFor(batchId),
        groupCols, tsUsCol, halfLifeUs)
      onBatch(batchId)
    }
}
