package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Continuous decontamination: screen a STREAM of incoming eval/probe
  * documents against a STATIC training-corpus gram set — the
  * stream-static form of [[graft.ops.Dedup.crossNgramContaminated]]
  * (reference profile: the engine's continuously-maintained views,
  * applied to benchmark hygiene — every new eval candidate is checked
  * the moment it arrives).
  *
  * The join is STATELESS (stream-static inner equi-join: each
  * micro-batch probes the static side, nothing is buffered across
  * batches), so the query runs in append mode with no watermark and no
  * state store — the cheapest possible streaming operator. The static
  * side is the [[graft.ops.Dedup.corpusGramSet]] artifact: materialize
  * it once to parquet and point every screen at it; at 100 TB the gram
  * set is the thing you keep current, not recompute per query.
  */
object DecontamStream {

  /** (probe_id, g) — one row per contaminated gram per streaming probe
    * doc, emitted within the micro-batch the doc arrives in. A doc's
    * grams arrive whole with it, so its verdict (hits > 0, or the
    * hit-fraction against its own gram count) is complete at emission;
    * aggregate downstream as the deployment needs — the delta sink's
    * consolidation, a per-doc count in update mode, or a plain batch
    * GROUP BY over the landed table. */
  def contaminatedGrams(probeStream: DataFrame, corpusGrams: DataFrame,
                        n: Int = 13, idCol: String = "doc_id",
                        textCol: String = "text"): DataFrame =
    graft.ops.Dedup.ngramHashes(probeStream, n, idCol, textCol)
      .join(corpusGrams, Seq("g"))
      .select(col("id").as("probe_id"), col("g"))
}
