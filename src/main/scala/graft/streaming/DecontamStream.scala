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

  /** [[contaminatedGrams]] with the [[graft.ops.BloomScreen]] pre-screen:
    * when the static gram set is past the broadcast threshold, the
    * stream-static join shuffles EVERY probe gram EVERY micro-batch.
    * The sketch (built once from the same static set, alongside the
    * parquet artifact) screens stream grams map-only inside the batch,
    * so only true hits plus the fpp sliver reach the join — per-batch
    * cost tracks the batch's contamination, not its size. Exact confirm
    * against the same static side keeps verdicts sketch-free; still
    * stateless, still append-mode. */
  def contaminatedGramsScreened(probeStream: DataFrame,
                                corpusGrams: DataFrame,
                                bloomBits: Array[Byte], n: Int = 13,
                                idCol: String = "doc_id",
                                textCol: String = "text"): DataFrame =
    graft.ops.Dedup.ngramHashes(probeStream, n, idCol, textCol)
      .filter(graft.ops.BloomScreen.mightContain(bloomBits, col("g")))
      .join(corpusGrams, Seq("g"))
      .select(col("id").as("probe_id"), col("g"))
}
