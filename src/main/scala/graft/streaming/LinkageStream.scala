package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Continuous record linkage: match a STREAM of incoming dirty records
  * against a STATIC master table — the stream-static form of
  * [[graft.ops.Linkage.blockedBestMatch]] (the DecontamStream shape:
  * every new record is resolved the moment it arrives).
  *
  * STATELESS by construction: candidates come only from the static
  * side, so a probe's full candidate set is present within its arrival
  * micro-batch — append mode, no watermark, no state store. The
  * blocked equi-join keys the shuffle on the block columns; the length
  * prune runs before the O(len²) edit distance exactly as in the batch
  * op. At 100 TB-master scale the master side is the thing you keep
  * current (a maintained table, bucketed by the block key so the
  * per-batch probe join co-locates); each micro-batch's cost is
  * Σ_block |batch probes_b| × |master_b| — the batch's arrival volume,
  * never the stream's lifetime.
  */
object LinkageStream {

  /** (probe_id, master_id, dist) candidate matches within maxDist,
    * emitted in the probe's arrival batch. A probe's verdict (its
    * best match = min (dist, master_id)) is complete at emission —
    * reduce downstream as the deployment needs (the delta sink's
    * consolidation, an update-mode min, or a batch GROUP BY over the
    * landed table); the batch-op reduction is
    * [[graft.ops.Linkage.blockedBestMatch]]'s window, which a
    * stream-side global window cannot express statelessly. */
  def candidates(probeStream: DataFrame, master: DataFrame,
                 blockCols: Seq[String],
                 probeIdCol: String, probeNameCol: String,
                 masterIdCol: String, masterNameCol: String,
                 maxDist: Int): DataFrame = {
    val p = probeStream.select(
      (blockCols.map(col) :+ col(probeIdCol).as("probe_id")
        :+ col(probeNameCol).as("probe_name")): _*)
    val m = master.select(
      (blockCols.map(col) :+ col(masterIdCol).as("master_id")
        :+ col(masterNameCol).as("master_name")): _*)
    p.join(m, blockCols)
      .filter(abs(length(col("probe_name")) - length(col("master_name")))
        <= maxDist)
      .withColumn("dist",
        levenshtein(col("probe_name"), col("master_name")).cast("long"))
      .filter(col("dist") <= maxDist)
      .select(col("probe_id"), col("master_id"), col("dist"))
  }
}
