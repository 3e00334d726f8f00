package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming overlap dedup over a SELF-MAINTAINING winnowed-fingerprint
  * store — the [[NearDupStream.selfMaintaining]] loop on winnowing
  * postings ([[graft.ops.Fingerprints]]). Where the MinHash loop offers
  * probabilistic recall, this one carries winnowing's DETECTION FLOOR:
  * any arriving doc sharing a token run ≥ w+k−1 with the corpus (or
  * with an earlier doc in its own batch) shares a stored fingerprint
  * and WILL be flagged. Per micro-batch:
  *
  *  1. the batch is winnowed once (postings persisted for all three
  *     consumers);
  *  2. cross pairs against the store: df-capped on STORED fingerprints
  *     (corpus boilerplate pruned before the join), the batch's own ids
  *     anti-joined off the corpus side so an at-least-once replay whose
  *     first attempt already appended cannot pair the batch with
  *     itself;
  *  3. within-batch pairs on the batch's own capped postings, the
  *     higher id of each pair cut (keep-lowest-id);
  *  4. survivors' postings fold into the store
  *     ([[graft.ops.Fingerprints.winnowStoreAppend]], marker-idempotent
  *     per batch id) so the NEXT batch dedups against corpus + all
  *     prior survivors;
  *  5. `onBatch(batchId, crossPairs, survivors)`.
  *
  * Both results are forced BEFORE the append so their plans read the
  * store's pre-batch file set. Per-batch cost tracks the batch: the
  * store is read (postings + one vocabulary-sized df histogram), never
  * re-tokenized. */
object FingerprintStream {

  def selfMaintaining(docs: DataFrame, path: String, minShared: Int,
                      dfCap: Int, k: Int = 3, w: Int = 4,
                      idCol: String = "doc_id", textCol: String = "text")
                     (onBatch: (Long, DataFrame, DataFrame) => Unit)
      : DataStreamWriter[Row] = {
    require(new java.io.File(path, "_SUCCESS").isFile,
      s"no fingerprint store at $path — seed it with winnowStored")
    docs.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val spark = batch.sparkSession
      val fps = graft.ops.Fingerprints
        .winnow(batch, k, w, idCol, textCol).persist()
      // cross + within-batch joins are the BATCH operators' own
      // definitions over the precomputed postings (one df-cap
      // discipline, no stream/batch divergence)
      val crossPairs = graft.ops.Fingerprints
        .crossPairsFromPostings(spark.read.parquet(path), fps,
          minShared, dfCap)
        .join(fps.select(col("id").as("corpus_id")).distinct(),
          Seq("corpus_id"), "left_anti")
        .persist()
      val innerCut = graft.ops.Fingerprints
        .pairsFromPostings(fps, minShared, dfCap)
        .select(col("id_b").as(idCol)).distinct()
      val dupOfStore = crossPairs.select(col("probe_id").as(idCol)).distinct()
      val survivors = batch
        .join(dupOfStore, Seq(idCol), "left_anti")
        .join(innerCut, Seq(idCol), "left_anti")
        .persist()
      crossPairs.count(); survivors.count()
      // survivors' postings are a filter of the ALREADY-persisted batch
      // postings (selection is deterministic) — append those instead of
      // re-tokenizing the surviving documents
      graft.ops.Fingerprints.postingsAppend(
        fps.join(survivors.select(col(idCol).as("id")), Seq("id"), "left_semi"),
        path, batchTag = s"batch_$batchId", spark)
      onBatch(batchId, crossPairs, survivors)
      fps.unpersist(); crossPairs.unpersist(); survivors.unpersist()
      ()
    }
  }
}
