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
      val stored = spark.read.parquet(path)
      val rare = stored.groupBy(col("fp"))
        .agg(count(lit(1)).as("df")).filter(col("df") <= dfCap).select("fp")
      val crossPairs = stored.join(rare, "fp")
        .select(col("fp"), col("id").as("corpus_id"))
        .join(fps.select(col("fp"), col("id").as("probe_id")), "fp")
        .groupBy(col("corpus_id"), col("probe_id"))
        .agg(count(lit(1)).as("n_shared"))
        .filter(col("n_shared") >= minShared)
        .join(fps.select(col("id").as("corpus_id")).distinct(),
          Seq("corpus_id"), "left_anti")
        .persist()
      // within-batch: the winnowPairs discipline on the batch's own
      // postings (df ≥ 2 to witness, ≤ cap against degenerate batches)
      val innerRare = fps.groupBy(col("fp"))
        .agg(count(lit(1)).as("bdf"))
        .filter(col("bdf") >= 2 && col("bdf") <= dfCap).select("fp")
      val posted = fps.join(innerRare, "fp")
      val innerCut = posted.as("a")
        .join(posted.as("b"),
          col("a.fp") === col("b.fp") && col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
        .groupBy(col("id_a"), col("id_b"))
        .agg(count(lit(1)).as("n"))
        .filter(col("n") >= minShared)
        .select(col("id_b").as(idCol)).distinct()
      val dupOfStore = crossPairs.select(col("probe_id").as(idCol)).distinct()
      val survivors = batch
        .join(dupOfStore, Seq(idCol), "left_anti")
        .join(innerCut, Seq(idCol), "left_anti")
        .persist()
      crossPairs.count(); survivors.count()
      graft.ops.Fingerprints.winnowStoreAppend(survivors, path,
        batchTag = s"batch_$batchId", k, w, idCol, textCol)
      onBatch(batchId, crossPairs, survivors)
      fps.unpersist(); crossPairs.unpersist(); survivors.unpersist()
      ()
    }
  }
}
