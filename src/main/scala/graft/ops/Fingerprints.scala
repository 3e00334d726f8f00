package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Text

/** Local document fingerprinting and content-defined segmentation —
  * the two classic robust-to-edit primitives a corpus pipeline layers
  * under plagiarism-style overlap detection and chunk-level dedup:
  *
  *   - winnowing (Schleimer, Wilkerson, Aiken, SIGMOD 2003): select the
  *     minimum k-gram hash of every sliding window of w consecutive
  *     k-grams. The selected set is ~1/w the size of the full shingle
  *     set yet GUARANTEES that any shared token run of length
  *     ≥ w + k − 1 contributes at least one shared fingerprint — the
  *     sparsification that makes postings-list overlap joins w× cheaper
  *     with a detection floor instead of a probabilistic recall.
  *   - content-defined chunking (Rabin-style CDC, as in LBFS/storage
  *     dedup): close a chunk after token j whenever the k-gram ending
  *     at j hashes to 0 mod `divisor`. Boundaries depend only on local
  *     content, so inserting or deleting a token reshapes chunks ONLY
  *     around the edit — every other chunk hash is unchanged, which is
  *     what makes chunk-level exact dedup robust to edits (fixed-width
  *     chunking shifts every later boundary).
  *
  * Both are single codegen'd per-row projections off one tokenize pass —
  * no shuffle until the caller joins/aggregates the (id, fingerprint)
  * postings, and those joins inherit the df-cap discipline of the
  * n-gram family ([[Dedup.ngramJaccard]]). At 100 TB: fingerprints are
  * a few longs per doc (winnow) or one long per ~divisor tokens (CDC) —
  * kilobytes of signature per megabyte of text crossing the exchange.
  */
object Fingerprints {

  /** Sliding-window minimum over an array ATTRIBUTE: position i of the
    * result is min(arr[i..i+w−1]); positions without a full window are
    * dropped (empty array when size(arr) < w). Built like
    * [[Text.shinglesFromTokens]] — w−1 zip_with passes over shifted
    * slices, so every argument array is evaluated once per ROW and the
    * lambda touches only bound variables. The null marker keeps Spark's
    * null-skipping `least` from silently shrinking the trailing
    * windows instead of dropping them. */
  def slidingMin(arr: Column, w: Int): Column = {
    require(w >= 1, s"window must be >= 1, got $w")
    val mins = (1 until w).foldLeft(arr) { (acc, j) =>
      zip_with(acc, slice(arr, lit(j + 1), greatest(size(arr) - j, lit(0))),
        (a, b) => when(b.isNull, lit(null)).otherwise(least(a, b)))
    }
    if (w == 1) mins else filter(mins, _.isNotNull)
  }

  private val WINNOW_SEED = 11
  private val CDC_SEED = 13
  private val CHUNK_SEED = 17

  /** Per-doc winnowed fingerprint postings: (id, fp) rows, fp = a
    * selected k-gram hash. Docs shorter than w + k − 1 tokens emit no
    * rows (no full window exists). */
  def winnow(docs: DataFrame, k: Int, w: Int, idCol: String = "doc_id",
             textCol: String = "text"): DataFrame =
    docs
      .select(col(idCol).as("id"), Text.tokens(col(textCol)).as("toks"))
      .select(col("id"),
        transform(Text.shinglesFromTokens(col("toks"), k),
          g => Text.hash64(g, WINNOW_SEED)).as("sh"))
      .select(col("id"),
        explode(array_distinct(slidingMin(col("sh"), w))).as("fp"))

  /** Overlap pairs from winnowed fingerprints: docs sharing at least
    * `minShared` selected fingerprints, by postings-list self-join.
    * Corpus-universal fingerprints (boilerplate) are pruned by the df
    * cap BEFORE the join — a fingerprint shared by the whole corpus
    * would otherwise contribute df² candidate pairs; df=1 fingerprints
    * are dropped too (they cannot witness a pair). The per-key join
    * fan-out is therefore ≤ dfCap², the same plan-time bound as the
    * n-gram postings family. */
  def winnowPairs(docs: DataFrame, k: Int, w: Int, minShared: Int,
                  dfCap: Int, idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame = {
    // the postings feed BOTH the df histogram and the join sides —
    // persisted so the tokenize→winnow pass runs once, not 3×. Cache
    // lifetime is CALLER-owned (spark.catalog.clearCache() between
    // units of work, as Verify/Bench do — the tokenTable convention);
    // a caller that wants an explicit handle computes winnow() itself,
    // persists, and calls pairsFromPostings directly. At 100 TB this
    // is the written-once fingerprint store, cf. minhashBandsStored.
    val fps = winnow(docs, k, w, idCol, textCol).persist()
    pairsFromPostings(fps, minShared, dfCap)
  }

  /** [[winnowPairs]]' capped self-join over PRECOMPUTED (id, fp)
    * postings — the single definition of the within-corpus df-cap
    * discipline, shared with the streaming loop so batch and stream
    * cannot diverge. */
  def pairsFromPostings(fps: DataFrame, minShared: Int,
                        dfCap: Int): DataFrame = {
    val shareable = fps.groupBy(col("fp"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2 && col("df") <= dfCap)
      .select("fp")
    val posted = fps.join(shareable, "fp")
    posted.as("a").join(posted.as("b"),
        col("a.fp") === col("b.fp") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Write-iff-absent winnowed-fingerprint store — the KEEP-CURRENT
    * artifact lifecycle ([[Dedup.minhashBandsStored]] shape) for the
    * postings side: the corpus is tokenized + winnowed ONCE to parquet
    * (id, fp); every later overlap probe reads the postings and never
    * touches the corpus text again. Selection is deterministic (md5
    * hashes, fixed window), so a rebuilt store is bit-identical to a
    * reused one. At cluster scale, bucketBy(fp) so probe batches
    * shuffle one-sided into the fixed layout. */
  def winnowStored(corpus: DataFrame, path: String, k: Int = 3, w: Int = 4,
                   idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    if (!Stores.exists(corpus.sparkSession, path, "_SUCCESS"))
      winnow(corpus, k, w, idCol, textCol)
        .write.mode("overwrite").parquet(path)
    corpus.sparkSession.read.parquet(path)
  }

  /** Fold a NEW batch's winnowed fingerprints into a [[winnowStored]]
    * store (parquet-append, new files only; marker-file idempotent per
    * `batchTag` — a replayed stage cannot double-post). Caller
    * guarantees id-uniqueness across batches. */
  def winnowStoreAppend(batch: DataFrame, path: String, batchTag: String,
                        k: Int = 3, w: Int = 4, idCol: String = "doc_id",
                        textCol: String = "text"): DataFrame =
    postingsAppend(winnow(batch, k, w, idCol, textCol), path, batchTag,
      batch.sparkSession)

  /** [[winnowStoreAppend]] over PRECOMPUTED postings — selection is
    * deterministic, so appending already-computed (id, fp) rows is
    * identical to re-winnowing the docs; the streaming loop uses this
    * to append its persisted batch postings instead of paying a second
    * tokenize+winnow pass over the survivors. Committed via
    * [[Stores.appendCommit]]: staged write + rename + marker-last, so
    * a crash between data write and marker cannot double-post the
    * batch on retry, and all store I/O goes through the Hadoop
    * FileSystem API (works beyond the local filesystem). */
  def postingsAppend(postings: DataFrame, path: String, batchTag: String,
                     spark: SparkSession): DataFrame = {
    Stores.requireStore(spark, path, "build it with winnowStored")
    Stores.appendCommit(spark, path, batchTag) { staging =>
      postings.select("id", "fp").write.mode("overwrite").parquet(staging)
    }
    spark.read.parquet(path)
  }

  /** Probe a fresh batch against a [[winnowStored]] corpus — the
    * steady-state incremental shape: only the BATCH is tokenized and
    * winnowed; the corpus side is a postings read. Returns (corpus_id,
    * probe_id, n_shared) for pairs sharing ≥ `minShared` fingerprints.
    * The df cap prunes corpus-universal fingerprints (df computed on
    * the STORED postings — boilerplate shared by the whole corpus would
    * contribute df_corpus × df_probe join rows); df = 1 corpus
    * fingerprints stay (cross pairs need no corpus-internal repeat). */
  def winnowIncremental(probe: DataFrame, path: String, minShared: Int,
                        dfCap: Int, k: Int = 3, w: Int = 4,
                        idCol: String = "doc_id",
                        textCol: String = "text"): DataFrame = {
    Stores.requireStore(probe.sparkSession, path, "build it with winnowStored")
    crossPairsFromPostings(probe.sparkSession.read.parquet(path),
      winnow(probe, k, w, idCol, textCol), minShared, dfCap)
  }

  /** [[winnowIncremental]]'s store⋈probe join over PRECOMPUTED probe
    * postings — the single definition of the cross-corpus df-cap
    * discipline (cap on STORED df only; corpus df = 1 stays, a cross
    * pair needs no corpus-internal repeat), shared with the streaming
    * loop. */
  def crossPairsFromPostings(stored: DataFrame, probePostings: DataFrame,
                             minShared: Int, dfCap: Int): DataFrame = {
    val rare = stored.groupBy(col("fp"))
      .agg(count(lit(1)).as("df")).filter(col("df") <= dfCap).select("fp")
    stored.join(rare, "fp")
      .select(col("fp"), col("id").as("corpus_id"))
      .join(probePostings.select(col("fp"), col("id").as("probe_id")), "fp")
      .groupBy(col("corpus_id"), col("probe_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Content-defined chunks: one row per chunk with 1-based start token,
    * token count, and the chunk's content hash. Token j ends a chunk
    * when the k-gram ending at j (k-gram index j − k + 1) hashes ≡ 0
    * mod `divisor`; a boundary at the last token is dropped (it would
    * open an empty chunk). Docs shorter than k tokens are one chunk.
    * Expected chunk length ≈ `divisor` tokens. */
  def cdcChunks(docs: DataFrame, k: Int, divisor: Int,
                idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(divisor >= 2, s"divisor must be >= 2, got $divisor")
    val base = docs
      .select(col(idCol).as("id"), Text.tokens(col(textCol)).as("toks"))
      .select(col("id"), col("toks"),
        transform(Text.shinglesFromTokens(col("toks"), k),
          g => Text.hash64(g, CDC_SEED)).as("sh"))
    // boundary END positions (token index of the k-gram's last token),
    // trailing boundary excluded. The (element, index) transform lambda
    // walks `sh` ONCE per row — an element_at(sh, i)-over-sequence
    // formulation re-evaluated the whole derived hash array per ELEMENT
    // (the interpreted-HOF trap, Text.shinglesFromTokens contract) and
    // went quadratic in doc length: 97 s at sf0.1 vs 1.2 s for this form
    val bends = base.withColumn("bends",
      filter(
        transform(col("sh"),
          (h, i) => when(pmod(h, lit(divisor.toLong)) === 0L, i + lit(k))),
        j => j.isNotNull && j < size(col("toks"))))
    val chunked = bends
      .withColumn("starts",
        concat(array(lit(1)), transform(col("bends"), _ + 1)))
      .withColumn("ends",
        concat(col("bends"), array(size(col("toks")))))
      // chunk structs built BEFORE the explode so `toks` is not
      // duplicated onto every chunk row; outer attribute references
      // inside the lambda are plain row-value reads
      .withColumn("chunks",
        zip_with(col("starts"), col("ends"), (st, en) => struct(
          st.cast("long").as("start_tok"),
          (en - st + 1).cast("long").as("n_toks"),
          Text.hash64(array_join(slice(col("toks"), st, en - st + 1), " "),
            CHUNK_SEED).as("chunk_hash"))))
    chunked
      .select(col("id"), posexplode(col("chunks")))
      .select(col("id"), col("pos").cast("long").as("chunk_idx"),
        col("col.start_tok"), col("col.n_toks"), col("col.chunk_hash"))
  }

  /** Per-doc duplicated-chunk mass — what CDC chunking exists FOR: the
    * fraction of each doc's tokens living in chunks whose content hash
    * appears in ≥ 2 docs anywhere in the corpus (cross-document; a
    * chunk repeated only within one doc doesn't count). Robust to edits
    * because the boundaries are content-defined: a near-copy with one
    * insertion still shares every chunk away from the edit. One
    * chunk-hash-keyed aggregation (distinct-doc count per hash is
    * 2-bounded via a cheap `min/max` trick: df_docs ≥ 2 ⟺ min(id) ≠
    * max(id)) + one join back — the exact-dedup shape one level below
    * the document. */
  def cdcDupMass(docs: DataFrame, k: Int, divisor: Int,
                 idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // chunk table feeds the shared-hash agg AND the join back — persist
    // so chunking runs once (CALLER-owned cache lifetime, clearCache
    // between units of work; pass precomputed chunks to
    // cdcDupMassFromChunks for an explicit handle)
    cdcDupMassFromChunks(cdcChunks(docs, k, divisor, idCol, textCol).persist())
  }

  /** [[cdcDupMass]] over a PRECOMPUTED (id, chunk_idx, start_tok,
    * n_toks, chunk_hash) chunk table — the postings-accepting variant
    * (cf. [[pairsFromPostings]]) for callers that own the chunk
    * table's persistence and want to unpersist it after consuming the
    * result. */
  def cdcDupMassFromChunks(chunks: DataFrame): DataFrame = {
    val shared = chunks.groupBy(col("chunk_hash"))
      .agg(min(col("id")).as("lo"), max(col("id")).as("hi"))
      .filter(col("lo") =!= col("hi"))
      .select(col("chunk_hash"), lit(1L).as("is_shared"))
    chunks.join(shared, Seq("chunk_hash"), "left")
      .groupBy(col("id"))
      .agg(
        sum(col("n_toks")).as("total_toks"),
        coalesce(sum(when(col("is_shared") === 1L, col("n_toks"))), lit(0L))
          .as("dup_toks"))
      .select(col("id"), col("total_toks"), col("dup_toks"),
        round(col("dup_toks").cast("double") / col("total_toks"), 6)
          .as("dup_frac"))
  }
}
