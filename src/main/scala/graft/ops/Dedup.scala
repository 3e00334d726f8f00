package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.Text

/** Corpus deduplication at training-data scale. All variants follow the
  * same distributed shape: per-doc signature (narrow, codegen'd) →
  * candidate generation by key equality (one shuffle on the signature,
  * never an all-pairs cross join) → exact verification on the candidates.
  *
  * At 100 TB: signatures are tiny relative to text, so the shuffles move
  * kilobytes per doc; the only quadratic work is inside a bucket, which
  * LSH parameters keep small (and a `groupBy(bucket).count` skew check is
  * the operational guardrail — salt or drop degenerate buckets).
  */
object Dedup {

  /** Exact dedup: keep the lowest-id doc per identical normalized text.
    * One hash aggregation on the 128-bit fingerprint. */
  def exact(docs: DataFrame, idCol: String = "doc_id",
            textCol: String = "text"): DataFrame =
    docs
      .withColumn("fp", Text.fingerprint(col(textCol)))
      .groupBy(col("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Per-doc MinHash signatures in ONE codegen'd pass per row
    * ([[graft.functions.expr.MinHashSignature]]): shingle bytes → md5
    * prefix → k affine permutations with k running minima in registers.
    * The signature leaves the scan stage as a finished array — no
    * shingle explode, no shuffle, no re-aggregation (the previous
    * explode + k×min-aggregate shape shuffled one row per (doc,
    * shingle); the original array-lambda shape was ~100× slower still —
    * Spark HOFs are interpreted). Docs with fewer than `shingleLen`
    * tokens carry a NULL signature; downstream band joins drop the null
    * key naturally (an isNotNull filter here would be alias-substituted
    * below the projection and run the signature twice). */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
                        shingleLen: Int, k: Int,
                        carry: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val reserved = Set("id", "toks", "sig", "bk", "band", "band_hash")
    require(carry.forall(c => !reserved(c)),
      s"carry columns collide with internal aliases: ${carry.filter(reserved)}")
    val coeffs = Text.minhashCoeffs(k)
    val toks = docs.select(col(idCol).as("id") +: Text.tokens(col(textCol)).as("toks")
      +: carry.map(col): _*)
    toks.select(col("id") +: ColumnBridge.column(graft.functions.expr.MinHashSignature(
        ColumnBridge.expr(col("toks")), shingleLen,
        coeffs.map(_._1).toArray, coeffs.map(_._2).toArray)).as("sig")
      +: carry.map(col): _*)
  }

  /** Doc → (band_idx, band_hash) candidate keys for MinHash-LSH.
    * numHashes = bands * rowsPerBand. */
  def minhashBands(docs: DataFrame, idCol: String, textCol: String,
                   shingleLen: Int, bands: Int, rowsPerBand: Int,
                   carry: Seq[String] = Nil): DataFrame = {
    val k = bands * rowsPerBand
    val withSig = minhashSignatures(docs, idCol, textCol, shingleLen, k, carry)
    withSig.select(
      col("id") +: col("sig") +:
      explode(array((0 until bands).map(b =>
        struct(lit(b).as("band"),
          md5(to_json(slice(col("sig"), b * rowsPerBand + 1, rowsPerBand)))
            .as("bh"))): _*)).as("bk") +: carry.map(col): _*)
      .select(col("id") +: col("sig") +: col("bk.band").as("band") +:
        col("bk.bh").as("band_hash") +: carry.map(col): _*)
  }

  /** MinHash-LSH near-dup pairs: docs sharing ≥1 band bucket, verified by
    * estimated Jaccard (signature agreement) ≥ `tau`. Returns (id_a, id_b,
    * jaccard_est) with id_a < id_b. */
  def minhashLsh(docs: DataFrame, tau: Double, idCol: String = "doc_id",
                 textCol: String = "text", shingleLen: Int = 3,
                 bands: Int = 8, rowsPerBand: Int = 4): DataFrame = {
    val banded = minhashBands(docs, idCol, textCol, shingleLen, bands, rowsPerBand)
    val a = banded.select(col("band"), col("band_hash"),
      col("id").as("id_a"), col("sig").as("sig_a"))
    val b = banded.select(col("band"), col("band_hash"),
      col("id").as("id_b"), col("sig").as("sig_b"))
    // shuffle_hash: both sides are the same exchange (ReusedExchange —
    // the signature build runs once); broadcast would rebuild it for the
    // build side and serialize it through the driver
    a.join(b.hint("shuffle_hash"), Seq("band", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) =>
          when(x === y, 1).otherwise(0)), v => v === 1))
          / size(col("sig_a")).cast("double")).as("jaccard_est"))
      .distinct()
      .filter(col("jaccard_est") >= tau)
  }

  /** Banding auto-tune for MinHash LSH: among the (bands, rowsPerBand)
    * factorizations of signature length k, pick the one whose S-curve
    * threshold (1/b)^(1/r) — the similarity where candidate probability
    * 1−(1−s^r)^b crosses ~½ — lands closest to the target tau. Driver-
    * side arithmetic over ≤ d(k) pairs; the output feeds
    * [[minhashLsh]]/[[crossMinhashLsh]] so recall at tau comes from the
    * math rather than folklore constants. Higher tau → fewer, longer
    * bands (stricter buckets); lower tau → many short bands. */
  def lshBanding(k: Int, tau: Double): (Int, Int) = {
    require(k >= 1, s"signature length must be >= 1, got $k")
    require(tau > 0 && tau < 1, s"tau in (0,1), got $tau")
    (1 to k).filter(k % _ == 0).map(b => (b, k / b))
      .minBy { case (b, r) => math.abs(math.pow(1.0 / b, 1.0 / r) - tau) }
  }

  /** Cross-corpus near-dup pairs — benchmark DEcontamination and
    * incremental-crawl dedup: which `probe` docs near-duplicate any
    * `corpus` doc. Same banded MinHash-LSH shape as [[minhashLsh]] but
    * across two inputs: candidates are (corpus, probe) docs sharing ≥1
    * band bucket, verified by signature-agreement Jaccard ≥ `tau`.
    * Returns (corpus_id, probe_id, jaccard_est).
    *
    * At 100 TB: the corpus side's banded signatures are computed once
    * and can be written out bucketed by (band, band_hash); each new
    * probe batch then shuffles only ITS OWN signatures into that layout
    * — decontaminating a fresh eval set or crawl increment never
    * re-scans the training corpus text. */
  def crossMinhashLsh(corpus: DataFrame, probe: DataFrame, tau: Double,
                      idCol: String = "doc_id", textCol: String = "text",
                      shingleLen: Int = 3, bands: Int = 8,
                      rowsPerBand: Int = 4): DataFrame = {
    val a = minhashBands(corpus, idCol, textCol, shingleLen, bands, rowsPerBand)
      .select(col("band"), col("band_hash"),
        col("id").as("corpus_id"), col("sig").as("sig_a"))
    val b = minhashBands(probe, idCol, textCol, shingleLen, bands, rowsPerBand)
      .select(col("band"), col("band_hash"),
        col("id").as("probe_id"), col("sig").as("sig_b"))
    bandedCrossVerify(a, b, tau)
  }

  /** The shared cross-corpus band-bucket join + signature-agreement
    * verify: two distinct inputs — no shared exchange to reuse;
    * shuffle_hash still avoids sort-merge sorts and a driver-side
    * broadcast build. */
  private def bandedCrossVerify(a: DataFrame, b: DataFrame,
                                tau: Double): DataFrame =
    a.join(b.hint("shuffle_hash"), Seq("band", "band_hash"))
      .select(col("corpus_id"), col("probe_id"),
        (size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) =>
          when(x === y, 1).otherwise(0)), v => v === 1))
          / size(col("sig_a")).cast("double")).as("jaccard_est"))
      .distinct()
      .filter(col("jaccard_est") >= tau)

  /** Write-iff-absent banded MinHash signature store — the KEEP-CURRENT
    * artifact lifecycle (the stored-centroid / gram-set shape) for the
    * [[crossMinhashLsh]] corpus side: the training corpus is signed and
    * banded ONCE to parquet; every later dedup of a crawl increment or
    * eval probe reads (band, band_hash, id, sig) rows and never touches
    * the corpus text again. Signatures are deterministic (fixed affine
    * coefficients), so a rebuilt store is bit-identical to a reused one
    * and both serve the same oracle. At cluster scale, write the store
    * `bucketBy(band_hash)` into a table so each probe batch shuffles
    * one-sided into the fixed bucket layout. */
  def minhashBandsStored(corpus: DataFrame, path: String,
                         shingleLen: Int = 3, bands: Int = 8,
                         rowsPerBand: Int = 4, idCol: String = "doc_id",
                         textCol: String = "text"): DataFrame = {
    if (!Stores.exists(corpus.sparkSession, path, "_SUCCESS"))
      minhashBands(corpus, idCol, textCol, shingleLen, bands, rowsPerBand)
        .select(col("id"), col("sig"), col("band"), col("band_hash"))
        .write.mode("overwrite").parquet(path)
    corpus.sparkSession.read.parquet(path)
  }

  /** Fold a NEW batch's banded signatures into a [[minhashBandsStored]]
    * store — the missing half of the incremental lifecycle: after a
    * crawl increment is deduplicated against the corpus, its surviving
    * docs' signatures must JOIN the store so the NEXT increment
    * deduplicates against corpus + this batch. Parquet-append of the
    * batch's signature rows (new part files only — the corpus
    * signatures are never rewritten, the right shape for a 100 TB
    * store; at cluster scale the same append lands new files in the
    * `bucketBy(band_hash)` table layout). Idempotent per `batchTag`: a
    * marker file records an applied batch, so a replayed pipeline stage
    * cannot double-sign (the [[JdbcDeltaSink]] batch-stamp idea at file
    * granularity). Caller guarantees id-uniqueness across batches (the
    * same contract every store consumer already assumes). */
  def minhashStoreAppend(batch: DataFrame, path: String, batchTag: String,
                         shingleLen: Int = 3, bands: Int = 8,
                         rowsPerBand: Int = 4, idCol: String = "doc_id",
                         textCol: String = "text"): DataFrame = {
    Stores.requireStore(batch.sparkSession, path,
      "build it with minhashBandsStored")
    // staged write + marker-LAST commit (exactly-once under a crash
    // between data and marker — the bare append+marker had that window)
    Stores.appendCommit(batch.sparkSession, path, batchTag) { staging =>
      minhashBands(batch, idCol, textCol, shingleLen, bands, rowsPerBand)
        .select(col("id"), col("sig"), col("band"), col("band_hash"))
        .write.mode("overwrite").parquet(staging)
    }
    batch.sparkSession.read.parquet(path)
  }

  /** [[crossMinhashLsh]] served from a [[minhashBandsStored]] store —
    * the steady-state incremental-dedup shape: only the probe batch is
    * signed; the corpus side is a parquet read of its stored banded
    * signatures. Returns (corpus_id, probe_id, jaccard_est). */
  def minhashIncremental(probe: DataFrame, path: String, tau: Double,
                         shingleLen: Int = 3, bands: Int = 8,
                         rowsPerBand: Int = 4, idCol: String = "doc_id",
                         textCol: String = "text"): DataFrame = {
    Stores.requireStore(probe.sparkSession, path,
      "build it with minhashBandsStored")
    val a = probe.sparkSession.read.parquet(path)
      .select(col("band"), col("band_hash"),
        col("id").as("corpus_id"), col("sig").as("sig_a"))
    val b = minhashBands(probe, idCol, textCol, shingleLen, bands, rowsPerBand)
      .select(col("band"), col("band_hash"),
        col("id").as("probe_id"), col("sig").as("sig_b"))
    bandedCrossVerify(a, b, tau)
  }

  /** EXACT n-gram contamination — the strict decontamination rule
    * (published-benchmark hygiene: an eval doc sharing ANY exact n-token
    * shingle with a training doc is contaminated; production pipelines
    * run it at n ≈ 13, the fixture queries lower n to get hits). Returns
    * one row per contaminated probe doc: (probe_id, hits) with hits =
    * count of DISTINCT contaminated grams in that doc.
    *
    * Scale shape: the corpus side collapses to a DISTINCT set of 60-bit
    * gram hashes BEFORE the join — the join key is then unique on the
    * build side, so candidate volume is bounded by the probe's own gram
    * occurrences (no df_corpus × df_probe blowup on hot grams, the trap
    * the Jaccard inverted index needs a df cap for). Both sides are
    * map-only projections (tokenize → shingle → hash in one codegen'd
    * pass) into a single hash join on the gram hash; per-doc
    * `array_distinct` happens BEFORE the explode so a gram repeated
    * within one doc crosses the exchange once. 60-bit hashes stand in
    * for the gram strings on the wire (collision odds ~n²/2⁶⁰). */
  def crossNgramContaminated(corpus: DataFrame, probe: DataFrame,
                             n: Int = 13, idCol: String = "doc_id",
                             textCol: String = "text"): DataFrame = {
    val corpusGrams = corpusGramSet(corpus, n, idCol, textCol)
    ngramHashes(probe, n, idCol, textCol)
      .join(corpusGrams.hint("shuffle_hash"), Seq("g"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("hits"))
      .select(col("id").as("probe_id"), col("hits"))
  }

  /** Per-doc distinct n-gram hashes (one codegen'd tokenize→shingle→
    * hash projection; a gram repeated within one doc crosses the
    * exchange once). Public: the streaming decontamination path builds
    * its probe side from the same projection. */
  def ngramHashes(df: DataFrame, n: Int, idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame = df
    .select(col(idCol).as("id"), Text.tokens(col(textCol)).as("toks"))
    .select(col("id"),
      explode(array_distinct(Text.shinglesFromTokens(col("toks"), n))).as("gram"))
    .select(col("id"), Text.hash64(col("gram"), 7).as("g"))

  /** The corpus side of n-gram decontamination as a standalone frame:
    * DISTINCT 60-bit gram hashes. Materialize it once (parquet) and
    * every later screen — batch or streaming — joins against the same
    * set; at 100 TB this is the artifact you keep, not recompute. */
  def corpusGramSet(corpus: DataFrame, n: Int = 13,
                    idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame =
    ngramHashes(corpus, n, idCol, textCol).select("g").distinct()

  /** Contamination REPORT — the graded companion of
    * [[crossNgramContaminated]]'s binary rule: for EVERY probe/eval doc
    * (clean ones included, at 0.0), the fraction of its distinct
    * n-grams that appear anywhere in the training corpus — the
    * "dirty if > X% overlap" reporting number benchmark cards publish
    * (the GPT-3/WMT-style overlap audit), where the strict rule is a
    * special case (hit_frac > 0).
    *
    * Same scale shape as the strict rule: corpus collapses to a
    * DISTINCT gram-hash set before the join (unique build-side key —
    * no df×df blowup), probe grams LEFT-join it so misses survive to
    * the per-doc aggregate. Probe docs with fewer than n tokens have
    * no grams and produce no row. */
  def contaminationReport(corpus: DataFrame, probe: DataFrame,
                          n: Int = 13, idCol: String = "doc_id",
                          textCol: String = "text"): DataFrame = {
    val corpusGrams = corpusGramSet(corpus, n, idCol, textCol)
      .withColumn("_hit", lit(1L))
    ngramHashes(probe, n, idCol, textCol)
      .join(corpusGrams.hint("shuffle_hash"), Seq("g"), "left")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("_hit"), lit(0L))).as("n_hit"))
      .select(col("id").as("probe_id"), col("n_grams"), col("n_hit"),
        round(col("n_hit").cast("double") / col("n_grams"), 6)
          .as("hit_frac"))
  }

  /** SimHash dedup: exact-signature groups (hamming-0). The banded
    * hamming-≤k variant reuses the same shape with signature chunks as
    * band keys. */
  def simhashGroups(docs: DataFrame, idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame =
    simhashSignatures(docs, idCol, textCol)
      .groupBy(col("sh"))
      .agg(min(col("id")).as("keep_id"), count(lit(1)).as("n_docs"))
      .filter(col("n_docs") > 1)

  /** (id, sh) signatures via the one-pass codegen'd
    * [[graft.functions.expr.SimHash48]] expression (distinct tokens →
    * md5 hash → 48 bit votes, all in one row-local loop). The column-
    * expression formulation it replaces needed the token-hash array
    * materialized as an attribute — and still paid 48 interpreted
    * `aggregate` folds per row, one per signature bit. */
  private def simhashSignatures(docs: DataFrame, idCol: String,
                                textCol: String): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    docs
      .select(col(idCol).as("id"), Text.tokens(col(textCol)).as("toks"))
      .select(col("id"), ColumnBridge.column(graft.functions.expr.SimHash48(
        ColumnBridge.expr(col("toks")))).as("sh"))
  }

  /** SimHash near-dup pairs within hamming distance ≤ `maxHamming` via
    * band split: any pair at distance ≤ k agrees on ≥1 of k+1 chunks
    * (pigeonhole — exact, not probabilistic). Chunk count tracks the
    * bound: fewer, wider chunks are more selective, so keep maxHamming
    * as tight as the application allows — on a corpus with dense
    * near-duplicate structure the candidate volume grows steeply with
    * each extra allowed bit of distance. */
  def simhashNearDup(docs: DataFrame, maxHamming: Int = 3,
                     idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val banded = bandSigs(simhashSignatures(docs, idCol, textCol), maxHamming)
    val l = banded.select(col("chunk"), col("ck"), col("id").as("id_a"), col("sh").as("sh_a"))
    val r = banded.select(col("chunk"), col("ck"), col("id").as("id_b"), col("sh").as("sh_b"))
    // shuffle_hash: same-exchange self-join (see ngramJaccard note)
    l.join(r.hint("shuffle_hash"), Seq("chunk", "ck"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming"))
      // hamming BEFORE distinct: bit_count is a per-row instruction,
      // the distinct is an exchange — filter first so only true
      // near-pairs (not every same-bucket collision) cross the wire
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Pigeonhole band split of an (id, sh) signature table: k+1 chunks
    * of 48/(k+1) bits each — any pair at hamming ≤ k agrees on ≥1
    * chunk. Shared by the one-shot [[simhashNearDup]] and the
    * incremental [[simhashStoreAppend]]. */
  private def bandSigs(sigs: DataFrame, maxHamming: Int): DataFrame = {
    val chunks = maxHamming + 1
    val chunkBits = 48 / chunks
    sigs.select(col("id"), col("sh"),
      explode(array((0 until chunks).map(c =>
        struct(lit(c).as("chunk"),
          shiftright(col("sh"), c * chunkBits).bitwiseAND((1L << chunkBits) - 1)
            .as("ck"))): _*)).as("b"))
      .select(col("id"), col("sh"), col("b.chunk").as("chunk"), col("b.ck").as("ck"))
  }

  /** INCREMENTAL SimHash near-dup — the steady-state edit-dup shape:
    * each batch signs only ITS documents, emits exactly the NEW pairs
    * (within-batch, plus batch-vs-earlier-batches from the signature
    * store), and appends its signatures. The union of emissions over
    * batches EQUALS the from-scratch [[simhashNearDup]] over the full
    * corpus: banding recall is exact at the bound (pigeonhole), and
    * each unordered pair surfaces exactly once — in the batch of its
    * LATER document (q_editdup_stored's oracle certifies this
    * end-to-end). Per-batch cost is batch×(batch+store-probe), never a
    * corpus re-pair: at 100 TB the corpus side is a parquet read of
    * (id, sh, tag) — 17 bytes/doc — bucket-joined on the batch's own
    * chunk keys.
    *
    * The store row carries its append `tag`, and the cross side reads
    * only tags STRICTLY BEFORE this batch's — so a replayed batch
    * (at-least-once delivery, or a Verify re-run over a populated
    * store) recomputes the IDENTICAL emission instead of pairing
    * against batches that arrived after it; the append itself no-ops
    * on the batch marker. Caller contract: tags are unique per batch
    * and lexicographically ordered by arrival (zero-padded sequence
    * numbers / batch ids).
    *
    * The returned emission DataFrame is persisted MEMORY_AND_DISK
    * (the count barrier below already materialized it) and the CALLER
    * OWNS the unpersist: release it after consuming — `.unpersist()`,
    * or the session-level `spark.catalog.clearCache()` the Verify
    * loop runs between queries — or a long-running driver accumulates
    * one cached emission per batch. Releasing early is safe: the
    * lineage reads the strictly-earlier-tag store view, so a
    * recompute after the append reproduces the same rows. */
  def simhashStoreAppend(docs: DataFrame, path: String, batchTag: String,
                         maxHamming: Int = 3, idCol: String = "doc_id",
                         textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    val sigs = simhashSignatures(docs, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bb = bandSigs(sigs, maxHamming)
    val within = {
      val l = bb.select(col("chunk"), col("ck"), col("id").as("id_a"), col("sh").as("sh_a"))
      val r = bb.select(col("chunk"), col("ck"), col("id").as("id_b"), col("sh").as("sh_b"))
      l.join(r.hint("shuffle_hash"), Seq("chunk", "ck"))
        .filter(col("id_a") < col("id_b"))
    }
    val crossOpt =
      if (!Stores.exists(spark, path, "_SUCCESS")) None
      else Some {
        val stored = spark.read.parquet(path)
          .filter(col("tag") < lit(batchTag)) // earlier batches only (replay-stable)
        val bs = bandSigs(stored, maxHamming)
          .select(col("chunk"), col("ck"), col("id").as("sid"), col("sh").as("ssh"))
        // canonical (least, greatest) — store and batch ids are
        // disjoint (the append store's id-uniqueness contract)
        bb.select(col("chunk"), col("ck"), col("id").as("bid"), col("sh").as("bsh"))
          .join(bs.hint("shuffle_hash"), Seq("chunk", "ck"))
          .select(least(col("bid"), col("sid")).as("id_a"),
            greatest(col("bid"), col("sid")).as("id_b"),
            col("bsh").as("sh_a"), col("ssh").as("sh_b"))
      }
    val pairs = (within.select(col("id_a"), col("id_b"), col("sh_a"), col("sh_b"))
        +: crossOpt.toSeq).reduce(_ unionAll _)
      .select(col("id_a"), col("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming"))
      .filter(col("hamming") <= maxHamming) // before the distinct exchange
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    pairs.count() // force BEFORE the append: the emission reads the pre-batch store
    if (!Stores.exists(spark, path, "_SUCCESS"))
      sigs.select(col("id"), col("sh"), lit(batchTag).as("tag"))
        .limit(0).write.mode("overwrite").parquet(path)
    Stores.appendCommit(spark, path, batchTag) { staging =>
      sigs.select(col("id"), col("sh"), lit(batchTag).as("tag"))
        .write.mode("overwrite").parquet(staging)
    }
    sigs.unpersist()
    pairs
  }

  /** (blk, id, gs) distinct shingle-hash sets — the shared first stage of
    * [[ngramJaccard]] (one codegen'd pass per row, see the note there). */
  private def shingleSets(docs: DataFrame, blockCol: String, idCol: String,
                          textCol: String, n: Int): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    docs
      .select(col(blockCol).as("blk"), col(idCol).as("id"),
        Text.tokens(col(textCol)).as("toks"))
      .select(col("blk"), col("id"),
        ColumnBridge.column(graft.functions.expr.ShingleHashes(
          ColumnBridge.expr(col("toks")), n, 15)).as("gs"))
  }

  /** Candidate pairs for [[ngramJaccard]]'s df-capped path: pairs sharing
    * ≥1 shingle with document frequency ≤ `maxDf` inside the block, after
    * the J ≥ tau length-ratio prune. Public for introspection — the
    * capped-vs-uncapped candidate count is the operational skew check.
    *
    * POSTINGS-LIST form: the same exchange that builds the inverted
    * index aggregates each gram's posting list, so df is its size — the
    * cap is one `size(ps) <= maxDf` filter on the aggregated rows (no
    * second df pass over the gram rows, no anti-join). Buckets are
    * ≤ maxDf wide BY CONSTRUCTION, and the per-bucket pair cartesian
    * runs as two generates over the aggregated row — never a join.
    * Dropping a gram with df > maxDf removes df² candidate rows; a
    * stop-gram ("of the …", df = 10⁶ at corpus scale) would otherwise
    * emit 10¹² rows under one reduce key. Recall trade, explicitly: a
    * pair whose ENTIRE overlap is capped grams can no longer surface —
    * at J ≥ tau a near-dup pair shares ≥ tau/(1+tau) of its grams, so
    * it stays findable unless all of those are corpus-stopwords; set
    * maxDf comfortably above the df of any gram that distinguishes
    * documents. */
  def ngramCandidates(docs: DataFrame, tau: Double, blockCol: String,
                      idCol: String = "doc_id", textCol: String = "text",
                      n: Int = 3, maxDf: Long = Long.MaxValue): DataFrame =
    ngramCandidatesFrom(shingleSets(docs, blockCol, idCol, textCol, n), tau, maxDf)

  /** Capped-branch candidate prune: `minCommon(na, nb)` is the smallest
    * exact overlap the FINAL metric filter will accept for a pair with
    * those set sizes. While the postings pass generates pairs it also
    * counts each pair's shared capped grams `c` and each doc's capped-
    * gram count `n_cap`; since every shared gram is either capped
    * (counted in `c`) or uncapped (at most `min(na-na_cap, nb-nb_cap)`
    * of those can be shared),
    *     common ≤ c + min(na - na_cap, nb - nb_cap)
    * — any pair whose bound misses `minCommon` would fail the exact
    * verification filter too, so dropping it changes NOTHING in the
    * output while sparing its verification. This is the asymmetric-
    * metric bound: containment has no length-ratio prefilter, so
    * without it every chance single-gram collision (c = 1) rides into
    * the verify join — measured at the K-fold sweep, 5.5M candidates
    * for 1 264 real pairs at K=16, and the candidate broadcast became
    * the scale wall (~K^1.5). With the bound, candidate volume tracks
    * output volume. */
  private def ngramCandidatesFrom(sets: DataFrame, tau: Double, maxDf: Long,
      minCommon: Option[(Column, Column) => Column] = None): DataFrame = {
    val base = sets
      // explode_OUTER, and no `filter(size > 0)` — see ngramJaccard note
      .select(col("blk"), col("id"), size(col("gs")).as("n_sh"),
        explode_outer(col("gs")).as("gh"))
    if (maxDf == Long.MaxValue) {
      // uncapped: the count-common self-join shape (both sides are the
      // SAME exchange — ReusedExchange); no df bound, so a collect_list
      // here could build an unbounded posting array in one reduce key,
      // while the join streams its output
      base.as("x")
        .join(base.as("y").hint("shuffle_hash"),
          col("x.blk") === col("y.blk") && col("x.gh") === col("y.gh")
            && col("x.id") < col("y.id")
            && col("y.n_sh") * lit(tau) <= col("x.n_sh")
            && col("x.n_sh") * lit(tau) <= col("y.n_sh"))
        .select(col("x.blk").as("blk"), col("x.id").as("id_a"),
          col("y.id").as("id_b"))
        .distinct()
    } else {
      // the null gh from shingle-less docs aggregates into one group —
      // dropped HERE (above the Aggregate; a pre-explode filter would
      // re-infer a scan-side size() evaluation, see the note above)
      val postings = base.groupBy(col("blk"), col("gh"))
        .agg(collect_list(struct(col("id"), col("n_sh"))).as("ps"))
        .filter(col("gh").isNotNull && size(col("ps")) <= lit(maxDf))
      minCommon match {
        case None =>
          postings
            .select(col("blk"), col("ps"), explode(col("ps")).as("a"))
            .select(col("blk"), col("a"), explode(col("ps")).as("b"))
            .filter(col("a.id") < col("b.id")
              && col("b.n_sh") * lit(tau) <= col("a.n_sh")
              && col("a.n_sh") * lit(tau) <= col("b.n_sh"))
            .select(col("blk"), col("a.id").as("id_a"), col("b.id").as("id_b"))
            .distinct()
        case Some(bound) =>
          // two consumers (pair counts + per-doc capped counts): persist,
          // caller's clearCache (the ngramJaccard convention) releases it
          val cached = postings
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          val nCap = cached
            .select(col("blk"), explode(col("ps")).as("p"))
            .groupBy(col("blk"), col("p.id").as("id"))
            .agg(count(lit(1)).as("n_cap"))
          // the count agg replaces distinct(): same exchange volume (the
          // per-bucket generates either way), plus the shared-gram count
          val pairs = cached
            .select(col("blk"), col("ps"), explode(col("ps")).as("a"))
            .select(col("blk"), col("a"), explode(col("ps")).as("b"))
            .filter(col("a.id") < col("b.id")
              && col("b.n_sh") * lit(tau) <= col("a.n_sh")
              && col("a.n_sh") * lit(tau) <= col("b.n_sh"))
            .groupBy(col("blk"), col("a.id").as("id_a"), col("b.id").as("id_b"),
              col("a.n_sh").as("na"), col("b.n_sh").as("nb"))
            .agg(count(lit(1)).as("c"))
          // n_cap rides to each pair on the ids — slim integer shuffles,
          // linear in pair count (shuffle_hash: pairs ≫ docs, but the doc
          // side is corpus-sized so never driver-broadcast at scale).
          // The 1e-6 slack keeps the prune strictly conservative against
          // the verify filter's own double rounding: a dropped pair's
          // bound misses the requirement by more than any float error.
          pairs
            .join(nCap.select(col("blk"), col("id").as("id_a"),
              col("n_cap").as("na_cap")).hint("shuffle_hash"), Seq("blk", "id_a"))
            .join(nCap.select(col("blk"), col("id").as("id_b"),
              col("n_cap").as("nb_cap")).hint("shuffle_hash"), Seq("blk", "id_b"))
            .filter((col("c") + least(col("na") - col("na_cap"),
                col("nb") - col("nb_cap"))).cast("double")
              >= bound(col("na"), col("nb")) - lit(1e-6))
            .select(col("blk"), col("id_a"), col("id_b"))
      }
    }
  }

  /** Exact n-gram Jaccard near-dup pairs, blocked by a grouping column to
    * bound the candidate space (at scale: block by LSH band instead —
    * see [[minhashLsh]]; the blocked-exact form is the verification
    * primitive).
    *
    * `maxDf` bounds the inverted-index join's Σdf² cost (see
    * [[ngramCandidates]]): with a cap, candidate generation uses only
    * grams with df ≤ maxDf and the Jaccard is then verified EXACTLY
    * against the full shingle sets (array intersect over the broadcast
    * candidate list — two map-side joins, no corpus shuffle), so capping
    * never changes a reported score, only whether an all-stopword
    * overlap pair is reported at all. */
  def ngramJaccard(docs: DataFrame, tau: Double, blockCol: String,
                   idCol: String = "doc_id", textCol: String = "text",
                   n: Int = 3, maxDf: Long = Long.MaxValue): DataFrame = {
    if (maxDf != Long.MaxValue) {
      // The signature table feeds two consumers (the postings pass and
      // the verification lookup): persist it once — signatures are a
      // few % of the text they summarize, and MEMORY_AND_DISK spills
      // instead of OOMing at corpus scale. The CALLER owns unpersisting
      // (or `spark.catalog.clearCache()`) when done.
      val sets = shingleSets(docs, blockCol, idCol, textCol, n)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // J ≥ tau ⟺ common ≥ tau/(1+tau)·(na+nb): the count-bound prune
      // (see ngramCandidatesFrom) drops chance-collision pairs that
      // cannot reach it, before they cost a verification
      val cand = ngramCandidatesFrom(sets, tau, maxDf,
        Some((na, nb) => (na + nb) * lit(tau / (1 + tau))))
      // ONE verification lookup: each candidate pair explodes to two
      // slim (blk, pair, id, side) rows — integers only — which
      // broadcast onto the scanned (never shuffled) set table; the
      // matched shingle arrays then meet at a candidate-keyed exchange
      // where the pair re-assembles. The previous two-step chain
      // broadcast the INTERMEDIATE (candidate ⨝ gs_a) — full shingle
      // arrays through the driver, candidates × setSize × 8B of driver
      // memory at scale; here arrays move only executor-to-executor and
      // only for candidate rows. Lookup keyed on (blk, id): a doc's row
      // identity is its id WITHIN a block — with a multi-valued
      // blocking column (LSH bands), grouping keeps blk so per-block
      // pair multiplicity is preserved exactly as before.
      return jaccardFromOverlap(verifiedOverlap(sets, cand), tau)
    }
    legacyNgramJaccard(docs, tau, blockCol, idCol, textCol, n)
  }

  /** The Jaccard projection + threshold over a [[verifiedOverlap]]
    * frame — shared by the capped and prefix plans so the metric's
    * arithmetic (and any future tie/cast fix) has ONE definition. */
  private def jaccardFromOverlap(verified: DataFrame, tau: Double): DataFrame =
    verified
      .select(col("id_a"), col("id_b"),
        (col("common") / (col("na") + col("nb") - col("common")).cast("double"))
          .as("jaccard"))
      .filter(col("jaccard") >= tau)

  /** The ONE-lookup exact verification shared by the set-overlap
    * metrics: candidate pairs explode to two slim integer rows that
    * broadcast onto the scanned (never shuffled) set table; matched
    * shingle arrays meet at a candidate-keyed exchange where each pair
    * re-assembles. Returns (id_a, id_b, common, na, nb) — every set
    * metric (Jaccard, containment, overlap coefficient) is one
    * projection over it. */
  private def verifiedOverlap(sets: DataFrame, cand: DataFrame): DataFrame = {
    val cexp = cand.select(col("blk"), col("id_a"), col("id_b"),
        explode(array(
          struct(col("id_a").as("id"), lit(0).as("side")),
          struct(col("id_b").as("id"), lit(1).as("side")))).as("l"))
      .select(col("blk"), col("id_a"), col("id_b"),
        col("l.id").as("id"), col("l.side").as("side"))
    broadcast(cexp)
      .join(sets.select(col("blk"), col("id"), col("gs")), Seq("blk", "id"))
      .groupBy(col("blk"), col("id_a"), col("id_b"))
      .agg(
        // exactly one non-null gs per side per group → deterministic
        first(when(col("side") === 0, col("gs")), ignoreNulls = true).as("gs_a"),
        first(when(col("side") === 1, col("gs")), ignoreNulls = true).as("gs_b"))
      .select(col("id_a"), col("id_b"),
        size(array_intersect(col("gs_a"), col("gs_b"))).cast("long").as("common"),
        size(col("gs_a")).as("na"), size(col("gs_b")).as("nb"))
  }

  /** n-gram CONTAINMENT (Broder's asymmetric companion of resemblance):
    * common / min(na, nb) — "is the smaller doc (near-)inside the
    * other?". Symmetric Jaccard structurally misses the quote/subset
    * near-dup — a 50-gram doc wholly contained in a 5000-gram doc
    * scores J ≈ 0.01 but containment 1.0 — and that is the dominant
    * duplication mode of boilerplate-wrapped and concatenated web text.
    *
    * Same df-capped postings plan as [[ngramJaccard]] with the length-
    * ratio candidate filter OFF (passing tau=0 disables it): the
    * Jaccard prefilter `na/nb ≥ τ` is exactly the bound containment
    * must NOT apply, since containment pairs have arbitrarily
    * mismatched sizes. What replaces it is the exact count bound
    * (see [[ngramCandidatesFrom]]): a pair must share enough capped
    * grams that `common` could still reach `tau·min(na,nb)` — without
    * it every chance single-gram collision becomes a candidate and the
    * verify stage, not the postings pass, turns super-linear (measured
    * ~K^1.5 on the K-fold sweep). Verification is the shared
    * one-lookup pass. */
  def ngramContainment(docs: DataFrame, tau: Double, blockCol: String,
                       idCol: String = "doc_id", textCol: String = "text",
                       n: Int = 3, maxDf: Long = 64): DataFrame = {
    require(maxDf != Long.MaxValue, "containment runs the df-capped plan")
    val sets = shingleSets(docs, blockCol, idCol, textCol, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // C ≥ tau ⟺ common ≥ tau·min(na,nb): with no length-ratio filter
    // this count bound is the ONLY candidate prune the asymmetric
    // metric admits — and it is exact (verify-filter-equivalent), so
    // the reported pair set is unchanged
    val cand = ngramCandidatesFrom(sets, tau = 0.0, maxDf,
      Some((na, nb) => least(na, nb) * lit(tau)))
    verifiedOverlap(sets, cand)
      .select(col("id_a"), col("id_b"),
        (col("common") / least(col("na"), col("nb")).cast("double"))
          .as("containment"))
      .filter(col("containment") >= tau)
  }

  /** PREFIX-FILTERED exact Jaccard join — the SSJoin/PPJoin prefix
    * principle (Chaudhuri et al. ICDE 2006; Xiao et al. WWW 2008)
    * as the COMPLETE-recall companion of [[ngramJaccard]]'s df-capped
    * plan: order every doc's distinct grams by global rarity (df asc,
    * hash asc — one shared total order) and index only the PREFIX,
    * the first |g| − ⌈tau·|g|⌉ + 1 grams. For any pair with J ≥ tau,
    * common ≥ tau·max(|a|,|b|) (via the length-ratio bound), and the
    * prefix lemma then guarantees the prefixes intersect — so unlike
    * the df cap's documented recall trade, NO qualifying pair can be
    * dropped, while hot grams still rarely generate candidates: a
    * corpus stop-gram sorts LAST in every doc and enters a prefix
    * only when nearly everything else in that doc is rarer.
    *
    * Cost vs the cap: one extra df exchange + a per-doc rarity sort
    * (window over bounded per-doc gram counts). The residual risk is
    * a genuinely boilerplate-only near-dup cluster whose prefixes ARE
    * hot grams — the cap path drops those pairs, this path pays df²
    * for them; the prefix-key df histogram is the operational skew
    * check. Verification is the shared one-lookup pass. */
  def ngramJaccardPrefix(docs: DataFrame, tau: Double, blockCol: String,
                         idCol: String = "doc_id", textCol: String = "text",
                         n: Int = 3): DataFrame = {
    require(tau > 0.0 && tau <= 1.0, s"need 0 < tau <= 1, got $tau")
    val sets = shingleSets(docs, blockCol, idCol, textCol, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // inner explode (not the capped path's explode_outer): shingle-less
    // docs are droppable here OUTRIGHT — they join no df row and index
    // no prefix — and the df join consumes the rows before any
    // filter-inference rule could push a size() back to the scan
    val grams = sets
      .select(col("blk"), col("id"), size(col("gs")).as("n_sh"),
        explode(col("gs")).as("gh"))
    val dfTab = grams.groupBy(col("blk"), col("gh"))
      .agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("blk"), col("id"))
      .orderBy(col("df").asc, col("gh").asc)
    // persisted: the prefix table is BOTH sides of the self-join below,
    // and without the cache the df aggregate + rarity window subtree is
    // physically built once per side (the dominant cost of this path —
    // the base shingle scan alone reusing does not help). Cache
    // lifetime is caller-owned (clearCache between units of work), the
    // same convention as `sets` above.
    val prefix = grams.join(dfTab, Seq("blk", "gh"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <=
        col("n_sh") - ceil(col("n_sh") * lit(tau)).cast("int") + 1)
      .select(col("blk"), col("gh"), col("id"), col("n_sh"), col("rn"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // same-exchange self-join: shuffle_hash keeps the ReusedExchange/
    // no-sort shape (the uncapped path's documented choice) — without
    // the hint SMJ adds two sorts over the prefix-gram volume.
    // POSITIONAL filter (PPJoin's second filter), exact: in the shared
    // (df, hash) total order every common gram of a qualifying pair
    // sorts at-or-after the pair's FIRST shared gram in both docs, so
    // common ≤ 1 + min(na − rn_a, nb − rn_b) at that match; a pair
    // whose every match fails the J ≥ tau requirement
    // (common ≥ tau/(1+tau)·(na+nb)) cannot qualify — in particular its
    // first shared gram fails it, so dropping those match rows loses
    // nothing while sparing their distinct+verify cost. The 1e-6 slack
    // keeps the prune strictly conservative against double rounding.
    val cand = prefix.as("a").join(prefix.as("b").hint("shuffle_hash"),
        col("a.blk") === col("b.blk") && col("a.gh") === col("b.gh")
          && col("a.id") < col("b.id")
          && col("b.n_sh") * lit(tau) <= col("a.n_sh")
          && col("a.n_sh") * lit(tau) <= col("b.n_sh")
          && (lit(1) + least(col("a.n_sh") - col("a.rn"),
                col("b.n_sh") - col("b.rn"))).cast("double")
            >= (col("a.n_sh") + col("b.n_sh")) * lit(tau / (1 + tau)) - lit(1e-6))
      .select(col("a.blk").as("blk"), col("a.id").as("id_a"),
        col("b.id").as("id_b"))
      .distinct()
    jaccardFromOverlap(verifiedOverlap(sets, cand), tau)
  }

  /** Exact duplicated-span REMOVAL — the rewrite companion of
    * [[graft.ops.TextStats.duplicatedSpans]] (which only reports): the
    * distributed profile of suffix-array substring dedup (Lee et al.
    * 2022, "Deduplicating Training Data Makes Language Models Better"),
    * where all but one occurrence of every corpus-duplicated token span
    * is CUT OUT of the text. Keep rule, deterministic: occurrences of a
    * span hash rank by (doc id, position); rank 1 keeps its tokens,
    * every later occurrence marks its `spanLen` tokens for removal. A
    * token survives iff no non-canonical duplicated span covers it.
    *
    * Plan — fully relational, two corpus-scale exchanges, no
    * interpreted HOF in the hot path:
    *  1. span occurrences (id, pos, hash) rank over a hash-partitioned
    *     window (the [[graft.ops.TextStats.duplicatedSpans]] exchange;
    *     same hot-span straggler caveat — a span in 10⁸ docs is one
    *     window partition);
    *  2. each duplicate occurrence becomes ±1 coverage EVENTS at
    *     (pos, pos+spanLen); events union the exploded token rows and
    *     one id-partitioned running sum gives each token its coverage
    *     depth — interval overlap without a range join;
    *  3. one aggregation per doc rebuilds the kept text in order
    *     (collect_list skips the nulls the kept-filter leaves, so
    *     totals and the rebuilt text come from the same pass; docs
    *     whose every token was removed stay present with empty text).
    *
    * Output: (id, n_tokens, n_removed, clean_text), one row per
    * non-null-text doc. The token table feeds stages 1 and 2: persisted
    * MEMORY_AND_DISK, caller owns `spark.catalog.clearCache()` (the
    * [[ngramJaccard]] convention). */
  def spanDedup(docs: DataFrame, spanLen: Int, idCol: String = "doc_id",
                textCol: String = "text",
                hotSpanGuard: Boolean = false): DataFrame = {
    require(spanLen >= 2, s"span length must be >= 2, got $spanLen")
    val toks = tokenTable(docs, idCol, textCol)
    val dups = nonCanonicalOccurrences(spanOccurrences(toks, spanLen), hotSpanGuard)
    cutCovered(toks, dups, spanLen)
  }

  /** The rank-1-keeps mark: every span occurrence EXCEPT the canonical
    * (min (id, pos)) one per hash.
    *
    * Default path: one h-partitioned rank window — one exchange, but a
    * corpus-universal span (df 10⁸) is ONE window partition, the
    * documented straggler. `hotSpanGuard = true` trades the window for
    * argmin-plus-join: rank-1-keeps needs no full rank, only each
    * hash's minimum occurrence, and `min(struct(id, pos))` aggregates
    * PARTIALLY — the map-side combine is exactly the two-level
    * (prefix-agg → merge) rank, reducing a hot span to one candidate
    * per map task before the exchange — while the mark-join back is
    * AQE-skew-splittable (adaptive.skewJoin is on session-wide), which
    * a window partition never is. Cost of the guard on a benign corpus:
    * the occurrence table is exchanged twice (agg + join) instead of
    * once, so it stays opt-in rather than default. */
  private def nonCanonicalOccurrences(occ: DataFrame,
                                      hotSpanGuard: Boolean): DataFrame =
    if (!hotSpanGuard) {
      occ
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("h")).orderBy(col("id"), col("pos"))))
        .filter(col("rn") > 1)
        .select(col("id"), col("pos"))
    } else {
      // struct min orders lexicographically (id, then pos) — identical
      // to the window's orderBy(id, pos) rank-1 row. Only spans with ≥2
      // occurrences can mark a cut, so the dictionary is FILTERED before
      // the join: in a mostly-unique corpus it collapses from
      // corpus-cardinality to the (small) duplicated-span set and the
      // mark-join broadcasts; when genuinely large, AQE's skew split
      // still beats the window's one-partition-per-hash (measured 5×
      // slower without this filter — the unfiltered canon table forced
      // a corpus-scale sort-merge join).
      val canon = occ.groupBy(col("h"))
        .agg(min(struct(col("id"), col("pos"))).as("m"),
          count(lit(1)).as("cnt"))
        .filter(col("cnt") >= 2)
        .select(col("h"), col("m"))
      occ.join(canon, Seq("h")) // inner: unique-span occurrences drop out
        .filter(col("id") =!= col("m.id") || col("pos") =!= col("m.pos"))
        .select(col("id"), col("pos"))
    }

  /** (id, toks) token table shared by the span-dedup stages: persisted
    * MEMORY_AND_DISK, caller owns `spark.catalog.clearCache()`. */
  private def tokenTable(docs: DataFrame, idCol: String,
                         textCol: String): DataFrame =
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol).as("id"), Text.tokens(col(textCol)).as("toks"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  /** (id, pos, h) span occurrences off a [[tokenTable]]. */
  private def spanOccurrences(toks: DataFrame, spanLen: Int): DataFrame =
    toks
      .select(col("id"), posexplode(Text.shinglesFromTokens(col("toks"), spanLen)))
      .select(col("id"), col("pos"), Text.hash64(col("col"), 0).as("h"))

  /** Stages 2+3 of [[spanDedup]]: cut every token covered by a `dups`
    * occurrence and rebuild the kept text per doc. */
  private def cutCovered(toks: DataFrame, dups: DataFrame,
                         spanLen: Int): DataFrame = {
    // ord sequences same-position rows: both of an occurrence's events
    // apply before the token there — a span STARTING at p covers p's
    // token, a span ENDING at p (exclusive) does not. Both events leave
    // one generate over the SAME dup row (two separate projections
    // would re-run the span explode + rank window once per union
    // branch — seen in the plan dump, the whole subtree doubled)
    val events = dups
      .select(col("id"), explode(array(
        struct(col("pos").as("pos"), lit(1L).as("delta")),
        struct((col("pos") + lit(spanLen)).as("pos"),
          lit(-1L).as("delta")))).as("e"))
      .select(col("id"), col("e.pos").as("pos"), lit(0).as("ord"),
        col("e.delta").as("delta"), lit(null).cast("string").as("tok"))
    val tokenRows = toks
      .select(col("id"), posexplode(col("toks")))
      .select(col("id"), col("pos"), lit(1).as("ord"), lit(0L).as("delta"),
        col("col").as("tok"))
    events.unionAll(tokenRows)
      .withColumn("cov", sum(col("delta")).over(
        Window.partitionBy(col("id")).orderBy(col("pos"), col("ord"))))
      .groupBy(col("id"))
      .agg(
        sum(when(col("ord") === 1, 1L).otherwise(0L)).as("n_tokens"),
        // collect_list drops nulls: only kept (uncovered) tokens land
        collect_list(when(col("ord") === 1 && col("cov") === 0,
          struct(col("pos"), col("tok")))).as("kept"))
      .select(col("id"), col("n_tokens"),
        (col("n_tokens") - size(col("kept"))).cast("long").as("n_removed"),
        concat_ws(" ",
          transform(array_sort(col("kept")), s => s.getField("tok")))
          .as("clean_text"))
  }

  /** Write-iff-absent distinct span-hash store — [[spanDedup]]'s corpus
    * artifact (the [[minhashBandsStored]] lifecycle at span
    * granularity): the cleaned corpus's span hashes collapse to one
    * distinct parquet column, signed once. */
  def spanSetStored(corpus: DataFrame, path: String, spanLen: Int,
                    idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame = {
    require(spanLen >= 2, s"span length must be >= 2, got $spanLen")
    if (!Stores.exists(corpus.sparkSession, path, "_SUCCESS"))
      spanOccurrences(
        corpus.filter(col(textCol).isNotNull)
          .select(col(idCol).as("id"), Text.tokens(col(textCol)).as("toks")),
        spanLen)
        .select(col("h")).distinct()
        .write.mode("overwrite").parquet(path)
    corpus.sparkSession.read.parquet(path)
  }

  /** Fold a NEW batch's span hashes into a [[spanSetStored]] store —
    * the [[minhashStoreAppend]] lifecycle at span granularity: after
    * [[spanDedupIncremental]] cleans a batch, the batch's spans join
    * the store so the next batch's copies of them are cut as
    * corpus-owned. Appends only hashes NOT already stored (left-anti
    * against the current store keeps the store distinct — its size
    * stays the corpus's distinct-span count, not its batch count).
    * The anti-joined delta is STAGED to a sibling temp dir and then
    * appended in a second job: one Spark job must not list-read and
    * append the same directory. Idempotent per `batchTag` via marker
    * file. Spans of the RAW batch text are stored (seen-ness, not
    * kept-ness: the canonical copy of a batch-internal duplicate
    * lives in the batch, and the store must own every span the corpus
    * has ever seen — the Lee et al. profile's contract). */
  def spanSetStoredAppend(batch: DataFrame, path: String, spanLen: Int,
                          batchTag: String, idCol: String = "doc_id",
                          textCol: String = "text"): DataFrame = {
    require(spanLen >= 2, s"span length must be >= 2, got $spanLen")
    Stores.requireStore(batch.sparkSession, path,
      "build it with spanSetStored")
    spanStageDelta(batch, path, spanLen, batchTag, idCol, textCol)
    spanCommitAppend(batch.sparkSession, path, batchTag)
    batch.sparkSession.read.parquet(path)
  }

  /** Phase 1 of the append: materialize the batch's NEW hashes (not in
    * the store) to the [[spanDeltaPath]] sidecar. Does not touch the
    * store, so plans built AFTER staging but BEFORE
    * [[spanCommitAppend]] can anti-join the delta and stay correct
    * whether they execute before or after the commit — the property
    * the streaming loop's cache-invalidation-under-append needs.
    * Write-iff-absent per tag. */
  def spanStageDelta(batch: DataFrame, path: String, spanLen: Int,
                     batchTag: String, idCol: String = "doc_id",
                     textCol: String = "text"): String = {
    Stores.requireStore(batch.sparkSession, path,
      "build it with spanSetStored")
    val delta = spanDeltaPath(path, batchTag)
    if (!Stores.exists(batch.sparkSession, delta, "_SUCCESS"))
      spanOccurrences(
        batch.filter(col(textCol).isNotNull)
          .select(col(idCol).as("id"), Text.tokens(col(textCol)).as("toks")),
        spanLen)
        .select(col("h")).distinct()
        .join(batch.sparkSession.read.parquet(path), Seq("h"), "left_anti")
        .write.mode("overwrite").parquet(delta)
    delta
  }

  /** Phase 2: fold the staged delta's files into the store (parquet
    * append — a copy job reading only the delta) and stamp the marker.
    * No-op when the marker exists (redelivery). */
  def spanCommitAppend(spark: org.apache.spark.sql.SparkSession,
                       path: String, batchTag: String): Unit =
    // staged copy of the delta + marker-LAST commit (exactly-once; a
    // crash between the copy and the marker cannot double-post spans)
    Stores.appendCommit(spark, path, batchTag) { staging =>
      spark.read.parquet(spanDeltaPath(path, batchTag))
        .write.mode("overwrite").parquet(staging)
    }

  /** The sidecar recording exactly the hashes `batchTag`'s append added
    * (the anti-joined delta). RETAINED, not cleaned up: it is the only
    * record that lets a replayed batch reconstruct the store as it
    * stood BEFORE its own append (see [[spanDedupIncremental]]'s
    * `replayTag`) — the store itself has no provenance column.
    * Batch-sized; a production pipeline GCs deltas once the downstream
    * checkpoint has committed past the batch. */
  def spanDeltaPath(path: String, batchTag: String): String =
    path + s"_delta_$batchTag"

  /** [[spanDedup]] of a fresh batch AGAINST a [[spanSetStored]] corpus —
    * incremental substring dedup: a batch span occurrence is cut if its
    * span exists anywhere in the stored corpus (the corpus already owns
    * the canonical copy) OR it repeats within the batch (batch-internal
    * rank > 1). The corpus is never re-tokenized; the store join and
    * the batch-internal rank share the span-hash exchange key. */
  def spanDedupIncremental(batch: DataFrame, path: String, spanLen: Int,
                           idCol: String = "doc_id",
                           textCol: String = "text",
                           hotSpanGuard: Boolean = false,
                           replayTag: Option[String] = None): DataFrame = {
    require(spanLen >= 2, s"span length must be >= 2, got $spanLen")
    Stores.requireStore(batch.sparkSession, path,
      "build it with spanSetStored")
    // replayTag: this batch may ALREADY have appended its spans (an
    // at-least-once redelivery after a crash downstream) — cutting the
    // batch against its own contribution would empty it. The retained
    // append delta ([[spanDeltaPath]]) records exactly what it added;
    // anti-joining it out reconstructs the pre-batch store view, so
    // first run and replay compute the identical cut.
    val rawStore = batch.sparkSession.read.parquet(path)
    val storeView = replayTag
      .map(spanDeltaPath(path, _))
      .filter(d => Stores.exists(batch.sparkSession, d, "_SUCCESS"))
      .map(d => rawStore.join(
        batch.sparkSession.read.parquet(d), Seq("h"), "left_anti"))
      .getOrElse(rawStore)
    val store = storeView.select(col("h"), lit(true).as("in_store"))
    val toks = tokenTable(batch, idCol, textCol)
    val occ = spanOccurrences(toks, spanLen)
    val dups =
      if (!hotSpanGuard) {
        occ
          .join(store.hint("shuffle_hash"), Seq("h"), "left")
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("h")).orderBy(col("id"), col("pos"))))
          .filter(col("in_store").isNotNull || col("rn") > 1)
          .select(col("id"), col("pos"))
      } else {
        // argmin form of the same mark (see nonCanonicalOccurrences):
        // cut when the span is already corpus-owned OR not the batch's
        // canonical occurrence among ≥2 batch copies. The batch
        // dictionary is df-filtered before joining (broadcast-sized in
        // the common case), and both joins key on h
        val canon = occ.groupBy(col("h"))
          .agg(min(struct(col("id"), col("pos"))).as("m"),
            count(lit(1)).as("cnt"))
          .filter(col("cnt") >= 2)
          .select(col("h"), col("m"))
        occ
          .join(store.hint("shuffle_hash"), Seq("h"), "left")
          .join(canon, Seq("h"), "left")
          .filter(col("in_store").isNotNull ||
            (col("m").isNotNull &&
              (col("id") =!= col("m.id") || col("pos") =!= col("m.pos"))))
          .select(col("id"), col("pos"))
      }
    cutCovered(toks, dups, spanLen)
  }

  /** Corpus-level BOILERPLATE removal — the template-span cut of the
    * RefinedWeb/CCNet cleaning stage: a span whose document frequency
    * (distinct docs containing it) reaches `minDf` is navigation/
    * license/header boilerplate, and EVERY occurrence is cut —
    * including the first. This is the semantic complement of
    * [[spanDedup]]: there, a duplicated span has a canonical owner
    * (rank 1 keeps); boilerplate has none.
    *
    * Plan: span occurrences aggregate per hash to a distinct-doc count
    * (two-phase (h,id)-dedup then h-count — no per-span occurrence
    * lists, so a span present in 10⁸ docs costs one counter, not a
    * collected list, and hot templates cannot skew an executor); the
    * df-filtered hash set (the boilerplate dictionary — df ≥ minDf
    * spans only, a small fraction by construction) then
    * shuffle-hash-joins the occurrences, which re-explode map-only off
    * the cached token table rather than re-scanning the corpus. Token
    * cut + text rebuild ride [[cutCovered]].
    *
    * Output: (id, n_tokens, n_removed, clean_text), one row per
    * non-null-text doc. Token table persisted MEMORY_AND_DISK; caller
    * owns `spark.catalog.clearCache()`. */
  def boilerplateRemoval(docs: DataFrame, spanLen: Int, minDf: Int,
                         idCol: String = "doc_id",
                         textCol: String = "text"): DataFrame = {
    require(spanLen >= 2, s"span length must be >= 2, got $spanLen")
    require(minDf >= 2, s"minDf must be >= 2, got $minDf")
    val toks = tokenTable(docs, idCol, textCol)
    val occ = spanOccurrences(toks, spanLen)
    val hot = occ
      .groupBy(col("h"))
      .agg(countDistinct(col("id")).as("df"))
      .filter(col("df") >= minDf)
      .select(col("h"))
    val dups = occ.join(hot.hint("shuffle_hash"), Seq("h"))
      .select(col("id"), col("pos"))
    cutCovered(toks, dups, spanLen)
  }

  /** Uncapped single-pass count-common form (best plan while per-block
    * dfs stay bounded — one shuffle, no verification join). */
  private def legacyNgramJaccard(docs: DataFrame, tau: Double, blockCol: String,
                                 idCol: String, textCol: String,
                                 n: Int): DataFrame = {
    // Shingle sets as 60-bit hashes (8-byte join keys; collision odds
    // ~2^-60, deterministic, mirrored in the oracle).
    //
    // Shape: inverted-index common-count. The distinct shingle-hash SET
    // per doc comes from the one-pass codegen'd [[ShingleHashes]]
    // expression (the zip_with + array_distinct + per-shingle-md5
    // pipeline it replaces ran through the interpreter and was
    // re-duplicated by filter-inference rules). The self-join on
    // (block, shingle-hash) yields one row per shared shingle per doc
    // pair; a single aggregation counts |A ∩ B| and the Jaccard filter
    // closes over the carried set sizes. Both join sides shuffle the
    // SAME exchange — the pipeline runs once.
    //
    // Cost model: the join emits Σ_shingle df² rows — linear-ish while
    // per-block document frequencies stay bounded (max df 14 on the
    // benchmark corpus). A corpus with stopword-dense shingles needs the
    // AllPairs/PPJoin prefix-filter ordering instead (rarest-first
    // prefixes + positional filter) — measured here, the prefix pass
    // costs an extra df shuffle+join and still leaves ~half the pairs
    // needing exact verification, so count-common wins until df² blows
    // up. The J ≥ tau ⇒ tau ≤ |A|/|B| ≤ 1/tau length filter prunes
    // instance pairs before the aggregation either way.
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val base = docs
      .select(col(blockCol).as("blk"), col(idCol).as("id"),
        Text.tokens(col(textCol)).as("toks"))
      .select(col("blk"), col("id"),
        ColumnBridge.column(graft.functions.expr.ShingleHashes(
          ColumnBridge.expr(col("toks")), n, 15)).as("gs"))
      // explode_OUTER, and no `filter(size > 0)`: a non-outer explode
      // triggers InferFiltersFromGenerate, which duplicates the shingle
      // expression into a `size(...) > 0` scan filter (one extra
      // evaluation per row), and an explicit size() filter gets pushed
      // below the projection with the same effect. The null row an
      // outer explode emits for shingle-less docs is a null join key,
      // which the inner equi-join drops.
      .select(col("blk"), col("id"), size(col("gs")).as("n_sh"),
        explode_outer(col("gs")).as("gh"))
    // shuffle_hash, not broadcast: the two sides are the SAME exchange
    // (ReusedExchange — the shingle pipeline runs once), while a
    // broadcast would serialize the instance table through the driver
    // AND recompute the pipeline for the build side
    base.as("x")
      .join(base.as("y").hint("shuffle_hash"),
        col("x.blk") === col("y.blk") && col("x.gh") === col("y.gh")
          && col("x.id") < col("y.id")
          && col("y.n_sh") * lit(tau) <= col("x.n_sh")
          && col("x.n_sh") * lit(tau) <= col("y.n_sh"))
      .groupBy(col("x.id").as("id_a"), col("y.id").as("id_b"),
        col("x.n_sh").as("na"), col("y.n_sh").as("nb"))
      .agg(count(lit(1)).as("common"))
      .select(col("id_a"), col("id_b"),
        (col("common") / (col("na") + col("nb") - col("common")).cast("double"))
          .as("jaccard"))
      .filter(col("jaccard") >= tau)
  }

  /** Connected components over a near-dup pair list — the step that turns
    * pairwise matches into dedup CLUSTERS so a pipeline can keep one
    * representative per component (dropping `id_b` of every pair
    * over-deletes when A~B and B~C but the pipeline should keep exactly
    * one of {A,B,C}).
    *
    * Hash-min label propagation: every vertex starts labeled with itself;
    * each round a vertex takes the minimum label among itself and its
    * neighbors; at fixpoint the label is the component's minimum id (the
    * canonical representative). Rounds needed = graph diameter — for
    * near-dup clusters (dense cliques stitched by a few bridges) that is
    * small, and each round is one join + one aggregation, both
    * shuffle-partitioned on vertex id so the exchange layout is reused
    * across rounds. Each round materializes (persist + count) — the
    * convergence check needs an action anyway — and unpersists the
    * previous round; intermediates never stack.
    *
    * Returns (id, cluster_id). Below `localEdgeThreshold` directed edges
    * the component solve runs as one driver-side union-find over the
    * collected pair list (near-dup graphs are corpus-tiny; a Spark job
    * per round would dominate) and the result is a fresh local frame.
    * On the distributed path the returned frame is backed by one
    * persisted intermediate (its lineage would otherwise replay every
    * round); the CALLER owns unpersisting it (or
    * `spark.catalog.clearCache()`) when done.
    *
    * At 100 TB: the pair list is orders of magnitude smaller than the
    * corpus (only near-dup docs appear), so the rounds run on the small
    * relation. For adversarial graphs (long chains), switch to the
    * large/small-star algorithm (alternation halves long paths); the
    * plain hash-min here is the right cost for near-dup topology.
    */
  def duplicateClusters(pairs: DataFrame, aCol: String = "id_a",
                        bCol: String = "id_b", maxIters: Int = 25,
                        localEdgeThreshold: Long = 1L << 20): DataFrame = {
    // One evaluation of the (possibly expensive) pair pipeline: persist
    // the undirected list, derive the doubled edge list by explode (a
    // union of two selects would compute the pair subtree twice).
    val undirected = pairs
      .select(col(aCol).cast("long").as("src"), col(bCol).cast("long").as("dst"))
      .persist()
    // The pair list is the DUPLICATE graph — orders of magnitude smaller
    // than the corpus. When it fits on the driver (default 1M directed
    // edges ≈ 16 MB), solve it in one union-find pass instead of paying
    // a Spark job per propagation round; the distributed rounds below
    // are the path for genuinely huge pair lists.
    val edgeCount = undirected.count() * 2
    if (edgeCount <= localEdgeThreshold) {
      val spark = pairs.sparkSession
      val es = undirected.collect().map(r => (r.getLong(0), r.getLong(1)))
      undirected.unpersist()
      val parent = new java.util.HashMap[Long, Long]()
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrDefault(r, r) != r) r = parent.getOrDefault(r, r)
        var c = x // path compression
        while (parent.getOrDefault(c, c) != c) { val n = parent.get(c); parent.put(c, r); c = n }
        r
      }
      es.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent.put(math.max(ra, rb), math.min(ra, rb)) // min-id root
      }
      val verts = es.iterator.flatMap(e => Iterator(e._1, e._2)).toArray.distinct
      import spark.implicits._
      return verts.map(v => (v, find(v))).toSeq.toDF("id", "cluster_id")
    }
    // Distributed path: alternating LARGE-STAR / SMALL-STAR rounds
    // (Kiveris et al., "Connected Components in MapReduce and Beyond")
    // — every pass contracts components toward their min id and the
    // round count is O(log n) REGARDLESS of diameter. The hash-min
    // label propagation this replaces needed O(diameter) rounds, so an
    // adversarial chain (crawl-ring boilerplate, page-N-quotes-page-N−1
    // chains) blew any fixed round budget; stars halve such paths
    // instead of walking them. Per round: two grouped aggregates +
    // joins on the EDGE list (orders of magnitude under the corpus),
    // one persisted frame, convergence checked on the canonical edge
    // set. Fixpoint is a star forest centered at component minima —
    // identical labels to the union-find path (property-tested).
    def canonical(e: DataFrame): DataFrame = e
      .select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      .filter(col("u") =!= col("v")).distinct()
    // localCheckpoint per round, NOT persist: each round reads `cur`
    // several times (symmetrize + both grouped joins), so an
    // un-truncated lineage multiplies in size every round and the
    // logical plan itself becomes the bottleneck (tree blowup) long
    // before the data does. Checkpointing pins the round's edges as
    // plain cached blocks with a leaf plan — the standard discipline
    // for iterative dataframe algorithms.
    var cur = canonical(undirected
      .select(col("src").as("u"), col("dst").as("v"))).localCheckpoint(true)
    var curCount = cur.count()
    undirected.unpersist()
    var converged = false
    var it = 0
    while (!converged && it < maxIters) {
      it += 1
      // large-star: u's whole neighborhood learns m = min(N(u) ∪ {u});
      // each LARGER neighbor re-wires to m. Every undirected edge is
      // seen from its smaller endpoint exactly once, so the output
      // stays edge-sized; emitted (b, m) has m ≤ a < b — canonical.
      val sym = cur.select(col("u").as("a"), col("v").as("b"))
        .union(cur.select(col("v").as("a"), col("u").as("b")))
      val ls = sym
        .join(sym.groupBy(col("a")).agg(min(col("b")).as("mb")), Seq("a"))
        .filter(col("b") > col("a"))
        .select(col("b").as("u"), least(col("mb"), col("a")).as("v"))
        .filter(col("u") =!= col("v")).distinct()
      // small-star: u (now only the big end of canonical edges) and all
      // its smaller neighbors re-wire to its min neighbor mv.
      val next = ls
        .join(ls.groupBy(col("u")).agg(min(col("v")).as("mv")), Seq("u"))
        .select(explode(array(
          struct(col("u").as("su"), col("mv").as("sv")),
          struct(col("v").as("su"), col("mv").as("sv")))).as("e"))
        .select(col("e.su").as("u"), col("e.sv").as("v"))
        .filter(col("u") =!= col("v")).distinct()
        .localCheckpoint(true)
      val nextCount = next.count()
      // fixpoint iff the canonical edge set is unchanged: equal sizes
      // and no edge outside the old set (one anti-join action)
      converged = nextCount == curCount &&
        next.join(cur, Seq("u", "v"), "left_anti").isEmpty
      cur.unpersist()
      cur = next
      curCount = nextCount
    }
    if (!converged)
      throw new IllegalStateException(
        s"duplicateClusters: no star fixpoint after $maxIters rounds")
    // star forest: every edge points a member at its component min;
    // centers label themselves (min() is defensive — at fixpoint each
    // member carries exactly one center)
    cur.select(col("u").as("id"), col("v").as("cluster_id"))
      .union(cur.select(col("v").as("id"), col("v").as("cluster_id")))
      .groupBy(col("id")).agg(min(col("cluster_id")).as("cluster_id"))
  }

  /** WHICH duplicate to keep — the decision step after
    * [[duplicateClusters]]: per cluster, the member maximizing `score`
    * (quality, length, recency — the caller's policy column), doc id
    * ascending as the deterministic tiebreak (ties otherwise make the
    * kept set engine-dependent, which poisons replay). One broadcast-
    * free join + one struct-max aggregation: the argmax rides a single
    * hash agg (no per-cluster sort, no window over the corpus — the
    * [[graft.flow.GroupedFlow]] `max_by` shape).
    *
    * @param clusters (id, cluster_id) from [[duplicateClusters]]
    * @param scores   (id, score) — LONG score (integer discipline)
    * @return (cluster_id, kept_id, n_docs, kept_score)
    */
  def canonicalPick(clusters: DataFrame, scores: DataFrame): DataFrame =
    clusters.join(scores, "id")
      .groupBy(col("cluster_id"))
      .agg(
        count(lit(1)).cast("long").as("n_docs"),
        max(struct(col("score").as("s"), (lit(0L) - col("id")).as("nid")))
          .as("m"))
      .select(col("cluster_id"), (lit(0L) - col("m.nid")).as("kept_id"),
        col("n_docs"), col("m.s").as("kept_score"))

  /** Embedding near-dup pairs, DEFAULT (scale) path: banded hyperplane
    * LSH inside the blocking column prunes the candidate space, then the
    * exact cosine refine decides — output ⊆ [[embeddingNearDupExact]]'s
    * pairs, equal whenever every qualifying pair shares ≥1 band bucket.
    *
    * Candidate generation: `bands` independent plane families
    * ([[graft.functions.Vectors.deterministicPlanes]] seeded per band)
    * of `planesPerBand` bits each; a pair is a candidate iff it agrees
    * on ALL bits of SOME band. For a pair at cosine c, a plane agrees
    * with probability p = 1 − acos(c)/π, so recall = 1 − (1 − p^b)^L —
    * at near-dup thresholds (tau ≥ 0.8, p ≥ 0.8) a handful of wide
    * bands give ≈100% recall with tiny buckets; at loose thresholds L
    * must grow (the defaults here hold recall ≈ 1 down to tau ≈ 0.35).
    *
    * Why this scales where the exact form doesn't: the exact path is
    * all-pairs WITHIN a block — a popular block of n docs costs n²/2
    * comparisons. Here a block is subdivided into 2^b buckets per band,
    * so the quadratic term is Σ_buckets n_b² with n_b ≈ n/2^b — the
    * bucket width (planesPerBand) bounds the worst candidate bucket
    * independently of block popularity. Grow planesPerBand with the
    * block (≈ log2(block/targetBucket)) to hold bucket width constant.
    *
    * Plan shape: vectors ride the ONE banded exchange (L·corpus rows,
    * both self-join sides reuse it) and the cosine refine runs INLINE in
    * the join projection — candidate pairs are generated, scored, and
    * tau-filtered inside a single codegen'd stage without ever being
    * materialized or re-joined; only the surviving near-dup pairs reach
    * the final band-dedup exchange. (The alternative — signatures-only
    * explode + candidate-distinct + two id-join lookups — shuffles the
    * candidate LIST, whose size is the very thing we can't bound ahead
    * of time; L·corpus is known at plan time.) */
  def embeddingNearDup(emb: DataFrame, tau: Double, blockCol: String = "label",
                       idCol: String = "vec_id", vecCol: String = "embedding",
                       dim: Int = 64, bands: Int = 32,
                       planesPerBand: Int = 3,
                       widthCol: Option[String] = None): DataFrame = {
    import graft.functions.{Vectors => V}
    // widthCol: per-BLOCK band width (≤ planesPerBand, which is then the
    // max). All rows compute the full planesPerBand-bit signature once;
    // each block keeps its own w-bit prefix — one plane family, one
    // banded exchange, yet hot blocks get exponentially finer buckets.
    // Equal-width rows mask identically, so pairs (never cross-block)
    // still agree iff their w common bits agree.
    val wCol = widthCol.map(c => col(c).cast("int"))
    val e = emb.select(Seq(col(blockCol).as("blk"), col(idCol).as("id"),
      col(vecCol).as("v"), V.norm(col(vecCol)).as("nrm")) ++
      wCol.map(_.as("w")): _*)
    def masked(bkt: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      if (wCol.isEmpty) bkt
      else bkt.bitwiseAND(expr("shiftleft(1L, w) - 1L"))
    val banded = e.select(col("blk"), col("id"), col("v"), col("nrm"),
      explode(array((0 until bands).map(b =>
        struct(lit(b).as("band"),
          masked(V.hyperplaneBucket(col("v"), dim, planesPerBand, seed = b + 1))
            .as("bkt"))): _*)).as("bb"))
      .select(col("blk"), col("id"), col("v"), col("nrm"),
        col("bb.band").as("band"), col("bb.bkt").as("bkt"))
    val d = V.dot(col("x.v"), col("y.v"))
    val nn = col("x.nrm") * col("y.nrm")
    // shuffle_hash: both sides are the SAME exchange (ReusedExchange)
    banded.as("x")
      .join(banded.as("y").hint("shuffle_hash"),
        col("x.blk") === col("y.blk") && col("x.band") === col("y.band")
          && col("x.bkt") === col("y.bkt") && col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        round(when(nn > 0.0, d / nn).otherwise(lit(0.0)), 6).as("cos"))
      .filter(col("cos") >= tau)
      .distinct() // band-collision dedup, AFTER the filter — tiny input
  }

  /** Embedding near-dup pairs, ADAPTIVE routing: blocks small enough that
    * all-pairs is cheap take the exact kernel; only popular blocks pay
    * the banded-LSH machinery. This is the skew answer in operator form —
    * per-block cost is min(n²/2, bands·n·bucketWidth), so the plan is
    * never worse than the better of the two fixed strategies on any
    * block-size distribution (a corpus of many small blocks plus a few
    * hot ones is the common real shape).
    *
    * Routing needs per-block counts: one column-pruned pre-scan
    * aggregates blockCol (map-side partial, rows = #blocks — broadcast
    * back onto the corpus). Pairs never cross blocks, so the union of
    * the two paths is exactly a partition of the work by block size.
    * Output equals [[embeddingNearDupExact]] whenever the LSH band
    * config reaches full recall at tau (the q_embed_neardup equivalence
    * check pins this at the fixture's hostile tau=0.35). */
  def embeddingNearDupAdaptive(emb: DataFrame, tau: Double, blockCol: String = "label",
                               idCol: String = "vec_id", vecCol: String = "embedding",
                               dim: Int = 64, bands: Int = 32,
                               planesPerBand: Int = 3,
                               smallBlock: Long = 4096L,
                               targetBucket: Long = 50L,
                               maxPlanes: Int = 16): DataFrame = {
    val counts = emb.groupBy(col(blockCol)).agg(count(lit(1)).as("_blk_n"))
    val tagged = emb.join(broadcast(counts), Seq(blockCol))
    val small = tagged.filter(col("_blk_n") <= smallBlock).drop("_blk_n")
    // AUTO-WIDTH banding for the popular blocks, from the same pre-scan
    // that routes them: w_b = clamp(planesPerBand .. maxPlanes,
    // ceil(log2(n_b / targetBucket))) holds expected bucket width ≈
    // targetBucket no matter how hot the block — per-block LSH cost
    // stays bands·n_b·targetBucket instead of growing with
    // n_b²/2^planesPerBand. The plane family is generated at maxPlanes
    // bits and each block keeps its w_b-bit prefix, so NO data-dependent
    // collect is needed and the operator stays fully lazy (an earlier
    // max-width lookup cost every caller one extra corpus-scan job).
    // maxPlanes=16 (65k buckets/band) holds targetBucket=50 up to ~3M-row
    // blocks; hotter blocks degrade gracefully (buckets grow past
    // targetBucket, still 2^16-way subdivided).
    val widths = counts.filter(col("_blk_n") > smallBlock)
      .select(col(blockCol), least(lit(maxPlanes),
        greatest(lit(planesPerBand),
          ceil(log2(col("_blk_n").cast("double") / targetBucket)).cast("int")))
        .cast("int").as("_ppb"))
    val big = tagged.filter(col("_blk_n") > smallBlock).drop("_blk_n")
      .join(broadcast(widths), Seq(blockCol))
    embeddingNearDupExact(small, tau, blockCol, idCol, vecCol)
      .unionAll(embeddingNearDup(big, tau, blockCol, idCol, vecCol,
        dim, bands, planesPerBand = maxPlanes, widthCol = Some("_ppb")))
  }

  /** Embedding near-dup pairs, EXACT form: all pairs within the blocking
    * column (cartesian per block — n²/2 per block, so only viable while
    * blocks stay small). This is the verification primitive and test
    * oracle for the LSH-blocked default above. */
  def embeddingNearDupExact(emb: DataFrame, tau: Double, blockCol: String = "label",
                            idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import graft.functions.{Vectors => V}
    // norms are per-ROW, so compute them before the pair join: the naive
    // cosine-per-pair recomputes both norms for every candidate (3
    // interpreted array folds/pair instead of 1)
    val e = emb.select(col(blockCol).as("blk"), col(idCol).as("id"),
      col(vecCol).as("v"), V.norm(col(vecCol)).as("nrm"))
    val d = V.dot(col("a.v"), col("b.v"))
    val nn = col("a.nrm") * col("b.nrm")
    e.as("a").join(e.as("b"),
        col("a.blk") === col("b.blk") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        round(when(nn > 0.0, d / nn).otherwise(lit(0.0)), 6).as("cos"))
      .filter(col("cos") >= tau)
  }
}
