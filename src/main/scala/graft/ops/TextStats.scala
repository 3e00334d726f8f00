package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Text

/** Corpus-level term statistics: document frequency and tf-idf term
  * ranking — the primitives behind keyword extraction, stopword
  * discovery, and contamination screens over a training corpus.
  *
  * Shape at scale: one explode of the token array, one (doc, term)
  * aggregation (shuffle on doc — bounded by corpus size), one term
  * aggregation for document frequency (shuffle on term — bounded by
  * vocabulary), and a broadcast of the corpus size. The document-
  * frequency side is vocabulary-sized, so it broadcasts back onto the
  * (doc, term) side instead of shuffling the corpus again.
  *
  * Idf is the LINEAR form N/df, not log(N/df): every score is then one
  * IEEE division of exact integers — bit-identical across engines (a
  * requirement of the DuckDB hash-compare; `ln` carries no
  * correct-rounding guarantee). Rankings only need idf to be monotonic
  * in 1/df, which both forms are.
  */
object TextStats {

  /** (doc, term) term frequencies over normalized whitespace tokens.
    * explode_OUTER: a non-outer explode triggers InferFiltersFromGenerate,
    * which duplicates the whole tokenization into a scan-level
    * `size(split(...)) > 0` filter — one extra evaluation per row
    * (split never returns an empty array, so outer ≡ inner here). */
  def termFrequencies(docs: DataFrame, idCol: String = "doc_id",
                      textCol: String = "text"): DataFrame =
    docs.select(col(idCol).as("id"), Text.tokens(col(textCol)).as("toks"))
      .select(col("id"), explode_outer(col("toks")).as("term"))
      // a NULL text row survives explode_outer as a null term — drop it
      // explicitly (the filter sits on the generator OUTPUT attribute,
      // so it cannot be substituted down into the tokenization)
      .filter(col("term").isNotNull)
      .groupBy(col("id"), col("term"))
      .agg(count(lit(1)).as("tf"))

  /** Simpson lexical-diversity card (Simpson 1949, "Measurement of
    * diversity") — the ENTROPY-FREE repetition/diversity signal: per
    * doc, the probability two tokens drawn without replacement are the
    * SAME type is Σ c·(c−1) / (n·(n−1)); diversity = 1 − that.
    * Shannon entropy needs log (banned by the exactness discipline —
    * not bit-replayable cross-engine); Simpson's index is the standard
    * rational-arithmetic substitute and ranks docs near-identically
    * for the repetition-filter use case. All-integer numerators (exact
    * at any doc length), ONE final division.
    *
    * Scale: the [[termFrequencies]] pass (tokenize once, one hash agg)
    * plus a per-doc sum — map-side combinable throughout.
    *
    * @return (id, n_tokens, n_types, rep_pairs = Σ c(c−1), diversity)
    *         for docs with ≥ 2 tokens */
  def simpsonDiversity(docs: DataFrame, idCol: String = "doc_id",
                       textCol: String = "text"): DataFrame =
    termFrequencies(docs, idCol, textCol)
      .groupBy(col("id"))
      .agg(
        sum(col("tf")).cast("long").as("n_tokens"),
        count(lit(1)).cast("long").as("n_types"),
        sum(col("tf") * (col("tf") - 1)).cast("long").as("rep_pairs"))
      .filter(col("n_tokens") >= 2)
      .withColumn("diversity",
        lit(1.0) - col("rep_pairs").cast("double") /
          (col("n_tokens") * (col("n_tokens") - 1)).cast("double"))

  /** Per-term document frequency (number of docs containing the term). */
  def documentFrequency(docs: DataFrame, idCol: String = "doc_id",
                        textCol: String = "text"): DataFrame =
    termFrequencies(docs, idCol, textCol)
      .groupBy(col("term")).agg(count(lit(1)).as("df"))

  /** Top-k terms per document by tf-idf (linear idf). Ranking ties break
    * by term ascending. Output: (id, term, tf, df, tfidf, rank).
    *
    * Single corpus pass: df is a window count over the tf rows
    * (one row per (doc, term), so rows-per-term IS the document
    * frequency) rather than a second `termFrequencies` pass — the
    * tokenize+explode+aggregate chain, the expensive part, runs once.
    * The term-partitioned window shuffles the already-aggregated tf
    * rows (far smaller than the raw corpus the two-pass form re-scans);
    * the vocabulary never materializes as a separate join side. */
  def tfidfTopK(docs: DataFrame, k: Int, idCol: String = "doc_id",
                textCol: String = "text"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val tf = termFrequencies(docs, idCol, textCol)
    val n = docs.select(count(lit(1)).as("n_docs"))
    val scored = tf
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("term"))))
      .crossJoin(broadcast(n))
      .withColumn("tfidf",
        col("tf").cast("double") * col("n_docs") / col("df"))
    val w = Window.partitionBy(col("id"))
      .orderBy(col("tfidf").desc, col("term").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("id"), col("term"), col("tf"), col("df"),
        col("tfidf"), col("rank"))
  }

  /** Corpus unigram model: top-`vocabSize` tokens by frequency (ties →
    * token ascending) with their corpus probability c/N. One
    * tokenize+explode+agg pass, vocabulary-sized TakeOrdered extraction
    * — the "train" half of the CCNet-style lexical-likelihood filter.
    * Returns the model as a driver-local (term → prob) map plus the
    * total token count (the model is V entries — driver-sized by
    * definition, like the PQ codebooks). */
  def unigramModel(docs: DataFrame, vocabSize: Int,
                   textCol: String = "text"): (Seq[(String, Double)], Long) = {
    require(vocabSize >= 1, s"vocabSize must be >= 1, got $vocabSize")
    // persist the vocabulary-sized counts: total + top-V are two
    // consumers, and without it each re-runs the corpus tokenize pass
    // (the sourceDrift convention; released here, model in hand)
    val counts = docs
      .select(explode_outer(Text.tokens(col(textCol))).as("term"))
      .filter(col("term").isNotNull)
      .groupBy(col("term")).agg(count(lit(1)).as("c"))
      .persist()
    try {
      val total = counts.agg(sum(col("c"))).head().getLong(0)
      val vocab = counts.orderBy(col("c").desc, col("term").asc)
        .limit(vocabSize).collect()
        .map(r => r.getString(0) -> r.getLong(1).toDouble / total.toDouble)
      (vocab.toSeq, total)
    } finally { counts.unpersist(); () }
  }

  /** Per-doc lexical likelihood under a unigram model — the ln-free
    * analog of unigram perplexity (the same linear-vs-log choice as
    * tfidf's idf: `ln` has no cross-engine correct-rounding guarantee,
    * so the score is the MEAN TOKEN PROBABILITY — each term one exact
    * IEEE division c/N, summed in document order — plus the
    * out-of-vocabulary fraction, the strongest single gibberish
    * signal). Monotone ranking for quality filtering either way.
    *
    * Scoring is ONE map-only projection: the model rides along as a
    * single `typedlit` map constant (no join, no shuffle — the 100 TB
    * shape), the per-doc fold runs left-to-right over the token array,
    * and every output is exact-integer arithmetic plus one division.
    * Output: (id, n_toks, oov_frac, mean_tok_prob). */
  def unigramScores(docs: DataFrame, vocab: Seq[(String, Double)],
                    idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame = {
    val model = typedlit(vocab.toMap)
    // NULL-text docs are dropped (an unnest-based SQL mirror produces no
    // rows for them; emitting a null-scored row here would break parity)
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol).as("id"), Text.tokens(col(textCol)).as("toks"))
      .select(col("id"), size(col("toks")).as("n_toks"),
        size(filter(col("toks"), t => element_at(model, t).isNull))
          .as("n_oov"),
        aggregate(col("toks"), lit(0.0d),
          (acc, t) => acc + coalesce(element_at(model, t), lit(0.0d)))
          .as("sp"))
      .select(col("id"), col("n_toks").cast("long").as("n_toks"),
        round(col("n_oov").cast("double") / col("n_toks"), 6).as("oov_frac"),
        round(col("sp") / col("n_toks"), 6).as("mean_tok_prob"))
  }

  /** Pairwise corpus drift between source slices: total-variation
    * distance between per-source unigram distributions — the mixture-
    * monitoring number behind "did this month's crawl change?" and
    * "how far apart are these two domains?".
    *
    * TV(a,b) = ½ Σ_t |ca/Na − cb/Nb| is computed with exact integer
    * cross-multiplication: Σ |ca·Nb − cb·Na| / (2·Na·Nb). Integer sums
    * are order-free, so the aggregate is hash-stable across engines
    * with ONE final IEEE division — no per-term fp accumulation (the
    * same exactness discipline as tfidf's linear idf). Terms missing
    * from one side never need a full-outer join: their mass is
    * recovered from the totals, Σ_{t∉b} ca·Nb = Nb·(Na − Σ_{t∈both} ca),
    * so the only term-keyed exchange is an inner self-join of the
    * (source, term) counts — vocabulary-sized, ≤ #sources rows per key.
    * Products go through decimal(38,0) (exact to 38 digits; bigint
    * would overflow once per-source token counts pass ~3·10⁹ at equal
    * vocab scale — the 100 TB regime).
    *
    * Output: (src_a, src_b, shared_terms, tv_dist) for every unordered
    * source pair, tv_dist ∈ [0,1]. */
  def sourceDrift(docs: DataFrame, srcCol: String = "source",
                  textCol: String = "text"): DataFrame = {
    // (src, term) counts are vocabulary-sized, but their lineage is the
    // full tokenize+explode+agg corpus pass — and counts feeds BOTH
    // self-join sides plus the totals (the unpersisted plan re-scans the
    // corpus six times). Persist the small aggregate; the session's
    // clearCache between queries releases it (the q_corpus_pipeline
    // convention for multi-consumer intermediates).
    val counts = docs
      .select(col(srcCol).as("src"),
        explode_outer(Text.tokens(col(textCol))).as("term"))
      .filter(col("term").isNotNull)
      .groupBy(col("src"), col("term")).agg(count(lit(1)).as("c"))
      .persist()
    val totals = counts.groupBy(col("src")).agg(sum(col("c")).as("n"))
    def dec(c: Column) = c.cast("decimal(19,0)")
    val joined = counts.as("a")
      .join(counts.as("b"),
        col("a.term") === col("b.term") && col("a.src") < col("b.src"))
      .select(col("a.src").as("src_a"), col("b.src").as("src_b"),
        col("a.c").as("ca"), col("b.c").as("cb"))
      .join(broadcast(totals.select(col("src").as("src_a"), col("n").as("na"))), Seq("src_a"))
      .join(broadcast(totals.select(col("src").as("src_b"), col("n").as("nb"))), Seq("src_b"))
      .groupBy(col("src_a"), col("src_b"), col("na"), col("nb"))
      .agg(count(lit(1)).as("shared_terms"),
        sum(abs(dec(col("ca")) * dec(col("nb")) - dec(col("cb")) * dec(col("na"))))
          .as("s_abs"),
        sum(col("ca")).as("s_ca"), sum(col("cb")).as("s_cb"))
    // every pair appears even with zero shared terms (TV = 1 there)
    val pairs = totals.select(col("src").as("src_a"), col("n").as("na"))
      .crossJoin(totals.select(col("src").as("src_b"), col("n").as("nb")))
      .filter(col("src_a") < col("src_b"))
    pairs.join(joined, Seq("src_a", "src_b", "na", "nb"), "left")
      .select(col("src_a"), col("src_b"),
        coalesce(col("shared_terms"), lit(0L)).as("shared_terms"),
        round(
          (coalesce(col("s_abs").cast("double"), lit(0.0))
            + col("nb").cast("double") * (col("na") - coalesce(col("s_ca"), lit(0L))).cast("double")
            + col("na").cast("double") * (col("nb") - coalesce(col("s_cb"), lit(0L))).cast("double"))
          / (lit(2.0) * col("na").cast("double") * col("nb").cast("double")), 6)
          .as("tv_dist"))
  }

  /** Cross-document DUPLICATED-SPAN accounting — the distributable form
    * of suffix-array substring dedup (Lee et al. 2022, "Deduplicating
    * Training Data Makes Language Models Better"): a span of `spanLen`
    * consecutive tokens that appears in ≥2 distinct documents is
    * boilerplate/memorization risk; a doc's `dup_frac` (duplicated ÷
    * total distinct spans) is the filter signal.
    *
    * A true suffix array is a global sort over the corpus — hostile to
    * a shared-nothing engine. Fixed-length span hashing keeps the
    * recall property that matters (any duplicated substring of length
    * ≥ spanLen contains a duplicated spanLen-gram) while the corpus is
    * TOKENIZED ONCE: per-doc distinct spans explode onto one span-keyed
    * exchange, the per-span doc count is a window over that same
    * exchange (the tfidf df trick — a groupBy+join would re-scan and
    * re-tokenize the corpus for the count side), then one re-aggregate
    * by doc. Hot boilerplate spans cost their row count, never a join
    * blowup; the honest residual is a straggler (a span in 10⁸ docs is
    * one window partition — linear, but one task).
    *
    * `hotSpanGuard = true` takes the two-scan trade: the per-span doc
    * count becomes a groupBy(h) aggregate (map-side partial — a
    * universal span reduces to one counter per map task, never one
    * window partition) joined back onto the persisted span table; the
    * join is AQE-skew-splittable. Costs a second exchange of the span
    * table on benign corpora, hence opt-in. The guard path persists the
    * span table (caller owns `spark.catalog.clearCache()`, the
    * [[graft.ops.Dedup.ngramJaccard]] convention).
    *
    * Output: (id, n_spans, n_dup_spans, dup_frac); docs with fewer than
    * spanLen tokens have no spans and produce no row. */
  def duplicatedSpans(docs: DataFrame, spanLen: Int,
                      idCol: String = "doc_id",
                      textCol: String = "text",
                      hotSpanGuard: Boolean = false): DataFrame = {
    val sp = docs.filter(col(textCol).isNotNull)
      .select(col(idCol).as("id"), Text.tokens(col(textCol)).as("toks"))
      .select(col("id"), explode(array_distinct(
        Text.shinglesFromTokens(col("toks"), spanLen))).as("span"))
      .select(col("id"), Text.hash64(col("span"), 0).as("h"))
    // rows are (doc, span)-distinct, so count per span = #docs
    val counted =
      if (!hotSpanGuard)
        sp.withColumn("n_docs",
          count(lit(1)).over(Window.partitionBy(col("h"))))
      else {
        // only df ≥ 2 matters downstream, so the count dictionary is
        // filtered BEFORE the join — corpus-cardinality → the (small)
        // duplicated-span set, which broadcasts; a left-join miss means
        // df = 1 (the null n_docs fails the ≥2 test below). Without the
        // filter the join is a corpus-scale sort-merge (measured 5×
        // the window's cost); with it, AQE broadcast/skew handles both
        // the benign and the hot-template corpus
        val spP = sp.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        spP.join(
          spP.groupBy(col("h")).agg(count(lit(1)).as("n_docs"))
            .filter(col("n_docs") >= 2),
          Seq("h"), "left")
      }
    counted
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(when(col("n_docs") >= 2, 1L).otherwise(0L)).as("n_dup_spans"))
      .select(col("id"), col("n_spans"), col("n_dup_spans"),
        round(col("n_dup_spans").cast("double") / col("n_spans"), 6)
          .as("dup_frac"))
  }

  /** Corpus bigram model: top-`vocabSize` bigrams by frequency (ties →
    * bigram ascending) scored as the bigram MLE c(w1 w2) / c(w1·) where
    * c(w1·) = Σ_w2 c(w1 w2) is w1's count as a bigram PREFIX — the
    * second-order companion of [[unigramModel]]. ONE corpus tokenize
    * pass builds the bigram counts; the prefix denominators are a
    * second aggregate over that DISTINCT-BIGRAM table (vocabulary-
    * sized, never the corpus again). The model is V entries —
    * driver-sized by definition. */
  def bigramModel(docs: DataFrame, vocabSize: Int,
                  textCol: String = "text"): Seq[(String, Double)] = {
    require(vocabSize >= 1, s"vocabSize must be >= 1, got $vocabSize")
    // persist the distinct-bigram counts (vocabulary-sized): the top-V
    // extraction and the prefix-sum aggregate are two consumers, and
    // without it each re-runs the corpus tokenize pass
    val bcnt = docs.filter(col(textCol).isNotNull)
      .select(Text.tokens(col(textCol)).as("toks"))
      .select(explode(Text.shinglesFromTokens(col("toks"), 2)).as("bg"))
      .groupBy(col("bg")).agg(count(lit(1)).as("c"))
      .persist()
    try {
      val big = bcnt
        .orderBy(col("c").desc, col("bg").asc).limit(vocabSize).collect()
        .map(r => (r.getString(0), r.getLong(1)))
      val firsts = big.map(_._1.split(' ')(0)).distinct.toSeq
      val prefix = bcnt
        .select(substring_index(col("bg"), " ", 1).as("w"), col("c"))
        .filter(col("w").isin(firsts: _*))
        .groupBy(col("w")).agg(sum(col("c")).as("c")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      big.map { case (bg, c) =>
        bg -> c.toDouble / prefix(bg.split(' ')(0)).toDouble
      }.toSeq
    } finally { bcnt.unpersist(); () }
  }

  /** Per-doc fluency under a bigram model — catches scrambled or
    * concatenated text that unigram stats can't see (every token
    * common, no two adjacent ones likely). Same exactness discipline
    * as [[unigramScores]]: each model entry is ONE IEEE division of
    * exact integer counts, the per-doc fold runs left-to-right, and
    * scoring is one map-only projection with the model riding as a
    * `typedlit` map constant (no join, no shuffle — the 100 TB shape).
    *
    * Output: (id, n_bigrams, hit_frac, mean_cond_prob); docs with
    * fewer than 2 tokens have no bigrams and produce no row. */
  def bigramScores(docs: DataFrame, model: Seq[(String, Double)],
                   idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame = {
    val m = typedlit(model.toMap)
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol).as("id"), Text.tokens(col(textCol)).as("toks"))
      .select(col("id"), Text.shinglesFromTokens(col("toks"), 2).as("bgs"))
      .filter(size(col("bgs")) >= 1)
      .select(col("id"), size(col("bgs")).as("n_bigrams"),
        size(filter(col("bgs"), b => element_at(m, b).isNull)).as("n_miss"),
        aggregate(col("bgs"), lit(0.0d),
          (acc, b) => acc + coalesce(element_at(m, b), lit(0.0d))).as("sp"))
      .select(col("id"), col("n_bigrams").cast("long").as("n_bigrams"),
        round(lit(1.0) - col("n_miss").cast("double") / col("n_bigrams"), 6)
          .as("hit_frac"),
        round(col("sp") / col("n_bigrams"), 6).as("mean_cond_prob"))
  }

  /** Windowed word CO-OCCURRENCE with a linear PMI score — the
    * GloVe/PPMI preparation pass: unordered word pairs within ±`window`
    * token positions, scored pmi_lin = c_ab·N / (c_a·c_b) (the exact
    * PMI ratio WITHOUT the log — monotone in PMI, so ranking and
    * thresholds agree, and ln-free keeps the score bit-identical
    * across engines, the tfidf/unigram convention).
    *
    * Pair generation is MAP-ONLY and corpus-LINEAR: position i pairs
    * with i+1..i+window via `window` shifted zip_with passes over each
    * doc's token array — never a positions self-join, whose per-doc
    * equi-join fan-out would be len² before any distance filter. Total
    * pair volume = tokens × window, one pair-keyed exchange with
    * map-side partial counts; hot words (stopwords) inflate counts,
    * not fan-out — there is no join to explode. `minCount`/`minPair`
    * trim the tail AFTER aggregation. The token table feeds three
    * consumers — persisted MEMORY_AND_DISK, caller-owned lifetime
    * (clearCache between units of work, the tokenTable convention). */
  def cooccurrence(docs: DataFrame, window: Int, minCount: Long,
                   minPair: Long, textCol: String = "text"): DataFrame =
    cooccurrenceTokens(
      docs.select(Text.tokens(col(textCol)).as("ts")),
      window, minCount, minPair, tokensCol = "ts")

  /** [[cooccurrence]] over a PRE-TOKENIZED corpus (`tokensCol` is an
    * array&lt;string&gt; column): pipelines that already hold a token
    * table (tokenizer training, packing, dedup shingling) feed it here
    * directly instead of paying a second tokenize-and-persist of the
    * raw text — the same one-pass persist then applies to the shared
    * token table, not a private copy. */
  def cooccurrenceTokens(docs: DataFrame, window: Int, minCount: Long,
                         minPair: Long, tokensCol: String): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    val toks = docs.select(col(tokensCol).as("ts"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pairs = (1 to window).map { k =>
      toks.select(explode(zip_with(col("ts"),
          slice(col("ts"), lit(k + 1), greatest(size(col("ts")) - k, lit(0))),
          (a, b) => struct(a.as("x"), b.as("y")))).as("pr"))
        .filter(col("pr.y").isNotNull) // zip_with pads the shifted side
    }.reduce(_ unionAll _)
    val pc = pairs
      .select(least(col("pr.x"), col("pr.y")).as("w1"),
        greatest(col("pr.x"), col("pr.y")).as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= minPair)
    val wc = toks.select(explode(col("ts")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val tot = toks.agg(coalesce(sum(size(col("ts"))), lit(0))
      .cast("long").as("n_tokens"))
    pc.join(wc.select(col("w").as("w1"), col("c").as("c_a")), "w1")
      .join(wc.select(col("w").as("w2"), col("c").as("c_b")), "w2")
      .filter(col("c_a") >= minCount && col("c_b") >= minCount)
      .crossJoin(tot) // 1-row totals, the q_funnel_steps base shape
      .select(col("w1"), col("w2"), col("c_ab"), col("c_a"), col("c_b"),
        round(col("c_ab").cast("double") * col("n_tokens")
          / (col("c_a").cast("double") * col("c_b")), 6).as("pmi_lin"))
  }

  /** The Robertson/Lucene BM25 idf table — `ln((N − df + ½)/(df + ½)
    * + 1)` for every df the capped postings can carry (1..maxDf).
    * Computed ONCE on the driver and shipped to both engines as DATA
    * (a broadcast join here, an exported parquet side-table for the
    * oracle): `ln` has no cross-engine correct-rounding guarantee, so
    * it must never run inside either engine's expression evaluator —
    * the table form makes every downstream float op plain IEEE
    * +,*,/ (this file's header discipline). maxDf+1 rows: df-capped
    * postings make the domain tiny by construction. */
  def bm25IdfRows(nDocs: Long, maxDf: Long): Seq[(Long, Double)] =
    (1L to maxDf).map(df =>
      df -> math.log((nDocs - df + 0.5) / (df + 0.5) + 1.0))

  /** BM25 more-like-this retrieval: score every corpus document
    * sharing ≥1 capped-df term with a query document, top-`k` per
    * query — the lexical complement to the embedding-space
    * hard-negative mining ([[graft.ops.Ann]]): BM25 surfaces the
    * near-misses that SHARE WORDS but differ in meaning.
    *
    * score(q, d) = Σ_{t ∈ q ∩ d} idf(df_t) · tf_td(k1+1) /
    *                (tf_td + k1(1 − b + b·dl_d/avgdl))
    *
    * Plan shape at 100 TB ([[ngramCandidates]]' postings discipline):
    * one explode+agg builds (doc, term, tf); document frequency is a
    * vocabulary-sized agg; terms with df > `maxDf` are DROPPED — a
    * stop-term's posting list would put df·|queries| candidate rows
    * under one key, and a term that frequent separates nothing (the
    * classic BM25 stop-list, made explicit). The query side (≤ a few
    * hundred capped terms per query doc) broadcasts onto the postings
    * scan, so candidates are bounded by |query terms| × maxDf — never
    * a corpus×corpus join. The per-pair sum folds in TERM ORDER
    * (sort_array + aggregate) so the float total is deterministic and
    * engine-portable. Ranking uses the full-precision score;
    * `bm25` in the output is rounded for the compare. */
  def bm25TopK(docs: DataFrame, queryIds: DataFrame, k: Int,
               k1: Double = 1.2, b: Double = 0.75, maxDf: Long = 100,
               idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = docs.sparkSession
    val nDocs = docs.count() // one scalar, the model-sized driver action
    import spark.implicits._
    val idf = broadcast(bm25IdfRows(nDocs, maxDf).toDF("df", "idf"))
    val tf = termFrequencies(docs, idCol, textCol)
      .persist() // corpus side + df + dl + query side all read it once
    val dl = tf.groupBy(col("id")).agg(sum(col("tf")).as("dl"))
    val stats = dl.agg(
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    val dfq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
    val qt = tf.join(queryIds.select(col(idCol).as("id")), Seq("id"))
      .select(col("id").as("q_id"), col("term"))
    val cand = qt
      .join(dfq.hint("broadcast"), Seq("term"))
      .join(idf, Seq("df"))
      .join(tf.select(col("id").as("doc_id"), col("term"), col("tf")), Seq("term"))
      .filter(col("q_id") =!= col("doc_id"))
      .join(dl.select(col("id").as("doc_id"), col("dl")), Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .select(col("q_id"), col("doc_id"), col("term"),
        (col("idf") * (col("tf").cast("double") * lit(k1 + 1.0)) /
          (col("tf").cast("double") + lit(k1) *
            (lit(1.0 - b) + lit(b) * col("dl").cast("double") / col("avgdl"))))
          .as("c"))
    val scored = cand
      .groupBy(col("q_id"), col("doc_id"))
      .agg(aggregate(
        sort_array(collect_list(struct(col("term"), col("c")))),
        lit(0.0),
        (acc, e) => acc + e.getField("c")).as("score"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("doc_id").asc)
    // tf stays persisted with caller-owned lifetime (the ngram
    // signature-table convention): four plan branches read it, and the
    // result is lazy — an unpersist here would discard the cache
    // before anything ran. Verify's between-query clearCache (or the
    // caller's) releases it.
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("doc_id"),
        round(col("score"), 6).as("bm25"), col("rank"))
  }

  /** Distinctive-terms "card" per group (source/domain): for each group,
    * the terms whose in-group vs rest-of-corpus odds ratio is highest —
    * the interpretability pass run over a corpus slice before mixing it
    * into a training set (c-TF-IDF / log-odds family; Monroe, Colaresi &
    * Quinn 2008 "Fightin' Words"). Deliberately LOG-FREE: `ln` has no
    * cross-engine correct-rounding guarantee (file header), so this ranks
    * by the raw odds ratio with Haldane–Anscombe 0.5 smoothing — each
    * factor (count + 0.5) is exactly representable, the products stay
    * under 2^53, and the single IEEE division is bit-identical across
    * engines; log-monotonicity makes the ranking identical to log-odds.
    *
    * Scale: one tokenize+explode pass; (group, term) counts are map-side
    * combinable; per-term totals re-aggregate the ALREADY-collapsed
    * (group, term) rows (≤ vocab × n_groups, far smaller than the
    * corpus); per-group totals and the grand total are broadcast. The
    * final top-k window partitions by group over candidate terms only
    * (n_st ≥ minCount — the df-cap pattern bounding the window input).
    *
    * @return (group, term, n_st, odds, rank): top-k terms per group by
    *         (odds desc, term asc), odds rounded to 6 decimals.
    */
  def distinctiveTerms(docs: DataFrame, groupCol: String,
                       minCount: Long, topK: Int,
                       textCol: String = "text"): DataFrame = {
    val toks = docs
      .select(col(groupCol).as("grp"), Text.tokens(col(textCol)).as("toks"))
      .select(col("grp"), explode_outer(col("toks")).as("term"))
      .filter(col("term").isNotNull && col("term").rlike("^[a-z]{3,}$"))
    val st = toks.groupBy(col("grp"), col("term"))
      .agg(count(lit(1)).as("n_st"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val perTerm = st.groupBy(col("term")).agg(sum(col("n_st")).as("n_t"))
    val perGrp = st.groupBy(col("grp")).agg(sum(col("n_st")).as("n_s"))
    val grand = st.agg(sum(col("n_st")).as("n_all"))
    def d(c: Column): Column = c.cast("double")
    val scored = st.filter(col("n_st") >= minCount)
      .join(perTerm, Seq("term"))
      .join(broadcast(perGrp), Seq("grp"))
      .crossJoin(broadcast(grand))
      .withColumn("odds",
        ((d(col("n_st")) + lit(0.5)) *
          (d(col("n_all") - col("n_s") - (col("n_t") - col("n_st"))) + lit(0.5))) /
        ((d(col("n_s") - col("n_st")) + lit(0.5)) *
          (d(col("n_t") - col("n_st")) + lit(0.5))))
    val w = Window.partitionBy(col("grp"))
      .orderBy(col("odds").desc, col("term").asc)
    // st unpersists with the caller/Verify clearCache (bm25TopK note):
    // three lazy plan branches read it.
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
      .select(col("grp").as(groupCol), col("term"), col("n_st"),
        round(col("odds"), 6).as("odds"), col("rank"))
  }

  /** RAKE keyword extraction (Rose, Engel, Cramer & Cowley 2010,
    * "Automatic keyword extraction from individual documents"), corpus
    * form: candidate phrases are maximal runs of content tokens between
    * boundaries (stopwords or non-alphabetic tokens), capped at
    * `maxPhraseLen` words; word degree = Σ phrase length over the
    * word's phrase occurrences, word frequency = occurrence count; a
    * phrase scores by its words' degree/frequency mass. This
    * implementation uses the RATIO-OF-SUMS variant — score =
    * (Σ_w deg(w)) / (Σ_w freq(w)) over the phrase's words — so the
    * score is ONE division of two exact integer sums (classic RAKE
    * sums per-word ratios, whose float fold order no two engines
    * guarantee; same trade as distinctiveTerms' log-free odds).
    *
    * Scale: one posexplode + one per-doc window (partition bound =
    * one document's token count), two hash aggregations, one join of
    * phrase words against the word-stat table — all map-side
    * combinable; no self-joins, no all-pairs anything.
    *
    * @return top-K (phrase, n, score) by (score desc, n desc, phrase) —
    *         deterministic
    */
  def rakeKeywords(docs: DataFrame, stop: Seq[String], maxPhraseLen: Int,
                   topK: Int, idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame = {
    require(maxPhraseLen >= 1 && topK >= 1)
    val toks = docs.select(col(idCol).as("id"),
      posexplode(graft.functions.Text.tokens(col(textCol))).as(Seq("pos", "term")))
    val marked = toks.withColumn("boundary",
      col("term").isin(stop: _*) || !col("term").rlike("^[a-z]+$"))
    val w = Window.partitionBy(col("id")).orderBy(col("pos"))
    val grouped = marked
      .withColumn("grp", sum(when(col("boundary"), 1L).otherwise(0L)).over(w))
      .filter(!col("boundary"))
    val occ = grouped.groupBy(col("id"), col("grp"))
      .agg(sort_array(collect_list(struct(col("pos"), col("term")))).as("pt"))
      .select(transform(col("pt"), x => x.getField("term")).as("words"))
      .filter(size(col("words")).between(1, maxPhraseLen))
      .select(col("words"), concat_ws(" ", col("words")).as("phrase"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val wordStats = occ
      .select(explode(col("words")).as("term"), size(col("words")).as("len"))
      .groupBy("term")
      .agg(count(lit(1)).cast("long").as("freq"),
        sum(col("len")).cast("long").as("deg"))
    val phrases = occ.groupBy(col("phrase"))
      .agg(count(lit(1)).cast("long").as("n"), first(col("words")).as("words"))
    val scored = phrases
      .select(col("phrase"), col("n"), explode(col("words")).as("term"))
      .join(wordStats, "term")
      .groupBy(col("phrase"), col("n"))
      .agg(sum(col("deg")).as("sd"), sum(col("freq")).as("sf"))
      .select(col("phrase"), col("n"),
        round(col("sd").cast("double") / col("sf").cast("double"), 6).as("score"))
    // occ stays persisted until the caller's action; clearCache convention
    scored.orderBy(col("score").desc, col("n").desc, col("phrase"))
      .limit(topK)
  }

  /** Per-group readability card: Automated Readability Index (Senter &
    * Smith 1967 — chosen over Flesch-Kincaid because it needs NO
    * syllable counting, only characters/words/sentences, so every input
    * to the formula is an exact integer sum and the one double formula
    * at the end is bit-identical across engines). Counting conventions
    * (deterministic, oracle-mirrorable):
    *   - words = [[graft.functions.Text.tokens]] count;
    *   - chars = non-space length of the normalized text, i.e.
    *     `length(norm) − words + 1` (norm joins tokens with single
    *     spaces);
    *   - sentences = occurrences of `.` `!` `?` (clamped to ≥ 1 per
    *     doc — a fragment is one sentence).
    * One map-only projection + one hash aggregation; ARI =
    * 4.71·chars/words + 0.5·words/sentences − 21.43 on the group sums. */
  def readability(docs: DataFrame, groupCol: String,
                  textCol: String = "text"): DataFrame = {
    val norm = graft.functions.Text.normText(col(textCol))
    val words = size(split(norm, " ")).cast("long")
    val noPunct = regexp_replace(col(textCol), "[.!?]", "")
    val sentences = greatest(lit(1L),
      (length(col(textCol)) - length(noPunct)).cast("long"))
    docs
      .select(col(groupCol),
        words.as("w"),
        (length(norm).cast("long") - words + lit(1L)).as("c"),
        sentences.as("s"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"), sum(col("c")).as("chars"),
        sum(col("w")).as("words"), sum(col("s")).as("sentences"))
      .select(col(groupCol), col("n_docs"), col("chars"), col("words"),
        col("sentences"),
        round(lit(4.71) * col("chars").cast("double") / col("words").cast("double")
          + lit(0.5) * col("words").cast("double") / col("sentences").cast("double")
          - lit(21.43), 6).as("ari"))
  }

  /** TextRank chunk salience (Mihalcea & Tarau 2004, "TextRank:
    * Bringing Order into Text", adapted to fixed token windows): rank
    * each document's CHUNKS (consecutive `chunkLen`-token windows — the
    * sentence stand-in for corpora without reliable sentence
    * boundaries, and the same unit [[graft.ops.Pack]] ships to
    * training) by weighted PageRank over the shared-vocabulary graph:
    * edge weight between two chunks of the SAME document = number of
    * distinct tokens they share (the paper's overlap numerator; the
    * log-length normalizer is dropped for cross-engine exactness —
    * rankings under fixed chunk length are unaffected by a
    * near-constant scale).
    *
    * The whole corpus runs as ONE graph: node id = doc_id·65536 +
    * chunk index (chunks beyond 65535 — docs past ~1M tokens at the
    * default length — are dropped loudly by the id-packing filter, on
    * both engines). Per-document components never interact, so one
    * [[Graph.pageRankWeighted]] loop ranks every document's chunks
    * simultaneously — the 100 TB shape: iterations are corpus-wide
    * joins, never a per-document loop.
    *
    * Scale bounds: the edge build joins the distinct (doc, chunk,
    * token) relation with itself on (doc, token) — per-token fan-out is
    * chunks-per-doc², bounded by the document length cap upstream, and
    * `minShared` prunes the long weak tail before the rank loop.
    *
    * @return (doc_id, chunk, rank, n_chunks) — the top-ranked chunk
    *         per document (ties to the smaller chunk index), with the
    *         count of ranked chunks; documents whose chunk graph has no
    *         edge ≥ minShared are absent (no salience signal)
    */
  def centralChunks(docs: DataFrame, idCol: String, textCol: String,
                    chunkLen: Int, minShared: Long, iters: Int,
                    damping: Double = 0.85): DataFrame = {
    require(chunkLen >= 1, "chunkLen must be >= 1")
    val p = docs
      .select(col(idCol).as("doc_id"),
        posexplode_outer(Text.tokens(col(textCol))).as(Seq("pos", "tok")))
      .filter(col("tok") =!= "")
    val ch = p
      .select(col("doc_id"), expr(s"pos div $chunkLen").as("chunk"),
        col("tok"))
      .filter(col("chunk") < 65536)
      .distinct()
    val a = ch.select(col("doc_id"), col("chunk").as("ca"), col("tok"))
    val b = ch.select(col("doc_id"), col("chunk").as("cb"), col("tok"))
    val eg = a.join(b, Seq("doc_id", "tok"))
      .filter(col("ca") =!= col("cb"))
      .groupBy((col("doc_id") * 65536 + col("ca")).as("src"),
        (col("doc_id") * 65536 + col("cb")).as("dst"))
      .agg(count(lit(1)).cast("long").as("w"))
      .filter(col("w") >= minShared)
    val ranks = Graph.pageRankWeighted(eg, "src", "dst", "w", iters, damping)
    val w = Window.partitionBy(col("doc_id"))
    val rk = Window.partitionBy(col("doc_id"))
      .orderBy(col("rank").desc, col("chunk"))
    ranks
      .select(expr("node div 65536").as("doc_id"),
        expr("node % 65536").as("chunk"), col("rank"))
      .withColumn("n_chunks", count(lit(1)).over(w).cast("long"))
      .withColumn("rn", row_number().over(rk))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("chunk"), col("rank"), col("n_chunks"))
  }
}
