package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling harness for the near-dup family (the quadratic-path check the
  * sf0.1 bench cannot expose): builds K-fold corpora from sf0.1 whose
  * DUPLICATE STRUCTURE stays constant while volume grows, then times the
  * capped/LSH paths against their exact forms.
  *
  *  - documents ×K: every token gets a copy-k prefix, so copies share no
  *    grams (per-gram df constant ⇒ honest linear growth), EXCEPT a stop
  *    sentence appended to EVERY doc after prefixing — its grams' df is
  *    the full corpus size n·K, planting exactly the Σdf² blowup
  *    (3·(nK)² join rows) the df cap exists to kill.
  *  - embeddings ×K: copy k is sign-flipped per dimension by a hash
  *    pattern — an orthogonal transform, so intra-copy cosines are
  *    preserved exactly while cross-copy cosines collapse to noise.
  *
  * For the LSH path the bucket width follows the design rule stated on
  * [[graft.ops.Dedup.embeddingNearDup]]: planesPerBand ≈ log2(block/
  * targetBucket) — wider buckets as the corpus grows, keeping per-bucket
  * cost constant so total candidate volume stays ~linear.
  *
  * Usage: runMain graft.BenchScale [maxK]   (writes /root/repo/tmp/scale_*)
  */
object BenchScale {

  private def time[A](f: => A): (Double, A) = {
    val t0 = System.nanoTime()
    val r = f
    ((System.nanoTime() - t0) / 1e9, r)
  }

  def scaledDocs(spark: SparkSession, sfDir: String, k: Int): DataFrame = {
    val base = graft.core.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("text"))
    (0 until k).map { i =>
      base.select(
        (col("doc_id") + lit(i.toLong * 1000000000L)).as("doc_id"),
        col("lang"),
        concat(
          regexp_replace(col("text"), "(\\S+)", s"c$i$$1"),
          lit(" lorem ipsum dolor sit amet")).as("text"))
    }.reduce(_ unionAll _)
  }

  def scaledEmbeddings(spark: SparkSession, sfDir: String, k: Int): DataFrame = {
    val base = graft.core.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label"), col("embedding"))
    (0 until k).map { i =>
      base.select(
        (col("vec_id") + lit(i.toLong * 1000000000L)).as("vec_id"),
        col("label"),
        transform(col("embedding"), (x, j) =>
          (x.cast("double") * (pmod(hash(lit(i), j), lit(2)).cast("double") * 2.0
            - 1.0)).cast("float")).as("embedding"))
    }.reduce(_ unionAll _)
  }

  /** Events ×K by USER duplication: copy k offsets user_id (and
    * event_id, for uniqueness), everything else — timestamps, types,
    * values, the stored ts encoding — passes through untouched. Rows
    * grow K× while every PER-USER series stays its original length, so
    * the per-user windows (rolling-z's cumulative frame, rate-limit's
    * ordered partition) keep constant partition size: the honest shape
    * for event analytics, where production growth is users, not
    * per-user history. Written to parquet so generation cost stays out
    * of the measured operator time; returns the dir the Tables loaders
    * read. */
  def scaledEventsDir(spark: SparkSession, sfDir: String, k: Int): String = {
    val raw = graft.core.Tables.read_events_raw(spark, sfDir)
    val scaled = (0 until k).map { i =>
      raw.select(
        (col("event_id") + lit(i.toLong * 1000000000000L)).as("event_id"),
        col("ts"),
        (col("user_id") + lit(i.toLong * 1000000000L)).as("user_id"),
        col("event_type"), col("value"), col("props"))
    }.reduce(_ unionAll _)
    val dir = s"/root/repo/tmp/scale_events_$k"
    scaled.write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private val EVENT_QUERIES = Seq("q_funnel_steps", "q_funnel_windowed",
    "q_cohort", "q_resample", "q_rate_limit", "q_rolling_z", "q_sessions")

  /** Baskets ×K by ORDER duplication: basket count grows K×, every
    * basket keeps its original item set, item/pair supports grow K× —
    * the honest retail-growth shape. The basket self-join's volume is
    * Σ L_b² over baskets: linear in K when per-basket size is fixed. */
  def scaledBaskets(spark: SparkSession, sfDir: String, k: Int): DataFrame = {
    val base = graft.core.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey"))
    (0 until k).map { i =>
      base.select((col("l_orderkey") + lit(i.toLong * 1000000000L)).as("basket"),
        col("l_partkey").as("item"))
    }.reduce(_ unionAll _)
  }

  /** K disjoint copies of the co-purchase graph: both basket AND item
    * ids shift per copy, so |V| and |E| scale ×K (order duplication
    * alone keeps the DISTINCT pair set constant — it grows support, not
    * structure). */
  def scaledGraphBaskets(spark: SparkSession, sfDir: String, k: Int): DataFrame = {
    val base = graft.core.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey"))
    (0 until k).map { i =>
      base.select((col("l_orderkey") + lit(i.toLong * 1000000000L)).as("basket"),
        (col("l_partkey") + lit(i.toLong * 1000000000L)).as("item"))
    }.reduce(_ unionAll _)
  }

  def main(args: Array[String]): Unit = {
    val maxK = if (args.nonEmpty) args(0).toInt else 4
    // optional families filter: `runMain graft.BenchScale 32 events`
    // ladders ONLY the event-analytics family; `… 32 r8` ladders only
    // the basket-pairs + co-occurrence family (the full docs/embeddings
    // sweep costs ~25 min at K=32 and is unchanged by those additions)
    val eventsOnly = args.lift(1).contains("events")
    val r8Only = args.lift(1).contains("r8")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("WARN")

    // event-analytics ladder over K-duplicated users — all designed
    // ~linear: funnel = chained shrinking min-aggs (never a per-user
    // sort), cohort = two hash aggs, resample = per-user-bounded grid
    // explode, rate-limit/sessions = one window over constant-size user
    // partitions, rolling-z = one cumulative per-user window (straggler
    // bound = ONE user's history length, constant under user
    // duplication — the documented q_rolling_z bound)
    def eventsLadder(): Unit =
      Iterator.iterate(1)(_ * 2).takeWhile(_ <= maxK).foreach { k =>
        val evDir = scaledEventsDir(spark, sfDir, k)
        val nEv = spark.read.parquet(s"$evDir/events.parquet").count()
        val fields = EVENT_QUERIES.map { name =>
          val (t, _) = time(SparkEntry.queries(name)(spark, evDir).count())
          spark.catalog.clearCache()
          s""""${name.stripPrefix("q_")}_sec":${f"$t%.2f"}"""
        }
        println(s"""{"k":$k,"events":$nEv,${fields.mkString(",")}}""")
      }
    // basket-pairs + co-occurrence ladder: copurchase baskets grow by
    // ORDER duplication (per-basket size fixed ⇒ self-join volume
    // linear); cooccur runs on the prefixed doc copies whose appended
    // stop sentence makes its words' counts n·K — the map-only pair
    // generation has NO join to explode, so the curve must stay linear
    // exactly where a positions self-join would go hot-key-quadratic
    def r8Ladder(): Unit =
      Iterator.iterate(1)(_ * 2).takeWhile(_ <= maxK).foreach { k =>
        val bPath = s"/root/repo/tmp/scale_baskets_$k"
        scaledBaskets(spark, sfDir, k).write.mode("overwrite").parquet(bPath)
        val baskets = spark.read.parquet(bPath)
        val nb = baskets.count()
        // thresholds scale WITH K: duplication multiplies every support
        // by K, so fixed cutoffs would stop filtering at K ≥ 2 and the
        // output would jump from 3.6k pairs to every co-occurring pair
        // (1.2M) — K-scaled cutoffs keep selectivity, and therefore the
        // measured work, structurally constant per input row
        val (tCop, nCop) = time(graft.ops.Baskets.frequentPairs(
          baskets, "basket", "item",
          minItemSupport = 5L * k, minPairSupport = 2L * k).count())
        spark.catalog.clearCache()
        val dPath = s"/root/repo/tmp/scale_docs_r8_$k"
        scaledDocs(spark, sfDir, k).write.mode("overwrite").parquet(dPath)
        val docs = spark.read.parquet(dPath)
        val ndoc = docs.count()
        val (tPmi, nPmi) = time(graft.ops.TextStats.cooccurrence(
          docs, window = 2, minCount = 5, minPair = 3).count())
        spark.catalog.clearCache()
        println(s"""{"k":$k,"basket_rows":$nb,"docs":$ndoc,""" +
          s""""copurchase_sec":${f"$tCop%.2f"},"copurchase_pairs":$nCop,""" +
          s""""cooccur_sec":${f"$tPmi%.2f"},"cooccur_pairs":$nPmi}""")
      }
    // edit-distance near-dup ladder (`… 32 editdup`): the family whose
    // cost model — candidates ∝ PLANTED pairs, not n²/buckets — was
    // asserted from a single measured point. scaledDocs holds near-dup
    // density constant: every copy keeps the base corpus's internal
    // near-dup structure (tokens deterministically prefixed per copy,
    // so within-copy signature geometry is preserved) while cross-copy
    // docs share almost no tokens (hamming ~half the bits, far above
    // the bound). Linear pairs/sec in K plus ~zero cross-copy
    // candidates is the banded regime holding; superlinear growth or
    // cross-copy leakage is the n²/buckets failure the 12-bit-chunk
    // choice exists to prevent.
    def editdupLadder(): Unit =
      Iterator.iterate(1)(_ * 2).takeWhile(_ <= maxK).foreach { k =>
        val dPath = s"/root/repo/tmp/scale_docs_ed_$k"
        scaledDocs(spark, sfDir, k).write.mode("overwrite").parquet(dPath)
        val docs = spark.read.parquet(dPath)
        val ndoc = docs.count()
        def ascii(c: org.apache.spark.sql.Column) =
          regexp_replace(c, "[^\\p{ASCII}]", "?")
        // headline: the full q_editdup shape (band → hamming ≤ 3 →
        // thresholded banded-DP levenshtein verify on survivors only)
        val (tEd, nVer) = time {
          val cand = graft.ops.Dedup.simhashNearDup(docs, maxHamming = 3)
          // ascii projected once per doc, pre-join (the shipped
          // q_editdup shape — post-join it re-ran per candidate pair)
          val proj = docs.select(col("doc_id"), ascii(col("text")).as("t"))
          cand
            .join(proj.select(col("doc_id").as("id_a"), col("t").as("t_a")), "id_a")
            .join(proj.select(col("doc_id").as("id_b"), col("t").as("t_b")), "id_b")
            .select(levenshtein(col("t_a"), col("t_b"), 40).as("ed"))
            .filter(col("ed") >= 0 && col("ed") <= 40)
            .count()
        }
        spark.catalog.clearCache()
        // cost-model introspection (untimed): candidate volume and the
        // cross-copy leakage that would signal bucket-collision noise
        val cand = graft.ops.Dedup.simhashNearDup(docs, maxHamming = 3)
          .persist()
        val nCand = cand.count()
        val nCross = cand
          .filter(expr("id_a DIV 1000000000") =!= expr("id_b DIV 1000000000"))
          .count()
        cand.unpersist()
        spark.catalog.clearCache()
        println(s"""{"k":$k,"docs":$ndoc,"editdup_sec":${f"$tEd%.2f"},""" +
          s""""verified_pairs":$nVer,"cand_pairs":$nCand,""" +
          s""""cross_copy_cand":$nCross}""")
      }
    // incremental-store ladder (`… 32 edstore`): the steady-state claim
    // on simhashStoreAppend — per-batch cost = batch×(batch+store-probe)
    // — measured directly. A FIXED probe batch (a perturbed copy-0 with
    // fresh ids: near-dups only of the store's copy-0 slice, so the
    // emission/verify term stays ~constant) appends against stores
    // seeded at K× the base corpus. The time curve isolates the
    // store-probe term: linear in store size, never store² — and far
    // below re-running the one-shot editdup over corpus+batch.
    def edStoreLadder(): Unit = {
      val base = graft.core.Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("text"))
      val probe = base.select(
        (col("doc_id") + lit(999000000000L)).as("doc_id"),
        concat(regexp_replace(col("text"), "(\\S+)", "c0$1"),
          lit(" lorem ipsum dolor sit amet zz perturbation")).as("text"))
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      Iterator.iterate(1)(_ * 2).takeWhile(_ <= maxK).foreach { k =>
        val dir = s"/root/repo/tmp/ed_store_$k"
        rm(new java.io.File(dir))
        // seed the store DIRECTLY with signatures (sign + write): the
        // ladder measures the probe append, not the seed's own pairing
        scaledDocs(spark, sfDir, k)
          .select(col("doc_id").as("id"),
            graft.functions.Text.simhash(col("text")).as("sh"),
            lit("a_seed").as("tag"))
          .write.mode("overwrite").parquet(dir)
        val nStore = spark.read.parquet(dir).count()
        val (t, nEmit) = time(
          graft.ops.Dedup.simhashStoreAppend(probe, dir, "b_probe").count())
        spark.catalog.clearCache()
        println(s"""{"k":$k,"store_docs":$nStore,"probe_docs":5000,""" +
          s""""append_sec":${f"$t%.2f"},"emitted_pairs":$nEmit}""")
      }
    }
    // ANN ladder (`… 32 ann`): vectors ×K by sign-flip perturbation
    // (scaledEmbeddings), model FROZEN at the base corpus (the FAISS
    // add() lifecycle — additions never retrain), probes fixed. The
    // claims under test, each a curve not a single point:
    //  - encode (writeIndex) and brute-force top-k are corpus-linear
    //    (map-only encode; one broadcast-join scan for brute);
    //  - the STORED-index probe reads only the probed cells, so its
    //    cost tracks the nProbe/nCells FRACTION of the corpus —
    //    probe4/probe1 ≈ 4 at every K, and each nProbe series grows
    //    linearly in K (cells grow with the corpus; the fraction is
    //    the lever, the partition-pruned scan is the mechanism);
    //  - exact re-rank over a fixed-size shortlist adds a near-
    //    constant term on top of its shortlist probe.
    def annLadder(): Unit = {
      val dim = 64; val m = 8; val kCode = 16; val nCells = 16
      val baseEmb = graft.core.Tables.embeddings(spark, sfDir)
      val cents = graft.ops.Pq.centroidArray(
        baseEmb.filter(col("vec_id") < nCells)
          .select(col("vec_id").cast("long").as("c_id"),
            expr("transform(embedding, x -> cast(x as double))").as("c_v")),
        dim)
      val cb = graft.ops.Pq.trainResidualCodebooksSampled(baseEmb, cents,
        dim, m, kCode, iters = 2, sampleCap = 512)
      // 200 probes: at the sf0.1 base (2k vectors) a 10-probe set is
      // pure job-launch overhead at every K — the first run's curves
      // were flat because the measured work was milliseconds under
      // ~1 s of scheduling. 200 probes × the K=256 top rung puts the
      // scored-row volume (the actual cost driver) in whole seconds.
      val probes = baseEmb.filter(col("vec_id") < 200)
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      Iterator.iterate(1)(_ * 2).takeWhile(_ <= maxK).foreach { k =>
        val embPath = s"/root/repo/tmp/ann_emb_$k"
        scaledEmbeddings(spark, sfDir, k).write.mode("overwrite").parquet(embPath)
        val emb = spark.read.parquet(embPath)
        val nv = emb.count()
        val idxDir = s"/root/repo/tmp/ann_index_$k"
        rm(new java.io.File(idxDir))
        val (tEnc, _) = time(graft.ops.Pq.writeIndex(
          emb, cents, dim, m, kCode, cb, idxDir))
        val (tBrute, _) = time(
          graft.ops.Ann.bruteTopK(emb, probes, 10).count())
        spark.catalog.clearCache()
        def probeIdx(nProbe: Int, topK: Int = 10) =
          graft.ops.Pq.ivfPqTopKFromIndex(spark, idxDir, probes, topK,
            cents, dim, m, kCode, cb, nProbe)
        val (tP1, _) = time(probeIdx(1).count())
        spark.catalog.clearCache()
        val (tP4, _) = time(probeIdx(4).count())
        spark.catalog.clearCache()
        // nProbe = nCells: the probed fraction is 1.0, so the ADC term
        // runs over the whole corpus — the rung that separates the
        // fraction-proportional compute from the index-scan floor
        val (tP16, _) = time(probeIdx(nCells).count())
        spark.catalog.clearCache()
        val (tRr, _) = time(graft.ops.Ann.rerankExact(
          probeIdx(4, topK = 10), emb, probes, k = 3).count())
        spark.catalog.clearCache()
        println(s"""{"k":$k,"vecs":$nv,"encode_sec":${f"$tEnc%.2f"},""" +
          s""""brute_sec":${f"$tBrute%.2f"},"probe1_sec":${f"$tP1%.2f"},""" +
          s""""probe4_sec":${f"$tP4%.2f"},"probe16_sec":${f"$tP16%.2f"},""" +
          s""""rerank_sec":${f"$tRr%.2f"}}""")
      }
    }
    if (args.lift(1).contains("ann")) {
      // untimed warmup of every measured plan shape (codegen JIT)
      val w = scaledEmbeddings(spark, sfDir, 1).limit(400)
        .persist()
      val dim = 64
      val wc = graft.ops.Pq.centroidArray(
        graft.core.Tables.embeddings(spark, sfDir).filter(col("vec_id") < 4)
          .select(col("vec_id").cast("long").as("c_id"),
            expr("transform(embedding, x -> cast(x as double))").as("c_v")),
        dim)
      val wcb = graft.ops.Pq.trainResidualCodebooksSampled(w, wc,
        dim, 8, 16, iters = 1, sampleCap = 128)
      val wIdx = s"/root/repo/tmp/ann_index_warm"
      graft.ops.Pq.writeIndex(w, wc, dim, 8, 16, wcb, wIdx)
      val wq = w.limit(3)
      graft.ops.Ann.bruteTopK(w, wq, 5).count()
      graft.ops.Pq.ivfPqTopKFromIndex(spark, wIdx, wq, 5,
        wc, dim, 8, 16, wcb, nProbe = 1).count()
      graft.ops.Ann.rerankExact(
        graft.ops.Pq.ivfPqTopKFromIndex(spark, wIdx, wq, 5,
          wc, dim, 8, 16, wcb, nProbe = 1), w, wq, 3).count()
      w.unpersist(); spark.catalog.clearCache()
      annLadder()
      spark.stop(); return
    }
    if (args.lift(1).contains("edstore")) {
      graft.ops.Dedup.simhashStoreAppend(
        scaledDocs(spark, sfDir, 1).limit(300),
        s"/root/repo/tmp/ed_store_warm_${System.nanoTime()}", "w0").count()
      spark.catalog.clearCache()
      edStoreLadder()
      spark.stop(); return
    }
    if (args.lift(1).contains("editdup")) {
      val warm = scaledDocs(spark, sfDir, 1).limit(500)
      graft.ops.Dedup.simhashNearDup(warm, 3).count() // JIT warmup
      spark.catalog.clearCache()
      editdupLadder()
      spark.stop(); return
    }
    if (args.lift(1).contains("r14")) {
      // r14 families ladder. Sketches (HLL registers / CMS cells /
      // quantile histogram): each build is ONE hash aggregation whose
      // output is sketch-sized — time must be corpus-linear and output
      // rows FLAT in K (registers ≤ m, cells ≤ d·w, buckets ≤ range/
      // width: the whole point of a sketch). RA link prediction:
      // disjoint graph copies keep degrees constant ⇒ capped wedge
      // volume linear in |E| (the commonNeighborLinks bound with a
      // weight rider). Assortativity: two broadcast joins + one agg
      // over 2|E| ends — linear by construction.
      import graft.functions.Text
      def docToks(df: DataFrame) = df
        .select(col("doc_id"),
          explode(Text.tokens(col("text"))).as("tok"))
        .filter(col("tok") =!= "")
      val warmD = scaledDocs(spark, sfDir, 1).limit(300)
      graft.ops.Hll.estimate(graft.ops.Hll.registers(
        docToks(warmD).select(col("tok").as("v")), Nil, "v", 256), Nil, 256)
        .count()
      graft.ops.Cms.build(docToks(warmD).select(col("tok").as("v")),
        "v", 4, 1024).count()
      graft.ops.Quantiles.histogram(
        warmD.select(Text.tokenCount(col("text")).cast("long").as("v")),
        "v", 8L).count()
      val warmE = graft.ops.Graph.copurchaseEdges(
        scaledGraphBaskets(spark, sfDir, 1).limit(5000), "basket", "item", 2)
      graft.ops.Graph.resourceAllocationLinks(warmE, "src", "dst", 96, 4)
        .count()
      graft.ops.Graph.degreeAssortativity(warmE, "src", "dst").count()
      spark.catalog.clearCache()
      Iterator.iterate(1)(_ * 2).takeWhile(_ <= maxK).foreach { k =>
        val dPath = s"/root/repo/tmp/scale_docs_r14_$k"
        scaledDocs(spark, sfDir, k).write.mode("overwrite").parquet(dPath)
        val docs = spark.read.parquet(dPath)
        val nDoc = docs.count()
        val toks = docToks(docs).select(col("tok").as("v"))
        val (tHll, nReg) = time(graft.ops.Hll.registers(
          toks, Nil, "v", 256).count())
        spark.catalog.clearCache()
        val (tCms, nCell) = time(graft.ops.Cms.build(
          toks, "v", 4, 1024).count())
        spark.catalog.clearCache()
        val (tHist, nBuck) = time(graft.ops.Quantiles.histogram(
          docs.select(Text.tokenCount(col("text")).cast("long").as("v")),
          "v", 8L).count())
        spark.catalog.clearCache()
        val baskets = scaledGraphBaskets(spark, sfDir, k)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        baskets.count()
        val edges = graft.ops.Graph.copurchaseEdges(baskets, "basket", "item", 5)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val nE = edges.count()
        val (tRa, nRa) = time(graft.ops.Graph.resourceAllocationLinks(
          edges, "src", "dst", 96, 4).count())
        spark.catalog.clearCache()
        edges.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        edges.count()
        val (tAs, _) = time(graft.ops.Graph.degreeAssortativity(
          edges, "src", "dst").count())
        println(s"""{"k":$k,"docs":$nDoc,"edges":$nE,""" +
          s""""hll_sec":${f"$tHll%.2f"},"hll_regs":$nReg,""" +
          s""""cms_sec":${f"$tCms%.2f"},"cms_cells":$nCell,""" +
          s""""hist_sec":${f"$tHist%.2f"},"hist_buckets":$nBuck,""" +
          s""""ra_sec":${f"$tRa%.2f"},"ra_pairs":$nRa,""" +
          s""""assort_sec":${f"$tAs%.2f"}}""")
        spark.catalog.clearCache()
      }
      spark.stop(); return
    }
    if (args.lift(1).contains("r15")) {
      // r15 ladder. Phonetic linkage: K customer copies with
      // copy-DISTINCT names (a "Q<i>" consonant prefix survives the
      // skeleton), so blocks grow in COUNT, not size — duplicating the
      // same names would flood the same skeleton blocks, the quadratic
      // trap the linkage ladder documents. Snapshot diff: two derived
      // snapshots of K-fold orders — one keyed join + one agg, linear.
      // HLL overlap: the corpus scan (register build) is the ONLY
      // data-sized stage; the pair algebra runs on ≤ m-rows-per-group
      // register tables and must be FLAT in K.
      import graft.core.Tables
      def scaledCustPh(k: Int): DataFrame = {
        val base = Tables.customer(spark, sfDir)
          .select(col("c_custkey"), col("c_name"))
        (0 until k).map { i =>
          base.select(
            (col("c_custkey") + lit(i.toLong * 1000000000L)).as("c_custkey"),
            concat(lit(s"Q$i"), col("c_name")).as("c_name"))
        }.reduce(_ unionAll _)
      }
      def dirtyPh(cust: DataFrame) = cust.filter(col("c_custkey") % 3 === 0)
        .select(col("c_custkey").as("d_key"),
          expr("concat(translate(substring(c_name, 1, 8), 'uoe', 'aui'), " +
            "substring(c_name, 9, 200))").as("d_name"))
        .withColumn("blk",
          graft.ops.Linkage.consonantSkeleton(col("d_name")))
      def scaledOrd(k: Int): DataFrame = {
        val base = Tables.orders(spark, sfDir)
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        (0 until k).map { i =>
          base.select(
            (col("o_orderkey") + lit(i.toLong * 1000000000L)).as("o_orderkey"),
            col("o_orderstatus"), col("o_totalprice"))
        }.reduce(_ unionAll _)
      }
      import graft.functions.Text
      // JIT warmup
      val warmC = scaledCustPh(1).limit(1000)
        .withColumn("blk", graft.ops.Linkage.consonantSkeleton(col("c_name")))
      graft.ops.Linkage.blockedBestMatch(dirtyPh(warmC), warmC, Seq("blk"),
        "d_key", "d_name", "c_custkey", "c_name", 3).count()
      val warmO = scaledOrd(1).limit(1000)
      graft.ops.Profile.snapshotDiff(warmO, warmO, "o_orderkey",
        Seq("o_orderstatus", "o_totalprice")).count()
      val warmR = graft.ops.Hll.registers(
        scaledDocs(spark, sfDir, 1).limit(300)
          .select(col("lang"), explode(Text.tokens(col("text"))).as("tok"))
          .filter(col("tok") =!= ""), Seq("lang"), "tok", 256)
      graft.ops.Hll.pairOverlap(warmR, "lang", 256).count()
      spark.catalog.clearCache()
      Iterator.iterate(1)(_ * 2).takeWhile(_ <= maxK).foreach { k =>
        val cust = scaledCustPh(k)
          .withColumn("blk", graft.ops.Linkage.consonantSkeleton(col("c_name")))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val nC = cust.count()
        val (tPh, nMatch) = time(graft.ops.Linkage.blockedBestMatch(
          dirtyPh(cust), cust, Seq("blk"),
          "d_key", "d_name", "c_custkey", "c_name", 3).count())
        spark.catalog.clearCache()
        val ord = scaledOrd(k)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val nO = ord.count()
        val snapA = ord.filter(col("o_orderkey") % 5 =!= 0)
        val snapB = ord.filter(col("o_orderkey") % 7 =!= 0)
          .select(col("o_orderkey"),
            when(col("o_orderkey") % 11 === 0, lit("X"))
              .otherwise(col("o_orderstatus")).as("o_orderstatus"),
            when(col("o_orderkey") % 3 === 0, col("o_totalprice") + 1)
              .otherwise(col("o_totalprice")).as("o_totalprice"))
        val (tSd, _) = time(graft.ops.Profile.snapshotDiff(snapA, snapB,
          "o_orderkey", Seq("o_orderstatus", "o_totalprice")).count())
        spark.catalog.clearCache()
        val toks = scaledDocs(spark, sfDir, k)
          .select(col("lang"), explode(Text.tokens(col("text"))).as("tok"))
          .filter(col("tok") =!= "")
        // build ONCE: the timed block returns the persisted frame so
        // the overlap stage reuses it (a rebuild would double the
        // dominant corpus-sized scan and skew the rung's wall-clock)
        var regs: org.apache.spark.sql.DataFrame = null
        val (tReg, nReg) = time {
          regs = graft.ops.Hll.registers(toks, Seq("lang"), "tok", 256)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          regs.count()
        }
        val (tOv, nPair) = time(
          graft.ops.Hll.pairOverlap(regs, "lang", 256).count())
        println(s"""{"k":$k,"cust":$nC,"matches":$nMatch,""" +
          s""""phonetic_sec":${f"$tPh%.2f"},"orders":$nO,""" +
          s""""snapdiff_sec":${f"$tSd%.2f"},""" +
          s""""hll_build_sec":${f"$tReg%.2f"},"regs":$nReg,""" +
          s""""overlap_sec":${f"$tOv%.2f"},"pairs":$nPair}""")
        spark.catalog.clearCache()
      }
      spark.stop(); return
    }
    if (args.lift(1).contains("r16")) {
      // r16 ladder over K copy-DISJOINT co-purchase graphs (basket and
      // item ids offset per copy): |E| grows ×K while per-node degree,
      // walk length and walks-per-node stay constant, so every stage
      // is designed ~linear — weighted walks (2 joins/hop + the
      // cumulative-weight window over per-src lists of constant size),
      // node2vec (adds the Σdeg candidate rows and the (prev, x)
      // triangle equi-join per hop, both ∝ |E|), and the skip-gram +
      // negative-sampling chain (map-side explode into a
      // vocab-bucketed equi-join; vocab grows ×K but stays
      // model-sized). A superlinear rung here means a shuffle started
      // spilling or a window partition grew — the trap the ladder
      // exists to catch.
      import graft.ops.Graph
      val warmB = scaledGraphBaskets(spark, sfDir, 1).limit(2000)
      val warmE = Graph.copurchaseWeightedEdges(warmB, "basket", "item", 3)
      Graph.deterministicWalksWeighted(warmE, "src", "dst", "w", 2, "w0")
        .count()
      Graph.deterministicWalksNode2vec(warmE, "src", "dst", 2, "w0",
        4L, 1L, 1L, 4L).count()
      Graph.negativeSamples(warmE, "src", "dst", "w", 2, "w0").count()
      spark.catalog.clearCache()
      Iterator.iterate(1)(_ * 2).takeWhile(_ <= maxK).foreach { k =>
        val b = scaledGraphBaskets(spark, sfDir, k)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        b.count()
        var ew: DataFrame = null
        val (tE, nE) = time {
          ew = Graph.copurchaseWeightedEdges(b, "basket", "item", 5)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          ew.count()
        }
        val (tWw, nW) = time(Graph.deterministicWalksWeighted(
          ew, "src", "dst", "w", walkLen = 3, salt = "lw").count())
        val (tN2, _) = time(Graph.deterministicWalksNode2vec(
          ew, "src", "dst", walkLen = 3, salt = "ln",
          pNum = 4L, pDen = 1L, qNum = 1L, qDen = 4L).count())
        val (tNeg, nS) = time(Graph.negativeSamples(
          ew, "src", "dst", "w", numNeg = 2, salt = "ns").count())
        val (tWk, _) = time {
          val walks = Graph.deterministicWalks(ew, "src", "dst", 3, "lp")
          Graph.walkPairs(walks, 3, 1).count()
        }
        println(s"""{"k":$k,"edges":$nE,"edge_build_sec":${f"$tE%.2f"},""" +
          s""""walks":$nW,"weighted_sec":${f"$tWw%.2f"},""" +
          s""""node2vec_sec":${f"$tN2%.2f"},"neg_samples":$nS,""" +
          s""""neg_sec":${f"$tNeg%.2f"},"pairs_sec":${f"$tWk%.2f"}}""")
        spark.catalog.clearCache()
      }
      spark.stop(); return
    }
    if (args.lift(1).contains("graph")) {
      // graph ladder: K disjoint co-purchase graph copies — edge build
      // and per-iteration cost must both track |E| linearly (the loop
      // relation is |E| rows; contributions aggregate map-side first).
      graft.ops.Graph.pageRank(
        graft.ops.Graph.copurchaseEdges(
          scaledGraphBaskets(spark, sfDir, 1).limit(5000),
          "basket", "item", 2), "src", "dst", 1).count() // JIT warmup
      spark.catalog.clearCache()
      Iterator.iterate(1)(_ * 2).takeWhile(_ <= maxK).foreach { k =>
        val baskets = scaledGraphBaskets(spark, sfDir, k)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        baskets.count()
        val edges = graft.ops.Graph.copurchaseEdges(baskets, "basket", "item", 5)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val (tEdge, nE) = time(edges.count())
        val (tPr, _) = time(
          graft.ops.Graph.pageRank(edges, "src", "dst", 3).count())
        val (tKz, _) = time(
          graft.ops.Graph.katzCentrality(edges, "src", "dst", 3).count())
        println(s"""{"k":$k,"edges":$nE,"edge_build_sec":${f"$tEdge%.2f"},"pagerank3_sec":${f"$tPr%.2f"},"katz3_sec":${f"$tKz%.2f"}}""")
        spark.catalog.clearCache()
      }
      spark.stop(); return
    }
    if (args.lift(1).contains("graph2")) {
      // second graph family ladder (r13 ops): triangle counting must be
      // wedge-bounded by the degree orientation (disjoint K copies keep
      // per-node degree constant ⇒ wedge volume linear in K), LPA is one
      // |E| join + one argmax per round, link prediction is center-capped
      // wedges — all three must track |E| linearly.
      val warm = graft.ops.Graph.copurchaseEdges(
        scaledGraphBaskets(spark, sfDir, 1).limit(5000), "basket", "item", 2)
      graft.ops.Graph.triangleCounts(warm, "src", "dst").count() // JIT warmup
      graft.ops.Graph.labelPropagation(warm, "src", "dst", 2).count()
      graft.ops.Graph.commonNeighborLinks(warm, "src", "dst", 96, 4).count()
      spark.catalog.clearCache()
      Iterator.iterate(1)(_ * 2).takeWhile(_ <= maxK).foreach { k =>
        val baskets = scaledGraphBaskets(spark, sfDir, k)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        baskets.count()
        val edges = graft.ops.Graph.copurchaseEdges(baskets, "basket", "item", 5)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val nE = edges.count()
        val (tTri, _) = time(
          graft.ops.Graph.triangleCounts(edges, "src", "dst").count())
        spark.catalog.clearCache()
        edges.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        edges.count()
        val (tLpa, _) = time(
          graft.ops.Graph.labelPropagation(edges, "src", "dst", 3).count())
        spark.catalog.clearCache()
        edges.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        edges.count()
        val (tLp, nP) = time(
          graft.ops.Graph.commonNeighborLinks(edges, "src", "dst", 96, 4).count())
        println(s"""{"k":$k,"edges":$nE,"triangles_sec":${f"$tTri%.2f"},"lpa3_sec":${f"$tLpa%.2f"},"linkpred_sec":${f"$tLp%.2f"},"predicted":$nP}""")
        spark.catalog.clearCache()
      }
      spark.stop(); return
    }
    if (args.lift(1).contains("stats")) {
      // statistical-test ladder over K-duplicated events. The scale
      // claim under test: each statistic is one corpus-scan hash
      // aggregation (to distinct values / per-user aggregates) plus a
      // window over the DISTINCT-VALUE axis only — duplication grows
      // the scan ~linearly while the cents domain (and so the
      // single-partition cumulative pass) stays CONSTANT, so every
      // curve must be ~linear with a flat window share. spearman/
      // wilcoxon additionally grow the per-user relation K-fold (users
      // are offset per copy), exercising the rank-table broadcast path.
      import graft.ops.Stats
      Iterator.iterate(1)(_ * 2).takeWhile(_ <= maxK).foreach { k =>
        val evDir = scaledEventsDir(spark, sfDir, k)
        val ev = graft.core.Tables.events(spark, evDir)
        val cents = (col("value").cast("decimal(18,2)") * 100).cast("long")
        val nEv = ev.count()
        val (tMw, _) = time(Stats.mannWhitney(
          ev.filter(col("event_type").isin("purchase", "error"))
            .select(cents.as("cents"), col("event_type")),
          Seq(), "cents", "event_type = 'purchase'").count())
        spark.catalog.clearCache()
        val (tKs, _) = time(Stats.ksTest(
          ev.filter(col("event_type").isin("purchase", "view"))
            .select(cents.as("cents"), col("event_type")),
          Seq(), "cents", "event_type = 'purchase'").count())
        spark.catalog.clearCache()
        val perUser = ev.groupBy(col("user_id"))
          .agg(count(lit(1)).cast("long").as("n_events"),
            (sum(col("value").cast("decimal(18,2)")) * 100).cast("long")
              .as("cents"))
        val (tSp, _) = time(
          Stats.spearman(perUser, "n_events", "cents").count())
        spark.catalog.clearCache()
        val pairs = ev.groupBy(col("user_id"))
          .agg(sum(when(expr("(ts_us div 86400000000) % 2") === 0, 1L)
              .otherwise(0L)).cast("long").as("x_even"),
            sum(when(expr("(ts_us div 86400000000) % 2") === 1, 1L)
              .otherwise(0L)).cast("long").as("y_odd"))
        val (tWx, _) = time(
          Stats.wilcoxonSignedRank(pairs, "x_even", "y_odd").count())
        spark.catalog.clearCache()
        println(s"""{"k":$k,"events":$nEv,""" +
          s""""mannwhitney_sec":${f"$tMw%.2f"},"ks_sec":${f"$tKs%.2f"},""" +
          s""""spearman_sec":${f"$tSp%.2f"},"wilcoxon_sec":${f"$tWx%.2f"}}""")
      }
      spark.stop(); return
    }
    if (args.lift(1).contains("r13ops")) {
      // r13 additions' ladder — every op is map-only or one hash agg,
      // so each curve must be ~linear in rows with no shuffle growth:
      // blocklist = explode + broadcast probe + bounded agg; simpson =
      // the termFrequencies agg; rendezvous = N md5s per row + one agg;
      // decayed = map-side bucket + one agg (one-shot AND via the
      // additive store).
      import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
      import graft.ops.{Blocklist, Shards, Decay, TextStats}
      val termsDf = {
        import spark.implicits._
        // scaledDocs prefixes corpus tokens with c<i> but appends an
        // UNprefixed "lorem ipsum dolor sit amet" — terms drawn from
        // that suffix guarantee the probe side actually matches, so the
        // rung times real hit aggregation, not just a missed probe
        Seq(("lorem", "infra"), ("ipsum", "infra"), ("dolor sit", "query"),
          ("sit amet", "query"), ("amet", "policy"))
          .toDF("term", "category")
      }
      val warmDocs = scaledDocs(spark, sfDir, 1).limit(2000)
      Blocklist.screen(warmDocs, termsDf).count() // JIT warmup
      TextStats.simpsonDiversity(warmDocs).count()
      spark.catalog.clearCache()
      Iterator.iterate(1)(_ * 2).takeWhile(_ <= maxK).foreach { k =>
        val docs = scaledDocs(spark, sfDir, k).persist(MEMORY_AND_DISK)
        val nD = docs.count()
        val (tBl, nBl) = time(Blocklist.screen(docs, termsDf).count())
        val (tSi, _) = time(TextStats.simpsonDiversity(docs).count())
        val (tRv, _) = time(docs.select(
            Shards.rendezvousShard(col("doc_id"), 8, "ring").as("s"))
          .groupBy("s").count().count())
        docs.unpersist()
        val evDir = scaledEventsDir(spark, sfDir, k)
        val ev = graft.core.Tables.events(spark, evDir)
          .persist(MEMORY_AND_DISK)
        val nE = ev.count()
        val asOf = ev.agg(max(col("ts_us"))).head.getLong(0)
        val (tDc, _) = time(Decay.decayedCounts(ev, Seq("event_type"),
          "ts_us", asOf, 604800000000L).count())
        val store = s"/root/repo/tmp/decay_ladder_$k"
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(new java.io.File(store))
        val (tDs, _) = time {
          (0 to 2).foreach { i =>
            Decay.storeAppend(ev.filter(pmod(col("event_id"), lit(3)) === i),
              store, s"b$i", Seq("event_type"), "ts_us", 604800000000L)
          }
          Decay.decayedFromStore(spark, store, Seq("event_type"),
            asOf, 604800000000L).count()
        }
        ev.unpersist()
        println(s"""{"k":$k,"docs":$nD,"blocklist_sec":${f"$tBl%.2f"},""" +
          s""""bl_hits":$nBl,"simpson_sec":${f"$tSi%.2f"},""" +
          s""""rendezvous_sec":${f"$tRv%.2f"},"events":$nE,""" +
          s""""decayed_sec":${f"$tDc%.2f"},"decayed_store_sec":${f"$tDs%.2f"}}""")
        spark.catalog.clearCache()
      }
      spark.stop(); return
    }
    if (args.lift(1).contains("r13ops2")) {
      // fourth-wave ladder (r13 follow-up): blocklist under HOT terms
      // (every doc hits several times — the join fan-out worst case the
      // broadcast-probe design must absorb linearly, vs the selective
      // terms the r13ops rung used), CAPACITY-WEIGHTED rendezvous
      // (cost = Σcapacities md5s per row — laddered in rows at fixed
      // capacities AND swept in Σcapacities at fixed rows), and
      // decayedFromBuckets over a GROWING group domain (the report
      // relation is groups × ≤40 periods: "model-sized" is a function
      // of the group domain, so the curve must be linear in it).
      import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
      import graft.ops.{Blocklist, Decay, Shards}
      val hotTerms = {
        import spark.implicits._
        // every scaled doc ends in the unprefixed "lorem ipsum dolor
        // sit amet" suffix: these unigrams/bigrams hit EVERY doc
        Seq(("lorem", "hot"), ("ipsum", "hot"), ("dolor", "hot"),
          ("dolor sit", "hot"), ("sit amet", "hot")).toDF("term", "category")
      }
      val warm = scaledDocs(spark, sfDir, 1).limit(2000)
      Blocklist.screen(warm, hotTerms).count() // JIT warmup
      spark.catalog.clearCache()
      Iterator.iterate(1)(_ * 2).takeWhile(_ <= maxK).foreach { k =>
        val docs = scaledDocs(spark, sfDir, k).persist(MEMORY_AND_DISK)
        val nD = docs.count()
        val (tHot, nHits) = time(Blocklist.screen(docs, hotTerms)
          .agg(coalesce(sum(col("hits")), lit(0L))).head.getLong(0))
        spark.catalog.clearCache()
        val (tRw, _) = time(docs.select(
            Shards.rendezvousShardWeighted(col("doc_id"), Seq(4, 2, 1, 1),
              "wring").as("sh"))
          .groupBy("sh").count().count())
        docs.unpersist()
        // pre-bucketed decay input: k·4000 groups × 40 periods
        val buckets = spark.range(k.toLong * 4000L)
          .select(concat(lit("g"), col("id")).as("g"),
            explode(expr("sequence(0L, 39L)")).as("period"))
          .withColumn("cnt",
            pmod(col("period") * 7L + length(col("g")), lit(13L)) + 1L)
          .persist(MEMORY_AND_DISK)
        val nB = buckets.count()
        val (tDb, nG) = time(Decay.decayedFromBuckets(buckets, Seq("g"),
          40L * 604800000000L, 604800000000L).count())
        buckets.unpersist()
        println(s"""{"k":$k,"docs":$nD,"hot_hits":$nHits,""" +
          s""""blocklist_hot_sec":${f"$tHot%.2f"},""" +
          s""""rendezvous_weighted_sec":${f"$tRw%.2f"},""" +
          s""""decay_buckets":$nB,"decay_groups":$nG,""" +
          s""""decayed_from_buckets_sec":${f"$tDb%.2f"}}""")
        spark.catalog.clearCache()
      }
      // Σcapacities sweep at fixed rows: one md5 per unit capacity →
      // time ∝ cap_total (the weighted form's documented cost model)
      val fixed = scaledDocs(spark, sfDir, math.min(4, maxK))
        .persist(MEMORY_AND_DISK)
      val nF = fixed.count()
      Seq(8, 16, 32, 64).foreach { s =>
        val caps = Seq.fill(4)(s / 4)
        val (t, _) = time(fixed.select(
            Shards.rendezvousShardWeighted(col("doc_id"), caps, "wring")
              .as("sh"))
          .groupBy("sh").count().count())
        println(s"""{"cap_total":$s,"docs":$nF,""" +
          s""""rendezvous_weighted_sec":${f"$t%.2f"}}""")
        spark.catalog.clearCache()
      }
      fixed.unpersist()
      spark.stop(); return
    }
    if (args.lift(1).contains("r14exp")) {
      // experimentation + stats-v2 ladder over K-duplicated users
      // (fresh user ids per copy — the honest growth axis). Design
      // claims under test: srm/stratified = one unit-grain hash agg;
      // permutation = a (rounds+1)-fold map-side explode that partial-
      // aggregates to ≤ rounds+1 rows per partition (the bootstrap
      // shape — linear in units at fixed rounds); qte = per-arm
      // histogram + bucket-axis window (bucket domain constant under
      // duplication); kruskal = one distinct-value pass (cents domain
      // constant); kendall = cell-bounded self-join (cell grid
      // constant); tvd = bucket join + one agg. Every curve must be
      // ~linear-to-flat.
      import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
      import graft.ops.{Abtest, Quantiles, Stats}
      val qs = Seq(("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100))
      val warmEv = graft.core.Tables.events(spark, sfDir).limit(5000)
      Abtest.srmCheck(warmEv, "user_id", "lad").count() // JIT warmup
      Abtest.permutationTest(warmEv, "user_id",
        "event_type = 'purchase'", "lad", rounds = 9).count()
      spark.catalog.clearCache()
      Iterator.iterate(1)(_ * 2).takeWhile(_ <= maxK).foreach { k =>
        val evDir = scaledEventsDir(spark, sfDir, k)
        val ev = graft.core.Tables.events(spark, evDir)
          .persist(MEMORY_AND_DISK)
        val nEv = ev.count()
        val cents = (col("value").cast("decimal(18,2)") * 100).cast("long")
        val (tSrm, _) = time(Abtest.srmCheck(ev, "user_id", "lad").count())
        spark.catalog.clearCache()
        val (tPerm, _) = time(Abtest.permutationTest(ev, "user_id",
          "event_type = 'purchase'", "lad", rounds = 49).count())
        spark.catalog.clearCache()
        val (tStrat, _) = time(Abtest.stratifiedReadout(ev, "user_id",
          "event_type = 'purchase'", "concat('s', user_id % 3)",
          Seq("s0", "s1", "s2"), "lad").count())
        spark.catalog.clearCache()
        val (tQte, _) = time(Abtest.quantileLift(
          ev.select(col("user_id"), cents.as("cents")),
          "user_id", "cents", "lad", 1000L, qs).count())
        spark.catalog.clearCache()
        val (tKw, _) = time(Stats.kruskalWallis(
          ev.select(cents.as("cents"), col("event_type")),
          "cents", "event_type", Seq("error", "purchase", "view")).count())
        spark.catalog.clearCache()
        val perUser = ev.groupBy(col("user_id"))
          .agg(count(lit(1)).cast("long").as("n_events"),
            (sum(col("value").cast("decimal(18,2)")) * 100).cast("long")
              .as("cents"))
        val (tKen, _) = time(Stats.kendallCells(perUser,
          "n_events", "cents div 1000").count())
        spark.catalog.clearCache()
        val store = s"/root/repo/tmp/tvd_ladder_$k"
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(new java.io.File(store))
        Quantiles.storeAppend(ev.filter(pmod(col("event_id"), lit(2)) === 0)
          .select(cents.as("v")), store, "b0", "v", 1000L)
        val (tTvd, _) = time(Stats.tvdDriftFromStore(spark, store,
          ev.filter(pmod(col("event_id"), lit(2)) === 1)
            .select(cents.as("v")),
          "v", 1000L, 1L, 10L).count())
        ev.unpersist()
        println(s"""{"k":$k,"events":$nEv,"srm_sec":${f"$tSrm%.2f"},""" +
          s""""permutation49_sec":${f"$tPerm%.2f"},""" +
          s""""stratified_sec":${f"$tStrat%.2f"},"qte_sec":${f"$tQte%.2f"},""" +
          s""""kruskal_sec":${f"$tKw%.2f"},"kendall_sec":${f"$tKen%.2f"},""" +
          s""""tvd_sec":${f"$tTvd%.2f"}}""")
        spark.catalog.clearCache()
      }
      spark.stop(); return
    }
    if (args.lift(1).contains("graph3deep")) {
      // the two shape probes split out of graph3 (runnable alone):
      // deep-peel tree + link-prediction cap sweep — see graph3 below.
      import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
      val warm = graft.ops.Graph.copurchaseEdges(
        scaledGraphBaskets(spark, sfDir, 1).limit(5000), "basket", "item", 2)
      graft.ops.Graph.kCore(warm, "src", "dst", 2).count() // JIT warmup
      graft.ops.Graph.commonNeighborLinks(warm, "src", "dst", 96, 4).count()
      spark.catalog.clearCache()
      Seq(10, 12, 14, 16).foreach { d =>
        val edges = spark.range(2L, 1L << (d + 1))
          .select((col("id") / 2).cast("long").as("src"),
            col("id").as("dst"))
          .persist(MEMORY_AND_DISK)
        val nE = edges.count()
        val peels = scala.collection.mutable.ArrayBuffer[Long]()
        val (tKc, nCore) = time(graft.ops.Graph.kCore(edges, "src", "dst",
          2, maxRounds = d + 2,
          onRound = (_, e) => { peels += e; () }).count())
        println(s"""{"tree_depth":$d,"edges":$nE,""" +
          s""""kcore_sec":${f"$tKc%.2f"},"core_nodes":$nCore,""" +
          s""""peel_rounds":${peels.size},""" +
          s""""round_edges":[${peels.mkString(",")}]}""")
        edges.unpersist(); spark.catalog.clearCache()
      }
      val capEdges = graft.ops.Graph.copurchaseEdges(
          scaledGraphBaskets(spark, sfDir, math.min(4, maxK)),
          "basket", "item", 5)
        .persist(MEMORY_AND_DISK)
      val nCapE = capEdges.count()
      Seq(32L, 64L, 128L, 256L).foreach { cap =>
        val (tLp, nP) = time(graft.ops.Graph.commonNeighborLinks(
          capEdges, "src", "dst", cap, 4).count())
        println(s"""{"cap":$cap,"edges":$nCapE,""" +
          s""""linkpred_sec":${f"$tLp%.2f"},"predicted":$nP}""")
      }
      capEdges.unpersist(); spark.catalog.clearCache()
      spark.stop(); return
    }
    if (args.lift(1).contains("graph3")) {
      // r13 ladder for the two graph loops without their own rung:
      // kCore (peel depth invariant under disjoint K copies ⇒ linear
      // in |E|) and harmonic (state ≤ |seeds|·|V|, seeds fixed ⇒
      // linear). Then two shape probes the K-fold CANNOT exercise:
      // a deep-peel tree (round count grows with depth while per-round
      // edges shrink geometrically — total work must stay ≈ 2|E|) and
      // a link-prediction cap sweep at fixed |E| (time ∝ cap — the
      // cap-selection rule's measured form).
      import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
      val warm = graft.ops.Graph.copurchaseEdges(
        scaledGraphBaskets(spark, sfDir, 1).limit(5000), "basket", "item", 2)
      graft.ops.Graph.kCore(warm, "src", "dst", 2).count() // JIT warmup
      graft.ops.Graph.harmonicCentrality(warm, "src", "dst",
        warm.select(col("src")).distinct().orderBy(col("src")).limit(8),
        "src", 3).count()
      spark.catalog.clearCache()
      Iterator.iterate(1)(_ * 2).takeWhile(_ <= maxK).foreach { k =>
        val edges = graft.ops.Graph.copurchaseEdges(
            scaledGraphBaskets(spark, sfDir, k), "basket", "item", 5)
          .persist(MEMORY_AND_DISK)
        val nE = edges.count()
        val peels = scala.collection.mutable.ArrayBuffer[Long]()
        val (tKc, nCore) = time(graft.ops.Graph.kCore(edges, "src", "dst",
          3, onRound = (_, e) => { peels += e; () }).count())
        spark.catalog.clearCache()
        edges.persist(MEMORY_AND_DISK); edges.count()
        val seeds = edges.select(col("src")).distinct()
          .orderBy(col("src")).limit(32)
        val (tH, nH) = time(graft.ops.Graph.harmonicCentrality(
          edges, "src", "dst", seeds, "src", 4).count())
        println(s"""{"k":$k,"edges":$nE,"kcore_sec":${f"$tKc%.2f"},""" +
          s""""core_nodes":$nCore,"peel_rounds":${peels.size},""" +
          s""""round_edges":[${peels.mkString(",")}],""" +
          s""""harmonic_sec":${f"$tH%.2f"},"reached":$nH}""")
        spark.catalog.clearCache()
      }
      // deep peel: perfect binary tree of depth d — the k=2 peel eats
      // one leaf layer per round (rounds = d, NOT constant), but each
      // round halves the remaining edges, so Σ per-round work ≈ 2|E|.
      // This is the rung disjoint-copy scaling can't produce: round
      // count scaling with structure while cost stays linear in |E|.
      Seq(10, 12, 14, 16).foreach { d =>
        val edges = spark.range(2L, 1L << (d + 1))
          .select((col("id") / 2).cast("long").as("src"),
            col("id").as("dst"))
          .persist(MEMORY_AND_DISK)
        val nE = edges.count()
        val peels = scala.collection.mutable.ArrayBuffer[Long]()
        val (tKc, nCore) = time(graft.ops.Graph.kCore(edges, "src", "dst",
          2, maxRounds = d + 2,
          onRound = (_, e) => { peels += e; () }).count())
        println(s"""{"tree_depth":$d,"edges":$nE,""" +
          s""""kcore_sec":${f"$tKc%.2f"},"core_nodes":$nCore,""" +
          s""""peel_rounds":${peels.size},""" +
          s""""round_edges":[${peels.mkString(",")}]}""")
        edges.unpersist(); spark.catalog.clearCache()
      }
      // cap sweep at fixed |E|: wedge volume ≤ cap·2|E| ⇒ time must be
      // ∝ cap; the rung where the trend breaks upward is the machine's
      // shuffle envelope (the scaladoc's cap ≤ M/(128·|E|) rule, read
      // off empirically instead of guessed).
      val capEdges = graft.ops.Graph.copurchaseEdges(
          scaledGraphBaskets(spark, sfDir, math.min(4, maxK)),
          "basket", "item", 5)
        .persist(MEMORY_AND_DISK)
      val nCapE = capEdges.count()
      Seq(32L, 64L, 128L, 256L).foreach { cap =>
        val (tLp, nP) = time(graft.ops.Graph.commonNeighborLinks(
          capEdges, "src", "dst", cap, 4).count())
        println(s"""{"cap":$cap,"edges":$nCapE,""" +
          s""""linkpred_sec":${f"$tLp%.2f"},"predicted":$nP}""")
      }
      capEdges.unpersist(); spark.catalog.clearCache()
      spark.stop(); return
    }
    if (args.lift(1).contains("hotblock")) {
      // hot-block guard ladder: a flood of K·1000 records lands in ONE
      // degenerate block next to the normal blocked customers. Uncapped,
      // blockedPairs' candidate volume is |flood|² — quadratic in K (run
      // only to K=8); with maxBlockSize=2000 the flood block is excluded
      // and cost must stay FLAT while K·1000 grows past the cap.
      import graft.core.Tables
      val base = Tables.customer(spark, sfDir)
        .select(col("c_custkey"), col("c_nationkey"), col("c_name"))
        .withColumn("blk", expr("right(c_name, 1)"))
      def flood(k: Int): DataFrame =
        spark.range(k * 1000L).select(
          (col("id") + lit(2000000000L)).as("c_custkey"),
          lit(99999).as("c_nationkey"),
          format_string("FloodRec#%09d", col("id")).as("c_name"),
          lit("junk").as("blk"))
      graft.ops.Linkage.blockedPairs(base.limit(2000).unionAll(flood(1)),
        Seq("c_nationkey", "blk"), "c_custkey", "c_name", 2,
        maxBlockSize = 2000L).count() // JIT warmup
      spark.catalog.clearCache()
      Iterator.iterate(1)(_ * 2).takeWhile(_ <= maxK).foreach { k =>
        val recs = base.unionAll(flood(k))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val nR = recs.count()
        val (tCap, nPC) = time(graft.ops.Linkage.blockedPairs(recs,
          Seq("c_nationkey", "blk"), "c_custkey", "c_name", 2,
          maxBlockSize = 2000L).count())
        val (tUncap, nPU) =
          if (k <= 8) time(graft.ops.Linkage.blockedPairs(recs,
            Seq("c_nationkey", "blk"), "c_custkey", "c_name", 2).count())
          else (-1.0, -1L)
        println(s"""{"k":$k,"records":$nR,"capped_sec":${f"$tCap%.2f"},"capped_pairs":$nPC,"uncapped_sec":${f"$tUncap%.2f"},"uncapped_pairs":$nPU}""")
        recs.unpersist(); spark.catalog.clearCache()
      }
      spark.stop(); return
    }
    if (args.lift(1).contains("linkage")) {
      // linkage ladder: K customer copies with SHIFTED nation keys —
      // blocks grow in COUNT, not size (candidates = Σ_b |block_b|², so
      // constant block size under K-folding must give a linear curve;
      // duplicating into the SAME blocks would be the quadratic trap).
      import graft.core.Tables
      def scaledCust(k: Int): DataFrame = {
        val base = Tables.customer(spark, sfDir)
          .select(col("c_custkey"), col("c_nationkey"), col("c_name"))
        (0 until k).map { i =>
          base.select(
            (col("c_custkey") + lit(i.toLong * 1000000000L)).as("c_custkey"),
            (col("c_nationkey") + lit(i * 1000)).as("c_nationkey"),
            col("c_name"))
        }.reduce(_ unionAll _)
      }
      def dirty(cust: DataFrame): DataFrame = cust
        .filter(col("c_custkey") % 3 === 0)
        .select(col("c_custkey").as("d_key"), col("c_nationkey"),
          expr("concat(substring(c_name, 1, cast(c_custkey % 8 as int) + 9), " +
            "substring(c_name, cast(c_custkey % 8 as int) + 11, 100))").as("d_name"))
        .withColumn("blk", expr("right(d_name, 1)"))
      val warmC = scaledCust(1).limit(2000)
        .withColumn("blk", expr("right(c_name, 1)"))
      graft.ops.Linkage.blockedBestMatch(dirty(warmC), warmC,
        Seq("c_nationkey", "blk"), "d_key", "d_name",
        "c_custkey", "c_name", 2).count() // JIT warmup
      graft.ops.Dedup.duplicateClusters(graft.ops.Linkage.blockedPairs(
        warmC, Seq("c_nationkey", "blk"), "c_custkey", "c_name", 2)).count()
      spark.catalog.clearCache()
      Iterator.iterate(1)(_ * 2).takeWhile(_ <= maxK).foreach { k =>
        val cust = scaledCust(k)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val nC = cust.count()
        val masters = cust.withColumn("blk", expr("right(c_name, 1)"))
        val (tBest, nM) = time(graft.ops.Linkage.blockedBestMatch(
          dirty(cust), masters, Seq("c_nationkey", "blk"),
          "d_key", "d_name", "c_custkey", "c_name", 2).count())
        val (tClus, nK) = time(graft.ops.Dedup.duplicateClusters(
          graft.ops.Linkage.blockedPairs(masters, Seq("c_nationkey", "blk"),
            "c_custkey", "c_name", 2)).count())
        println(s"""{"k":$k,"customers":$nC,"best_match_sec":${f"$tBest%.2f"},"matched":$nM,"cluster_sec":${f"$tClus%.2f"},"clustered":$nK}""")
        cust.unpersist(); spark.catalog.clearCache()
      }
      spark.stop(); return
    }
    if (r8Only) {
      graft.ops.Baskets.frequentPairs(scaledBaskets(spark, sfDir, 1)
        .limit(5000), "basket", "item", 2, 1).count() // JIT warmup
      graft.ops.TextStats.cooccurrence(
        scaledDocs(spark, sfDir, 1).limit(300), 2, 2, 2).count()
      spark.catalog.clearCache()
      r8Ladder()
      spark.stop(); return
    }

    // untimed warmup for the event plans (codegen JIT), then the ladder
    EVENT_QUERIES.foreach(n => SparkEntry.queries(n)(spark, sfDir).count())
    spark.catalog.clearCache()
    eventsLadder()
    if (eventsOnly) { spark.stop(); return }

    // untimed warmup: pay whole-stage-codegen JIT for both plan shapes
    // before any measured pass
    val warm = scaledDocs(spark, sfDir, 1).limit(500)
    val warmE = scaledEmbeddings(spark, sfDir, 1).limit(500)
    graft.ops.Dedup.ngramJaccard(warm, 0.5, "lang", maxDf = 64).count()
    graft.ops.Dedup.ngramJaccard(warm, 0.5, "lang").count()
    graft.ops.Dedup.embeddingNearDup(warmE, 0.9, bands = 16, planesPerBand = 3).count()
    graft.ops.Dedup.embeddingNearDupExact(warmE, 0.9).count()
    spark.catalog.clearCache()

    Iterator.iterate(1)(_ * 2).takeWhile(_ <= maxK).foreach { k =>
      // materialize the scaled corpora so generation cost stays out of
      // the measured operator time
      val docsPath = s"/root/repo/tmp/scale_docs_$k"
      val embPath = s"/root/repo/tmp/scale_emb_$k"
      scaledDocs(spark, sfDir, k).write.mode("overwrite").parquet(docsPath)
      scaledEmbeddings(spark, sfDir, k).write.mode("overwrite").parquet(embPath)
      val docs = spark.read.parquet(docsPath)
      val emb = spark.read.parquet(embPath)
      val nd = docs.count(); val ne = emb.count()

      // the capped form is bounded (df cap + count-bound prune) — run it
      // at every K; the uncapped form's stop-gram join grows ∝ (nK)², so
      // past K=4 it is the demonstration itself, not worth the wall-clock
      val (tCap, nCap) = time(graft.ops.Dedup.ngramJaccard(
        docs, tau = 0.5, blockCol = "lang", maxDf = 64).count())
      spark.catalog.clearCache()
      // prefix-filtered exact join: COMPLETE recall with no df cap —
      // the planted stop sentence (df = n·K in every doc) never enters
      // a prefix because every doc carries rarer grams, so the curve
      // must stay ~linear where the naive uncapped path goes (nK)²
      val (tPrefix, nPrefix) = time(graft.ops.Dedup.ngramJaccardPrefix(
        docs, tau = 0.5, blockCol = "lang").count())
      spark.catalog.clearCache()
      val (tUncap, nUncap) =
        if (k <= 4) {
          val (c, d2) = time(graft.ops.Dedup.ngramJaccard(
            docs, tau = 0.5, blockCol = "lang").count())
          spark.catalog.clearCache()
          (c, d2)
        } else (-1.0, -1L)

      // bucket-width rule: block ≈ ne/5 labels, target ~50/bucket
      val planes = math.max(3,
        (math.log(ne.toDouble / 5 / 50) / math.log(2)).ceil.toInt)
      val (tLsh, nLsh) = time(graft.ops.Dedup.embeddingNearDup(
        emb, tau = 0.9, bands = 16, planesPerBand = planes).count())
      spark.catalog.clearCache()
      // the ADAPTIVE path derives the same width per block from its own
      // pre-scan (auto-width) — must track the manual rule above and
      // return the identical pair set
      val (tAuto, nAuto) = time(graft.ops.Dedup.embeddingNearDupAdaptive(
        emb, tau = 0.9, bands = 16).count())
      spark.catalog.clearCache()
      val (tExact, nExact) = time(graft.ops.Dedup.embeddingNearDupExact(
        emb, tau = 0.9).count())
      spark.catalog.clearCache()

      // round-4 text/model ops: all designed linear-in-corpus — the
      // model/aggregate side is vocabulary- or k-sized regardless of K
      val (tUni, _) = time {
        val (vocab, _) = graft.ops.TextStats.unigramModel(docs, vocabSize = 500)
        graft.ops.TextStats.unigramScores(docs, vocab).count()
      }
      spark.catalog.clearCache()
      val (tDrift, _) = time(graft.ops.TextStats.sourceDrift(docs, "lang").count())
      spark.catalog.clearCache()
      // round-6 ops, all designed ~linear: duplicated spans (the
      // scaled corpus's appended stop sentence is a deliberate hot
      // span — df = n·K in ONE window partition, the documented
      // straggler bound), graded contamination (distinct corpus-gram
      // build + left join), bigram model+score (one corpus pass +
      // vocabulary-sized prefix agg; map-only scoring)
      val (tSpans, _) = time(
        graft.ops.TextStats.duplicatedSpans(docs, spanLen = 5).count())
      spark.catalog.clearCache()
      // hotSpanGuard: the argmin/groupBy+join route around the
      // universal-span window straggler — the stop sentence planted in
      // every scaled doc (df = n·K) is exactly its target shape. The
      // acceptance bound is guard ≤ 2× window on this mostly-benign
      // corpus (the guard's second exchange is its only extra cost)
      val (tSpansGuard, _) = time(
        graft.ops.TextStats.duplicatedSpans(docs, spanLen = 5,
          hotSpanGuard = true).count())
      spark.catalog.clearCache()
      val (tContam, _) = time(graft.ops.Dedup.contaminationReport(
        docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 === 1), n = 5).count())
      spark.catalog.clearCache()
      val (tBigram, _) = time {
        val model = graft.ops.TextStats.bigramModel(docs, vocabSize = 500)
        graft.ops.TextStats.bigramScores(docs, model).count()
      }
      spark.catalog.clearCache()

      // train and apply timed APART: the apply side (assignment +
      // within-cell pruning through the adaptive path) is the
      // steady-state corpus-maintenance cost — q_semdedup_stored's
      // repetition shape — while Lloyd's is a once-per-model cost
      val (tSemTrain, model) = time(graft.ops.Pq.centroidArray(
        graft.ops.Ann.kmeansCentroids(emb, 0L until 8L, iters = 2, dim = 64),
        dim = 64))
      spark.catalog.clearCache()
      // min-of-3 (the Bench convention): single samples at K=16 landed
      // inside host-CPU-steal spikes two rounds running — the min is
      // the reproducible engine cost, the spread is the box
      val tSemApply = (1 to 3).map { _ =>
        val (t, _) = time(
          graft.ops.SemDedup.semDedup(emb, model, dim = 64, tau = 0.9).count())
        spark.catalog.clearCache(); t
      }.min

      // round-6 late additions, both designed ~linear: the Bloom
      // decontamination screen (map-side filter, survivors-only
      // exchange) and the hashed-NB classifier (one train pass into a
      // buckets-sized model, map-only scoring)
      val (tBloom, _) = time(graft.ops.BloomScreen.corpusContaminatedBloom(
        docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 === 1), n = 5).count())
      spark.catalog.clearCache()
      val (tQc, _) = time {
        val (m, cut) = graft.ops.QualityClassifier.train(docs)
        graft.ops.QualityClassifier.score(docs, m, cutPpm = cut).count()
      }
      spark.catalog.clearCache()
      // containment rides the same df-capped postings machinery as the
      // capped jaccard but with NO length-ratio candidate prefilter —
      // the df cap is the only bound, so its K-curve is the honest cost
      // of the asymmetric metric
      val (tCont, nCont) = time(graft.ops.Dedup.ngramContainment(
        docs, tau = 0.6, blockCol = "lang", maxDf = 64).count())
      spark.catalog.clearCache()

      // this round's additions, all designed ~linear — boilerplate
      // removal (the appended stop sentence IS a planted template:
      // df = n·K, but the df agg holds one counter per span and the cut
      // join emits ~5 occurrences per doc), DSIR (two bucket-sized
      // count aggs to train; scoring one scan — broadcast-join form vs
      // the zero-exchange map fold), int8 ANN (store build one scan;
      // 10-probe brute pass O(10·n) integer dots)
      val (tBp, _) = time(graft.ops.Dedup.boilerplateRemoval(
        docs, spanLen = 4, minDf = 3).count())
      spark.catalog.clearCache()
      val (tDsirTrain, ratios) = time(graft.ops.Dsir.trainLogRatios(
        docs.filter(col("lang") === "en"), docs, buckets = 4096))
      val (tDsirScore, _) = time(
        graft.ops.Dsir.score(docs, ratios, buckets = 4096).count())
      spark.catalog.clearCache()
      val (tDsirMap, _) = time(
        graft.ops.Dsir.scoreMapOnly(docs, ratios, buckets = 4096).count())
      spark.catalog.clearCache()
      val int8Path = s"/root/repo/tmp/scale_int8_$k"
      locally { // write-iff-absent store: clear so the build is measured
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(new java.io.File(int8Path))
      }
      val (tInt8Build, _) = time(graft.ops.Ann.int8Stored(emb, int8Path))
      val (tInt8Ann, _) = time(graft.ops.Ann.bruteTopKInt8(
        spark.read.parquet(int8Path), emb.filter(col("vec_id") < 10), k = 3)
        .count())
      spark.catalog.clearCache()

      // BPE: the copy prefixes multiply the VOCABULARY by K (c0key,
      // c1key, … are distinct words), so the trainer's curve is the
      // honest vocab-growth cost — every round's pair agg runs over a
      // K× symbol table — while encode stays corpus-linear (vocab-sized
      // broadcast map-join over the explode)
      val (tBpeTrain, bpeMerges) = time(graft.ops.Bpe.trainMerges(docs, k = 6))
      spark.catalog.clearCache()
      val (tBpeEnc, _) = time(graft.ops.Bpe.tokenCountPerDoc(docs,
        bpeMerges.map(m => (m._2, m._3))).count())
      spark.catalog.clearCache()

      // round-7 additions, all designed ~linear: PCA fit is ONE moments
      // pass (17 KB per-partition summaries) + a driver eigensolve and
      // projection is map-only; WordPiece and Unigram amortize over the
      // distinct-word table (the copy prefixes multiply VOCABULARY by K
      // — the honest vocab-growth curve, like BPE); novelty is one
      // gram-keyed exchange; curriculum interleave is a per-source
      // window + arithmetic position (no global sort)
      val (tPcaFit, pcaModel) = time(
        graft.ops.Pca.fit(emb, "embedding", dim = 64, k = 16))
      val (tPcaProj, _) = time(
        graft.ops.Pca.project(emb, "embedding", pcaModel).count())
      spark.catalog.clearCache()
      val (tWpVocab, wpV) = time {
        val v = graft.ops.Wordpiece.vocab(docs, maxLen = 4, vocabSize = 200)
          .persist()
        v.count(); v
      }
      val (tWpEnc, _) = time(
        graft.ops.Wordpiece.tokenCountPerDoc(docs, wpV, maxLen = 4).count())
      wpV.unpersist()
      spark.catalog.clearCache()
      val (tUgTrain, ugScores) = time {
        val words = graft.ops.Wordpiece.words(docs).persist()
        val s1 = graft.ops.Unigram.emRound(words,
          graft.ops.Unigram.seedScoresFromWords(words, maxLen = 4, vocabSize = 200),
          maxLen = 4).persist()
        s1.count(); words.unpersist(); s1
      }
      val (tUgEnc, _) = time(
        graft.ops.Unigram.tokenCountPerDoc(docs, ugScores, maxLen = 4).count())
      ugScores.unpersist()
      spark.catalog.clearCache()
      val (tNov, _) = time(graft.ops.Curriculum.novelty(docs, n = 2).count())
      spark.catalog.clearCache()
      val (tCurr, _) = time {
        val sc = docs.select(col("doc_id"), col("lang"),
          graft.functions.Text.qualityScore(col("text")).as("q"))
        graft.ops.Curriculum.interleavedOrder(sc, "lang", "q").count()
      }
      spark.catalog.clearCache()

      // winnowing + CDC: per-row projections (expected corpus-linear);
      // the pairs join is the df-capped postings shape, and the scaled
      // corpus's appended stop sentence plants universal FINGERPRINTS
      // (df = n·K) — exactly what the cap must prune before the
      // self-join, or the curve goes (nK)²
      val (tWinnow, _) = time(
        graft.ops.Fingerprints.winnow(docs, k = 3, w = 4).count())
      spark.catalog.clearCache()
      val (tWinnowPairs, nWinnowPairs) = time(graft.ops.Fingerprints
        .winnowPairs(docs, k = 3, w = 4, minShared = 2, dfCap = 64).count())
      spark.catalog.clearCache()
      val (tCdc, _) = time(
        graft.ops.Fingerprints.cdcChunks(docs, k = 3, divisor = 16).count())
      spark.catalog.clearCache()

      println(s"""{"k":$k,"docs":$nd,"vecs":$ne,""" +
        s""""ngram_capped_sec":${f"$tCap%.2f"},"ngram_uncapped_sec":${f"$tUncap%.2f"},""" +
        s""""ngram_prefix_sec":${f"$tPrefix%.2f"},"ngram_pairs_prefix":$nPrefix,""" +
        s""""ngram_pairs_capped":$nCap,"ngram_pairs_uncapped":$nUncap,""" +
        s""""embed_lsh_sec":${f"$tLsh%.2f"},"embed_auto_sec":${f"$tAuto%.2f"},""" +
        s""""embed_exact_sec":${f"$tExact%.2f"},""" +
        s""""embed_planes":$planes,"embed_pairs_lsh":$nLsh,""" +
        s""""embed_pairs_auto":$nAuto,"embed_pairs_exact":$nExact,""" +
        s""""unigram_sec":${f"$tUni%.2f"},"drift_sec":${f"$tDrift%.2f"},""" +
        s""""semdedup_train_sec":${f"$tSemTrain%.2f"},""" +
        s""""semdedup_apply_sec":${f"$tSemApply%.2f"},""" +
        s""""dup_spans_sec":${f"$tSpans%.2f"},""" +
        s""""dup_spans_guard_sec":${f"$tSpansGuard%.2f"},""" +
        s""""contam_sec":${f"$tContam%.2f"},""" +
        s""""bigram_sec":${f"$tBigram%.2f"},""" +
        s""""bloom_decontam_sec":${f"$tBloom%.2f"},""" +
        s""""quality_classifier_sec":${f"$tQc%.2f"},""" +
        s""""containment_sec":${f"$tCont%.2f"},"containment_pairs":$nCont,""" +
        s""""boilerplate_sec":${f"$tBp%.2f"},""" +
        s""""dsir_train_sec":${f"$tDsirTrain%.2f"},""" +
        s""""dsir_score_sec":${f"$tDsirScore%.2f"},""" +
        s""""dsir_map_sec":${f"$tDsirMap%.2f"},""" +
        s""""int8_build_sec":${f"$tInt8Build%.2f"},""" +
        s""""int8_ann_sec":${f"$tInt8Ann%.2f"},""" +
        s""""bpe_train_sec":${f"$tBpeTrain%.2f"},""" +
        s""""bpe_encode_sec":${f"$tBpeEnc%.2f"},""" +
        s""""pca_fit_sec":${f"$tPcaFit%.2f"},""" +
        s""""pca_project_sec":${f"$tPcaProj%.2f"},""" +
        s""""wp_vocab_sec":${f"$tWpVocab%.2f"},""" +
        s""""wp_encode_sec":${f"$tWpEnc%.2f"},""" +
        s""""unigram_train_sec":${f"$tUgTrain%.2f"},""" +
        s""""unigram_encode_sec":${f"$tUgEnc%.2f"},""" +
        s""""novelty_sec":${f"$tNov%.2f"},""" +
        s""""curriculum_sec":${f"$tCurr%.2f"},""" +
        s""""winnow_sec":${f"$tWinnow%.2f"},""" +
        s""""winnow_pairs_sec":${f"$tWinnowPairs%.2f"},""" +
        s""""winnow_pairs":$nWinnowPairs,""" +
        s""""cdc_sec":${f"$tCdc%.2f"}}""")
    }
    spark.stop()
  }
}
