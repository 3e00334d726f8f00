package graft

/** Physical-plan audit: dumps `explain("formatted")` for the headline
  * queries so scan pruning (`PushedFilters`/`ReadSchema`), join strategy
  * (BroadcastHashJoin vs SortMergeJoin) and WholeStageCodegen spans can
  * be reviewed per round. Usage: runMain graft.Plans [names...]
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(4)
    // SPARK_GRAFT_PLANS_DIR overrides for plan checks at other scales
    // (join strategies flip with input size — an sf0.001 dump cannot
    // show whether sf0.1 broadcasts); default stays the committed
    // PLANS.md contract
    val d = sys.env.getOrElse("SPARK_GRAFT_PLANS_DIR",
      "/root/testdata/sf0.001")
    val names = if (args.nonEmpty) args.toSet else
      Set("q1_agg", "q3_join", "q5_join_multi", "q_dashboard", "q_lookback",
        "q_minhash_lsh", "q_ann_brute", "q_ngram_jaccard", "q_simhash_pairs",
        "q_join_anti", "q_window_frame", "q_topk", "q_asof", "q_range_join",
        "q_sample_hash", "q_stratified", "q_tfidf", "q_pack_seq",
        "q_mix_weighted", "q_chunk", "q_asof_fwd", "q_pq_ann",
        "q_heavy_hitters", "q_ivfpq_ann", "q_sessions", "q_zorder", "q_trending",
        "q_weighted_sample", "q_embed_neardup", "q_intersect",
        "q_semdedup", "q_unigram_quality", "q_corpus_drift", "q_temperature_mix",
        "q_ann_ivf", "q_decontaminate", "q_ngram_decontam", "q_repetition",
        "q_sem_decontam", "q_curation_pipeline", "q_ivfpq_stored",
        "q_semdedup_stored", "q_dup_spans", "q_bigram_quality",
        "q_bloom_decontam", "q_quality_classifier", "q_bloom_stored",
        "q_leakage_split", "q_export_shards", "q_budget_mix",
        "q_ngram_containment", "q_qc_stored", "q_span_dedup", "q_minhash_stored",
        "q_span_dedup_stored", "q_boilerplate", "q_dsir", "q_ann_int8",
        "q_hard_negatives", "q_gopher_quality", "q_corpus_diff",
        "q_weighted_quantile", "q_pooled_embed", "q_dataset_card",
        "q_nearest_doc", "q_bpe_merges", "q_bpe_encode", "q_ann_recall",
        "q_bpe_pack", "q_dup_spans_guard", "q_span_dedup_guard",
        "q_minhash_append", "q_span_append",
        "q_pca_cov", "q_pca_recall", "q_wp_vocab", "q_wp_encode",
        "q_novelty", "q_curriculum", "q_unigram_tokens",
        "q_winnow", "q_winnow_pairs", "q_winnow_stored", "q_cdc_chunks",
        "q_cdc_dedup", "q_ppl_buckets", "q_ann_rerank", "q_procrustes",
        "q_ann_metrics", "q_ann_multiprobe",
        "q_cohort", "q_funnel_steps", "q_resample", "q_ngram_prefix",
        "q_rolling_z", "q_rate_limit", "q_funnel_windowed",
        "q_tokenizer_card", "q_copurchase", "q_transitions", "q_attribution",
        "q_ohlc", "q_source_overlap", "q_rfm", "q_interp", "q_multimodal",
        "q_cooccur", "q_copurchase_stored", "q_rolling_dau",
        "q_user_features", "q_dq_checks", "q_lookback_partitioned",
        "q_media_card", "q_editdup", "q_salted_sum", "q_scd2",
        "q_dq_stored", "q_editdup_stored", "q_ivfpq_compact",
        "q_aggview_union", "q_bm25", "q_pii_scrub",
        "q_entity_match", "q_domain_terms", "q_ewma", "q_entity_clusters",
        "q_kanon", "q_normalize",
        "q_triangles", "q_hits", "q_entity_match_capped",
        "q_image_neardup", "q_link_predict", "q_readability",
        "q_keywords", "q_ann_mmr", "q_hybrid_rrf", "q_harmonic",
        "q_hll_card", "q_hll_stored", "q_cms_freq", "q_cms_stored",
        "q_hist_quantiles", "q_hist_stored", "q_link_predict_ra",
        "q_assortativity", "q_golden_record", "q_fd_profile",
        "q_profile_card",
        "q_hll_overlap", "q_entity_phonetic", "q_seasonal",
        "q_seasonal_stored", "q_snapshot_diff", "q_score_calibrate",
        "q_source_jsonl", "q_source_csv", "q_cms_joinsize",
        "q_table_stats", "q_rr_dp", "q_source_orc",
        "q_pagerank_stored", "q_iqr_outliers", "q_ab_readout", "q_score_calibrate_hist", "q_iqr_stored",
        "q_blocklist", "q_rendezvous", "q_decayed", "q_decayed_stored",
        "q_simpson", "q_split_points", "q_trimmed_mean",
        "q_canonical_pick", "q_curation_v2", "q_neyman",
        "q_hist_asof", "q_decayed_asof", "q_blocklist_stored",
        "q_rendezvous_weighted",
        "q_cusum", "q_cusum_stored", "q_range_assign", "q_fano", "q_gini",
        "q_mannwhitney", "q_ks_test", "q_kappa_langid", "q_chi2_assoc",
        "q_gk_lambda", "q_spearman", "q_ks_drift_stored",
        "q_wilcoxon", "q_mcnemar", "q_fleiss_kappa", "q_median_test",
        "q_ks_drift_asof", "q_bootstrap_se", "q_loo_influence", "q_cuped",
        "q_specific_agreement", "q_benford", "q_mde", "q_ab_ratio",
        "q_bootstrap_stored", "q_mannwhitney_by", "q_ab_ci",
        "q_rank_biserial", "q_odds_ratio",
        "q_kappa_by", "q_chi2_by", "q_gk_lambda_by", "q_spearman_by",
        "q_ab_stored", "q_cuped_stored", "q_bootstrap_asof",
        "q_blocklist_asof",
        "q_srm", "q_permutation", "q_mde_mean", "q_ab_asof", "q_ab_by",
        "q_kruskal", "q_cochran_q", "q_kendall",
        "q_srm_stored", "q_hll_asof", "q_cms_asof",
        "q_tvd_stored", "q_ks_drift_by", "q_ab_stratified", "q_qte",
        "q_ab_mean", "q_ab_mean_stored", "q_ab_trace",
        "q_qte_stored", "q_qte_asof", "q_ab_mean_trace", "q_ab_boundary",
        "q_url_canon", "q_url_dedup", "q_kruskal_by",
        "q_srm_trace", "q_cuped_trace", "q_kendall_by",
        "q_qte_trace", "q_hist_trace", "q_random_walks",
        "q_walk_pairs", "q_ab_winsorized", "q_srm_by",
        "q_ab_karm", "q_srm_karm", "q_ab_karm_stored", "q_srm_karm_stored",
        "q_mrl_recall", "q_ab_mean_boundary", "q_cochran_by",
        "q_random_walks_stored", "q_walk_pairs_stored", "q_walks_weighted",
        "q_walks_node2vec", "q_negative_samples", "q_betweenness",
        "q_ab_cuped_karm", "q_ab_cuped_karm_stored", "q_walks_n2v_weighted")
        // q_lpa / q_kcore are iterative like q_pagerank: the final frame
        // inlines every checkpointed round — audited via GraphSpec/
        // PlanShapeSpec instead of a dump that would be all repetition;
        // q_central_chunks inlines the pageRankWeighted loop likewise
    graft.queries.Queries.all.filter(q => names(q._1)).foreach { case (name, (impl, _)) =>
      println(s"\n========== $name ==========")
      impl(spark, d).explain("formatted")
    }
    // Iterative queries (q_pagerank, q_ppr, q_katz): the final DataFrame's
    // printed tree recursively inlines every cached iteration's stored
    // plan (tens of thousands of lines of repetition), so the audit
    // dump shows the two plans that actually matter — the edge build
    // and ONE power iteration, the shape every iteration repeats.
    if (names("q_dashboard")) {
      import org.apache.spark.sql.functions._
      val li = graft.core.Tables.lineitem(spark, d)
        .select(col("l_orderkey"), col("l_partkey"))
      val edges = graft.ops.Graph.copurchaseEdges(li, "l_orderkey",
        "l_partkey", 5)
      println(s"\n========== q_pagerank / q_ppr / q_katz (edge build) ==========")
      edges.explain("formatted")
      val deg = edges.groupBy("src").agg(count(lit(1)).cast("long").as("deg"))
      val ranks = deg.select(col("src").as("node"))
        .withColumn("rank", lit(1.0 / 1000))
      val iter = edges.join(deg, "src")
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"),
          floor((col("rank") / col("deg")) * lit(1e18)).cast("long").as("c"))
        .groupBy("node").agg(sum(col("c")).as("in_mass"))
      println(s"\n========== q_pagerank / q_ppr / q_katz (one power iteration) ==========")
      iter.explain("formatted")
    }
    // Stored-index pruning demonstrated, not just asserted: at the
    // fixture's 10 probes × nProbe=4 the IN-list covers all 8 cells, so
    // the q_ivfpq_stored dump above can't show pruning doing work. One
    // query at nProbe=1 probes exactly one cell — the IN-list below
    // must name a strict subset (PqIndexSpec pins this plus the
    // files-read metric).
    if (names("q_ivfpq_stored")) {
      import org.apache.spark.sql.functions._
      val emb = graft.core.Tables.embeddings(spark, d)
      val cents = graft.ops.Pq.centroidArray(
        emb.filter(col("vec_id") < 8)
          .select(col("vec_id").cast("long").as("c_id"),
            expr("transform(embedding, x -> cast(x as double))").as("c_v")),
        dim = 64)
      val cb = graft.ops.Pq.trainResidualCodebooksSampled(emb, cents,
        dim = 64, m = 8, k = 16, iters = 2, sampleCap = 1024)
      val idxPath = java.nio.file.Files.createTempDirectory("plans_ivfpq").toString
      graft.ops.Pq.writeIndex(emb, cents, dim = 64, m = 8, k = 16,
        codebook = cb, path = idxPath)
      println(s"\n========== q_ivfpq_stored (nProbe=1, 1 query — pruning demo) ==========")
      graft.ops.Pq.ivfPqTopKFromIndex(spark, idxPath,
          emb.filter(col("vec_id") === 17), topK = 3,
          centroids = cents, dim = 64, m = 8, k = 16, codebook = cb, nProbe = 1)
        .explain("formatted")
    }
    spark.stop()
  }
}
