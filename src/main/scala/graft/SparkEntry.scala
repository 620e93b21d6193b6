package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{Dedup, Graph, Relational, Similarity, TextAnalysis}
import graft.multimodal.Multimodal

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator registry (one entry per implemented
  * operator from SURVEY.md §2 plus the LLM-pipeline extensions); `oracleSql`
  * carries the DuckDB-equivalent SQL for every hash-checkable entry.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * q9 is the reference's richest shape (join + group + window-avg + no-ELSE
    * CASE + arithmetic + multi-key sort).
    */
  def entry(spark: SparkSession): DataFrame =
    Relational.q9WindowAvgCase(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 (relational
    * parity) plus the LLM-pipeline extensions (text analysis, dedup,
    * similarity search, multimodal plumbing).
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ TextAnalysis.queries ++ Dedup.queries ++
      Similarity.queries ++ Multimodal.queries ++ graft.plans.Asof.queries ++
      graft.pipeline.CorpusPipeline.queries ++ Graph.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Since round 4 EVERY query has a twin — the
    * sketch operators (MinHash, SimHash, winnowing, KMV, sign-LSH, IVF)
    * run on engine-portable md5-62 hashes / replayable arithmetic, so
    * even they hash-check instead of falling back to rows-only.
    */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ TextAnalysis.oracles ++ Dedup.oracles ++
      Similarity.oracles ++ Multimodal.oracles ++ graft.plans.Asof.oracles ++
      graft.pipeline.CorpusPipeline.oracles ++ Graph.oracles

  /** Headline subset timed by Bench (kept representative but bounded). */
  def headline: Seq[String] = Seq(
    "q1_agg", "q3_month_filter", "q5_join_broadcast", "q6_join_3way",
    "q7_topk_global", "q8_window_rank", "q9_window_avg_case",
    "q10_share_month", "q12_date_agg", "q15_events_hourly",
    "t1_text_stats", "t2_quality", "t4_fingerprint",
    "d1_exact_dedup", "d2_ngram_jaccard", "d3_minhash_lsh", "d4_simhash",
    "t6_winnowing", "v1_knn_brute", "v2_ann_lsh", "v3_embedding_neardup",
    "v4_ivf_ann", "q20_sessionize", "q16_rollup", "q22_approx_sketch",
    "q23_asof_join", "q24_range_join", "q25_pivot", "q26_distinct_quantile",
    "q27_full_outer", "q28_json_extract", "q29_stratified_sample",
    "q30_kmv_distinct", "d5_dedup_clusters", "t7_chunking",
    "q31_rank_distributions", "q32_cube", "q33_collect_sorted",
    "q34_value_windows", "mm2_frame_sample", "q35_gap_fill",
    "q36_sweep_concurrency", "q37_lateral_topk", "t8_char_entropy",
    "p1_corpus_pipeline",
    "q2_count_nonnull", "q4_filter_in", "q11_cte_chain", "q13_ingest_cdc",
    "q14_set_ops", "q17_semi_join", "q18_anti_join", "q19_except",
    "q21_frame_spec", "t3_lang_id", "t5_vocab", "mm1_decode_stub",
    "t9_contamination", "t10_tfidf", "t11_packing", "d6_keep_best",
    "t12_redact", "t13_repetition", "v5_int8_ann", "t14_bloom_contamination",
    "t15_global_packing", "t16_corpus_mix", "t17_lm_score",
    "v6_pq_ann", "p2_training_prep", "t18_heavy_hitters",
    "t19_dsir_importance", "d7_semantic_dedup", "q38_grouping_sets",
    "q39_time_range_window", "q40_fuzzy_join", "q41_scd2",
    "q42_merge_upsert", "q43_unpivot", "q44_hll_distinct",
    "t20_quality_classifier", "d8_span_dedup", "g1_pagerank",
    "mm3_audio_energy",
    "g2_triangles", "g3_reach", "q45_argmax", "q46_rcd", "q47_setkmv",
    "v7_mips", "q48_ivm", "q49_locf", "mm4_phash",
    "q50_histogram", "q51_interp_linear", "q52_funnel", "q53_salted_agg",
    "v8_filtered_ann", "q54_attribution", "q55_weighted_sample",
    "q56_bitmap_distinct", "q57_skyline", "q58_decay_score", "g4_sssp",
    "mm5_shot_boundary", "q59_retention", "t21_bpe_merges", "q60_profile",
    "g5_kcore", "q61_table_diff", "d9_containment", "g6_cooccur", "q62_debounce", "mm6_vad",
    "t22_langid_audit", "q63_transitions", "q64_rank_family", "q65_twap",
    "q66_weighted_median", "t23_novelty", "g7_linkpred", "mm7_resize",
    "d10_incremental_dedup", "q67_pattern_match",
    "v9_rerank", "q68_rolling_distinct", "q69_ohlc", "q70_ab_test",
    "t24_code_switch", "g8_labelprop", "q71_pareto",
    "q72_incremental_models", "v10_kmeans", "t25_bpe_encode",
    "t26_bm25", "g9_walks", "v11_recall_eval", "mm8_shard_export",
    "v12_ivf_append", "g10_walk_pairs", "d12_lsh_eval", "p3_dataset_card",
    "t27_ccnet_buckets", "p4_mixture_schedule", "g11_hits",
    "g12_modularity", "mm9_pair_audit", "d13_threshold_sweep",
    "v13_truncation_eval", "t28_fertility", "p5_epoch_materialize",
    "g13_neighbor_sample", "p6_epoch_shuffle", "t29_code_detect",
    "t30_corpus_drift", "v14_ivfpq", "t31_sft_mask", "p7_sft_packing",
    "t32_preference_pairs", "t33_rejection_sampling", "p8_dpo_batches",
    "v15_diverse_ann", "mm10_crossmodal_audit", "d15_boilerplate_lines",
    "p9_leak_safe_split", "t34_span_decontam", "d16_incremental_components",
    "mm11_video_neardup", "v16_knn_join", "p10_curriculum", "t35_gopher_rules",
    "v17_hard_negatives", "v18_prototypicality", "p11_doremi_mixture",
    "t36_moore_lewis", "d17_source_overlap", "t37_zipf_audit",
    "t38_dup_ngram_chars", "g14_ppr", "t39_filter_funnel",
    "v19_nprobe_sweep", "t40_heldout_ppl", "t41_bpe_train64",
    "t42_bpe_encode64", "d18_span_dedup32", "t43_kn_lm_score",
    "g15_cc_star", "d19_oph_minhash", "t44_blocklist", "t45_fim_prep",
    "p12_unimax_mixture", "mm12_audio_neardup", "d20_allpairs",
    "v20_bitext_mining", "d21_exactsubstr", "t46_classifier_train",
    "v21_hybrid_rrf", "p13_source_cap", "v22_hybrid_eval",
    "t47_heldout_eval", "q73_bucketed_join", "v23_cell_shard",
    "v24_ann_hybrid", "v25_hybrid_serve")
}
