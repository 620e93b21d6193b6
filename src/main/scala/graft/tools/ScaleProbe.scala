package graft.tools

import org.apache.spark.sql.functions._
import graft.{GraftSession, SparkEntry, Tables}

/** 10x scale probe: replicate the sf0.1 tables (ids offset per copy so
  * keys stay distinct) into /tmp and time representative headline queries
  * at ~6M lineitem rows. Evidence that the plans scale ~linearly — run
  * manually, not part of the driver contract.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val src = "/root/testdata/sf0.1"
    val out = "/tmp/graft_sf1"
    val spark = GraftSession.local("scaleprobe")
    spark.sparkContext.setLogLevel("WARN")
    val copies = 10

    def replicate(name: String, idCols: Seq[String]): Unit = {
      val base = Tables.load(spark, src, name)
      val union = (0 until copies).map { i =>
        idCols.foldLeft(base.withColumn("__copy", lit(i))) { (df, c) =>
          df.withColumn(c, col(c) + lit(i.toLong * 10000000L))
        }
      }.reduce(_ unionByName _).drop("__copy")
      union.write.mode("overwrite").parquet(s"$out/$name.parquet")
    }
    // fact-like tables replicated with shifted keys; dims copied as-is.
    // documents/embeddings replicate too (round 4): the curation and ANN
    // ops must be probed against a 10x corpus, not a 10x fact table.
    // Copies keep source/bucket/label, so dedup blocks get 10x denser —
    // deliberately harsher than organic growth (pair candidates scale
    // with block density squared).
    replicate("lineitem", Seq("l_orderkey"))
    replicate("orders", Seq("o_orderkey"))
    replicate("events", Seq("event_id"))
    replicate("documents", Seq("doc_id"))
    replicate("embeddings", Seq("vec_id"))
    Seq("customer", "supplier", "part", "nation", "region").foreach { n =>
      Tables.load(spark, src, n).write.mode("overwrite")
        .parquet(s"$out/$n.parquet")
    }

    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q1_agg", "q5_join_broadcast", "q6_join_3way", "q8_window_rank",
      "q15_events_hourly", "q20_sessionize", "q24_range_join",
      "q26_distinct_quantile", "q29_stratified_sample", "q23_asof_join",
      // round-4 additions: the curation + quantized-ANN ops
      "t9_contamination", "t10_tfidf", "t11_packing", "t12_redact",
      "t13_repetition", "d6_keep_best", "v5_int8_ann",
      "t14_bloom_contamination", "t15_global_packing", "t16_corpus_mix",
      "t17_lm_score", "v6_pq_ann", "p2_training_prep",
      // round-5 additions: sketch/importance/semantic-dedup + the new
      // relational shapes
      "t18_heavy_hitters", "t19_dsir_importance", "d7_semantic_dedup",
      "q38_grouping_sets", "q39_time_range_window", "q40_fuzzy_join",
      "q41_scd2",
      // round-6 additions: merge/unpivot/HLL + classifier + span dedup +
      // graph + audio windows
      "q42_merge_upsert", "q43_unpivot", "q44_hll_distinct",
      "t20_quality_classifier", "d8_span_dedup", "g1_pagerank",
      "mm3_audio_energy",
      // round-6c additions: profiling, interpolation, funnel, salted agg
      "q50_histogram", "q51_interp_linear", "q52_funnel", "q53_salted_agg",
      "v8_filtered_ann", "q54_attribution", "q55_weighted_sample",
      // round-6d additions: bitmap distinct, skyline, decay, SSSP, shots
      "q56_bitmap_distinct", "q57_skyline", "q58_decay_score", "g4_sssp",
      "mm5_shot_boundary",
      // round-6e additions: retention, BPE, profiling, k-core, diff,
      // containment
      "q59_retention", "t21_bpe_merges", "q60_profile", "g5_kcore",
      "q61_table_diff", "d9_containment",
      // round-6f additions: co-occurrence, debounce, VAD, langid audit
      "g6_cooccur", "q62_debounce", "mm6_vad", "t22_langid_audit",
      "q63_transitions", "q64_rank_family", "q65_twap",
      // round-6g additions: weighted median, novelty, link prediction,
      // resize, incremental dedup, pattern match, rerank, rolling
      // distinct, OHLC, A/B readout
      "q66_weighted_median", "t23_novelty", "g7_linkpred", "mm7_resize",
      "d10_incremental_dedup", "q67_pattern_match", "v9_rerank",
      "q68_rolling_distinct", "q69_ohlc", "q70_ab_test")
    SparkEntry.queries(names.head)(spark, out)
      .write.format("noop").mode("overwrite").save() // warmup
    names.foreach { n =>
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, out).write.format("noop").mode("overwrite").save()
      println(f"SCALE10 $n ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
