package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection tool: prints `explain("formatted")` for the named
  * queries (or a default set of plan-critical ones) so pushdown, pruning,
  * broadcast choice, and codegen spans can be audited per round.
  *
  * Usage: runMain graft.Explain [sfDir] [queryName...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q_scan", "q_partition_prune", "q_multimodal_join", "q_pricing_summary",
        "q_topk_cosine", "q_near_dup", "q_sessionize", "q_ngram_jaccard", "q_dedup_first",
        "q_contamination", "q_upsert_bucketed", "q_lsh_verified", "q_ivf_assign",
        "q_asof_join", "q_range_join", "q_rolling_agg", "q_quantiles", "q_salted_join",
        "q_sample_stratified", "q_rollup", "q_pivot", "q_corpus_diff", "q_sliding_window",
        "q_count_distinct", "q_seq_build", "q_vocab", "q_dup_clusters",
        // round 5
        "q_cube", "q_lead_lag", "q_ntile", "q_intersect", "q_except", "q_gap_fill",
        "q_inverted_index", "q_cooccur", "q_keywords", "q_heavy_hitters",
        "q_bloom_join", "q_topk_agg", "q_skew_agg", "q_median", "q_outliers", "q_event_join",
        "q_grouping_sets", "q_minhash_est", "q_near_dup_purge", "q_union_dedup",
        "q_rank_stats", "q_string_fns", "q_date_rollup", "q_correlation",
        // round 7
        "q_emb_dup_clusters", "q_emb_dup_purge", "q_upsert_pruned",
        // round 8
        "q_upsert_pruned_grouped", "q_lm_familiarity", "q_ann_srp",
        "q_ann_srp_probe", "q_repetition", "q_heavy_hitters",
        // round 9
        "q_partition_prune_keep", "q_repeated_passages", "q_dup_window_share",
        "q_pii_screen", "q_filter_funnel", "q_profile", "q_mix_quota",
        "q_strip_dup_spans", "q_diverse_sample", "q_time_travel", "q_snapshot_diff",
        "q_incr_dedup", "q_chunk_docs", "q_winnow", "q_semdedup",
        "q_incr_dedup_exact", "q_zorder_prune", "q_incr_dedup_pruned",
        "q_incr_dedup_lsh_pruned",
        // round 11
        "q_ivf_train", "q_ivf_probe", "q_seq_pack", "q_sq_quantize",
        // round 12
        "q_ivf_probe_repo")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n======== $n ========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    // checkpoint-ending queries explain as one `Scan ExistingRDD` line —
    // dump their stage pipelines with the barriers disabled so the
    // candidate/verify plans stay auditable
    graft.ops.Queries.auditStages(spark, sfDir).foreach { case (n, df) =>
      println(s"\n======== stage $n (Ckpt disabled for audit) ========")
      df.explain("formatted")
    }
    spark.stop()
  }
}
