from guardian_for_apache_kafka_spark.plans.registry import REGISTRY, EngineQuery, all_queries, oracle_map

# importing the modules populates REGISTRY
from guardian_for_apache_kafka_spark.plans import guardian_queries  # noqa: F401
from guardian_for_apache_kafka_spark.plans import relational_queries  # noqa: F401
from guardian_for_apache_kafka_spark.plans import pipeline_queries  # noqa: F401

# ---------------------------------------------------------------------------
# Rotation policy (round 6+): LEAST-RECENTLY-ATTESTED FIRST.
#
# The external correctness harness checks the first 50 registered queries per
# round, so registration order is a statement of verification priority. Rounds
# 1-5 used a "never-driver-checked first" rotation; that pool is now empty
# (every query in the registry has at least one driver-green row, union of
# r01-r05), so the gate's value comes from re-attesting the stalest veterans.
#
# Mechanics: ``_LAST_ATTESTED`` maps query name -> the latest round with a
# green driver row (rows+schema+hash, no err) in CORRECTNESS_r{N}.json. A name
# absent from the map has never been driver-checked and sorts first (round 0).
# The registry is reordered by (last_attested_round, registration order), so
# the head window always holds the 50 queries whose external signal is oldest
# — new queries enter the window immediately, and freshly-attested ones age
# back toward the head over subsequent rounds with no manual curation.
#
# Per-round maintenance is mechanical: after the driver writes
# CORRECTNESS_r{N}.json, run ``python scripts/update_attestation.py`` to
# regenerate the map below. Promotion safety is unchanged from earlier rounds:
# anything entering the window must be green in the in-repo differential
# harness (plans/differential.run_all) at sf0.01 first; the harness itself
# still checks ALL queries at every sf regardless of window position.
#
# Staleness guarantee (round 6 refinement): a fast-growing registry could
# otherwise starve old veterans — every brand-new query sorts at round 0 and
# a round that adds >50-k queries would evict the k stalest veterans from
# the window indefinitely. So queries whose attestation is VERY stale
# (last green round <= _VERY_STALE_ROUND, maintained by the update script as
# latest attested round - 2) outrank even never-attested queries; new queries fill
# the remaining slots in registration order and overflow waits a round.
# Invariant: no query's external attestation ages more than ~3 rounds, no
# matter how many queries a round adds.
#
# Slot cap (round 7 refinement): the guarantee itself can starve the
# never-attested backlog — after round 6, 38 round-4 veterans hit the
# very-stale bar while 82 round-6 additions had never been driver-checked at
# all; an uncapped guarantee would have spent 38/50 window slots re-attesting
# queries that DO have external evidence (merely old) ahead of queries with
# NONE. Never-attested is the strictly worse state, so the guarantee now
# reserves at most _VERY_STALE_SLOTS head positions per round for the stalest
# very-stale veterans; the remaining very-stale veterans queue immediately
# AFTER the never-attested pool (still ahead of fresher veterans), degrading
# the hard guarantee to FIFO-with-priority until the backlog drains. With an
# empty never-attested pool this is exactly the round-6 behavior.
# ---------------------------------------------------------------------------
#: Names REGISTERED this round (refresh each round alongside the map
#: regeneration): still never-attested, but the round-7 verdict's drain
#: plan wants the OLDER never-attested backlog (registered rounds 6-7,
#: checked by nobody yet) ahead of brand-new queries — module import
#: order would otherwise let new relational_queries additions jump the
#: pipeline_queries backlog. These sort just AFTER the old backlog and
#: just BEFORE the capped very-stale veterans.
_NEW_THIS_ROUND = frozenset({
    "q129_spearman_corr", "q130_kendall_tau", "q131_mann_kendall_trend",
    "q132_turning_points", "q133_runs_test", "q134_anova_dow",
    "q135_lorenz_curve", "q136_link_prediction", "q137_capture_recapture",
    "q138_gumbel_extremes", "s21_rrf_fusion", "s22_rank_agreement",
    "t35_ngram_novelty", "t36_token_length_histogram", "t37_burrows_delta",
    "t38_pmi_collocations", "t39_ngram_coverage_curve",
    "d36_candidate_pair_budget", "d37_prefix_dedup_sweep",
    "g13_compaction_plan", "g14_restore_cost_plan",
    "p17_shard_balance_report", "p18_mixture_fidelity",
    "m11_motion_energy", "m12_patch_signature_dedup",
    "m13_keyframe_selection", "t40_token_dropout_augment",
    "d38_ccnet_quality_buckets", "s23_matryoshka_rerank",
    "s24_hard_negative_mining", "d39_dsir_importance",
    "t41_ngram_diversity", "q139_isotonic_calibration",
    "q140_kaplan_meier", "q141_jsd_drift",
    "p19_length_bucket_padding", "g15_archive_gap_report",
    "q142_conditional_entropy", "q143_quantile_shape",
    "g16_offset_continuity", "p20_token_budget_curation",
    "m14_fps_normalization", "q144_hill_tail_index",
    "s25_filtered_search", "q145_subsequence_search",
    "p21_epoch_shuffle_plan", "q146_disjunctive_pushdown",
    "q147_discrete_quantiles_mode",
})

_VERY_STALE_ROUND = 5  # attested at or before this round => guaranteed slot
_VERY_STALE_SLOTS = 5  # at most this many guaranteed head slots per round
_LAST_ATTESTED: dict[str, int] = {
    # --- begin generated by scripts/update_attestation.py (r01-r07) ---
    "q05_left_outer_join": 4,
    "q06_semi_anti_join": 4,
    "q08_rollup_grouping_sets": 4,
    "q10_window_rank": 4,
    "q20_correlated_subquery": 4,
    "q22_documents_tokens": 4,
    "q23_statistical_aggregates": 4,
    "q31_percentiles": 4,
    "q37_lateral_topk_per_group": 4,
    "d1_dedup_exact_stats": 4,
    "d2_dedup_exact_keepers": 4,
    "d3_ngram_jaccard_pairs": 4,
    "q07_range_join": 4,
    "q11_window_frame_analytic": 4,
    "q17_json_extraction": 4,
    "q21_cte_multiblock": 4,
    "q27_sessionization": 4,
    "q33_value_window_frames": 4,
    "q38_gap_fill_resample": 4,
    "q41_session_window_native": 4,
    "t1_token_stats": 4,
    "t2_lang_token_summary": 4,
    "t3_quality_scores": 4,
    "t4_fingerprint": 4,
    "t5_language_id": 4,
    "q25_asof_join": 4,
    "t6_tfidf_top_terms": 4,
    "d8_deterministic_sample": 4,
    "t7_repetition_stats": 4,
    "q40_hopping_window": 4,
    "t8_quality_filter_report": 4,
    "d9_ngram_containment_pairs": 4,
    "m1_multimodal_features": 4,
    "g8_interrupted_file_parse": 5,
    "g1_record_normalization": 5,
    "g2_time_slice_hourly": 5,
    "g3_anchored_windows": 5,
    "g6_compaction_latest_by_key": 5,
    "g7_offset_resume_filter": 5,
    "q39_salted_skew_join": 5,
    "s1_cosine_topk": 5,
    "d7_dedup_clusters": 5,
    "p2_training_pipeline": 5,
    "s3_knn_classify": 5,
    "d4_minhash_lsh_dedup": 5,
    "q24_approx_aggregates": 5,
    "q42_activity_correlation": 5,
    "q43_temporal_validity_intervals": 5,
    "q44_rolling_zscore_anomaly": 5,
    "q45_funnel_steps": 5,
    "q46_bucketed_colocated_join": 5,
    "q48_sketch_rollup": 5,
    "q49_partition_pruned_scan": 5,
    "q50_table_profile": 5,
    "q51_retention_cohorts": 5,
    "q52_cdc_merge": 5,
    "d5_simhash_pairs": 5,
    "d6_embedding_near_dup": 5,
    "s2_ivf_topk": 5,
    "m2_audio_features": 5,
    "p1_backup_restore_roundtrip": 5,
    "d10_stratified_rebalance": 5,
    "t9_doc_chunks": 5,
    "d11_cluster_representatives": 5,
    "d12_incremental_dedup": 5,
    "s4_decontaminate": 5,
    "s5_kmeans_assign": 5,
    "d13_semantic_dedup": 5,
    "p3_sequence_packing": 5,
    "p4_temperature_mixture": 5,
    "t10_pii_scrub": 5,
    "d14_ngram_decontaminate": 5,
    "t11_token_df_scores": 5,
    "m3_multimodal_fusion": 5,
    "p5_shard_export": 5,
    "t12_normalize_text": 5,
    "m4_video_frames": 5,
    "t13_boilerplate_chunks": 5,
    "d15_bloom_decontaminate": 5,
    "q47_hierarchy_depths": 5,
    "t14_unigram_cross_entropy": 5,
    "q53_pattern_search": 5,
    "q54_sequence_similarity": 5,
    "q01_scan_filter_project": 6,
    "q09_distinct_count": 6,
    "q12_topk": 6,
    "q13_set_ops": 6,
    "q14_string_functions": 6,
    "q15_date_functions": 6,
    "q16_math_functions": 6,
    "q18_array_functions": 6,
    "q19_conditional_null": 6,
    "q28_string_agg": 6,
    "q29_unpivot": 6,
    "q30_window_distribution": 6,
    "q32_exists_subquery": 6,
    "q34_posexplode_ordinality": 6,
    "q35_bitwise_functions": 6,
    "q36_scalar_subquery_select": 6,
    "q26_pivot": 6,
    "q55_incremental_agg_maintenance": 6,
    "q57_snapshot_time_travel": 6,
    "q58_histogram_quantile_rollup": 6,
    "q59_pagerank_fixed_point": 6,
    "q60_rolling_distinct_sketch": 6,
    "q61_scd2_history": 6,
    "q62_runtime_filtered_join": 6,
    "q63_dynamic_partition_pruning": 6,
    "q64_running_balance_with_resets": 6,
    "q65_triangle_counts": 6,
    "q67_snapshot_diff": 6,
    "q66_skyline_pareto": 6,
    "q68_interval_overlap_join": 6,
    "q69_zorder_locality": 6,
    "q70_frequent_pairs": 6,
    "q71_label_propagation": 6,
    "q72_interval_coalesce": 6,
    "q73_association_rules": 6,
    "q74_mad_outliers": 6,
    "q75_last_touch_attribution": 6,
    "q76_time_to_convert": 6,
    "q77_week_over_week": 6,
    "q78_bounce_rate": 6,
    "q79_winsorized_stats": 6,
    "q80_weekly_churn": 6,
    "q81_variant_json_stats": 6,
    "q82_session_paths": 6,
    "q83_frequent_triples": 6,
    "q84_join_skew_report": 6,
    "q85_latency_bands": 6,
    "q86_merge_schema_evolution": 6,
    "q87_bitemporal_asof": 6,
    "q88_silence_gaps": 6,
    "q02_hash_aggregate_tpch_q1": 7,
    "q03_multiway_join": 7,
    "q04_broadcast_join": 7,
    "g4_fromwhen_filter": 7,
    "g5_topic_rename": 7,
    "q89_guarded_sequence": 7,
    "q90_scd2_fact_join": 7,
    "q91_event_debounce": 7,
    "q92_write_conflicts": 7,
    "q93_range_split_points": 7,
    "q94_cube_aggregate": 7,
    "q95_audience_overlap": 7,
    "q96_diverse_topk": 7,
    "q97_gini_concentration": 7,
    "q98_markov_transitions": 7,
    "q99_referential_audit": 7,
    "q100_contract_checks": 7,
    "q102_ewma_smoothing": 7,
    "q103_k_anonymity": 7,
    "q104_seasonal_decomposition": 7,
    "q105_linear_attribution": 7,
    "q106_fifo_allocation": 7,
    "q107_ab_test_chisquare": 7,
    "q108_subtree_rollup": 7,
    "q109_psi_drift": 7,
    "q110_retention_halflife": 7,
    "q111_ipf_raking": 7,
    "q112_benford_audit": 7,
    "q113_peak_concurrency": 7,
    "q114_clamped_balance": 7,
    "q115_abc_pareto": 7,
    "q116_linear_trend": 7,
    "q117_decile_lift": 7,
    "q118_cohort_ltv": 7,
    "q119_autocorrelation": 7,
    "q120_cusum_changepoint": 7,
    "q121_l_diversity": 7,
    "q122_auc_mann_whitney": 7,
    "q123_ks_drift": 7,
    "q124_holt_smoothing": 7,
    "q125_weighted_median": 7,
    "q126_theil_sen_slope": 7,
    "q127_g_test_independence": 7,
    "q128_seasonal_naive_skill": 7,
    "t15_bigram_cross_entropy": 7,
    "t16_vocab_growth": 7,
    "q56_heavy_hitters": 7,
    "s6_mmr_diverse_topk": 7,
    "s7_quantized_rerank": 7,
    "s14_pq_adc_topk": 7,
    # --- end generated ---
}


def _reorder_registry() -> None:
    """Reorder REGISTRY least-recently-attested first (stable within a round)."""
    unknown = sorted(set(_LAST_ATTESTED) - set(REGISTRY))
    if unknown:
        # a renamed/removed query must not silently detach its attestation
        # history (the old _TAIL had the same strictness): fix the map
        raise ValueError(f"_LAST_ATTESTED names not in REGISTRY: {unknown}")
    names = list(REGISTRY)
    order = {n: i for i, n in enumerate(names)}

    very_stale = sorted(
        (n for n in names if _LAST_ATTESTED.get(n, 99) <= _VERY_STALE_ROUND),
        key=lambda n: (_LAST_ATTESTED[n], order[n]),
    )
    guaranteed = set(very_stale[:_VERY_STALE_SLOTS])

    def rank(n: str) -> tuple[float, int]:
        last = _LAST_ATTESTED.get(n)
        if n in guaranteed:
            # capped very-stale veterans: hard-guaranteed head slots
            return (-1.0, order[n])
        if last is None:
            if n in _NEW_THIS_ROUND:
                # this round's additions: behind the OLDER never-attested
                # backlog, still ahead of very-stale-beyond-the-cap
                return (_VERY_STALE_ROUND + 0.6, order[n])
            # never attested: ahead of everything except guaranteed veterans
            return (_VERY_STALE_ROUND + 0.5, order[n])
        if last <= _VERY_STALE_ROUND:
            # very-stale beyond the cap: right behind the never-attested pool,
            # still ahead of fresher veterans
            return (_VERY_STALE_ROUND + 0.75, order[n])
        return (float(last), order[n])

    ranked = sorted(names, key=rank)
    ordered = {n: REGISTRY[n] for n in ranked}
    REGISTRY.clear()
    REGISTRY.update(ordered)


_reorder_registry()

__all__ = ["REGISTRY", "EngineQuery", "all_queries", "oracle_map"]
