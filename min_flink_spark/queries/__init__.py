"""Aggregates every query module into the driver-facing registry."""

from min_flink_spark.registry import ORACLE, QUERIES

# Importing a module registers its queries via the @query decorator.
from min_flink_spark.queries import analytics_q  # noqa: F401
from min_flink_spark.queries import core_surface  # noqa: F401
from min_flink_spark.queries import functions_q  # noqa: F401
from min_flink_spark.queries import llm  # noqa: F401
from min_flink_spark.queries import pipeline_q  # noqa: F401
from min_flink_spark.queries import relational  # noqa: F401
from min_flink_spark.queries import streaming_q  # noqa: F401
from min_flink_spark.queries import subqueries_q  # noqa: F401
from min_flink_spark.queries import windows  # noqa: F401

# The driver's correctness gate checks registry queries in dict order
# and covers only a fixed 50-slot prefix per round (CORRECTNESS_r1-r5
# each stop at exactly 50 rows).  The prefix therefore ROTATES:
# queries whose Spark plan or oracle SQL changed since their last
# driver row come first, then never-driver-checked queries, then the
# longest-unchecked.  Round 5 wasted its gate by not executing the
# written rotation; the ordering below is now mechanically enforced by
# tests/test_rotation.py against tools/rotation_ledger.json — refresh
# the ledger (python tools/rotation_ledger.py --write) ONLY when
# rearranging this list.
#
# ROUND-13 PREFIX (positions 1-50), executing the r12 verdict item 1
# (the written r13 rotation: the 21 r7-evidence leftovers + the first
# r8 rows) with r13's own changed/new queries jumping ahead (changed
# always first):
#   1-5   changed in r13:
#         (a) keyed_sum_first_record — its arrival-ordered float fold
#         gained the FOLD_MAX_GROUP_ROWS group-size guard (verdict
#         r12 item 2: the per-group collect_list array is O(group)
#         executor memory; pathological hot keys now fail loudly with
#         the remediation named instead of drifting into an opaque
#         executor OOM). Results at gate scale invariant; the plan
#         gains a count + guarded projection.
#         (b) mg_per_lang_top_terms — contract redesigned from
#         bit-exact-because-vocab≤m (a toy-data argument) to the
#         containment/bound certificate mg_heavy_hitters carries
#         (m 64→128), which holds at ANY vocabulary — unblocking the
#         r13 few-thousand-word sf1 corpus (verdict r12 item 3).
#         (c) tfidf_top_terms — profiled at sf1: Catalyst's column
#         pruning specialized the three tf-derived legs, ReuseExchange
#         never fired, and the corpus was tokenized THREE times; the
#         per-term df and per-doc length are now WINDOW aggregates
#         over the single tf frame (one tokenize, zero joins, same
#         shuffle budget; sf0.1 headline 1.39→1.00 s).
#         (d)+(e) bpe_merge_training / bpe_tokenized_lengths — the
#         same scan-count audit found lineage recomputation multiplied
#         the corpus tokenize 7×/9×; the word-type table is now
#         localCheckpoint-ed at the corpus boundary (scans → 0/1 in
#         the executed plans; per-round checkpoints measured and
#         REJECTED — barriers cost more than vocab-sized recompute),
#         with attach/carry/release backing discipline throughout.
#   6     BRAND-NEW in r13: exact_percentile_grid — the first-class
#         contract pin for operators/pipeline.exact_percentiles
#         (verdict r12 item 5): multi-q grid, nulls inside live
#         groups, an all-null group preserved by the documented
#         left-join composition, quantile_cont op-tree interpolation.
#   7-27  the last 21 r7-evidence rows (pii_redaction …
#         waiting_supplier_counts — alphabetical, mechanically sorted
#         by (last driver round, name); this retires r7 from the
#         staleness histogram),
#   28-50 the first 23 of the 39 r8-evidence rows (ann_pq_topk …
#         nested_field_sum_first_record; null_semantics_sampler opens
#         the r14 tail at position 51).
#
# ROUND-14 ROTATION NOTE (positions 51+ are already in promotion
# order — mechanically: everything outside the r13 head sorted by
# (last driver round, name)): the 16 r8 leftovers at 51-66
# (null_semantics_sampler … zorder_key_events), then the r9, r10,
# r11, and r12 blocks.  Promote 51-onward next round — r14's 50 slots
# take the 16 r8 rows and the first 34 of the r9 block; any query
# changed during round 14 jumps ahead of everything (changed always
# first).
# The guardrail test enforces this shape — re-sorting this list IS
# the rotation.
_PRIORITY = [
    # ---- 1-5: changed in r13 (see note above) ----
    "keyed_sum_first_record",
    "mg_per_lang_top_terms",
    "tfidf_top_terms",
    "bpe_merge_training",
    "bpe_tokenized_lengths",
    # ---- 6: BRAND-NEW in r13 (exact_percentiles contract pin) ----
    "exact_percentile_grid",
    # ---- 7-27: the last 21 r7-evidence rows ----
    "pii_redaction",
    "prototype_label_agreement",
    "quality_filter_flags",
    "range_join_price_bands",
    "repetition_signals",
    "resample_1h_forward_fill",
    "salted_skew_aggregation",
    "salted_skew_join",
    "sequence_packing",
    "session_window_4h",
    "session_window_dynamic_gap",
    "simhash_hamming_pairs",
    "sketch_quantiles_merged",
    "sliding_window_1d_6h",
    "small_quantity_revenue",
    "streaming_complete_topk",
    "streaming_dedup",
    "streaming_dedup_within_watermark",
    "streaming_event_time_timer",
    "streaming_sketch_quantiles",
    "waiting_supplier_counts",
    # ---- 28-50: first 23 of the 39 r8 rows (gate ends at 50;
    #      null_semantics_sampler opens the r14 tail at position 51) ----
    "ann_pq_topk",
    "approx_aggregates",
    "bigram_top_pairs",
    "chunk_retrieval_topk",
    "conversation_assembly",
    "count_window_blocks",
    "custom_pysource_events",
    "customer_order_distribution",
    "declining_streak_users",
    "event_funnel_conversion",
    "html_text_extraction",
    "idle_rich_customers",
    "incremental_near_dup_matches",
    "json_props_stats",
    "kmv_distinct_users",
    "kmv_rollup_distinct",
    "kmv_windowed_distinct",
    "large_volume_customers",
    "lateral_top2_orders",
    "left_join_order_item_stats",
    "map_function_sampler",
    "minmax_normalized_values",
    "nested_field_sum_first_record",
    # ---- 51-66: last 16 r8 rows (r14 opens here — see note) ----
    "null_semantics_sampler",
    "part_value_concentration",
    "per_domain_cap",
    "positional_tokens",
    "promo_revenue_share",
    "streaming_interval_join",
    "streaming_session_window",
    "streaming_sliding_window",
    "streaming_tumbling_window",
    "streaming_wordcount",
    "tumbling_window_daily",
    "url_domain_filter",
    "weighted_sample_topk",
    "window_distribution_funcs",
    "window_range_frame_1h",
    "zorder_key_events",
    # ---- r9 rows ----
    "ann_ivf_topk",
    "ann_lsh_topk",
    "anti_join_no_urgent_customers",
    "asof_join_click_to_signup",
    "bloom_bigm_prefilter_join",
    "bloom_prefilter_join",
    "bucket_pruned_point_lookup",
    "coarse_to_fine_topk",
    "correlated_subquery_big_orders",
    "cube_order_status_priority",
    "dedup_clusters",
    "dedup_exact",
    "dedup_minhash_lsh",
    "deterministic_sample",
    "distinct_user_event_types",
    "doc_fingerprint",
    "embedding_cosine_topk",
    "lpa_communities_copurchase",
    "mg_heavy_hitters",
    "pagerank_copurchase",
    "recency_decay_weights",
    "recursive_event_chains",
    "returned_item_customers",
    "semantic_dedup_survivors",
    "set_ops_all_multiset",
    "sketch_quantiles_windowed",
    "skew_report",
    "streaming_bloom_filter_join",
    "streaming_cep_absence",
    "streaming_cep_followed_by",
    "streaming_connect_coprocess",
    "streaming_outer_interval_join",
    "streaming_running_reduce",
    "substring_dedup",
    "text_chunking",
    "train_val_test_split",
    "unigram_surprisal_score",
    "variant_json_stats",
    "vocab_oov_rate",
    "zscore_standardized_values",
    # ---- r10 rows ----
    "cheapest_supplier_per_type",
    "concentrated_suppliers",
    "embedding_near_dup_pairs",
    "embedding_quantize_int8",
    "flatmap_wordcount",
    "full_outer_join_balances",
    "heavy_hitter_terms",
    "keyed_max_by_record",
    "keyed_min_by_record_last",
    "keyed_min_first_record",
    "language_id",
    "levenshtein_rerank",
    "map_filter_project",
    "market_share",
    "media_byte_stats",
    "mg_weighted_top_customers",
    "mg_windowed_top_events",
    "model_quality_scores",
    "ngram_jaccard_pairs",
    "pivot_event_counts",
    "pricing_summary",
    "product_profit_by_nation_year",
    "regexp_extract_props",
    "revenue_by_nation",
    "rollup_acctbal",
    "running_reduce_sum",
    "scalar_function_sampler",
    "semi_join_urgent_customers",
    "set_ops_users",
    "shipping_priority",
    "simhash_docs",
    "sketch_quantiles_key_rollup",
    "stratified_sample",
    "streaming_sketch_quantiles_windowed",
    "streaming_static_join",
    "supplier_part_counts",
    "text_stats",
    "top100_orders_global",
    "top3_orders_per_priority",
    "top_supplier_revenue",
    "union_rebalance",
    "unpivot_lineitem_metrics",
    # ---- r11 rows ----
    "bigram_lm_surprisal",
    "bucketed_cobucket_join_stats",
    "char_entropy_quality",
    "cluster_sample_events",
    "cohort_retention",
    "compaction_plan_bins",
    "concurrent_sessions_sweep",
    "contrastive_negative_pairs",
    "copurchase_pmi_top",
    "count_window_sliding",
    "dp_noisy_counts",
    "er_candidate_features",
    "event_transition_probs",
    "forecast_revenue_change",
    "funnel_time_to_convert",
    "group_aware_split",
    "image_header_dims",
    "incremental_stats_merge",
    "k_anonymity_report",
    "kmv_keyed_windowed_distinct",
    "late_shipment_priority_counts",
    "local_supplier_volume",
    "mad_outlier_flags",
    "multi_format_roundtrip",
    "nested_rollup_roundtrip",
    "pandas_udaf_geomean",
    "partitioned_pruned_read",
    "rfm_customer_scores",
    "scd2_user_state_intervals",
    "schema_evolution_union",
    "snapshot_diff_statuses",
    "split_leakage_report",
    "streaming_cep_times",
    "streaming_chained_windows",
    "streaming_csv_source_counts",
    "streaming_pysource_counts",
    "streaming_side_outputs",
    "temporal_table_join",
    "triangle_counts_copurchase",
    "video_mp4_stats",
    "volume_shipping",
    "weekly_active_growth",
    # ---- r12 rows ----
    "array_function_sampler",
    "audio_wav_stats",
    "bfs_reach_copurchase",
    "bitmap_keyed_windowed_ops",
    "bitmap_segment_ops",
    "bitmap_windowed_retention",
    "cms_keyed_windowed_counts",
    "cms_term_frequencies",
    "cms_windowed_counts",
    "contamination_overlap",
    "corpus_drift_report",
    "cross_join_status_grid",
    "csv_corrupt_record_quarantine",
    "datetime_function_sampler",
    "dedup_keep_best",
    "disjunctive_predicate_revenue",
    "domain_mix_sample",
    "either_tagged_union",
    "embedding_normalize_project",
    "epoch_shuffle_index",
    "explode_outer_tokens",
    "global_sort_expensive_orders",
    "grouping_sets_revenue",
    "incremental_dedup",
    "incremental_hll_merge",
    "interevent_gap_histogram",
    "kcore_copurchase",
    "kmv_segment_overlap",
    "length_bucketed_batches",
    "media_frame_sampling",
    "median_and_central_tendency",
    "mg_keyed_windowed_top_events",
    "paragraph_dedup",
    "streaming_bitmap_keyed_windowed_ops",
    "streaming_bitmap_segment_ops",
    "streaming_bitmap_windowed_retention",
    "streaming_cms_counts",
    "streaming_cms_keyed_windowed_counts",
    "streaming_cms_windowed_counts",
    "streaming_kmv_distinct",
    "streaming_kmv_keyed_windowed_distinct",
    "streaming_kmv_windowed_distinct",
    "streaming_mg_heavy_hitters",
    "streaming_mg_keyed_windowed_top_events",
    "streaming_mg_windowed_top_events",
    "trend_slope_by_type",
    "value_percentiles",
    "window_rank_lag",
    "winsorized_values",
]


def _reorder() -> None:
    ordered = {n: QUERIES[n] for n in _PRIORITY if n in QUERIES}
    ordered.update((n, f) for n, f in QUERIES.items() if n not in ordered)
    QUERIES.clear()
    QUERIES.update(ordered)


_reorder()

__all__ = ["ORACLE", "QUERIES"]
