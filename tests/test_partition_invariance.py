"""Partition-count invariance: the engine's exact-arithmetic claims
(integer cents, nano-int folds, dimension-order dot products,
deterministic tiebreaks), tested against the engine itself.

The DuckDB oracle harness proves Spark matches an independent engine
at ONE parallelism. This module proves the results don't depend on
the parallelism: each query runs under 32 and then 7 shuffle
partitions — different partial-aggregation grouping, different merge
order, different task boundaries — and must produce identical
normalized rows. Any float accumulation leaking into a result would
fork here long before a 1000-executor cluster makes the ordering
truly adversarial.

Queries chosen: every headline-family query whose output includes a
float aggregate, a ranked window, or an iterative composition.
"""

from __future__ import annotations

import pytest

from kittispark import registry
from tests.oracle_harness import _norm_rows

SF = "/root/testdata/sf0.01"

INVARIANCE_SET = [
    "q1_pricing_summary",
    "q5_region_revenue",
    "tumbling_window_counts",
    "moving_avg_time_range",
    "bootstrap_ci_mean",
    "kmeans_two_iterations",
    "pagerank_nation_flow",
    "bigram_lm_score",
    "tfidf_top_terms",
    "embedding_whitening",
    "jl_projection_audit",
    "weighted_median_supplier_price",
    "semantic_dedup_clustered",
    "minhash_lsh_candidates",
    "hll_sketch_rollup",
    "weighted_reservoir_sample",
    # round-6 float-emitting / ranked / iterative additions
    "ols_price_vs_quantity",
    "welch_ttest_value",
    "mad_outlier_profile",
    "ewma_user_value",
    "triangle_count_parts",
    "graph_label_propagation",
    "bigram_collocation_lift",
    "term_keyness_chisq",
    "pareto_front_orders",
    "dim_truncation_recall",
    "ivfadc_topk",
    "time_to_convert_profile",
    "daily_drift_report",
    "readability_profile",
    "neyman_allocation",
    # round-6 continuation wave (two-level cumsum; ranked decimal
    # distances; collected-vocab greedy segmentation; pair Jaccard)
    "heaps_vocab_growth",
    "embedding_centroid_outliers",
    "wordpiece_segment_vocab",
    "source_overlap_jaccard",
    # grouped_rank / global_rank consumers: per-group order
    # statistics must not depend on partition count
    "trimmed_winsorized_value",
    "quantile_normalize_doclen",
    # r6 second continuation: rank/ntile-derived plans (global_rank
    # NTILE closed form; per-stratum hash-order dealing), the
    # float-emitting tokenizer/LM ratios, and the hash-keyed
    # perceptual clusters
    "curriculum_phase_mix",
    "stratified_kfold_assign",
    "tokenizer_fertility_by_source",
    "kneser_ney_bigram",
    "media_phash_clusters",
    "mlm_masking_plan",
    "kanonymity_audit",
    "record_linkage_blocked_pairs",
    "unigram_seed_vocab",
    "phash_hamming_near_dup",
    "audio_fingerprint_clusters",
    "video_phash_signature",
    "contrastive_margin_mining",
    "farthest_point_coreset",
    "dataset_card_report",
    "rouge1_eval_overlap",
    "vocab_coverage_curve",
    "span_corruption_plan",
    "lang_confusion_matrix",
    "watermark_lateness_profile",
    "dedup_threshold_curve",
    # r7: the LSH-fed curve (banded candidate join + integer
    # thresholds), the box-ordinal ranked wireframe expansion, and
    # the envelope-derived plane meshes
    "dedup_threshold_curve_lsh",
    "wireframe_edge_segments",
    "plane_mesh_vertices",
]


def _run(spark, name: str, shuffle_partitions: int):
    spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    try:
        df = registry.all_specs()[name].fn(spark, SF)
        return df.columns, [tuple(r) for r in df.collect()]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", "32")


@pytest.mark.parametrize("name", INVARIANCE_SET)
def test_result_invariant_under_partitioning(spark, name):
    cols_a, rows_a = _run(spark, name, 32)
    cols_b, rows_b = _run(spark, name, 7)
    assert cols_a == cols_b
    assert _norm_rows(cols_a, rows_a) == _norm_rows(cols_b, rows_b), name
