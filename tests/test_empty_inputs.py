"""Empty-input robustness: every table present with its exact schema
but ZERO rows — the degenerate case every 100 TB pipeline hits
(a filter that matches nothing, a new partition, a fresh index).

The round-5 empty-fixture sweep surfaced 20 failures: 8 are
DOCUMENTED PRECONDITIONS that raise clear errors by contract (the
7 KITTI file queries need >= 160 document rows to synthesize their
binary fixtures; stream_merge_upsert needs >= 2 micro-batches of
source data), and the rest were fixable divergences (raw numpy axis
errors in IVF training/append, an unguarded argmax collect in the
BPE learner, UNABLE_TO_INFER_SCHEMA on freshly initialized
partitioned datasets, ANSI div-by-zero in audit rates, and Spark
omitting ROLLUP/CUBE grand-total rows that DuckDB emits). All are
fixed; EMPTY_PINNED below pins every query whose code or oracle the
fix commit (6d8c26f) touched — including the three that shared a
fixed helper rather than failing directly (distinct_agg,
weighted_median_supplier_price, ann_ivf_indexed_match), per ADVICE
r5's count-reconciliation ask.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from kittispark import registry
from tests.oracle_harness import compare

EMPTY_PINNED = [
    "group_rollup",
    "group_cube",
    "grouping_sets_explicit",
    "approx_count_distinct",
    "constraint_audit_report",
    "partitioned_write_prune",
    "incremental_dedup_batch",
    "bpe_learn_merges",
    "bpe_segment_corpus",
    "ann_ivf_recall",
    "ann_ivf_index_append",
    "distinct_agg",
    "weighted_median_supplier_price",
    "ann_ivf_indexed_match",
]

# Round-6 additions: none of these needed an empty-input fix (they
# were born under the per-addition fixture sweep), but pin them so a
# refactor can't regress the zero-row path between sweeps.
R6_EMPTY_GREEN = [
    "graph_degree_histogram",
    "triangle_count_parts",
    "graph_label_propagation",
    "ols_price_vs_quantity",
    "welch_ttest_value",
    "mad_outlier_profile",
    "ewma_user_value",
    "interval_sweep_coverage",
    "dim_truncation_recall",
    "pareto_front_orders",
    "table_profile_report",
    "sentence_split_profile",
    "token_diversity_index",
    "bigram_collocation_lift",
    "term_keyness_chisq",
    "ivfadc_topk",
    "cumulative_distinct_users",
    "nearest_event_tolerance_join",
    "time_to_convert_profile",
    "daily_drift_report",
    "readability_profile",
    "neyman_allocation",
    "heaps_vocab_growth",
    "source_overlap_jaccard",
    "embedding_centroid_outliers",
    "wordpiece_segment_vocab",
    "trimmed_winsorized_value",
    "quantile_normalize_doclen",
    "split_leakage_audit",
]

# Round-6 second-continuation wave: kanonymity_audit needed one
# empty-input fix at landing (Spark sum(when) is NULL over zero rows
# where DuckDB count FILTER is 0 — coalesced), curriculum_phase_mix
# needed the explicit NULLS FIRST ordering contract; the rest were
# born green. Pinned like the rest so refactors can't regress.
R6C_EMPTY_GREEN = [
    "kanonymity_audit",
    "record_linkage_blocked_pairs",
    "curriculum_phase_mix",
    "tokenizer_fertility_by_source",
    "unigram_seed_vocab",
    "media_phash_clusters",
    # training-prep / LM / image-pairs wave: born green on the empty
    # fixture (coalesced zero-row sums and NULL-text guards written
    # at authoring time).
    "mlm_masking_plan",
    "stratified_kfold_assign",
    "kneser_ney_bigram",
    "phash_hamming_near_dup",
    "audio_fingerprint_clusters",
    "video_phash_signature",
    # data-selection wave: farthest_point_coreset needed one
    # empty-input fix at landing (the oracle's seed aggregate emits
    # a NULL row over an empty corpus where the operator returns
    # nothing — HAVING-guarded); the other two were born green.
    "contrastive_margin_mining",
    "farthest_point_coreset",
    "dataset_card_report",
    # eval-prep wave: born green on every regime including empty.
    "rouge1_eval_overlap",
    "vocab_coverage_curve",
    "span_corruption_plan",
    "lang_confusion_matrix",
    # pipeline-tuning wave: watermark_lateness_profile needed the
    # zero-row coalesce (same class as kanonymity_audit's landing
    # fix); the threshold curve was born green.
    "watermark_lateness_profile",
    "dedup_threshold_curve",
]
EMPTY_PINNED = EMPTY_PINNED + R6_EMPTY_GREEN + R6C_EMPTY_GREEN

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="session")
def empty_dir(tmp_path_factory) -> str:
    dst = tmp_path_factory.mktemp("sfempty")
    con = duckdb.connect()
    for t in TABLES:
        src = f"/root/testdata/sf0.001/{t}.parquet"
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}') WHERE false) "
            f"TO '{os.path.join(dst, t)}.parquet' (FORMAT PARQUET)"
        )
    con.close()
    return str(dst)


@pytest.mark.parametrize("name", EMPTY_PINNED)
def test_empty_input_oracle_parity(spark, empty_dir, name):
    spec = registry.all_specs()[name]
    compare(spec.fn(spark, empty_dir), spec.oracle, empty_dir, name)
