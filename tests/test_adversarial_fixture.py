"""Adversarial-fixture oracle parity: the round-5 depth gate.

scripts/gen_adversarial.py distorts a driver sf dir with the inputs
real 100 TB corpora contain but the clean generator never emits —
NULLs in every nullable column, heavy key skew, one shared duplicate
timestamp, zero-norm and duplicate embeddings, and a unicode zoo
(NFD, ZWJ emoji, RTL, CJK, zero-width, surrogate pairs, Thai). Every
query pinned here previously CRASHED (ANSI DIVIDE_BY_ZERO) or
diverged from its DuckDB oracle on that fixture; the full census
lives in SCALING.md ("Round-5 adversarial sweep").

The list grows as divergence classes are fixed — a query joins the
pin the commit its fix lands.
"""

from __future__ import annotations

import pytest

from kittispark import registry
from tests.oracle_harness import compare

# fixed divergence classes, pinned on the adversarial fixture:
# A: ANSI DIVIDE_BY_ZERO on zero-norm vectors / zero-weight docs
ADVERSARIAL_PINNED = [
    "cosine_topk_bruteforce",
    "ann_lsh_topk",
    "ann_ivf_recall",
    "ann_ivf_topk",
    "embedding_decontamination",
    "rank_fusion_rrf",
    "hamming_recall_vs_cosine",
    "weighted_reservoir_sample",
    "cosine_near_dup",
    # B: NULL-ordering / NULL-timestamp contracts (windows, temporal)
    "running_sum",
    "lag_delta",
    "first_last_value",
    "tumbling_window_counts",
    "sessionization",
    "asof_join_latest_click",
    "resample_ffill_grid",
    "scd2_user_value_history",
    "temporal_interval_lookup",
    "rollup_incremental_maintain",
    "event_transition_matrix",
    # C: unicode/text contracts (ASCII case fold, NULL text, CSV trim)
    "tfidf_top_terms",
    "simhash_candidates",
    "quality_filter_composite",
    "vocab_edit_distance_pairs",
    "csv_corpus_roundtrip",
    # D: NULL-stat zones are never prunable
    "zonemap_skip_audit",
    "zorder_layout_audit",
    # sessions: NULL event time belongs to no session (tracker was
    # batch-order-flaky on NaT ticks before the ingress filter)
    "tokenizer_chunk_windows",
    "stream_session_counts",
    "stream_session_tracker",
    "stream_tumbling_counts",
    "stream_sliding_avg",
    "unicode_nfc_normalize",
    # scale-revealed ulp fork in the RANGE-frame average (fixed via
    # exact integer cents; reproduces only at adversarial-sf0.1 hot
    # keys, pinned here for the NULL-value/NULL-ts handling)
    "moving_avg_time_range",
]


@pytest.fixture(scope="session")
def adv_dir(tmp_path_factory) -> str:
    from scripts.gen_adversarial import generate

    # sf0.01 — the driver's own gate scale: the ANN recall floors
    # (ann_lsh_topk >= 1 hit/query etc.) are calibrated there, and the
    # sweep that produced the pinned census ran there.
    dst = tmp_path_factory.mktemp("sfadv")
    generate("/root/testdata/sf0.01", str(dst))
    return str(dst)


@pytest.mark.parametrize("name", ADVERSARIAL_PINNED)
def test_adversarial_oracle_parity(spark, adv_dir, name):
    spec = registry.all_specs()[name]
    compare(spec.fn(spark, adv_dir), spec.oracle, adv_dir, name)


def test_generator_is_deterministic(tmp_path):
    """Two generate() runs must produce byte-identical parquet — the
    fixture is pure key-modulo + literal payloads, so the sweeps and
    pins are reproducible bit-for-bit across sessions."""
    import filecmp

    from scripts.gen_adversarial import generate

    a, b = tmp_path / "a", tmp_path / "b"
    generate("/root/testdata/sf0.001", str(a))
    generate("/root/testdata/sf0.001", str(b))
    for f in sorted(p.name for p in a.iterdir()):
        assert filecmp.cmp(a / f, b / f, shallow=False), f
