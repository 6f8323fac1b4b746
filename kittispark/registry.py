"""Named query registry.

Every operator the engine claims (SURVEY.md §2 + the LLM-data-pipeline
extensions) is registered here as a ``QuerySpec``: a callable
``(spark, sf_dir) -> DataFrame`` plus, where ANSI-SQL-expressible, the
equivalent DuckDB oracle SQL. ``__spark_entry__.queries()`` /
``oracle_sql()`` are thin views over this registry — the driver's
correctness gate runs both sides and hash-compares.

Column-name discipline: the driver sorts columns by name before
hashing, so every computed column is aliased identically in the Spark
code and the SQL. Float aggregates are rounded identically on both
sides so value hashes are stable across engines.
"""

from __future__ import annotations

import functools
import importlib
import os
import tempfile
import zipfile
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, "QuerySpec"] = {}

# Modules that register queries on import (kept explicit so a broken
# optional module can't silently drop half the surface). Order matters:
# the driver's correctness gate adjudicates the first 50 registered
# queries, so the families without a prior driver verdict come first.
_QUERY_MODULES = (
    "kittispark.queries.governance",
    "kittispark.queries.training_prep",
    "kittispark.queries.data_selection",
    "kittispark.queries.eval_prep",
    "kittispark.queries.pipeline_tuning",
    "kittispark.queries.curation",
    "kittispark.queries.storage_ops",
    "kittispark.queries.vectors_ext",
    "kittispark.queries.corpus_ext",
    "kittispark.queries.sampling_stats",
    "kittispark.queries.graph",
    "kittispark.queries.stats_ml",
    "kittispark.queries.corpus_analytics",
    "kittispark.queries.kitti_files",
    "kittispark.queries.llm_pipeline",
    "kittispark.queries.corpus_lm",
    "kittispark.queries.text",
    "kittispark.queries.dedup",
    "kittispark.queries.similarity",
    "kittispark.queries.kitti",
    "kittispark.queries.multimodal",
    "kittispark.queries.streaming",
    "kittispark.queries.events",
    "kittispark.queries.relational",
    "kittispark.queries.windows",
    "kittispark.queries.tpch_suite",
    "kittispark.queries.analytics_ext",
)

# Queries with a green (hash_match) driver verdict, mapped to the
# LAST round that verdict was issued (CORRECTNESS_r{N}.json).
# queries()/oracle_sql() list never-green queries first so the
# driver's 50-query window always covers the freshest signal; banked
# greens fill the remaining slots LEAST-RECENTLY-VERIFIED FIRST
# (round-robin recheck — ADVICE r2: a fixed fresh-first/banked-last
# order left ~41 greens permanently unrechecked while their shared
# operators kept changing). GENERATED from the CORRECTNESS files by
# scripts/update_green_bank.py (VERDICT r3 #6: hand-maintained maps
# go stale and silently mis-prioritize the rotation); rerun it each
# round, and list post-verdict rewrites in _REVERIFY below.
from kittispark._green_bank import DRIVER_GREEN as _DRIVER_GREEN


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None = None  # DuckDB SQL twin; None → rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


def register(
    name: str, oracle: str | None = None, doc: str = "", tags: tuple[str, ...] = ()
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(name, fn, oracle, doc or (fn.__doc__ or ""), tags)
        return fn

    return deco


def _load_all() -> None:
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)


# Queries whose banked verdict was voided by a rewrite (output or
# oracle changed after adjudication). They need a new driver verdict,
# but every NEVER-adjudicated query outranks them for window slots:
# these already carry exhaustive local multi-SF verification of the
# new form, the truly-fresh ones have no driver signal at all.
_REVERIFY: frozenset[str] = frozenset(
    {
        # r5 adversarial-sweep fixes, class A (null-safe cosine /
        # positive-weight contracts — SCALING.md "Round-5 adversarial
        # sweep"): banked verdicts predate the NULLIF/zero-norm
        # exclusion rewrite, so they need fresh adjudication.
        # (cosine_topk_bruteforce, tfidf_top_terms, simhash_candidates,
        # quality_filter_composite, incremental_dedup_batch were the
        # first 5 in registry order; re-adjudicated GREEN in
        # CORRECTNESS_r05.json and removed at r6 start. The 25 below
        # head the r6 window under the fresh-first policy.)
        "ann_lsh_topk",
        "ann_ivf_recall",
        "ann_ivf_indexed_match",
        "ann_ivf_topk",
        "embedding_decontamination",
        "rank_fusion_rrf",
        "cosine_near_dup",
        # class B (explicit NULL-ordering / NULL-timestamp contracts
        # in the window & temporal family):
        "running_sum",
        "lag_delta",
        "first_last_value",
        "tumbling_window_counts",
        "sessionization",
        "asof_join_latest_click",
        "resample_ffill_grid",
        "scd2_user_value_history",
        "temporal_interval_lookup",
        # streaming session contracts (NULL event time -> no session;
        # the tracker was batch-order-FLAKY on NaT ticks before):
        "stream_session_counts",
        "stream_session_tracker",
        "stream_tumbling_counts",
        "stream_sliding_avg",
        # scale-revealed at adversarial-sf0.1 (hot-key 1e5-row frame
        # ulp fork): rewritten to exact-cents window average
        "moving_avg_time_range",
        # r5 post-close-out triangle-block pair-enumeration rewrite
        # (commit cafbb69) never joined this set — its banked verdict
        # predates that rewrite; r6 additionally materializes the
        # shared assignment subtree. Caught and queued at r6.
        "semantic_dedup_clustered",
        # r6 PQ hot-path change: the interpreted HOF d2 fold replaced
        # by the codegen-expanded static-width form (d2_static —
        # provably the same left-to-right association, 6-dataset
        # re-certified bit-identical), queued on principle: the
        # banked verdicts predate the compute-path change.
        "pq_adc_topk",
        "pq_rerank_topk",
        # empty-input sweep fixes (grand-total alignment, guarded
        # rates, schema-explicit index reads):
        "group_rollup",
        "group_cube",
        "grouping_sets_explicit",
        "approx_count_distinct",
        # r6-continuation 50x-sweep fix: the raw-double disc_price/
        # charge sums forked by one ulp in the 2nd decimal at 30M
        # rows; rewritten to the exact-cents integer products
        # (q6/q14 convention). Gate-scale (sf0.01) values are
        # bit-identical to the banked form, but sf0.1 shifts one
        # cent — output changed, verdict voided. Queuing this makes
        # the reverify tier 29 for a 50-slot window already holding
        # 22 fresh: rank_fusion_rrf (last by registration order; its
        # r6 rewrite is A/B-proven bit-identical) waits one round —
        # the flagship's value change outranks a provably-identical
        # compute-path change.
        "q1_pricing_summary",
        # r6-second-continuation 50x-sweep find: global_rank /
        # grouped_rank / global_cumsum consumed their pid-stamped
        # subtree twice, and AQE could coalesce the two stage
        # instances differently -> dropped rows / inflated ranks
        # (fired on 3 of 5 runs at 250k rows x 8 cores; invisible at
        # the sf0.01 gate). Fixed by localCheckpoint-freezing the
        # pid assignment (operators/analytics.py). These five held
        # banked verdicts adjudicated on the flaky path — queued on
        # the compute-path-change principle AND because the old path
        # was latently wrong at scale. With reverify now 34 for a
        # 50-slot window holding 22 fresh, the last six by
        # registration order wait one round: grouping_sets_explicit,
        # running_sum, lag_delta, first_last_value,
        # moving_avg_time_range (r5 NULL-ordering rewrites, each
        # 6-regime-certified locally in its current form) and
        # rank_fusion_rrf (bit-identical rewrite). Acceptable: every
        # waiter's current form holds full local certification, and
        # the five new entries carry a KNOWN-flaky-adjudication
        # taint the waiters don't.
        "lm_score_deciles",
        "decile_spend_profile",
        "corpus_shard_manifest",
        "length_grouped_batches",
        "compaction_bin_plan",
    }
)
# (r5 start was empty — all 13 r3/r4 rewrites were re-adjudicated
# green in CORRECTNESS_r04.json. Populated again the same day the
# adversarial-sweep rewrites landed, per VERDICT r4 #2.)

# Queries registered AFTER the current round's 50-slot window was
# already exactly full (never-adjudicated fresh + _REVERIFY): they
# sort BEHIND _REVERIFY so a late addition can never evict a
# judge-demanded re-adjudication from the window. CLEAR THIS SET AT
# ROUND START (update_green_bank.py --check warns while it is
# non-empty): once the round's verdicts land, these are ordinary
# never-green queries and belong at the head of the fresh tier.
_DEFER_FRESH: frozenset[str] = frozenset(
    {
        # r6 continuation wave, registered AFTER the r6 window was
        # exactly full (22 fresh + 28 _REVERIFY = 50): locally
        # 6-dataset-certified (sf0.1, sf1synth, adversarial/empty/
        # dup/neg — SCALING.md "Round-6 continuation"), they must
        # not evict a judge-demanded re-adjudication; they head the
        # r7 fresh tier once the r6 verdicts land.
        "heaps_vocab_growth",
        "source_overlap_jaccard",
        "embedding_centroid_outliers",
        "wordpiece_segment_vocab",
        "trimmed_winsorized_value",
        "quantile_normalize_doclen",
        "split_leakage_audit",
        # r6 second-continuation wave (same rationale: the r6 window
        # is exactly full; these head the r7 fresh tier):
        "kanonymity_audit",
        "record_linkage_blocked_pairs",
        "curriculum_phase_mix",
        "tokenizer_fertility_by_source",
        "unigram_seed_vocab",
        "media_phash_clusters",
        "mlm_masking_plan",
        "stratified_kfold_assign",
        "kneser_ney_bigram",
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
    }
)
# r5 start: empty — the 23 late-r4 additions rejoin the head of the
# fresh tier (none has a driver verdict, so they auto-sort into the
# r5 window per VERDICT r4 #1). Re-populate only if a round's window
# is already exactly full when a new query registers.


def all_specs() -> dict[str, QuerySpec]:
    """All specs: never-adjudicated first, then de-banked rewrites
    (_REVERIFY), then late additions (_DEFER_FRESH — kept behind the
    re-adjudications they must not evict), then banked greens
    least-recently-verified first — so every green is re-adjudicated
    within ~2 rounds even though the driver window is smaller than
    the registry (stable within each group by registration order)."""
    _load_all()
    order = {n: i for i, n in enumerate(_REGISTRY)}
    fresh = [
        n for n in _REGISTRY
        if n not in _DRIVER_GREEN
        and n not in _REVERIFY
        and n not in _DEFER_FRESH
    ]
    reverify = sorted(
        (n for n in _REGISTRY if n in _REVERIFY), key=order.__getitem__
    )
    deferred = sorted(
        (n for n in _REGISTRY if n in _DEFER_FRESH and n not in _DRIVER_GREEN),
        key=order.__getitem__,
    )
    banked_names = sorted(
        (n for n in _REGISTRY if n in _DRIVER_GREEN and n not in _REVERIFY),
        key=lambda n: (_DRIVER_GREEN[n], order[n]),
    )
    return {
        n: _REGISTRY[n] for n in (*fresh, *reverify, *deferred, *banked_names)
    }


_SHIPPED: set[str] = set()


def ensure_package_shipped(spark: SparkSession) -> None:
    """Ship the kittispark package to executor Python workers
    (sc.addPyFile — the programmatic form of `spark-submit
    --py-files`). Python kernels are pickled with references to this
    module, so workers must be able to import it no matter what the
    driver's cwd/PYTHONPATH is. Zipped once per process, added once
    per SparkContext."""
    sc = spark.sparkContext
    app = sc.applicationId
    if app in _SHIPPED:
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zip_path = os.path.join(
        tempfile.gettempdir(), f"kittispark-pyfiles-{os.getpid()}.zip"
    )
    if not os.path.exists(zip_path):
        with zipfile.ZipFile(zip_path, "w") as zf:
            for root, _, files in os.walk(pkg_dir):
                for fname in files:
                    if fname.endswith(".py"):
                        full = os.path.join(root, fname)
                        rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                        zf.write(full, rel)
    sc.addPyFile(zip_path)
    _SHIPPED.add(app)


def _shipping(fn: QueryFn) -> QueryFn:
    @functools.wraps(fn)
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        ensure_package_shipped(spark)
        return fn(spark, sf_dir)

    return run


def queries() -> dict[str, QueryFn]:
    return {name: _shipping(spec.fn) for name, spec in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in all_specs().items() if spec.oracle is not None
    }
