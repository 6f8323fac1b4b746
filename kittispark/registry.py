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
)

# Queries with a green (hash_match) driver verdict, mapped to the
# LAST round that verdict was issued (CORRECTNESS_r{N}.json).
# queries()/oracle_sql() list never-green queries first so the
# driver's 50-query window always covers the freshest signal; banked
# greens fill the remaining slots LEAST-RECENTLY-VERIFIED FIRST
# (round-robin recheck — ADVICE r2: a fixed fresh-first/banked-last
# order left ~41 greens permanently unrechecked while their shared
# operators kept changing). Update this map each round.
_DRIVER_GREEN: dict[str, int] = {
    # round 1 greens not re-adjudicated since. REMOVED in r3 (their
    # outputs/oracles were rewritten, so the banked verdict no longer
    # describes the shipped query — they must re-adjudicate as fresh):
    # join_three_way, q5_region_revenue, grouping_sets_explicit
    # (exact integer-cents money sums).
    **{n: 1 for n in (
        "anti_join_not_exists", "argmax_best_order", "array_functions",
        "box_filter_conjunctive", "case_when_bucketing",
        "category_filter_in", "corner_explode", "correlation_stats",
        "date_functions", "first_last_value", "full_outer_join",
        "group_cube", "group_rollup",
        "lag_delta", "left_outer_join",
        "map_literal_lookup", "math_functions", "median_mode_agg",
        "moving_avg_time_range", "null_handling", "null_safe_join",
        "order_by_limit", "pivot_conditional_agg", "q3_top_orders",
        "range_join_nonequi", "rank_functions",
        "running_sum", "salted_skew_join", "scalar_subquery_avg_qty",
        "semi_join_exists", "set_except", "set_intersect",
        "set_union_distinct", "string_functions", "topk_per_group",
        "union_all_counts", "unpivot_measures", "window_distribution",
    )},
    # round 2 greens (CORRECTNESS_r02.json hash_match rows).
    # REMOVED in r3 (rewritten after their verdict, so re-adjudicate
    # as fresh): stream_sliding_avg (integer-micros average),
    # stream_session_tracker (nanosecond gap detection).
    # (De-banked names are listed in _REVERIFY below so they sort
    # after never-adjudicated queries in the driver window.)
    **{n: 2 for n in (
        "token_count", "text_quality", "lang_id_heuristic",
        "doc_fingerprint", "tfidf_top_terms", "regexp_functions",
        "hash_split_sample", "stratified_sample_rates",
        "bpe_pretoken_count", "dedup_exact", "dedup_exact_survivors",
        "ngram_jaccard_pairs", "dedup_cluster_assign", "dedup_digest",
        "cosine_topk_bruteforce", "cosine_near_dup",
        "cutout_count_stats", "axis_remap_projection",
        "envelope_combine", "binary_metadata", "media_feature_extract",
        "media_image_decode", "media_frame_sample",
        "stream_tumbling_counts",
        "stream_session_counts", "stream_dedup_exactonce",
        "stream_running_user_stats", "stream_stream_interval_join",
        "tumbling_window_counts",
        "sessionization", "event_type_stats", "asof_join_latest_click",
        "resample_ffill_grid", "approx_count_distinct",
        "sorted_array_agg", "percentile_per_group",
        "rescale_by_percentile", "json_extract_group",
        "q1_pricing_summary", "envelope_minmax", "group_count_stats",
        "distinct_agg",
    )},
}


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
_REVERIFY: frozenset[str] = frozenset({
    "join_three_way", "q5_region_revenue", "grouping_sets_explicit",
    "stream_sliding_avg", "stream_session_tracker",
})


def all_specs() -> dict[str, QuerySpec]:
    """All specs: never-adjudicated first, then de-banked rewrites
    (_REVERIFY), then banked greens least-recently-verified first —
    so every green is re-adjudicated within ~2 rounds even though
    the driver window is smaller than the registry (stable within
    each group by registration order)."""
    _load_all()
    order = {n: i for i, n in enumerate(_REGISTRY)}
    fresh = [
        n for n in _REGISTRY
        if n not in _DRIVER_GREEN and n not in _REVERIFY
    ]
    reverify = sorted(
        (n for n in _REGISTRY if n in _REVERIFY), key=order.__getitem__
    )
    banked_names = sorted(
        (n for n in _REGISTRY if n in _DRIVER_GREEN and n not in _REVERIFY),
        key=lambda n: (_DRIVER_GREEN[n], order[n]),
    )
    return {n: _REGISTRY[n] for n in (*fresh, *reverify, *banked_names)}


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
