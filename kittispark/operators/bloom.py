"""Broadcast Bloom-filter join pruning — the 100 TB pattern for a
selective semi-join: build a compact bit-set over the (filtered)
build-side keys, broadcast it, and drop probe-side rows that cannot
match BEFORE the shuffle; an exact semi-join then confirms the
survivors, so false positives never reach the result.

The filter is a sorted array of set bit positions rather than a
packed bitmap: positions are ``pmod(xxhash64(key, seed_j), m)`` for
j in 1..k, and membership is k ``array_contains`` probes — all JVM
column expressions inside codegen, no UDF. With m sized ~10x the
build-side key count the position array stays KB-scale, far under
any broadcast threshold (a real deployment would also reach for
Spark's runtime row-level bloom via
``spark.sql.optimizer.runtime.bloomFilter.enabled``; this operator
is the explicit, plan-visible form).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _positions(key: Column, m: int, k: int) -> list[Column]:
    return [F.pmod(F.xxhash64(key, F.lit(j)), F.lit(m)) for j in range(k)]


def bloom_filter_build(keys: DataFrame, key_col: str, m: int = 1 << 14, k: int = 3) -> DataFrame:
    """One-row DataFrame holding the sorted distinct bit positions of
    every build-side key (column ``__bloom_bits``)."""
    pos = keys.select(
        F.explode(F.array(*_positions(F.col(key_col), m, k))).alias("p")
    )
    return pos.agg(F.sort_array(F.collect_set("p")).alias("__bloom_bits"))


def bloom_pruned_semi_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    m: int = 1 << 14,
    k: int = 3,
) -> DataFrame:
    """``probe`` rows whose key appears in ``build`` — exactly a
    left_semi join, but with a broadcast Bloom pre-filter so the
    shuffle only carries probe rows that might match. Correctness is
    independent of the filter (superset -> exact confirm); the filter
    only changes how much data moves.
    """
    bits = bloom_filter_build(build.select(build_key), build_key, m, k)
    probes = _positions(F.col(probe_key), m, k)
    candidate = probe.crossJoin(F.broadcast(bits)).filter(
        F.aggregate(
            F.array(*[F.array_contains("__bloom_bits", p) for p in probes]),
            F.lit(True),
            lambda acc, x: acc & x,
        )
    ).drop("__bloom_bits")
    return candidate.join(
        build.select(F.col(build_key).alias(probe_key)).distinct(),
        probe_key,
        "left_semi",
    )
