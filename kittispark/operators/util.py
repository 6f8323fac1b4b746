"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition iff the input has fewer partitions than
    the session's parallelism.

    Why: a small parquet file arrives as ONE partition, and any
    operator that fans out work per row (shingle explode, per-row
    GEMM scoring, signature hashing) then runs on one core no matter
    how many the cluster has. The repartition shuffles only the small
    *input* (cheap), unlocking full parallelism for the expensive
    downstream. At 100 TB inputs already have >= cluster parallelism
    partitions and this is a no-op — the guard exists precisely so the
    operator behaves at BOTH ends of the scale."""
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
