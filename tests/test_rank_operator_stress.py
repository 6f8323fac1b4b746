"""Regression stress for the AQE pid-remap flake in the two-level
rank operators (SCALING.md "the 50x sweep catches a shared-operator
flake").

The bug: global_rank/global_cumsum/grouped_rank stamp rows with
spark_partition_id() after repartitionByRange and consume that
subtree twice; with AQE free to coalesce the two stage instances
differently, the offset table's pid map stops describing the join
side — rows silently drop and ranks inflate. It fired at 250k rows
x 8 cores on 3 of 5 runs, and NEVER at the sf0.01 oracle-gate scale
(everything coalesces to one partition), so this test recreates the
firing conditions directly: a wide synthetic range, small shuffle
parallelism, repeated runs.

Invariants that the flake broke (checked on every run):
- no row lost: count(out) == N
- ranks are exactly the permutation 1..N: max == N and
  sum == N(N+1)/2 (a dropped pid shrinks count; a mis-offset
  breaks the sum even when the count survives)
- total_col is N on every row
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kittispark.operators.analytics import global_cumsum, global_rank

N = 200_000
RUNS = 3


def test_global_rank_dense_permutation_under_small_parallelism(spark):
    base = spark.range(N).select(
        (F.col("id") * 2654435761 % 1000003).alias("k"),
        F.col("id").alias("tie"),
    )
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        for _ in range(RUNS):
            out = global_rank(
                base,
                F.col("k").asc_nulls_first(),
                F.col("tie").asc_nulls_first(),
                out_col="r",
                total_col="n",
            )
            agg = out.agg(
                F.count(F.lit(1)).alias("cnt"),
                F.max("r").alias("mx"),
                F.sum("r").alias("sm"),
                F.min("n").alias("nmin"),
                F.max("n").alias("nmax"),
            ).collect()[0]
            assert agg.cnt == N, f"rows lost: {agg.cnt}"
            assert agg.mx == N, f"rank inflated/truncated: {agg.mx}"
            assert agg.sm == N * (N + 1) // 2, f"offsets wrong: {agg.sm}"
            assert agg.nmin == N and agg.nmax == N
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def test_global_cumsum_conservation_under_small_parallelism(spark):
    base = spark.range(N).select(
        (F.col("id") * 1140071481 % 999983).alias("k"),
        F.col("id").alias("tie"),
        F.lit(1).alias("w"),
    )
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        for _ in range(RUNS):
            out = global_cumsum(
                base,
                "w",
                F.col("k").asc_nulls_first(),
                F.col("tie").asc_nulls_first(),
                out_col="c",
            )
            agg = out.agg(
                F.count(F.lit(1)).alias("cnt"),
                F.max("c").alias("mx"),
                F.sum("c").alias("sm"),
            ).collect()[0]
            # exclusive cumsum of all-ones over N rows is 0..N-1
            assert agg.cnt == N, f"rows lost: {agg.cnt}"
            assert agg.mx == N - 1, f"offsets wrong: {agg.mx}"
            assert agg.sm == N * (N - 1) // 2, f"offsets wrong: {agg.sm}"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
