"""Window-function surface (SURVEY.md §2.5 — absent from the
reference; the one idiomatic window there is the per-frame percentile
rescale P7, covered in queries.events). All orderings carry a unique
key tiebreak so results are deterministic across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from kittispark.registry import register
from kittispark.queries._util import t


@register(
    "topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn
    FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                 CAST(row_number() OVER (PARTITION BY o_custkey
                      ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
          FROM orders)
    WHERE rn <= 3
    """,
    doc="Top-k per group via row_number — partial sort within hash "
    "partitions, no global sort; rank filter cannot push below the "
    "window but the partition key shuffle is the only exchange.",
    tags=("window",),
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate NULLS FIRST, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
               AS running_total
    FROM orders
    """,
    doc="Running (cumulative) sum per customer over order date — "
    "deterministic ROWS frame with key tiebreak.",
    tags=("window",),
)
def running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        # unknown-date orders sort FIRST (engine convention: NULL
        # ordering keys lead, pinned explicitly on both engines)
        .orderBy(F.asc_nulls_first("o_orderdate"), F.asc("o_orderkey"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
    )


@register(
    "lag_delta",
    oracle="""
    SELECT event_id, user_id,
           round(value - lag(value) OVER (PARTITION BY user_id
                 ORDER BY ts NULLS FIRST, event_id), 6) + 0.0 AS delta
    FROM events
    """,
    doc="lag() delta per user over event time (change detection shape).",
    tags=("window",),
)
def lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(
        F.asc_nulls_first("ts"), F.asc("event_id")
    )
    return events.select(
        "event_id",
        "user_id",
        # + 0.0: consecutive values within 5e-7 produce a tiny
        # negative delta that rounds to -0.0 in DuckDB but +0.0 in
        # Spark (r9 agghash-tier latent class)
        (F.round(F.col("value") - F.lag("value").over(w), 6) + 0.0).alias("delta"),
    )


@register(
    "rank_functions",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           CAST(rank()       OVER w AS INT) AS price_rank,
           CAST(dense_rank() OVER w AS INT) AS price_dense_rank,
           CAST(ntile(4)     OVER w AS INT) AS price_quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice DESC, o_orderkey)
    """,
    doc="rank / dense_rank / ntile family over a deterministic total "
    "order within each partition.",
    tags=("window",),
)
def rank_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.rank().over(w).alias("price_rank"),
        F.dense_rank().over(w).alias("price_dense_rank"),
        F.ntile(4).over(w).alias("price_quartile"),
    )


@register(
    "first_last_value",
    oracle="""
    SELECT DISTINCT user_id,
           first_value(event_type) OVER w AS first_type,
           last_value(event_type)  OVER w AS last_type,
           CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n_events
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    doc="first_value/last_value over full-partition frame, deduped to "
    "one row per user (session entry/exit event shape).",
    tags=("window",),
)
def first_last_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = t(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.asc_nulls_first("ts"), F.asc("event_id"))
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return (
        events.select(
            "user_id",
            F.first("event_type").over(w).alias("first_type"),
            F.last("event_type").over(w).alias("last_type"),
            F.count(F.lit(1)).over(W.partitionBy("user_id")).alias("n_events"),
        )
        .distinct()
    )


@register(
    "moving_avg_time_range",
    oracle="""
    SELECT event_id, user_id,
           round(CAST(sum(CAST(floor(value * 100) AS BIGINT)) OVER w
                      AS DOUBLE) / 100
                 / NULLIF(count(value) OVER w, 0), 6) AS avg_1h,
           CAST(count(*) OVER w AS BIGINT) AS n_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id
                 ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
                 RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
    """,
    doc="Event-time RANGE-frame window: trailing 1-hour average per "
    "user — the value-based frame (peers included) vs the row-based "
    "frames elsewhere. Both engines order by floor-epoch-seconds so "
    "frame boundaries agree on sub-second timestamps; the average "
    "rides exact integer cents (window sum of BIGINT cents / count) "
    "so no accumulation-order ulp can fork the engines on large "
    "frames. One shuffle on "
    "user_id; frame evaluation is a per-partition sliding scan.",
    tags=("window",),
)
def moving_avg_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = t(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts").cast("long"))
        .rangeBetween(-3600, 0)
    )
    # exact-cents window average (same idiom as stream_sliding_avg):
    # the hot-key frame at scale holds 1e5+ rows and a float avg's
    # accumulation order forks the engines by one ulp at round-6
    # midpoints (observed at adversarial-sf0.1, row 36155)
    cents = F.sum(F.floor(F.col("value") * 100).cast("long")).over(w)
    nv = F.count(F.col("value")).over(w)
    return events.select(
        "event_id",
        "user_id",
        F.round(
            cents.cast("double") / 100 / F.nullif(nv, F.lit(0)), 6
        ).alias("avg_1h"),
        F.count(F.lit(1)).over(w).alias("n_1h"),
    )
