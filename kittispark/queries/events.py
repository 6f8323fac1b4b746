"""Event-table queries: the reference's per-frame percentile rescale
(P7/A5, data_pipeline.py:29-30 — its one non-trivial aggregate)
re-expressed per user over event time, plus the batch analogs of the
streaming surface (tumbling windows, sessionization) and the JSON
scalar family. Streaming-proper versions live in
kittispark.streaming; these batch twins are what the DuckDB oracle
can check.
"""

from __future__ import annotations

import atexit

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from kittispark.registry import register
from kittispark.queries._util import t


@register(
    "percentile_per_group",
    oracle="""
    SELECT user_id,
           round(quantile_cont(value, 0.05), 6) AS p05,
           round(quantile_cont(value, 0.5), 6)  AS p50,
           round(quantile_cont(value, 0.95), 6) AS p95,
           count(*) AS n
    FROM events GROUP BY user_id
    """,
    doc="Exact interpolated percentile per group — reference A5 "
    "np.percentile(point_cloud[:,2], 5) per frame "
    "(data_pipeline.py:29). Exact percentile shuffles whole groups; "
    "percentile_approx is the single-pass mergeable 100 TB variant "
    "(same call site, documented trade-off).",
    tags=("agg", "kitti-analog"),
)
def percentile_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = t(spark, sf_dir, "events")
    return events.groupBy("user_id").agg(
        F.round(F.percentile("value", 0.05), 6).alias("p05"),
        F.round(F.percentile("value", 0.5), 6).alias("p50"),
        F.round(F.percentile("value", 0.95), 6).alias("p95"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "rescale_by_percentile",
    oracle="""
    WITH stats AS (
        SELECT user_id, quantile_cont(value, 0.05) AS p05
        FROM events GROUP BY user_id
    )
    SELECT e.event_id, e.user_id,
           round(e.value - s.p05, 6) + 0.0 AS value_rescaled
    FROM events e JOIN stats s ON e.user_id = s.user_id
    """,
    doc="Aggregate-to-detail rejoin: per-group percentile broadcast back "
    "onto detail rows and subtracted — the z-ground-plane rescale "
    "(reference P7/J2, data_pipeline.py:29-30). The KITTI-exact "
    "operator is kittispark.operators.kitti.rescale_z.",
    tags=("join", "kitti-analog"),
)
def rescale_by_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = t(spark, sf_dir, "events")
    stats = events.groupBy("user_id").agg(F.percentile("value", 0.05).alias("p05"))
    # per-USER stats: planner's join choice, no forced broadcast
    # (data-scaled side — the grouped_rank/pagerank ADVICE class;
    # AQE broadcasts it whenever the user count is actually small)
    # round(...) + 0.0 on BOTH sides: a value sitting just below its
    # group's p05 rounds to -0.0 in DuckDB but +0.0 in Spark; the
    # IEEE identity -0.0 + 0.0 = +0.0 normalizes both. Latent at
    # every tier below 50x (first value within 1e-6 under its
    # percentile appears at ~5M events) — caught by the r9
    # aggregate-hash 50x value tier on its first run.
    return events.join(stats, "user_id").select(
        "event_id",
        "user_id",
        (F.round(F.col("value") - F.col("p05"), 6) + 0.0).alias("value_rescaled"),
    )


@register(
    "rescale_by_percentile_approx",
    oracle="""
    WITH stats AS (
        SELECT user_id, quantile_cont(value, 0.05) AS p05
        FROM events GROUP BY user_id
    )
    SELECT e.event_id, e.user_id,
           round(e.value - s.p05, 6) + 0.0 AS value_rescaled,
           TRUE AS within_tol
    FROM events e JOIN stats s ON e.user_id = s.user_id
    """,
    doc="The documented 100 TB switch of rescale_by_percentile, "
    "itself driver-verified: the per-group 5th percentile comes from "
    "the single-pass mergeable percentile_approx sketch (the "
    "operators.kitti.frame_z_scale approx=True path), bounded "
    "against the exact percentile (+-15.0, measured max deviation "
    "3.21 at sf0.01) while the exact-rescaled detail rows are "
    "hash-checked — so both the rejoin shape and the sketch accuracy "
    "carry a green verdict.",
    tags=("join", "kitti-analog", "sketch"),
)
def rescale_by_percentile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = t(spark, sf_dir, "events")
    stats = events.groupBy("user_id").agg(
        F.percentile("value", 0.05).alias("p05"),
        F.percentile_approx("value", 0.05, 10000).alias("p05_approx"),
    )
    # per-USER stats: planner's choice (see rescale_by_percentile)
    return events.join(stats, "user_id").select(
        "event_id",
        "user_id",
        # + 0.0: signed-zero normalization, same latent class as
        # rescale_by_percentile (caught by the r9 agghash 50x tier)
        (F.round(F.col("value") - F.col("p05"), 6) + 0.0).alias("value_rescaled"),
        (F.abs(F.col("p05_approx") - F.col("p05")) <= 15.0).alias("within_tol"),
    )


@register(
    "json_extract_group",
    oracle="""
    SELECT json_extract_string(props, '$.k') AS k_value,
           event_type,
           count(*) AS n,
           round(sum(value), 2) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="JSON field extraction from a string column + grouped agg "
    "(SURVEY §2.6 date/json row: absent from reference, built-in).",
    tags=("scalar",),
)
def json_extract_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = t(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.get_json_object("props", "$.k").alias("k_value"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


@register(
    "tumbling_window_counts",
    oracle="""
    SELECT CAST(floor(epoch(ts) / 600) * 600 AS BIGINT) AS bucket_start,
           event_type,
           count(*) AS n,
           round(sum(value), 2) AS sum_value
    FROM events
    WHERE ts IS NOT NULL
    GROUP BY 1, 2
    """,
    doc="10-minute tumbling event-time window aggregation (batch twin "
    "of streaming window(ts, '10 minutes') — Spark aligns windows to "
    "the epoch origin, so start == floor(epoch/600)*600). Events "
    "without a timestamp belong to no bucket: Spark's window() "
    "drops them by construction and the oracle filters identically.",
    tags=("window", "streaming-analog"),
)
def tumbling_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = t(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "10 minutes").alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").cast("long").alias("bucket_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


@register(
    "sessionization",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL THEN 1
                    WHEN epoch(ts) - epoch(lag(ts) OVER w) > 1800.0 THEN 1
                    ELSE 0 END AS new_session
        FROM events
        WHERE ts IS NOT NULL
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id,
           CAST(sum(new_session) AS BIGINT) AS n_sessions,
           count(*) AS n_events
    FROM flagged GROUP BY user_id
    """,
    doc="Sessionization with a 30-minute inactivity gap via lag + "
    "cumulative flags — batch twin of session_window(ts, '30 minutes') "
    "in streaming. Gap compares fractional epoch seconds on both "
    "engines so microsecond boundaries agree.",
    tags=("window", "streaming-analog"),
)
def sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    # an event with no timestamp belongs to no session — excluded
    # (the oracle filters identically; n_events counts timed events)
    events = t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag(F.col("ts").cast("double")).over(w)
    flagged = events.select(
        "user_id",
        F.when(prev.isNull(), 1)
        .when(F.col("ts").cast("double") - prev > 1800.0, 1)
        .otherwise(0)
        .alias("new_session"),
    )
    return flagged.groupBy("user_id").agg(
        F.sum("new_session").cast("long").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "event_type_stats",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           round(avg(value), 6)         AS avg_value,
           round(stddev_samp(value), 6) AS sd_value,
           round(min(value), 6)         AS min_value,
           round(max(value), 6)         AS max_value
    FROM events GROUP BY event_type
    """,
    doc="Moment-based statistics per event type (stddev is the "
    "mergeable two-level agg shape that scales to 100 TB).",
    tags=("agg",),
)
def event_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = t(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("value"), 6).alias("avg_value"),
        F.round(F.stddev_samp("value"), 6).alias("sd_value"),
        F.round(F.min("value"), 6).alias("min_value"),
        F.round(F.max("value"), 6).alias("max_value"),
    )


@register(
    "asof_join_latest_click",
    oracle="""
    WITH r AS (
        SELECT user_id, ts, max(value) AS click_value
        FROM events
        WHERE event_type = 'click' AND ts IS NOT NULL
        GROUP BY 1, 2
    ), l AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type <> 'click'
    )
    -- NULL-ts handling made explicit (DuckDB's raw ASOF sorts NULL as
    -- greatest and would match unknown times to each other — file
    -- order masquerading as time): timed left rows as-of join timed
    -- clicks; un-timed left rows keep a NULL payload.
    SELECT l.event_id, l.user_id, round(r.click_value, 6) AS click_value
    FROM (SELECT * FROM l WHERE ts IS NOT NULL) l
    ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
    UNION ALL
    SELECT event_id, user_id, CAST(NULL AS DOUBLE) AS click_value
    FROM l WHERE ts IS NULL
    """,
    doc="As-of join: each non-click event annotated with the value of "
    "the user's latest click at-or-before it — the union+window "
    "composition (kittispark.operators.asof) checked against DuckDB's "
    "native ASOF JOIN. One shuffle, no pair explosion.",
    tags=("join", "asof"),
)
def asof_join_latest_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kittispark.operators.asof import asof_join

    events = t(spark, sf_dir, "events")
    clicks = (
        events.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("click_value"))
    )
    left = events.filter(F.col("event_type") != "click").select(
        "event_id", "user_id", "ts"
    )
    return asof_join(left, clicks, on="user_id", ts="ts", payload=["click_value"]).select(
        "event_id", "user_id", F.round("click_value", 6).alias("click_value")
    )


@register(
    "resample_ffill_grid",
    oracle="""
    WITH obs AS (
        SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ots,
               max(value) AS v
        FROM events WHERE user_id < 20 GROUP BY 1, 2
    ),
    bounds AS (
        SELECT user_id,
               CAST(floor(min(ots) / 21600) * 21600 AS BIGINT) AS lo,
               max(ots) AS hi
        FROM obs GROUP BY user_id
    ),
    grid AS (
        SELECT user_id, g.grid_ts
        FROM bounds,
             LATERAL (SELECT unnest(generate_series(lo, hi, 21600))
                      AS grid_ts) g
    )
    SELECT grid.user_id, grid.grid_ts, round(obs.v, 6) AS v
    FROM grid ASOF LEFT JOIN obs
      ON grid.user_id = obs.user_id AND grid.grid_ts >= obs.ots
    """,
    doc="Resample-with-forward-fill: each user's irregular events land "
    "on a regular 6-hour grid carrying the last observation at-or-"
    "before each grid point — grid explode + as-of join composition "
    "(operators.asof.resample_ffill) vs DuckDB generate_series + ASOF.",
    tags=("asof", "timeseries"),
)
def resample_ffill_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kittispark.operators.asof import resample_ffill

    events = t(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    obs = events.groupBy(
        "user_id", F.col("ts").cast("long").alias("ots")
    ).agg(F.max("value").alias("v"))
    res = resample_ffill(
        obs.select("user_id", F.col("ots").cast("timestamp").alias("ts"), "v"),
        on="user_id",
        ts="ts",
        value="v",
        step_s=21600,
    )
    return res.select("user_id", "grid_ts", F.round("v", 6).alias("v"))


@register(
    "percentile_approx_group",
    oracle="""
    SELECT user_id,
           round(quantile_cont(value, 0.5), 6) AS p50_exact,
           TRUE AS within_tol,
           count(*) AS n
    FROM events GROUP BY user_id
    """,
    doc="approx_percentile per group at accuracy 10000 — the single-"
    "pass mergeable percentile for 100 TB (exact percentile shuffles "
    "whole groups; the KLL-style sketch merges partials). Oracle-"
    "bound like approx_count_distinct: the exact interpolated "
    "percentile is hash-checked against DuckDB, and the sketch "
    "estimate is asserted within +-15.0 of it (measured max "
    "deviation 4.25 at sf0.01) — a broken sketch flips within_tol "
    "and fails the hash.",
    tags=("agg", "sketch"),
)
def percentile_approx_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = t(spark, sf_dir, "events")
    return events.groupBy("user_id").agg(
        F.round(F.percentile("value", 0.5), 6).alias("p50_exact"),
        (
            F.abs(
                F.percentile_approx("value", 0.5, 10000)
                - F.percentile("value", 0.5)
            )
            <= 15.0
        ).alias("within_tol"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "merge_upsert_snapshot",
    oracle="""
    WITH changes AS (
        SELECT user_id AS key, event_type, value FROM (
            SELECT user_id, event_type, value,
                   row_number() OVER (PARTITION BY user_id
                       ORDER BY ts DESC, event_id DESC) AS rk
            FROM events) WHERE rk = 1
    ),
    base AS (
        SELECT c_custkey AS key, c_acctbal AS val
        FROM customer WHERE c_custkey BETWEEN 50 AND 250
    )
    SELECT COALESCE(b.key, c.key) AS key,
           CASE WHEN c.key IS NULL THEN b.val ELSE c.value END AS val,
           CASE WHEN c.key IS NULL THEN 'keep'
                WHEN b.key IS NULL THEN 'insert'
                ELSE 'update' END AS action
    FROM base b FULL OUTER JOIN changes c ON b.key = c.key
    WHERE NOT (b.key IS NOT NULL AND c.key IS NOT NULL
               AND c.event_type = 'error')
      AND NOT (b.key IS NULL AND c.event_type = 'error')
    """,
    doc="MERGE INTO executed as one full-outer key join (the CDC "
    "upsert shape: WHEN MATCHED AND op='error' DELETE / WHEN MATCHED "
    "UPDATE / WHEN NOT MATCHED INSERT, with unmatched deletes a "
    "no-op). Changes = latest event per key via one window pass with "
    "a deterministic (ts, event_id) tiebreak. Both sides shuffle on "
    "the merge key only — the same co-partitioned plan a Delta/"
    "Iceberg MERGE compiles to at 100 TB, with no driver-side state.",
    tags=("join", "cdc"),
)
def merge_upsert_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = t(spark, sf_dir, "events")
    customer = t(spark, sf_dir, "customer")
    w = W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    changes = (
        events.select(
            F.col("user_id").alias("key"),
            "event_type",
            "value",
            F.row_number().over(w).alias("rk"),
        )
        .filter(F.col("rk") == 1)
        .drop("rk")
    )
    base = customer.filter(F.col("c_custkey").between(50, 250)).select(
        F.col("c_custkey").alias("key"), F.col("c_acctbal").alias("val")
    )
    b, c = base.alias("b"), changes.alias("c")
    merged = b.join(c, F.col("b.key") == F.col("c.key"), "full_outer")
    matched_delete = (
        F.col("b.key").isNotNull()
        & F.col("c.key").isNotNull()
        & (F.col("c.event_type") == "error")
    )
    unmatched_delete = F.col("b.key").isNull() & (F.col("c.event_type") == "error")
    return merged.filter(~matched_delete & ~unmatched_delete).select(
        F.coalesce(F.col("b.key"), F.col("c.key")).alias("key"),
        F.when(F.col("c.key").isNull(), F.col("b.val"))
        .otherwise(F.col("c.value"))
        .alias("val"),
        F.when(F.col("c.key").isNull(), "keep")
        .when(F.col("b.key").isNull(), "insert")
        .otherwise("update")
        .alias("action"),
    )


@register(
    "scd2_user_value_history",
    oracle="""
    SELECT user_id, value,
           CAST(floor(epoch(ts)) AS BIGINT) AS valid_from,
           CAST(floor(epoch(lead(ts) OVER w)) AS BIGINT) AS valid_to,
           CAST(row_number() OVER w AS INT) AS version,
           (lead(ts) OVER w IS NULL) AS is_current
    FROM events
    WHERE event_type = 'view' AND ts IS NOT NULL
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    doc="Type-2 slowly-changing-dimension build: each change event "
    "opens a validity interval [valid_from, valid_to) closed by the "
    "next change (lead over event time with a deterministic event_id "
    "tiebreak); the open interval is the current row. One window "
    "shuffle partitioned by the dimension key — the standard "
    "history-table materialization a warehouse pipeline derives from "
    "a 100 TB change log. Epochs floor()ed identically on both "
    "engines (DuckDB CAST rounds, Spark's truncates).",
    tags=("window", "cdc"),
)
def scd2_user_value_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    # a change event with no timestamp can't anchor a validity
    # interval — excluded on both engines
    events = t(spark, sf_dir, "events").filter(
        (F.col("event_type") == "view") & F.col("ts").isNotNull()
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return events.select(
        "user_id",
        "value",
        F.col("ts").cast("long").alias("valid_from"),
        nxt.cast("long").alias("valid_to"),
        F.row_number().over(w).alias("version"),
        nxt.isNull().alias("is_current"),
    )


@register(
    "funnel_conversion",
    oracle="""
    WITH v AS (
        SELECT user_id, min(ts) AS t_view FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, min(e.ts) AS t_click
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click' AND e.ts > v.t_view
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, min(e.ts) AS t_purchase
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND e.ts > c.t_click
        GROUP BY e.user_id
    )
    SELECT CAST((SELECT count(*) FROM v) AS BIGINT) AS n_view,
           CAST((SELECT count(*) FROM c) AS BIGINT) AS n_view_click,
           CAST((SELECT count(*) FROM p) AS BIGINT) AS n_view_click_purchase,
           round(CAST((SELECT count(*) FROM p) AS DOUBLE)
                 / NULLIF((SELECT count(*) FROM v), 0), 6) AS conversion_rate
    """,
    doc="Ordered funnel analysis (view -> click -> purchase, each "
    "step strictly after the previous): per-step user counts and "
    "end-to-end conversion rate. Each stage is a type-filtered "
    "min-ts agg REJOINED to the event stream (the J2 "
    "aggregate-to-detail pattern) so ordering is enforced by "
    "comparison, not by a per-user sort; all joins are equi-joins "
    "on user_id and the stage tables shrink monotonically.",
    tags=("events", "analytics"),
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    nv = v.agg(F.count(F.lit(1)).alias("n_view"))
    nc = c.agg(F.count(F.lit(1)).alias("n_view_click"))
    np_ = p.agg(F.count(F.lit(1)).alias("n_view_click_purchase"))
    return (
        nv.crossJoin(F.broadcast(nc))
        .crossJoin(F.broadcast(np_))
        .select(
            "n_view",
            "n_view_click",
            "n_view_click_purchase",
            # no view-stage users: NULL rate, matching the oracle's
            # NULL-on-zero-division (ANSI mode would throw)
            F.when(
                F.col("n_view") > 0,
                F.round(
                    F.col("n_view_click_purchase").cast("double")
                    / F.col("n_view"),
                    6,
                ),
            ).alias("conversion_rate"),
        )
    )


@register(
    "retention_cohorts",
    oracle="""
    WITH first_day AS (
        SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
        FROM events GROUP BY user_id
    )
    SELECT CAST(f.cohort_day AS VARCHAR) AS cohort_day,
           CAST(datediff('day', f.cohort_day, CAST(e.ts AS DATE)) AS INT)
               AS day_offset,
           CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_active
    FROM events e JOIN first_day f ON e.user_id = f.user_id
    GROUP BY 1, 2
    """,
    doc="Retention cohort analysis: users bucketed by first-activity "
    "day, activity counted per (cohort, day-offset) cell — the "
    "classic retention triangle. One per-user min-date agg rejoined "
    "to the stream (equi-join on user_id), then a distinct-count "
    "rollup; dates emitted as strings so both engines agree on the "
    "representation.",
    tags=("events", "analytics"),
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    first_day = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("cohort_day")
    )
    return (
        ev.join(first_day, "user_id")
        .groupBy(
            F.col("cohort_day").cast("string").alias("cohort_day"),
            F.datediff(F.to_date("ts"), F.col("cohort_day")).alias("day_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_active"))
    )


@register(
    "value_histogram",
    oracle="""
    SELECT CAST(floor(value / 50) * 50 AS DOUBLE) AS bin_lo,
           CAST(count(*) AS BIGINT) AS n,
           round(avg(value), 6) AS avg_value
    FROM events
    GROUP BY 1
    """,
    doc="Fixed-width histogram of the event value column (bin width "
    "50): bin lower bound, count, and in-bin mean. A single "
    "partial+final hash agg on a computed key — the map-side-combine "
    "shape a 100 TB histogram needs (bin cardinality, not row "
    "cardinality, crosses the shuffle).",
    tags=("events", "analytics"),
)
def value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    return ev.groupBy(
        (F.floor(F.col("value") / 50) * 50).cast("double").alias("bin_lo")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("value"), 6).alias("avg_value"),
    )


@register(
    "temporal_interval_lookup",
    oracle="""
    WITH hist AS (
        SELECT user_id, value, ts AS v_from,
               lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS v_to,
               CAST(row_number() OVER (PARTITION BY user_id
                    ORDER BY ts, event_id) AS INT) AS version
        FROM events WHERE event_type = 'view' AND ts IS NOT NULL
    )
    SELECT p.event_id,
           p.user_id,
           CAST(floor(epoch(p.ts)) AS BIGINT) AS ts_epoch,
           h.version,
           h.value AS dim_value
    FROM events p
    LEFT JOIN hist h
      ON p.user_id = h.user_id
     AND p.ts >= h.v_from
     AND (h.v_to IS NULL OR p.ts < h.v_to)
    WHERE p.event_type = 'purchase'
    """,
    doc="Temporal point-in-interval lookup — the join every SCD2 "
    "history exists to serve: each purchase event resolves the "
    "version of its user's view-dimension that was valid AT ITS "
    "TIMESTAMP ([v_from, v_to) containment; purchases before the "
    "first version keep NULLs via the left join). Composes the SCD2 "
    "build (one per-key window) with an equi-plus-range join on "
    "(user_id, ts) — at 100 TB both sides partition by the dimension "
    "key and intervals are non-overlapping by construction, so each "
    "probe matches at most one row.",
    tags=("events", "cdc", "join"),
)
def temporal_interval_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    hist = (
        ev.filter((F.col("event_type") == "view") & F.col("ts").isNotNull())
        .select(
            F.col("user_id").alias("h_user"),
            F.col("value").alias("dim_value"),
            F.col("ts").alias("v_from"),
            F.lead("ts").over(w).alias("v_to"),
            F.row_number().over(w).alias("version"),
        )
    )
    purchases = ev.filter(F.col("event_type") == "purchase")
    cond = (
        (purchases.user_id == hist.h_user)
        & (purchases.ts >= hist.v_from)
        & (hist.v_to.isNull() | (purchases.ts < hist.v_to))
    )
    return purchases.join(hist, cond, "left").select(
        "event_id",
        "user_id",
        F.col("ts").cast("long").alias("ts_epoch"),
        "version",
        "dim_value",
    )


@register(
    "attribution_first_touch",
    oracle="""
    WITH clicks AS (
        SELECT user_id, ts AS c_ts, event_id AS click_id
        FROM events WHERE event_type = 'click'
    ),
    purchases AS (
        SELECT user_id, ts AS p_ts, event_id AS purchase_id,
               value AS purchase_value
        FROM events WHERE event_type = 'purchase'
    ),
    firsts AS (
        SELECT p.purchase_id, min(c.c_ts) AS first_ts
        FROM purchases p
        JOIN clicks c ON c.user_id = p.user_id
                     AND c.c_ts <= p.p_ts
                     AND c.c_ts >= p.p_ts - INTERVAL 7 DAY
        GROUP BY p.purchase_id
    )
    SELECT p.purchase_id,
           p.user_id,
           min(c.click_id) AS click_id,
           round(EXTRACT(epoch FROM p.p_ts) - EXTRACT(epoch FROM f.first_ts),
                 6) AS gap_s,
           round(p.purchase_value, 6) AS purchase_value
    FROM firsts f
    JOIN purchases p USING (purchase_id)
    JOIN clicks c ON c.user_id = p.user_id AND c.c_ts = f.first_ts
    GROUP BY p.purchase_id, p.user_id, p.p_ts, f.first_ts, p.purchase_value
    """,
    doc="First-touch attribution — the complement of the as-of "
    "(last-touch) join: each purchase is attributed to the EARLIEST "
    "click of the same user within the preceding 7 days. Stage 1 "
    "computes min(click ts) per purchase over the equi+range join "
    "(user equi-key carries the shuffle; the range is a post-join "
    "filter); stage 2 re-joins at the winning timestamp and breaks "
    "same-timestamp ties by min click_id — deterministic on both "
    "engines without min_by-on-struct portability concerns. The gap "
    "is emitted in epoch seconds.",
    tags=("events", "analytics", "join"),
)
def attribution_first_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        F.col("event_id").alias("click_id"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("purchase_value"),
    )
    firsts = (
        purchases.join(
            clicks,
            (F.col("c_user") == F.col("user_id"))
            & (F.col("c_ts") <= F.col("p_ts"))
            & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 7 DAYS")),
        )
        .groupBy("purchase_id")
        .agg(F.min("c_ts").alias("first_ts"))
    )
    return (
        firsts.join(purchases, "purchase_id")
        .join(
            clicks,
            (F.col("c_user") == F.col("user_id"))
            & (F.col("c_ts") == F.col("first_ts")),
        )
        .groupBy(
            "purchase_id", "user_id", "p_ts", "first_ts", "purchase_value"
        )
        .agg(F.min("click_id").alias("click_id"))
        .select(
            "purchase_id",
            "user_id",
            "click_id",
            F.round(
                F.col("p_ts").cast("double") - F.col("first_ts").cast("double"),
                6,
            ).alias("gap_s"),
            F.round("purchase_value", 6).alias("purchase_value"),
        )
    )


@register(
    "decile_spend_profile",
    oracle="""
    WITH spend AS (
        SELECT user_id,
               CAST(sum(CAST(round(value * 1000000, 0) AS BIGINT)) AS BIGINT)
                   AS spend_micros,
               count(*) AS n_purchases
        FROM events WHERE event_type = 'purchase'
        GROUP BY user_id
    ),
    ranked AS (
        SELECT *, ntile(10) OVER (ORDER BY spend_micros DESC, user_id)
                   AS decile
        FROM spend
    )
    SELECT CAST(decile AS INT) AS decile,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(n_purchases) AS BIGINT) AS n_purchases,
           CAST(sum(spend_micros) AS DOUBLE) / 1000000 AS total_spend,
           CAST(min(spend_micros) AS DOUBLE) / 1000000 AS min_spend,
           CAST(max(spend_micros) AS DOUBLE) / 1000000 AS max_spend
    FROM ranked GROUP BY decile
    """,
    doc="Equi-DEPTH user spend deciles (the whale-curve profile; "
    "value_histogram is the equi-width twin): per-user purchase "
    "totals in exact integer micros (float sums would make the "
    "decile CUT ORDER engine-dependent at the boundaries), then "
    "EXACT ntile(10) over the (desc spend, user_id) total order "
    "computed scalably: a two-level distributed rank "
    "(repartitionByRange + per-partition row_number + running "
    "offsets over the tiny partition-size table) and the closed-form "
    "integer tile formula — bit-identical to the engines' ntile "
    "window but with no single-partition sort anywhere "
    "(operators.analytics.global_rank/ntile_from_rank).",
    tags=("events", "analytics"),
)
def decile_spend_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kittispark.operators.analytics import global_rank, ntile_from_rank

    ev = t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    spend = ev.groupBy("user_id").agg(
        F.sum(F.round(F.col("value") * 1_000_000, 0).cast("long")).alias(
            "spend_micros"
        ),
        F.count(F.lit(1)).alias("n_purchases"),
    )
    # exact ntile(10) over the total order, but DISTRIBUTED: two-level
    # rank (range repartition + per-partition row_number + offsets)
    # and the closed-form tile formula replace the single-partition
    # global window the naive W.orderBy(...) form would plan
    rk = global_rank(
        spend, F.desc("spend_micros"), F.asc("user_id"), total_col="__nrows"
    )
    ranked = rk.select(
        "*", ntile_from_rank(F.col("rank"), F.col("__nrows"), 10).alias("decile")
    )
    return ranked.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("n_purchases").alias("n_purchases"),
        (F.sum("spend_micros").cast("double") / 1_000_000).alias("total_spend"),
        (F.min("spend_micros").cast("double") / 1_000_000).alias("min_spend"),
        (F.max("spend_micros").cast("double") / 1_000_000).alias("max_spend"),
    )


# --------------------------------------------------------------------------
# Mergeable-aggregate patterns: HLL sketch rollup and incremental
# rollup maintenance (persisted partials built once per
# process+sf_dir, like the MinHash/IVF indexes).
# --------------------------------------------------------------------------


@register(
    "hll_sketch_rollup",
    oracle="""
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact,
           TRUE AS est_ok
    FROM events GROUP BY 1
    UNION ALL
    SELECT 'ALL' AS day,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact,
           TRUE AS est_ok
    FROM events
    """,
    doc="HyperLogLog sketch rollup (Spark 4 datasketches functions): "
    "per-day HLL sketches of the distinct-user set, then ONE "
    "hll_union_agg MERGE of the daily sketches for the all-time "
    "count — the mergeable-aggregate pattern that makes distinct "
    "counting viable at 100 TB (daily sketches are bytes; re-unions "
    "over any date range never rescan raw events, and count_distinct "
    "over a year of raw data becomes a union of 365 sketches). "
    "Adjudicated with the recall-gate pattern: each row carries the "
    "EXACT distinct count and an est_ok flag — the HLL estimate "
    "(register-wise-max merge, order-independent, deterministic for "
    "a given input set) must sit within 5% of exact (default "
    "lgConfigK=12 gives ~1.6% standard error, so the gate holds with "
    "wide margin at any cardinality); the oracle recomputes exact "
    "counts and emits constant TRUE.",
    tags=("events", "sketch"),
)
def hll_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "user_id"
    )
    daily = ev.groupBy("day").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.count_distinct("user_id").alias("n_exact"),
    )
    # the gate: |estimate - exact| * 20 <= exact  <=>  within 5%
    def gated(df: DataFrame, day_col) -> DataFrame:
        est = F.hll_sketch_estimate("sk")
        return df.select(
            day_col.alias("day"),
            F.col("n_exact"),
            (
                F.abs(est - F.col("n_exact")) * 20 <= F.col("n_exact")
            ).alias("est_ok"),
        )

    total = daily.agg(F.hll_union_agg("sk").alias("sk")).crossJoin(
        ev.agg(F.count_distinct("user_id").alias("n_exact"))
    )
    return gated(daily, F.date_format("day", "yyyy-MM-dd")).unionByName(
        gated(total, F.lit("ALL"))
    )


_ROLLUP_ROOT: dict[str, str] = {}
_ROLLUP_SPLIT = "2024-01-25"


def _cleanup_rollup_roots() -> None:
    import shutil

    for root in _ROLLUP_ROOT.values():
        shutil.rmtree(root, ignore_errors=True)


atexit.register(_cleanup_rollup_roots)


def _rollup_partials(ev: DataFrame) -> DataFrame:
    """(day, event_type) partial aggregates in mergeable form: row
    count + exact-cents value sum. count+sum are ALGEBRAIC — partials
    from any partitioning merge to the same result, the property
    incremental maintenance relies on."""
    return ev.groupBy(
        F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("val_cents"),
    )


def _rollup_path(spark: SparkSession, sf_dir: str) -> str:
    import os
    import tempfile

    cached = _ROLLUP_ROOT.get(sf_dir)
    if cached is not None and os.path.isdir(cached):
        return cached
    root = tempfile.mkdtemp(prefix="kittispark-rollup-")
    hist = t(spark, sf_dir, "events").filter(F.col("ts") < _ROLLUP_SPLIT)
    _rollup_partials(hist).write.mode("overwrite").parquet(root)
    _ROLLUP_ROOT[sf_dir] = root
    return root


@register(
    "rollup_incremental_maintain",
    oracle="""
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS DOUBLE)
               / 100 AS total_value
    FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
    """,
    doc="Incremental rollup maintenance — the nightly-ETL shape that "
    "replaces full recomputation at 100 TB: the historical rollup "
    "(days before 2024-01-25) is PERSISTED as mergeable partials "
    "(count + exact-cents sum per (day, event_type)), and the query "
    "aggregates ONLY the new batch (ts >= the split, pushed into the "
    "events scan) before merging both partial sets with one "
    "sum-of-partials agg. count/sum are algebraic, so the merged "
    "result is bit-identical to the full recompute the oracle "
    "performs over all of events — the adjudication proves the "
    "persisted partials, the batch-only scan, and the merge "
    "compose exactly.",
    tags=("events", "cdc"),
)
def rollup_incremental_maintain(spark: SparkSession, sf_dir: str) -> DataFrame:
    hist = spark.read.parquet(_rollup_path(spark, sf_dir))
    batch = _rollup_partials(
        t(spark, sf_dir, "events").filter(F.col("ts") >= _ROLLUP_SPLIT)
    )
    return (
        hist.unionByName(batch)
        .groupBy("day", "event_type")
        .agg(
            F.sum("n_events").alias("n_events"),
            (F.sum("val_cents").cast("double") / 100).alias("total_value"),
        )
    )


_DAYPART_ROOT: dict[str, str] = {}


def _cleanup_daypart_roots() -> None:
    import shutil

    for root in _DAYPART_ROOT.values():
        shutil.rmtree(root, ignore_errors=True)


atexit.register(_cleanup_daypart_roots)


def _daypart_path(spark: SparkSession, sf_dir: str) -> str:
    """Events re-written PARTITIONED BY event day (hive-style
    day=YYYY-MM-DD directories), once per process+sf_dir."""
    import os
    import tempfile

    cached = _DAYPART_ROOT.get(sf_dir)
    if cached is not None and os.path.isdir(cached):
        return cached
    root = tempfile.mkdtemp(prefix="kittispark-daypart-")
    (
        t(spark, sf_dir, "events")
        .withColumn("day", F.date_format(F.to_date("ts"), "yyyy-MM-dd"))
        .write.mode("overwrite")
        .partitionBy("day")
        .parquet(root)
    )
    _DAYPART_ROOT[sf_dir] = root
    return root


@register(
    "partitioned_write_prune",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS DOUBLE)
               / 100 AS total_value
    FROM events
    WHERE date_trunc('day', ts) = DATE '2024-01-15'
    GROUP BY event_type
    """,
    doc="Date-partitioned layout + partition-pruned read — with "
    "bucketing, THE data-layout lever at 100 TB: events are "
    "persisted once under hive-style day=YYYY-MM-DD directories "
    "(Spark's partitioned parquet sink), and a one-day query filters "
    "on the partition column so the scan plans PartitionFilters and "
    "touches exactly ONE directory of ~1/30th the data — no row of "
    "any other day is read, decoded, or filtered (plan-pinned in "
    "tests/test_plans.py). The oracle recomputes the same day's "
    "aggregate from the unpartitioned table, proving the re-write, "
    "the partition encoding, and the pruned read lose nothing. "
    "Value is the exact integer-cents sum.",
    tags=("events", "storage"),
)
def partitioned_write_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    root = _daypart_path(spark, sf_dir)
    # explicit schema: an all-NULL-ts (or empty) events table writes
    # zero partitions and schema inference would fail on the bare dir
    day = (
        spark.read.schema(
            "event_id bigint, ts timestamp, user_id bigint, "
            "event_type string, value double, props string, day string"
        )
        .parquet(root)
        .filter(F.col("day") == "2024-01-15")
    )
    return day.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count_distinct("user_id").alias("n_users"),
        (
            F.sum(F.round(F.col("value") * 100, 0).cast("long")).cast("double")
            / 100
        ).alias("total_value"),
    )


@register(
    "event_transition_matrix",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               lead(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS next_type
        FROM events
        WHERE ts IS NOT NULL
    ),
    pairs AS (
        SELECT event_type AS from_type, next_type AS to_type,
               count(*) AS n
        FROM seq WHERE next_type IS NOT NULL
        GROUP BY 1, 2
    ),
    outdeg AS (
        SELECT from_type, sum(n) AS tot FROM pairs GROUP BY 1
    )
    SELECT p.from_type, p.to_type,
           CAST(p.n AS BIGINT) AS n_transitions,
           round(CAST(p.n AS DOUBLE) / o.tot, 6) AS p_transition
    FROM pairs p JOIN outdeg o ON o.from_type = p.from_type
    """,
    doc="Event-transition (Markov) matrix — the pattern-mining "
    "aggregate behind next-action prediction and funnel discovery: "
    "per user, consecutive events (ordered by ts with event_id "
    "totalizing ties) pair into (from, to) transitions via ONE "
    "user-partitioned lead() window; transition counts and "
    "row-normalized probabilities follow from two tiny hash aggs "
    "over the 5x5 type space. The window's user_id shuffle is the "
    "only data-sized Exchange — users partition independently, so "
    "the shape holds at any event volume; the probability divides "
    "two exact int64 counts (one rounded quotient, no float "
    "accumulation).",
    tags=("events", "window"),
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    seq_w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = (
        # un-timestamped events have no place in a sequence — excluded
        t(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .select(
            "user_id",
            "event_type",
            F.lead("event_type").over(seq_w).alias("next_type"),
        )
        .filter(F.col("next_type").isNotNull())
    )
    pairs = seq.groupBy(
        F.col("event_type").alias("from_type"),
        F.col("next_type").alias("to_type"),
    ).agg(F.count(F.lit(1)).alias("n_transitions"))
    outdeg = pairs.groupBy("from_type").agg(
        F.sum("n_transitions").alias("__tot")
    )
    return pairs.join(F.broadcast(outdeg), "from_type").select(
        "from_type",
        "to_type",
        "n_transitions",
        F.round(
            F.col("n_transitions").cast("double") / F.col("__tot"), 6
        ).alias("p_transition"),
    )


# --------------------------------------------------------------------------
# round 6: expanding distinct + tolerance-bounded nearest-event join
# --------------------------------------------------------------------------


@register(
    "cumulative_distinct_users",
    oracle="""
    WITH fd AS (
        SELECT user_id, min(CAST(ts AS DATE)) AS first_day
        FROM events WHERE ts IS NOT NULL
        GROUP BY user_id
    ),
    daily_new AS (
        SELECT first_day AS day, CAST(count(*) AS BIGINT) AS n_new
        FROM fd GROUP BY first_day
    )
    SELECT CAST(day AS VARCHAR) AS day, n_new,
           CAST(sum(n_new) OVER (ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum_users
    FROM daily_new
    ORDER BY day
    """,
    doc="Expanding distinct-user count per day — the DAU-to-"
    "cumulative-users curve. COUNT(DISTINCT) over an expanding "
    "window is quadratic if done literally; the first-touch "
    "reduction makes it linear: a user contributes to the "
    "cumulative count exactly from their FIRST active day, so "
    "min-day per user + daily new-user counts + one running sum "
    "over the (tiny, one-row-per-day) daily series is the whole "
    "query. The only unpartitioned window runs over days, not "
    "events — bounded by the calendar, not the data. NULL "
    "timestamps excluded by contract (no day to attribute).",
    tags=("timeseries", "window", "aggregate"),
)
def cumulative_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    fd = ev.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("first_day")
    )
    daily = fd.groupBy(F.col("first_day").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_new")
    )
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    return daily.select(
        F.col("day").cast("string").alias("day"),
        "n_new",
        F.sum("n_new").over(w).cast("bigint").alias("cum_users"),
    ).orderBy("day")


_NEAREST_TOL_S = 300


@register(
    "nearest_event_tolerance_join",
    oracle=f"""
    WITH c AS (
        SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
        FROM events WHERE event_type = 'click' AND ts IS NOT NULL
    ),
    p AS (
        SELECT event_id AS p_event_id, user_id,
               CAST(floor(epoch(ts)) AS BIGINT) AS p_ts_s
        FROM events WHERE event_type = 'purchase' AND ts IS NOT NULL
    ),
    cand AS (
        SELECT c.event_id, c.user_id, c.ts_s, p.p_event_id,
               abs(p.p_ts_s - c.ts_s) AS adt,
               p.p_ts_s - c.ts_s AS dt
        FROM c JOIN p ON c.user_id = p.user_id
        WHERE abs(p.p_ts_s - c.ts_s) <= {_NEAREST_TOL_S}
    )
    SELECT event_id, user_id, p_event_id, CAST(dt AS BIGINT) AS dt_s
    FROM (SELECT *, row_number() OVER (
              PARTITION BY event_id
              ORDER BY adt, dt, p_event_id) AS rk
          FROM cand)
    WHERE rk = 1
    ORDER BY event_id
    """,
    doc="Nearest-event join with a hard tolerance: each click is "
    f"matched to the user's temporally closest purchase within "
    f"±{_NEAREST_TOL_S}s (ties: prefer the earlier-signed delta, "
    "then the lower event id). Unlike the as-of join (latest "
    "at-or-before), this is the symmetric-nearest variant used for "
    "sensor alignment and conversion attribution. The Spark side "
    "is a BANDED BUCKET JOIN — both sides keyed by (user, "
    f"floor(ts/{_NEAREST_TOL_S})), clicks replicated to the two "
    "adjacent buckets so every within-tolerance pair co-locates in "
    "exactly one probed bucket triplet — a bounded equi-join, "
    "never the unbounded `|dt| <= tol` theta join that explodes "
    "pairwise per user (same bucketing algebra as the MinHash band "
    "join and the LSH tables). The oracle IS that theta join, so "
    "agreement proves the replication covers exactly the "
    "tolerance window. Unmatched clicks drop (inner semantics); "
    "NULL timestamps excluded by contract.",
    tags=("join", "timeseries", "asof"),
)
def nearest_event_tolerance_join(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = t(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id",
        "user_id",
        F.col("ts").cast("long").alias("ts_s"),
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_event_id"),
        "user_id",
        F.col("ts").cast("long").alias("p_ts_s"),
    )
    tol = _NEAREST_TOL_S
    # replicate each CLICK into its own bucket and both neighbors;
    # purchases stay single-bucket, so each candidate pair meets in
    # exactly one (user, bucket) cell
    c_rep = clicks.select(
        "event_id",
        "user_id",
        "ts_s",
        F.explode(
            F.array(
                (F.floor(F.col("ts_s") / tol) - 1).cast("bigint"),
                F.floor(F.col("ts_s") / tol).cast("bigint"),
                (F.floor(F.col("ts_s") / tol) + 1).cast("bigint"),
            )
        ).alias("bkt"),
    )
    p_b = purchases.withColumn(
        "bkt", F.floor(F.col("p_ts_s") / tol).cast("bigint")
    )
    cand = (
        c_rep.join(p_b, ["user_id", "bkt"])
        .where(F.abs(F.col("p_ts_s") - F.col("ts_s")) <= tol)
        .select(
            "event_id",
            "user_id",
            "p_event_id",
            (F.col("p_ts_s") - F.col("ts_s")).alias("dt"),
            F.abs(F.col("p_ts_s") - F.col("ts_s")).alias("adt"),
        )
    )
    w = W.partitionBy("event_id").orderBy("adt", "dt", "p_event_id")
    return (
        cand.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select(
            "event_id",
            "user_id",
            "p_event_id",
            F.col("dt").cast("bigint").alias("dt_s"),
        )
        .orderBy("event_id")
    )


@register(
    "time_to_convert_profile",
    oracle="""
    WITH fc AS (
        SELECT user_id, min(CAST(floor(epoch(ts)) AS BIGINT)) AS c_ts
        FROM events WHERE event_type = 'click' AND ts IS NOT NULL
        GROUP BY user_id
    ),
    fp AS (
        SELECT e.user_id,
               min(CAST(floor(epoch(e.ts)) AS BIGINT)) AS p_ts
        FROM events e JOIN fc ON fc.user_id = e.user_id
        WHERE e.event_type = 'purchase' AND e.ts IS NOT NULL
          AND CAST(floor(epoch(e.ts)) AS BIGINT) >= fc.c_ts
        GROUP BY e.user_id
    ),
    lag AS (
        SELECT fp.user_id, fp.p_ts - fc.c_ts AS lag_s
        FROM fp JOIN fc USING (user_id)
    )
    SELECT CAST(count(*) AS BIGINT) AS n_converted,
           CAST(min(lag_s) AS BIGINT) AS min_lag_s,
           round(quantile_cont(lag_s, 0.25), 2) AS p25_lag_s,
           round(quantile_cont(lag_s, 0.50), 2) AS p50_lag_s,
           round(quantile_cont(lag_s, 0.75), 2) AS p75_lag_s,
           CAST(max(lag_s) AS BIGINT) AS max_lag_s
    FROM lag
    """,
    doc="Conversion-latency profile: per user, the lag from FIRST "
    "click to the first purchase at-or-after it; quartiles, min, "
    "max, and the converted-user count in one audit row. The "
    "standard growth-analytics latency curve, computed as two "
    "keyed min-aggregations (first click; first qualifying "
    "purchase, the at-or-after filter applied IN the join so a "
    "purchase before any click never counts) and exact "
    "interpolating quantiles over integer epoch seconds — the "
    ".25/.75 interpolation lands on exact quarter-grid doubles, "
    "identical across engines. NULL timestamps excluded by "
    "contract. Both shuffles key on user_id.",
    tags=("timeseries", "aggregate"),
)
def time_to_convert_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    fc = (
        ev.where(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min(F.col("ts").cast("long")).alias("c_ts"))
    )
    p = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").cast("long").alias("p_ts")
    )
    fp = (
        p.join(fc, "user_id")
        .where(F.col("p_ts") >= F.col("c_ts"))
        .groupBy("user_id")
        # c_ts is constant per user (one fc row per user); min() makes
        # the determinism explicit rather than relying on first()
        .agg(F.min("p_ts").alias("p_ts"), F.min("c_ts").alias("c_ts"))
    )
    lag = fp.select((F.col("p_ts") - F.col("c_ts")).alias("lag_s"))
    return lag.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_converted"),
        F.min("lag_s").cast("bigint").alias("min_lag_s"),
        F.round(F.expr("percentile(lag_s, 0.25)"), 2).alias("p25_lag_s"),
        F.round(F.expr("percentile(lag_s, 0.50)"), 2).alias("p50_lag_s"),
        F.round(F.expr("percentile(lag_s, 0.75)"), 2).alias("p75_lag_s"),
        F.max("lag_s").cast("bigint").alias("max_lag_s"),
    )


_DRIFT_WIN = 7


@register(
    "daily_drift_report",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
                   AS day_cents
        FROM events WHERE ts IS NOT NULL
        GROUP BY 1
    ),
    w AS (
        SELECT day, n_rows, day_cents,
               count(*) OVER tw AS w_n,
               sum(n_rows) OVER tw AS w_s,
               sum(n_rows * n_rows) OVER tw AS w_ss
        FROM daily
        WINDOW tw AS (ORDER BY day
                      ROWS BETWEEN {_DRIFT_WIN} PRECEDING AND 1 PRECEDING)
    )
    SELECT CAST(day AS VARCHAR) AS day, n_rows, day_cents,
           CASE WHEN w_n = {_DRIFT_WIN}
                THEN round(CAST(w_s AS DOUBLE) / w_n, 4) END
               AS trail_mean_rows,
           CASE WHEN w_n = {_DRIFT_WIN}
                THEN abs(n_rows - CAST(w_s AS DOUBLE) / w_n)
                     > 3 * sqrt((CAST(w_ss AS DOUBLE)
                                 - CAST(w_s AS DOUBLE) * w_s / w_n)
                                / (w_n - 1))
                ELSE NULL END AS drift_flag
    FROM w
    ORDER BY day
    """,
    doc="Data-observability drift report: per ingest day, row count "
    "and exact-cents value total, plus a 3-sigma volume anomaly "
    f"flag against the trailing {_DRIFT_WIN}-day window (flag NULL "
    "until a full window exists — no verdicts from partial "
    "history). This is the table-health monitor every production "
    "pipeline bolts onto its bronze layer; here it is one grouped "
    "aggregation plus one tiny window over the one-row-per-day "
    "series (calendar-bounded, like cumulative_distinct_users — "
    "the events table itself is never windowed). Trailing moments "
    "ride exact integer window sums; the mean/stddev/flag are one "
    "identical double expression per engine. NULL timestamps "
    "excluded by contract.",
    tags=("timeseries", "window", "ops"),
)
def daily_drift_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(F.round(F.col("value") * 100, 0).cast("bigint"))
        .cast("bigint")
        .alias("day_cents"),
    )
    tw = W.orderBy("day").rowsBetween(-_DRIFT_WIN, -1)
    w = daily.select(
        "day",
        "n_rows",
        "day_cents",
        F.count(F.lit(1)).over(tw).alias("w_n"),
        F.sum("n_rows").over(tw).alias("w_s"),
        F.sum(F.col("n_rows") * F.col("n_rows")).over(tw).alias("w_ss"),
    )
    full = F.col("w_n") == _DRIFT_WIN
    mean = F.col("w_s").cast("double") / F.col("w_n")
    sd = F.sqrt(
        (
            F.col("w_ss").cast("double")
            - F.col("w_s").cast("double") * F.col("w_s") / F.col("w_n")
        )
        / (F.col("w_n") - 1)
    )
    return w.select(
        F.col("day").cast("string").alias("day"),
        "n_rows",
        "day_cents",
        F.when(full, F.round(mean, 4)).alias("trail_mean_rows"),
        F.when(full, F.abs(F.col("n_rows") - mean) > 3 * sd).alias(
            "drift_flag"
        ),
    ).orderBy("day")
