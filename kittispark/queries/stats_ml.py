"""Statistical modeling and time-series analytics.

Five operators a training-data / analytics pipeline reaches for
constantly, each expressed as a declarative Spark plan with exact
cross-engine arithmetic:

- ``ols_price_vs_quantity`` — closed-form per-group OLS (slope /
  intercept / R^2) from exact integer moments;
- ``welch_ttest_value`` — Welch's unequal-variance t-test between
  two event populations, from exact integer moments;
- ``mad_outlier_profile`` — median-absolute-deviation outlier
  profile per group (the robust-statistics alternative to z-scores,
  immune to the outliers it hunts);
- ``ewma_user_value`` — exponentially-weighted moving average over
  each user's most recent events with alpha = 1/2, so every weight
  is a POWER OF TWO and the weighted sum rides exact int64 — no
  float-power drift between engines;
- ``interval_sweep_coverage`` — union-length of overlapping
  per-user time intervals via the classic sweep-line (prefix-max)
  window, the same interval-union machinery ExactSubstr uses for
  span merging (operators/dedup.py), here as a first-class query.

Cross-engine float discipline (SCALING.md): every cross-row SUM is
an exact integer (cents / micro-units, DECIMAL(38,0) on Spark,
HUGEINT on DuckDB); floats appear only AFTER aggregation, in
identical single-expression form on both engines, rounded on
emission. Medians interpolate identically (Spark ``percentile`` /
DuckDB ``quantile_cont``) and land on exact .5 grid points of the
micro-int domain.

Reference parity: none — the reference has no statistics surface;
SURVEY.md §6 breadth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from kittispark.queries._util import t
from kittispark.registry import register


# --------------------------------------------------------------------------
# Closed-form OLS per group
# --------------------------------------------------------------------------


@register(
    "ols_price_vs_quantity",
    oracle="""
    WITH m AS (
        SELECT l_returnflag,
               CAST(count(*) AS HUGEINT)                             AS n,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS HUGEINT)      AS sx,
               CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT))
                    AS HUGEINT)                                      AS sy,
               CAST(sum(CAST(l_quantity AS BIGINT)
                        * CAST(l_quantity AS BIGINT)) AS HUGEINT)    AS sxx,
               CAST(sum(CAST(l_quantity AS BIGINT)
                        * CAST(round(l_extendedprice * 100, 0) AS BIGINT))
                    AS HUGEINT)                                      AS sxy,
               CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                        * CAST(round(l_extendedprice * 100, 0) AS BIGINT))
                    AS HUGEINT)                                      AS syy
        FROM lineitem
        GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           CAST(n AS BIGINT) AS n,
           round(CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS slope_cents,
           round((CAST(sy AS DOUBLE)
                  - CAST(n * sxy - sx * sy AS DOUBLE)
                    / CAST(n * sxx - sx * sx AS DOUBLE)
                    * CAST(sx AS DOUBLE))
                 / CAST(n AS DOUBLE), 6) AS intercept_cents,
           round(CAST(n * sxy - sx * sy AS DOUBLE)
                 * CAST(n * sxy - sx * sy AS DOUBLE)
                 / (CAST(n * sxx - sx * sx AS DOUBLE)
                    * CAST(n * syy - sy * sy AS DOUBLE)), 6) AS r2
    FROM m
    ORDER BY l_returnflag
    """,
    doc="Per-returnflag ordinary least squares of extended price "
    "(cents) on quantity: slope, intercept and R^2 from the five "
    "closed-form moments. The moments are EXACT integers "
    "(DECIMAL(38,0) sums of int64 products on Spark, HUGEINT on "
    "DuckDB — cents x quantity keeps every term far inside 128 "
    "bits even at 100 TB row counts), so the single double "
    "division + round(6) at the end is the only float step and is "
    "bit-identical across engines. One map-side-combined hash "
    "aggregation over the fact table — the whole regression is a "
    "one-pass, one-shuffle plan; no gradient loop, no collect. "
    "This moments-then-solve shape is exactly how linear models "
    "are fit at warehouse scale.",
    tags=("stats", "aggregate"),
)
def ols_price_vs_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("bigint")
    y = F.round(F.col("l_extendedprice") * 100, 0).cast("bigint")
    dec = "decimal(38,0)"
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum(x.cast(dec)).alias("sx"),
        F.sum(y.cast(dec)).alias("sy"),
        F.sum((x * x).cast(dec)).alias("sxx"),
        F.sum((x * y).cast(dec)).alias("sxy"),
        F.sum((y * y).cast(dec)).alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "double"
    )
    deny = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
        "double"
    )
    slope = num / den
    return m.select(
        "l_returnflag",
        F.col("n").cast("bigint").alias("n"),
        F.round(slope, 6).alias("slope_cents"),
        F.round(
            (F.col("sy").cast("double") - slope * F.col("sx").cast("double"))
            / F.col("n").cast("double"),
            6,
        ).alias("intercept_cents"),
        F.round(num * num / (den * deny), 6).alias("r2"),
    ).orderBy("l_returnflag")


# --------------------------------------------------------------------------
# Welch's t-test
# --------------------------------------------------------------------------


@register(
    "welch_ttest_value",
    oracle="""
    WITH m AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(round(value * 1e6, 0) AS BIGINT))
                    AS HUGEINT) AS s,
               CAST(sum(CAST(round(value * 1e6, 0) AS BIGINT)
                        * CAST(round(value * 1e6, 0) AS BIGINT))
                    AS HUGEINT) AS ss
        FROM events
        WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL
        GROUP BY event_type
    ),
    v AS (
        SELECT event_type, n,
               CAST(s AS DOUBLE) / n / 1e6 AS mean,
               (CAST(ss AS DOUBLE)
                - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
               / (n - 1) / 1e12 AS var
        FROM m
    ),
    w AS (
        SELECT a.n AS n_click, b.n AS n_purchase,
               a.mean - b.mean AS md,
               a.var / a.n AS va, b.var / b.n AS vb
        FROM v a, v b
        WHERE a.event_type = 'click' AND b.event_type = 'purchase'
    )
    SELECT n_click, n_purchase,
           round(md, 6) + 0.0 AS mean_diff,
           round(md / sqrt(va + vb), 4) + 0.0 AS t_stat,
           round((va + vb) * (va + vb)
                 / (va * va / (n_click - 1) + vb * vb / (n_purchase - 1)),
                 4) AS welch_df
    FROM w
    """,
    doc="Welch's unequal-variance t-test between the 'click' and "
    "'purchase' event value populations: micro-unit integer moments "
    "(exact HUGEINT / DECIMAL sums) feed the textbook mean/variance/"
    "t/Welch-Satterthwaite-df formulas, written as the IDENTICAL "
    "double expression on both engines so every IEEE operation "
    "matches bit-for-bit before the emission round. One grouped "
    "aggregation + a 2x1-row self-pair — the A/B-test primitive at "
    "any scale, one shuffle total. NULL values excluded by "
    "contract (documented, matches the r5 NULL-exclusion family).",
    tags=("stats", "aggregate"),
)
def welch_ttest_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").where(
        F.col("event_type").isin("click", "purchase")
        & F.col("value").isNotNull()
    )
    vi = F.round(F.col("value") * 1e6, 0).cast("bigint")
    dec = "decimal(38,0)"
    m = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(vi.cast(dec)).alias("s"),
        F.sum((vi * vi).cast(dec)).alias("ss"),
    )
    v = m.select(
        "event_type",
        "n",
        (F.col("s").cast("double") / F.col("n") / F.lit(1e6)).alias("mean"),
        (
            (
                F.col("ss").cast("double")
                - F.col("s").cast("double")
                * F.col("s").cast("double")
                / F.col("n")
            )
            / (F.col("n") - 1)
            / F.lit(1e12)
        ).alias("var"),
    )
    a = v.where(F.col("event_type") == "click").alias("a")
    b = v.where(F.col("event_type") == "purchase").alias("b")
    w = a.crossJoin(b).select(
        F.col("a.n").alias("n_click"),
        F.col("b.n").alias("n_purchase"),
        (F.col("a.mean") - F.col("b.mean")).alias("md"),
        (F.col("a.var") / F.col("a.n")).alias("va"),
        (F.col("b.var") / F.col("b.n")).alias("vb"),
    )
    return w.select(
        "n_click",
        "n_purchase",
        # + 0.0: mean_diff / t_stat are signed differences that can
        # round to -0.0 in DuckDB but +0.0 in Spark (r9 agghash-tier
        # latent class; see rescale_by_percentile). welch_df >= 0 by
        # construction, no normalization needed.
        (F.round(F.col("md"), 6) + 0.0).alias("mean_diff"),
        (F.round(F.col("md") / F.sqrt(F.col("va") + F.col("vb")), 4) + 0.0).alias(
            "t_stat"
        ),
        F.round(
            (F.col("va") + F.col("vb"))
            * (F.col("va") + F.col("vb"))
            / (
                F.col("va") * F.col("va") / (F.col("n_click") - 1)
                + F.col("vb") * F.col("vb") / (F.col("n_purchase") - 1)
            ),
            4,
        ).alias("welch_df"),
    )


# --------------------------------------------------------------------------
# MAD outlier profile
# --------------------------------------------------------------------------


@register(
    "mad_outlier_profile",
    oracle="""
    WITH x AS (
        SELECT event_type,
               CAST(round(value * 1e6, 0) AS BIGINT) AS vi
        FROM events WHERE value IS NOT NULL
    ),
    med AS (
        SELECT event_type, quantile_cont(vi, 0.5) AS m
        FROM x GROUP BY event_type
    ),
    dev AS (
        SELECT x.event_type, x.vi, med.m, abs(x.vi - med.m) AS d
        FROM x JOIN med USING (event_type)
    ),
    mad AS (
        SELECT event_type, any_value(m) AS m,
               quantile_cont(d, 0.5) AS mad
        FROM dev GROUP BY event_type
    )
    SELECT d.event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(mad.m / 1e6, 6) AS median_value,
           round(mad.mad / 1e6, 6) AS mad_value,
           CAST(sum(CASE WHEN d.d > 3 * mad.mad THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers
    FROM dev d JOIN mad USING (event_type)
    GROUP BY d.event_type, mad.m, mad.mad
    ORDER BY d.event_type
    """,
    doc="Median-absolute-deviation outlier profile per event type: "
    "median of the micro-int values, median of absolute deviations "
    "from it, and the count of points beyond 3 MAD — the robust "
    "outlier detector (unlike z-scores, the threshold itself is "
    "immune to the outliers it flags). Exact interpolating medians "
    "land on the .5 grid of the micro-int domain (Spark percentile "
    "== DuckDB quantile_cont on integers), deviations and the "
    "3xMAD threshold stay on that grid, so the comparison is "
    "exact. Plan: two grouped-median passes with the medians "
    "broadcast back — the standard two-phase robust-stats shape; "
    "both shuffles key on event_type.",
    tags=("stats", "aggregate"),
)
def mad_outlier_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    x = (
        t(spark, sf_dir, "events")
        .where(F.col("value").isNotNull())
        .select(
            "event_type",
            F.round(F.col("value") * 1e6, 0).cast("bigint").alias("vi"),
        )
    )
    med = x.groupBy("event_type").agg(
        F.expr("percentile(vi, 0.5)").alias("m")
    )
    dev = x.join(F.broadcast(med), "event_type").withColumn(
        "d", F.abs(F.col("vi") - F.col("m"))
    )
    # m is constant within each event_type group (it came from the
    # broadcast-back join); min() states that invariance explicitly
    # where first() would merely rely on it
    mad = dev.groupBy("event_type").agg(
        F.min("m").alias("m"), F.expr("percentile(d, 0.5)").alias("mad")
    )
    return (
        dev.drop("m")
        .join(F.broadcast(mad), "event_type")
        .groupBy("event_type", "m", "mad")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(
                F.when(F.col("d") > 3 * F.col("mad"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_outliers"),
        )
        .select(
            "event_type",
            "n",
            F.round(F.col("m") / 1e6, 6).alias("median_value"),
            F.round(F.col("mad") / 1e6, 6).alias("mad_value"),
            "n_outliers",
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Power-of-two EWMA
# --------------------------------------------------------------------------

_EWMA_K = 8


@register(
    "ewma_user_value",
    oracle=f"""
    WITH r AS (
        SELECT user_id,
               CAST(round(value * 1e6, 0) AS BIGINT) AS vi,
               row_number() OVER (
                   PARTITION BY user_id
                   ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
        WHERE ts IS NOT NULL AND value IS NOT NULL
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_used,
           round(CAST(sum(vi * (1::BIGINT << ({_EWMA_K} - rn))) AS DOUBLE)
                 / CAST(sum(1::BIGINT << ({_EWMA_K} - rn)) AS DOUBLE)
                 / 1e6, 6) AS ewma
    FROM r
    WHERE rn <= {_EWMA_K}
    GROUP BY user_id
    ORDER BY user_id
    """,
    doc="Exponentially-weighted moving average of each user's last "
    f"{_EWMA_K} event values with alpha = 1/2 — newest first, weight "
    "halving each step back. Because alpha is a power of two the "
    "weights are exact int64 (1 << (K - rn)), the weighted sum is "
    "an exact integer, and the single final division is the only "
    "float op — no pow()/exp() cross-engine drift possible. Rows "
    "with NULL event time or value are excluded by contract (no "
    "position in the recency order / nothing to average). Plan: "
    "one window (partitioned by user, never global) + one grouped "
    "agg — both shuffle on user_id and AQE-coalesce; this is the "
    "standard online-feature shape (user recency features at "
    "serving time).",
    tags=("stats", "window", "timeseries"),
)
def ewma_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").where(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    )
    w = W.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    r = ev.select(
        "user_id",
        F.round(F.col("value") * 1e6, 0).cast("bigint").alias("vi"),
        F.row_number().over(w).alias("rn"),
    ).where(F.col("rn") <= _EWMA_K)
    # shift amount is a column — PySpark's shiftleft wrapper wants an
    # int literal, so go through the SQL form
    wgt = F.expr(
        f"shiftleft(cast(1 as bigint), cast({_EWMA_K} - rn as int))"
    )
    return (
        r.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_used"),
            F.round(
                F.sum(F.col("vi") * wgt).cast("double")
                / F.sum(wgt).cast("double")
                / 1e6,
                6,
            ).alias("ewma"),
        )
        .orderBy("user_id")
    )


# --------------------------------------------------------------------------
# Interval union via sweep line
# --------------------------------------------------------------------------


@register(
    "interval_sweep_coverage",
    oracle="""
    WITH iv AS (
        SELECT user_id, event_id,
               CAST(floor(epoch(ts)) AS BIGINT) AS s,
               CAST(floor(epoch(ts)) AS BIGINT)
                   + 1 + CAST(floor(abs(value)) AS BIGINT) AS e
        FROM events
        WHERE ts IS NOT NULL AND value IS NOT NULL
    ),
    flagged AS (
        SELECT user_id, event_id, s, e,
               CASE WHEN s > coalesce(max(e) OVER (
                        PARTITION BY user_id ORDER BY s, e, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        -9223372036854775808)
                    THEN 1 ELSE 0 END AS brk
        FROM iv
    ),
    grp AS (
        SELECT user_id, s, e,
               sum(brk) OVER (
                   PARTITION BY user_id ORDER BY s, e, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS g
        FROM flagged
    ),
    merged AS (
        SELECT user_id, g, min(s) AS ms, max(e) AS me
        FROM grp GROUP BY user_id, g
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_spans,
           CAST(sum(me - ms) AS BIGINT) AS coverage_s
    FROM merged
    GROUP BY user_id
    ORDER BY user_id
    """,
    doc="Union length of overlapping per-user time intervals "
    "([ts, ts + 1 + floor(|value|)] seconds) via the classic sweep "
    "line: order intervals by start within each user, a new merged "
    "span begins exactly when a start exceeds the running max of "
    "prior ends (prefix-max window), the span id is the running sum "
    "of those breaks, and each span contributes max(end)-min(start). "
    "This is the distributed interval-union — the same shape that "
    "merges ExactSubstr byte spans (operators/dedup.py) and "
    "sessionizes with variable timeouts — O(n log n) per user key, "
    "every window partitioned by user_id, nothing global. All "
    "epoch-second integer arithmetic; the break flag is invariant "
    "to tie order among equal starts (any earlier equal-start "
    "interval already covers s, so ties cannot flip it).",
    tags=("timeseries", "window"),
)
def interval_sweep_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").where(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    )
    iv = ev.select(
        "user_id",
        "event_id",
        F.col("ts").cast("long").alias("s"),
        (
            F.col("ts").cast("long")
            + 1
            + F.floor(F.abs(F.col("value"))).cast("long")
        ).alias("e"),
    )
    w_prev = (
        W.partitionBy("user_id")
        .orderBy("s", "e", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    flagged = iv.select(
        "user_id",
        "s",
        "e",
        F.when(
            F.col("s")
            > F.coalesce(
                F.max("e").over(w_prev),
                F.lit(-(2**63)).cast("long"),
            ),
            1,
        )
        .otherwise(0)
        .alias("brk"),
        F.col("event_id"),
    )
    w_run = (
        W.partitionBy("user_id")
        .orderBy("s", "e", "event_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    grp = flagged.select(
        "user_id", "s", "e", F.sum("brk").over(w_run).alias("g")
    )
    merged = grp.groupBy("user_id", "g").agg(
        F.min("s").alias("ms"), F.max("e").alias("me")
    )
    return (
        merged.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_spans"),
            F.sum(F.col("me") - F.col("ms")).cast("bigint").alias(
                "coverage_s"
            ),
        )
        .orderBy("user_id")
    )


@register(
    "trimmed_winsorized_value",
    oracle="""
    WITH e AS (
        SELECT event_type, event_id,
               CAST(round(value * 1e6, 0) AS BIGINT) AS vm
        FROM events WHERE value IS NOT NULL
    ),
    r AS (
        SELECT event_type, vm,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY vm, event_id) AS rk,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM e
    ),
    g AS (
        SELECT event_type, vm, rk, n, n // 10 AS kt FROM r
    ),
    agg AS (
        SELECT event_type,
               CAST(max(n) AS BIGINT) AS n,
               CAST(max(kt) AS BIGINT) AS k_trim,
               CAST(sum(vm) AS HUGEINT) AS s_all,
               CAST(sum(CASE WHEN rk > kt AND rk <= n - kt
                        THEN vm END) AS HUGEINT) AS s_mid,
               max(CASE WHEN rk = kt + 1 THEN vm END) AS lo_cap,
               max(CASE WHEN rk = n - kt THEN vm END) AS hi_cap
        FROM g GROUP BY event_type
    )
    SELECT event_type, n, k_trim,
           round(CAST(s_all AS DOUBLE) / n / 1e6, 6) AS mean,
           round(CAST(s_mid AS DOUBLE) / (n - 2 * k_trim) / 1e6, 6)
               AS trimmed_mean,
           round((CAST(s_mid AS DOUBLE)
                  + CAST(k_trim AS DOUBLE) * lo_cap
                  + CAST(k_trim AS DOUBLE) * hi_cap) / n / 1e6, 6)
               AS winsor_mean
    FROM agg
    ORDER BY event_type
    """,
    doc="10% trimmed and winsorized means of event value per event "
    "type — the robust location estimates that survive the heavy "
    "tails z-scores choke on (trimming drops the k = n DIV 10 "
    "lowest and highest; winsorizing clamps them to the surviving "
    "boundary values). Exactness: values ride integer micro-units; "
    "per-group order statistics come from grouped_rank — the "
    "two-level (partition x group) prefix-sum rank, so NO "
    "data-sized single-partition window exists even when one group "
    "holds the whole table; ranks, k, and every cross-row sum are "
    "exact integers (DECIMAL(38,0) / HUGEINT); ties break on "
    "event_id; the three means are identical single double "
    "expressions per engine, rounded at emission. NULL values "
    "excluded by contract; NULL event_type is its own group "
    "(null-safe rank join).",
    tags=("stats", "aggregate", "window"),
)
def trimmed_winsorized_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kittispark.operators.analytics import _exact_div, grouped_rank

    ev = t(spark, sf_dir, "events").where(F.col("value").isNotNull())
    e = ev.select(
        "event_type",
        "event_id",
        F.round(F.col("value") * 1e6, 0).cast("bigint").alias("vm"),
    )
    r = grouped_rank(
        e, ["event_type"], F.col("vm"), F.col("event_id"), out_col="rk"
    )
    g = r.withColumn("kt", _exact_div(F.col("n_group"), F.lit(10)))
    mid = F.col("rk").between(F.col("kt") + 1, F.col("n_group") - F.col("kt"))
    dec = "decimal(38,0)"
    agg = g.groupBy("event_type").agg(
        F.max("n_group").cast("bigint").alias("n"),
        F.max("kt").cast("bigint").alias("k_trim"),
        F.sum(F.col("vm").cast(dec)).alias("s_all"),
        F.sum(F.when(mid, F.col("vm")).cast(dec)).alias("s_mid"),
        F.max(F.when(F.col("rk") == F.col("kt") + 1, F.col("vm"))).alias(
            "lo_cap"
        ),
        F.max(
            F.when(F.col("rk") == F.col("n_group") - F.col("kt"), F.col("vm"))
        ).alias("hi_cap"),
    )
    return agg.select(
        "event_type",
        "n",
        "k_trim",
        F.round(F.col("s_all").cast("double") / F.col("n") / 1e6, 6).alias(
            "mean"
        ),
        F.round(
            F.col("s_mid").cast("double")
            / (F.col("n") - 2 * F.col("k_trim"))
            / 1e6,
            6,
        ).alias("trimmed_mean"),
        F.round(
            (
                F.col("s_mid").cast("double")
                + F.col("k_trim").cast("double") * F.col("lo_cap")
                + F.col("k_trim").cast("double") * F.col("hi_cap")
            )
            / F.col("n")
            / 1e6,
            6,
        ).alias("winsor_mean"),
    ).orderBy("event_type")
