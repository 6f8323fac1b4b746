"""Statistical sampling and estimation operators: Johnson-
Lindenstrauss random projection with a distance-preservation audit,
one-pass Poisson-bootstrap confidence intervals, and Efraimidis-
Spirakis weighted reservoir sampling.

All three follow the exact-determinism discipline: randomness comes
from the portable md5-derived hash (operators/dedup.py:
portable_hash64) so both engines draw the SAME pseudo-random
numbers, and every cross-row aggregate rides exact integers
(nano/cent-scaled BIGINT, DECIMAL/HUGEINT second moments) so no
float-summation-order drift can split the engines.

Reference parity: none of this exists in the reference (NumPy
geometry scripts); SURVEY.md §6's LLM-pipeline extension — JL is
the scale path for embedding pipelines (project before cluster),
Poisson bootstrap is how you put error bars on corpus metrics in
one pass (Chamandy et al., "Estimating Uncertainty for Massive
Data Streams", Google 2012), and weighted reservoirs are the
standard fixed-size weighted sample (Efraimidis & Spirakis 2006).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kittispark.queries._util import t
from kittispark.registry import register

_DIM = 64
_JL_K = 16


def _jl_sign(i: int, j: int) -> int:
    """±1 sign for projection cell (i, j): parity of the portable
    60-bit md5 hash of 'i:j' — reproducible in-engine (DuckDB twin
    derives the same value from md5 SQL) and in Python here, so the
    Spark side can burn the signs into a literal expression and stay
    map-side."""
    h = int(hashlib.md5(f"{i}:{j}".encode()).hexdigest()[:15], 16)
    return 1 if h % 2 == 0 else -1


_JL_SIGNS = [[_jl_sign(i, j) for i in range(_DIM)] for j in range(_JL_K)]

# exact squared L2 over nano-int arrays, as a decimal fold (Spark)
_D2_SPARK = (
    "aggregate(sequence(0,{n}), cast(0 as decimal(38,0)), (acc, i) -> "
    "acc + cast(element_at({a}, i+1) - element_at({b}, i+1) as decimal(19,0))"
    "    * cast(element_at({a}, i+1) - element_at({b}, i+1) as decimal(19,0)))"
)
# ... and as a HUGEINT list_sum (DuckDB; integer sums are order-free)
_D2_DUCK = (
    "list_sum(list_transform(range({n1}), i -> "
    "CAST({a}[CAST(i+1 AS INT)] - {b}[CAST(i+1 AS INT)] AS HUGEINT)"
    " * ({a}[CAST(i+1 AS INT)] - {b}[CAST(i+1 AS INT)])))"
)


@register(
    "jl_projection_audit",
    oracle=f"""
    WITH x AS (
        SELECT vec_id,
               list_transform(embedding,
                              e -> CAST(floor(e * 1e9) AS BIGINT)) AS xn
        FROM embeddings WHERE vec_id < 50
    ),
    proj AS (
        SELECT vec_id,
               list_transform(range({_JL_K}), j -> CAST(
                   list_sum(list_transform(range({_DIM}), i ->
                       (CASE WHEN CAST(('0x' || substring(
                            md5(i || ':' || j), 1, 15)) AS UBIGINT) % 2 = 0
                        THEN 1 ELSE -1 END)
                       * xn[CAST(i + 1 AS INT)])) AS BIGINT)) AS p
        FROM x
    ),
    pairs AS (
        SELECT a.vec_id AS pair_id,
               {_D2_DUCK.format(n1=_DIM, a="ax.xn", b="bx.xn")} AS d2o,
               {_D2_DUCK.format(n1=_JL_K, a="a.p", b="b.p")} AS d2p
        FROM proj a
        JOIN proj b ON b.vec_id = a.vec_id + 1
        JOIN x ax ON ax.vec_id = a.vec_id
        JOIN x bx ON bx.vec_id = b.vec_id
        WHERE a.vec_id % 2 = 0
    )
    SELECT pair_id,
           round(CAST(d2p AS DOUBLE) / {_JL_K}
                 / nullif(CAST(d2o AS DOUBLE), 0), 4) AS dist_ratio
    FROM pairs
    """,
    doc="Johnson-Lindenstrauss audit: embeddings project 64 -> 16 "
    "dims through a ±1 sign matrix whose entries are parities of the "
    "portable md5 hash of 'i:j' — so Spark burns the signs into a "
    "literal whole-stage-codegen fold (map-side matmul, NO shuffle, "
    "no broadcast table: workers re-derive nothing) while the oracle "
    "re-derives the identical matrix from md5 SQL. For 25 adjacent "
    "vec_id pairs the squared-distance ratio (projected/k over "
    "original) is reported — the JL lemma says these concentrate "
    "near 1. Distances ride nano-int DECIMAL/HUGEINT folds: "
    "engine-exact, order-free. At 100 TB, this projection IS the "
    "recommended pre-step before k-means/IVF (16 cheap dims for "
    "assignment, full dims only for re-rank).",
    tags=("similarity", "sampling"),
)
def jl_projection_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    x = (
        t(spark, sf_dir, "embeddings")
        .where(F.col("vec_id") < 50)
        .select(
            "vec_id",
            F.expr(
                "transform(embedding, e -> cast(floor(e * 1e9) as bigint))"
            ).alias("xn"),
        )
    )
    proj_cols = [
        F.expr(
            "aggregate(sequence(0, %d), 0L, (acc, i) -> acc + "
            "element_at(array(%s), i+1) * element_at(xn, i+1))"
            % (_DIM - 1, ", ".join(f"{s}L" for s in _JL_SIGNS[j]))
        ).alias(f"p{j}")
        for j in range(_JL_K)
    ]
    proj = x.select("vec_id", F.array(*[c for c in proj_cols]).alias("p"), "xn")
    a = proj.select(
        F.col("vec_id").alias("pair_id"),
        F.col("p").alias("pa"),
        F.col("xn").alias("xa"),
    ).where(F.col("pair_id") % 2 == 0)
    b = proj.select(
        (F.col("vec_id") - 1).alias("pair_id"),
        F.col("p").alias("pb"),
        F.col("xn").alias("xb"),
    )
    d2o = F.expr(_D2_SPARK.format(n=_DIM - 1, a="xa", b="xb"))
    d2p = F.expr(_D2_SPARK.format(n=_JL_K - 1, a="pa", b="pb"))
    return a.join(b, "pair_id").select(
        "pair_id",
        F.round(
            d2p.cast("double")
            / _JL_K
            / F.nullif(d2o.cast("double"), F.lit(0.0)),
            4,
        ).alias("dist_ratio"),
    )


# Poisson(1) inverse-CDF thresholds (cumulative e^-1 / k!) — literal
# constants shared by both engines so the same uniform draws the
# same weight everywhere.
_POIS = [
    (0.36787944117144233, 0),
    (0.7357588823428847, 1),
    (0.9196986029286058, 2),
    (0.9810118431238462, 3),
    (0.9963401531726563, 4),
    (0.9994058151824183, 5),
]
_B = 32
_TWO60 = 1 << 60


def _pois_case_sql(u: str) -> str:
    branches = " ".join(
        f"WHEN {u} < {p!r} THEN {k}" for p, k in _POIS
    )
    return f"CASE {branches} ELSE 6 END"


@register(
    "bootstrap_ci_mean",
    oracle=f"""
    WITH rep AS (
        SELECT b,
               sum(CAST(floor(value * 100) AS BIGINT)
                   * ({_pois_case_sql(
                       "CAST(('0x' || substring(md5(event_id || ':' || b), 1, 15)) AS UBIGINT) / " + str(float(_TWO60))
                   )}) ) AS cents,
               sum({_pois_case_sql(
                   "CAST(('0x' || substring(md5(event_id || ':' || b), 1, 15)) AS UBIGINT) / " + str(float(_TWO60))
               )}) AS w
        FROM events CROSS JOIN range(0, {_B}) t(b)
        GROUP BY b
    ),
    means AS (
        SELECT b, CAST(cents AS DOUBLE) / 100 / w AS m,
               row_number() OVER (ORDER BY CAST(cents AS DOUBLE) / 100 / w, b)
                   AS rk
        FROM rep
    ),
    point AS (
        SELECT CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS DOUBLE)
               / 100 / count(*) AS pm
        FROM events
    )
    SELECT CAST({_B} AS INT) AS n_replicas,
           round((SELECT pm FROM point), 4) AS point_mean,
           round(min(CASE WHEN rk = 2 THEN m END), 4) AS ci_lo,
           round(min(CASE WHEN rk = {_B - 1} THEN m END), 4) AS ci_hi
    FROM means
    """,
    doc="One-pass Poisson bootstrap (Chamandy et al. 2012) for the "
    "mean of events.value: each of 32 replicas reweights every row "
    "by a Poisson(1) draw — the draw is the inverse CDF applied to "
    "the portable md5 hash of (event_id, replica), so both engines "
    "sample identical weights — and the 2nd/31st order statistics "
    "of the replica means bracket the ~95% CI. Replica sums ride "
    "cent-scaled BIGINTs (exact, order-free); the full-data point "
    "estimate is exact the same way. Shape at 100 TB: the 32x "
    "explode is map-side, partial aggregation collapses it to 32 "
    "keys per partition before the one tiny shuffle — error bars on "
    "a corpus metric for one extra scan, no resampling passes.",
    tags=("sampling", "events", "audit"),
)
def bootstrap_ci_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select("event_id", "value")
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col("event_id"), F.col("b"))), 1, 15
            ),
            16,
            10,
        ).cast("long")
        / F.lit(float(_TWO60))
    )
    w = F.lit(6)
    for p, k in reversed(_POIS):
        w = F.when(u < p, k).otherwise(w)
    rep = (
        ev.select(
            "event_id",
            F.floor(F.col("value") * 100).cast("long").alias("cents"),
            F.explode(F.sequence(F.lit(0), F.lit(_B - 1))).alias("b"),
        )
        .select("b", (F.col("cents") * w).alias("wc"), w.alias("w"))
        .groupBy("b")
        .agg(F.sum("wc").alias("cents"), F.sum("w").alias("w"))
    )
    m = (F.col("cents").cast("double") / 100 / F.col("w")).alias("m")
    means = rep.select("b", m).withColumn(
        "rk", F.row_number().over(Window.orderBy("m", "b"))
    )
    point = ev.agg(
        (
            F.sum(F.floor(F.col("value") * 100).cast("long")).cast("double")
            / 100
            / F.count(F.lit(1))
        ).alias("pm")
    )
    return (
        means.crossJoin(F.broadcast(point))
        .agg(
            F.lit(_B).cast("int").alias("n_replicas"),
            F.round(F.first("pm"), 4).alias("point_mean"),
            F.round(F.min(F.when(F.col("rk") == 2, F.col("m"))), 4).alias(
                "ci_lo"
            ),
            F.round(
                F.min(F.when(F.col("rk") == _B - 1, F.col("m"))), 4
            ).alias("ci_hi"),
        )
    )


@register(
    "weighted_reservoir_sample",
    oracle=f"""
    WITH keyed AS (
        SELECT doc_id, n_chars,
               ln(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                       AS UBIGINT) / {float(_TWO60)!r}) / n_chars AS k
        FROM documents
        WHERE n_chars > 0
    )
    SELECT doc_id, n_chars, CAST(rk AS INT) AS rk
    FROM (SELECT doc_id, n_chars,
                 row_number() OVER (ORDER BY k DESC, doc_id) AS rk
          FROM keyed)
    WHERE rk <= 50
    """,
    doc="Efraimidis-Spirakis weighted reservoir sample (A-ES 2006): "
    "each document draws key ln(u)/w with w = n_chars and u the "
    "portable md5 hash of its id mapped to (0,1) — the top-50 keys "
    "ARE a weighted-without-replacement sample, and because u is "
    "hash-derived both engines select the identical reservoir. "
    "log-space keys avoid u^(1/w) underflow at large weights. Shape "
    "at 100 TB: keys are map-side; the top-k is TakeOrdered (per-"
    "partition top-50, then a 50-row merge on the driver-side "
    "reduce) — no global sort, no single-partition window; the "
    "output rank is a window over 50 rows.",
    tags=("sampling", "documents"),
)
def weighted_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    # A-ES requires strictly positive weights: zero-length docs have
    # no defined key (ln(u)/0) and NULL n_chars no weight at all —
    # both are excluded from the draw (oracle filters identically).
    keyed = t(spark, sf_dir, "documents").where(F.col("n_chars") > 0).select(
        "doc_id",
        "n_chars",
        (
            F.log(
                F.conv(
                    F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15),
                    16,
                    10,
                ).cast("long")
                / F.lit(float(_TWO60))
            )
            / F.col("n_chars")
        ).alias("k"),
    )
    top = keyed.orderBy(F.desc("k"), F.col("doc_id")).limit(50)
    return top.select(
        "doc_id",
        "n_chars",
        F.row_number()
        .over(Window.orderBy(F.desc("k"), F.col("doc_id")))
        .cast("int")
        .alias("rk"),
    )


_NEYMAN_N = 1000


@register(
    "neyman_allocation",
    oracle=f"""
    WITH m AS (
        SELECT l_returnflag,
               CAST(count(*) AS BIGINT) AS nh,
               CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT))
                    AS HUGEINT) AS s,
               CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                        * CAST(round(l_extendedprice * 100, 0) AS BIGINT))
                    AS HUGEINT) AS ss
        FROM lineitem
        GROUP BY l_returnflag
    ),
    sd AS (
        SELECT l_returnflag, nh,
               sqrt((CAST(ss AS DOUBLE)
                     - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / nh)
                    / (nh - 1)) AS sh
        FROM m
    ),
    w AS (
        SELECT l_returnflag, nh, sh,
               nh * sh / sum(nh * sh) OVER () AS wh
        FROM sd
    ),
    base AS (
        SELECT l_returnflag, nh, sh, wh,
               CAST(floor({_NEYMAN_N} * wh) AS BIGINT) AS n_floor,
               {_NEYMAN_N} * wh - floor({_NEYMAN_N} * wh) AS frac
        FROM w
    ),
    ranked AS (
        SELECT *,
               row_number() OVER (ORDER BY frac DESC, l_returnflag)
                   AS rk,
               {_NEYMAN_N} - sum(n_floor) OVER () AS leftover
        FROM base
    )
    SELECT l_returnflag, nh AS n_stratum,
           round(sh, 4) AS stddev_cents,
           round(wh, 6) AS neyman_weight,
           CAST(n_floor + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
                AS BIGINT) AS n_alloc
    FROM ranked
    ORDER BY l_returnflag
    """,
    doc="Neyman-optimal stratified sample allocation: each stratum "
    f"(returnflag) gets its share of an n={_NEYMAN_N} sample "
    "proportional to N_h * S_h (size x within-stratum stddev) — "
    "the variance-minimizing allocation of survey sampling, and "
    "the right way to draw an eval slice from a skewed corpus. "
    "Stddevs come from exact HUGEINT/DECIMAL moments; weights and "
    "floor shares are identical double expressions; the leftover "
    "after flooring is distributed by LARGEST REMAINDER with a "
    "deterministic lexicographic tiebreak, so the integer "
    "allocations sum to exactly n on both engines. The strata "
    "table is tiny (one row per stratum) — the unpartitioned "
    "windows run over 3 rows, never data.",
    tags=("sampling", "stats"),
)
def neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    li = t(spark, sf_dir, "lineitem")
    y = F.round(F.col("l_extendedprice") * 100, 0).cast("bigint")
    dec = "decimal(38,0)"
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("bigint").alias("nh"),
        F.sum(y.cast(dec)).alias("s"),
        F.sum((y * y).cast(dec)).alias("ss"),
    )
    sh = F.sqrt(
        (
            F.col("ss").cast("double")
            - F.col("s").cast("double") * F.col("s").cast("double") / F.col("nh")
        )
        / (F.col("nh") - 1)
    )
    sd = m.select("l_returnflag", "nh", sh.alias("sh"))
    wall = W.partitionBy()
    w = sd.withColumn(
        "wh",
        F.col("nh") * F.col("sh") / F.sum(F.col("nh") * F.col("sh")).over(wall),
    )
    base = w.select(
        "l_returnflag",
        "nh",
        "sh",
        "wh",
        F.floor(_NEYMAN_N * F.col("wh")).cast("bigint").alias("n_floor"),
        (_NEYMAN_N * F.col("wh") - F.floor(_NEYMAN_N * F.col("wh"))).alias(
            "frac"
        ),
    )
    ranked = base.select(
        "*",
        F.row_number()
        .over(W.orderBy(F.col("frac").desc(), "l_returnflag"))
        .alias("rk"),
        (F.lit(_NEYMAN_N) - F.sum("n_floor").over(wall)).alias("leftover"),
    )
    return ranked.select(
        "l_returnflag",
        F.col("nh").alias("n_stratum"),
        F.round("sh", 4).alias("stddev_cents"),
        F.round("wh", 6).alias("neyman_weight"),
        (
            F.col("n_floor")
            + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_alloc"),
    ).orderBy("l_returnflag")
