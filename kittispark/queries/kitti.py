"""KITTI-pipeline analogs on the relational fixtures, so the
reference's end-to-end shapes (SURVEY §3 E1/E2) are oracle-checkable.
The KITTI-exact operators over real .bin/label/calib files live in
kittispark.operators.kitti and are golden-tested against NumPy
semantics in tests/ (the driver's sf dirs hold no KITTI files).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kittispark.registry import register
from kittispark.queries._util import t


@register(
    "cutout_count_stats",
    oracle="""
    WITH filtered AS (
        SELECT l_orderkey
        FROM lineitem
        WHERE l_quantity > 5 AND l_quantity < 45
          AND l_extendedprice > 2000 AND l_extendedprice < 80000
          AND l_discount > 0.01 AND l_discount < 0.09
    ),
    per_group AS (
        SELECT l_orderkey, count(*) AS n FROM filtered GROUP BY l_orderkey
    )
    SELECT min(n) AS min_n,
           CAST(round(avg(n), 0) AS BIGINT) AS avg_n_rounded,
           max(n) AS max_n,
           count(*) AS n_groups
    FROM per_group
    """,
    doc="E2 cut-out pipeline shape end-to-end: conjunctive box filter "
    "-> per-group counts -> global min/round(avg)/max — the exact "
    "stats the reference prints (gen_cut_out_dataset, "
    "data_pipeline.py:77-84, round() at :83).",
    tags=("kitti-analog",),
)
def cutout_count_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    filtered = li.filter(
        (F.col("l_quantity") > 5)
        & (F.col("l_quantity") < 45)
        & (F.col("l_extendedprice") > 2000)
        & (F.col("l_extendedprice") < 80000)
        & (F.col("l_discount") > 0.01)
        & (F.col("l_discount") < 0.09)
    )
    per_group = filtered.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n"))
    return per_group.agg(
        F.min("n").alias("min_n"),
        F.round(F.avg("n"), 0).cast("long").alias("avg_n_rounded"),
        F.max("n").alias("max_n"),
        F.count(F.lit(1)).alias("n_groups"),
    )


@register(
    "axis_remap_projection",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_quantity AS x_out,
           l_tax      AS y_out,
           -l_discount AS z_out
    FROM lineitem WHERE l_orderkey < 500
    """,
    doc="Constant-rotation axis remap as a pure projection — the 90° "
    "X-rotation (reference P6, data_utils.py:95-108) constant-folds "
    "to select(x, z, -y): no matmul at runtime (SURVEY §4).",
    tags=("kitti-analog",),
)
def axis_remap_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 500)
    # (x, y, z) := (l_quantity, l_discount, l_tax) -> remap (x, z, -y)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").alias("x_out"),
        F.col("l_tax").alias("y_out"),
        (-F.col("l_discount")).alias("z_out"),
    )


@register(
    "envelope_combine",
    oracle="""
    WITH pt AS (
        SELECT min(l_quantity) AS min_q, max(l_quantity) AS max_q FROM lineitem
    ),
    ob AS (
        SELECT min(o_totalprice / 10000) AS min_p, max(o_totalprice / 10000) AS max_p
        FROM orders
    )
    SELECT round(greatest(pt.min_q, ob.min_p), 6) AS env_lo,
           round(least(pt.max_q, ob.max_p), 6)    AS env_hi
    FROM pt, ob
    """,
    doc="Envelope combination of two aggregate branches via "
    "greatest/least on a 1-row cross join — the minimal/maximal area "
    "postprocess (reference P13, data_pipeline.py:56-61).",
    tags=("kitti-analog",),
)
def envelope_combine(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    pt = li.agg(
        F.min("l_quantity").alias("min_q"), F.max("l_quantity").alias("max_q")
    )
    ob = orders.agg(
        F.min(F.col("o_totalprice") / 10000).alias("min_p"),
        F.max(F.col("o_totalprice") / 10000).alias("max_p"),
    )
    return pt.crossJoin(ob).select(
        F.round(F.greatest("min_q", "min_p"), 6).alias("env_lo"),
        F.round(F.least("max_q", "max_p"), 6).alias("env_hi"),
    )
