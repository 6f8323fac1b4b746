"""Generic relational operator surface (SURVEY.md §2.2-§2.6).

Each query demonstrates one operator family on the TPC-H-ish fixtures
and carries a DuckDB oracle twin. The Spark side is written the way it
should run at 100 TB: filters appear before joins (Catalyst pushes
them into the parquet scan), small dimensions are explicitly
``broadcast()``, aggregations are single-pass multi-agg (partial +
final hash agg), and nothing ever collects to the driver.
"""

from __future__ import annotations

import atexit

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kittispark.registry import register
from kittispark.queries._util import t


# --------------------------------------------------------------------------
# Aggregation (SURVEY A1-A7)
# --------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    oracle="""
    WITH b AS (
        SELECT l_returnflag, l_linestatus,
               CAST(round(l_quantity, 0) AS BIGINT)            AS ql,
               CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS pc,
               CAST(round(l_discount * 100, 0) AS BIGINT)      AS dh,
               CAST(round(l_tax * 100, 0) AS BIGINT)           AS th
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    )
    SELECT l_returnflag, l_linestatus,
           round(CAST(CAST(sum(ql) AS HUGEINT) AS DOUBLE), 2) AS sum_qty,
           round(CAST(CAST(sum(pc) AS HUGEINT) AS DOUBLE) / 100, 2)
               AS sum_base_price,
           round(CAST(sum(CAST(pc * (100 - dh) AS HUGEINT)) AS DOUBLE)
                 / 10000, 2) AS sum_disc_price,
           round(CAST(sum(CAST(pc * (100 - dh) * (100 + th) AS HUGEINT))
                      AS DOUBLE) / 1000000, 2) AS sum_charge,
           round(CAST(CAST(sum(ql) AS HUGEINT) AS DOUBLE) / count(*), 2)
               AS avg_qty,
           round(CAST(CAST(sum(pc) AS HUGEINT) AS DOUBLE) / count(*) / 100,
                 2) AS avg_price,
           round(CAST(CAST(sum(dh) AS HUGEINT) AS DOUBLE) / count(*) / 100,
                 4) AS avg_disc,
           count(*) AS count_order
    FROM b
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 shape: filtered scan -> 2-key hash agg with 8 aggregates "
    "in one pass (reference analog: A1-A4 multi-aggregate fold, "
    "data_pipeline.py:31-43). EXACT-CENTS discipline (the q6/q14 "
    "convention): quantity/price/discount/tax ride their native "
    "integer grids (units / cents / hundredths), disc_price and "
    "charge are the exact integer products pc*(100-dh)[*(100+th)] "
    "summed in DECIMAL(38,0)/HUGEINT, and every emitted float is "
    "one identical double expression per engine, rounded once — "
    "the raw-double formulation forked by one ulp in the 2nd "
    "decimal at the 30M-row (50x) sweep scale because the two "
    "engines sum multi-million-row groups in different orders.",
    tags=("agg", "flagship"),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    dec = "decimal(38,0)"
    b = li.filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    ).select(
        "l_returnflag",
        "l_linestatus",
        F.round(F.col("l_quantity"), 0).cast("bigint").alias("ql"),
        F.round(F.col("l_extendedprice") * 100, 0)
        .cast("bigint")
        .alias("pc"),
        F.round(F.col("l_discount") * 100, 0).cast("bigint").alias("dh"),
        F.round(F.col("l_tax") * 100, 0).cast("bigint").alias("th"),
    )
    n = F.count(F.lit(1))
    return (
        b.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(F.col("ql").cast(dec)).cast("double"), 2).alias(
                "sum_qty"
            ),
            F.round(
                F.sum(F.col("pc").cast(dec)).cast("double") / 100, 2
            ).alias("sum_base_price"),
            F.round(
                F.sum((F.col("pc") * (100 - F.col("dh"))).cast(dec)).cast(
                    "double"
                )
                / 10000,
                2,
            ).alias("sum_disc_price"),
            F.round(
                F.sum(
                    (
                        F.col("pc")
                        * (100 - F.col("dh"))
                        * (100 + F.col("th"))
                    ).cast(dec)
                ).cast("double")
                / 1000000,
                2,
            ).alias("sum_charge"),
            F.round(
                F.sum(F.col("ql").cast(dec)).cast("double") / n, 2
            ).alias("avg_qty"),
            F.round(
                F.sum(F.col("pc").cast(dec)).cast("double") / n / 100, 2
            ).alias("avg_price"),
            F.round(
                F.sum(F.col("dh").cast(dec)).cast("double") / n / 100, 4
            ).alias("avg_disc"),
            n.alias("count_order"),
        )
    )


@register(
    "envelope_minmax",
    oracle="""
    SELECT min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
           min(l_extendedprice) AS min_price, max(l_extendedprice) AS max_price,
           min(l_discount) AS min_disc, max(l_discount) AS max_disc,
           min(l_tax) AS min_tax, max(l_tax) AS max_tax
    FROM lineitem
    """,
    doc="Global per-column min/max envelope in one pass (reference A1: "
    "min_point/max_point fold, data_pipeline.py:31-32).",
    tags=("agg",),
)
def envelope_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.agg(
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        F.min("l_discount").alias("min_disc"),
        F.max("l_discount").alias("max_disc"),
        F.min("l_tax").alias("min_tax"),
        F.max("l_tax").alias("max_tax"),
    )


@register(
    "group_count_stats",
    oracle="""
    SELECT min(n) AS min_n, round(avg(n), 4) AS avg_n, max(n) AS max_n,
           count(*) AS n_groups
    FROM (SELECT o_custkey, count(*) AS n FROM orders GROUP BY o_custkey)
    """,
    doc="Two-level aggregation: per-group count then global min/avg/max of "
    "counts (reference A6 per-frame point-count stats, "
    "data_pipeline.py:80-84).",
    tags=("agg",),
)
def group_count_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n"))
    return per_cust.agg(
        F.min("n").alias("min_n"),
        F.round(F.avg("n"), 4).alias("avg_n"),
        F.max("n").alias("max_n"),
        F.count(F.lit(1)).alias("n_groups"),
    )


@register(
    "distinct_agg",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS n_parts,
           count(DISTINCT l_suppkey) AS n_supps,
           count(*) AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Distinct aggregation (expand + two-phase agg under the hood); "
    "absent from the reference, SURVEY §2.4 generalized surface.",
    tags=("agg",),
)
def distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "group_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    HAVING count(*) > 0  -- Spark emits NO grand-total row on empty
                         -- input; DuckDB emits the () group with
                         -- count 0. On non-empty input every
                         -- grouping-set row covers >= 1 row, so the
                         -- guard only aligns the empty case.
    """,
    doc="ROLLUP hierarchy totals (SURVEY §2.4: absent from reference, "
    "free in Spark).",
    tags=("agg",),
)
def group_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "group_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS DOUBLE)
               / 100 AS sum_price,
           count(*) AS n
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    HAVING count(*) > 0  -- see group_rollup: empty-input alignment
    """,
    doc="CUBE over two grouping columns (SURVEY §2.4 generalized "
    "surface). sum_price is an exact integer cents sum "
    "(order-independent) emitted once through double division — the "
    "old round(sum(double), 2) forked by the last cent at the 50x "
    "tier's 5e11 grand totals, where 30M summation-order ulps "
    "outgrow the 2dp grid (the q1 class, caught by the r9 agghash "
    "census; grouping_sets_explicit had the same fix in r4). "
    "Quantity sums (group_rollup, pivot) stay raw: whole-number "
    "doubles sum EXACTLY below 2^53, so they cannot fork.",
    tags=("agg",),
)
def group_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    return li.cube("l_returnflag", "l_linestatus").agg(
        (F.sum(cents).cast("double") / 100).alias("sum_price"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "pivot_conditional_agg",
    oracle="""
    SELECT l_returnflag,
           round(sum(l_quantity) FILTER (WHERE l_linestatus = 'O'), 2) AS qty_open,
           round(sum(l_quantity) FILTER (WHERE l_linestatus = 'F'), 2) AS qty_filled
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Pivot expressed as conditional aggregation (Spark .pivot() "
    "compiles to the same shape; SURVEY §2.4).",
    tags=("agg",),
)
def pivot_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    piv = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum("l_quantity"), 2))
    )
    return piv.select(
        "l_returnflag",
        F.col("O").alias("qty_open"),
        F.col("F").alias("qty_filled"),
    )


# --------------------------------------------------------------------------
# Filters / predicates (SURVEY P8-P10)
# --------------------------------------------------------------------------


@register(
    "box_filter_conjunctive",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount
    FROM lineitem
    WHERE l_quantity > 10 AND l_quantity < 40
      AND l_extendedprice > 5000 AND l_extendedprice < 50000
      AND l_discount > 0.02 AND l_discount < 0.08
    """,
    doc="Conjunctive 6-way range predicate — the 3-D box containment "
    "filter of the cut-out generator (reference P8, "
    "data_pipeline.py:77-79). Pushdown-friendly: reaches the parquet "
    "scan as PushedFilters, so at 100 TB row-groups outside the box "
    "are skipped via min/max stats.",
    tags=("filter",),
)
def box_filter_conjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_quantity") > 10)
        & (F.col("l_quantity") < 40)
        & (F.col("l_extendedprice") > 5000)
        & (F.col("l_extendedprice") < 50000)
        & (F.col("l_discount") > 0.02)
        & (F.col("l_discount") < 0.08)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount")


@register(
    "category_filter_in",
    oracle="""
    SELECT p_partkey, p_brand, p_type, p_size
    FROM part
    WHERE p_brand IN ('Brand#11', 'Brand#22', 'Brand#33')
      AND p_size <> 7
    """,
    doc="IN-list inclusion + exclusion predicate (reference P9 DontCare "
    "exclusion data_pipeline.py:37, P10 class IN-list visualize.py:68-81).",
    tags=("filter",),
)
def category_filter_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = t(spark, sf_dir, "part")
    return part.filter(
        F.col("p_brand").isin("Brand#11", "Brand#22", "Brand#33")
        & (F.col("p_size") != 7)
    ).select("p_partkey", "p_brand", "p_type", "p_size")


@register(
    "null_handling",
    oracle="""
    SELECT l_returnflag,
           count(*) AS n_rows,
           CAST(count(nullif(l_discount, 0.0)) AS BIGINT) AS n_discounted,
           round(avg(nullif(l_discount, 0.0)), 6) AS avg_nonzero_disc,
           round(sum(coalesce(nullif(l_discount, 0.0), 0.0)), 6) AS sum_disc
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="NULL-aware scalar ops: nullif/coalesce + null-skipping agg "
    "(SURVEY §1.2: reference has no nulls; generalized surface).",
    tags=("filter", "scalar"),
)
def null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    nonzero = F.nullif(F.col("l_discount"), F.lit(0.0))
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(nonzero).alias("n_discounted"),
        F.round(F.avg(nonzero), 6).alias("avg_nonzero_disc"),
        F.round(F.sum(F.coalesce(nonzero, F.lit(0.0))), 6).alias("sum_disc"),
    )


# --------------------------------------------------------------------------
# Joins (SURVEY J1-J3 + generalized)
# --------------------------------------------------------------------------


def _rev_scaled_sum():
    """Exact revenue sum: price cents x (100 - discount points) summed
    in int64 — order-independent, so Spark and DuckDB agree bitwise
    where float sum + round(.., 2) drifts one ulp at 1e10 magnitudes
    (observed at sf1synth). Exact while the scaled sum < 2^53 (~6e15,
    i.e. ~6M max-price items per group); beyond that emit div-based
    cents instead of the double conversion."""
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    dpts = F.lit(100) - F.round(F.col("l_discount") * 100, 0).cast("long")
    return F.sum(cents * dpts)


@register(
    "join_three_way",
    oracle="""
    SELECT c.c_mktsegment, o.o_orderpriority,
           count(*) AS n_items,
           CAST(sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
                    * (100 - CAST(round(l.l_discount * 100, 0) AS BIGINT))) AS DOUBLE) / 10000 AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
    GROUP BY c.c_mktsegment, o.o_orderpriority
    """,
    doc="Three-way equi-join fact->dim->dim with post-join agg — the "
    "points ⋈ labels ⋈ calib frame join (reference J1, "
    "data_pipeline.py:18). Filter is pushed below the join; customer "
    "is broadcast (small dim) so the only shuffle is lineitem⋈orders "
    "on the shared orderkey. Revenue is an exact integer sum (cents x "
    "discount points, /1e4 at the end): float round(sum) differs "
    "across engines by one ulp at 1e10 magnitudes (observed at "
    "sf1synth); the integer sum is order-independent and exact up to "
    "~6e15 (beyond that, emit div-based cents).",
    tags=("join",),
)
def join_three_way(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp")
    )
    cust = t(spark, sf_dir, "customer")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            (_rev_scaled_sum().cast("double") / 10000).alias("revenue"),
        )
    )


@register(
    "q3_top_orders",
    oracle="""
    SELECT o.o_orderkey,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
      AND l.l_shipdate > TIMESTAMP '1998-01-01'
    GROUP BY o.o_orderkey, o.o_orderdate
    ORDER BY revenue DESC, o.o_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3 shape: selective dim filter -> join -> agg -> "
    "deterministic top-k (ORDER BY with key tiebreak + LIMIT; Spark "
    "plans a TakeOrderedAndProject, no full sort at scale).",
    tags=("join", "topk"),
)
def q3_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select(
            "o_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


@register(
    "q5_region_revenue",
    oracle="""
    SELECT n.n_name,
           CAST(sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
                    * (100 - CAST(round(l.l_discount * 100, 0) AS BIGINT))) AS DOUBLE) / 10000 AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n.n_name
    """,
    doc="Five-table snowflake join rolled up to nation. nation/region "
    "are bounded-size dims -> broadcast; only the fact-fact join "
    "shuffles. At 100 TB AQE re-plans the customer join to broadcast "
    "iff the filtered side fits.",
    tags=("join",),
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    cust = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg((_rev_scaled_sum().cast("double") / 10000).alias("revenue"))
    )


@register(
    "semi_join_exists",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    """,
    doc="Left-semi join (EXISTS). Absent from reference (SURVEY §2.3); "
    "Spark: how='left_semi' — no row duplication, no payload from the "
    "probe side.",
    tags=("join",),
)
def semi_join_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    big = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return cust.join(
        big, cust.c_custkey == big.o_custkey, "left_semi"
    ).select("c_custkey", "c_name", "c_mktsegment")


@register(
    "anti_join_not_exists",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    doc="Left-anti join (NOT EXISTS): customers with no orders at all.",
    tags=("join",),
)
def anti_join_not_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name", "c_acctbal")


@register(
    "left_outer_join",
    oracle="""
    SELECT s.s_suppkey, s.s_name, n.n_name,
           coalesce(r.r_name, 'NO REGION') AS region_name
    FROM supplier s
    LEFT JOIN nation n ON s.s_nationkey = n.n_nationkey
    LEFT JOIN region r ON n.n_regionkey = r.r_regionkey AND r.r_regionkey <> 0
    """,
    doc="Left outer join chain with a non-key join condition and NULL "
    "backfill via coalesce (generalized surface).",
    tags=("join",),
)
def left_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region")
    return (
        sup.join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey, "left")
        .join(
            F.broadcast(region),
            (nation.n_regionkey == region.r_regionkey) & (region.r_regionkey != 0),
            "left",
        )
        .select(
            "s_suppkey",
            "s_name",
            "n_name",
            F.coalesce("r_name", F.lit("NO REGION")).alias("region_name"),
        )
    )


@register(
    "range_join_nonequi",
    oracle="""
    SELECT o.o_orderkey, b.bucket_id
    FROM orders o
    JOIN (SELECT 0 AS bucket_id, 0.0 AS lo, 100000.0 AS hi
          UNION ALL SELECT 1, 100000.0, 250000.0
          UNION ALL SELECT 2, 250000.0, 500000.0) b
      ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
    """,
    doc="Non-equi (range/theta) join against a tiny bucket table — "
    "broadcast nested loop in Spark; absent from reference (SURVEY "
    "§2.3). At scale the small side must be broadcast or the range "
    "bucketized into an equi-key.",
    tags=("join",),
)
def range_join_nonequi(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    buckets = spark.createDataFrame(
        [(0, 0.0, 100000.0), (1, 100000.0, 250000.0), (2, 250000.0, 500000.0)],
        "bucket_id INT, lo DOUBLE, hi DOUBLE",
    )
    return orders.join(
        F.broadcast(buckets),
        (orders.o_totalprice >= buckets.lo) & (orders.o_totalprice < buckets.hi),
    ).select("o_orderkey", "bucket_id")


# --------------------------------------------------------------------------
# Set operations (SURVEY §2.5: absent from reference, generalized)
# --------------------------------------------------------------------------


@register(
    "set_union_distinct",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION
    SELECT c_custkey FROM customer WHERE c_acctbal > 5000
    """,
    doc="UNION (distinct) of two key sets.",
    tags=("setop",),
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    a = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = cust.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    return a.union(b).distinct()


@register(
    "set_intersect",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT c_custkey FROM customer WHERE c_acctbal > 5000
    """,
    doc="INTERSECT (distinct semantics on both engines).",
    tags=("setop",),
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    a = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = cust.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    return a.intersect(b)


@register(
    "set_except",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    EXCEPT
    SELECT c_custkey FROM customer WHERE c_acctbal > 5000
    """,
    doc="EXCEPT (distinct semantics on both engines).",
    tags=("setop",),
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    a = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = cust.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    return a.subtract(b)


# --------------------------------------------------------------------------
# Sort / limit (SURVEY §2.5)
# --------------------------------------------------------------------------


@register(
    "order_by_limit",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 20
    """,
    doc="Global deterministic top-k (total order via key tiebreaks). "
    "Spark executes as per-partition top-k + merge "
    "(TakeOrderedAndProject) — no global sort even at 100 TB.",
    tags=("topk",),
)
def order_by_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.desc("l_extendedprice"), "l_orderkey", "l_linenumber")
        .limit(20)
    )


# --------------------------------------------------------------------------
# Scalar function surface (SURVEY §2.6)
# --------------------------------------------------------------------------


@register(
    "string_functions",
    oracle="""
    SELECT p_partkey,
           upper(p_type)                          AS type_upper,
           lower(p_brand)                         AS brand_lower,
           substr(p_name, 1, 8)                   AS name_prefix,
           CAST(length(p_name) AS INT)            AS name_len,
           concat(p_brand, '|', p_type)           AS brand_type,
           replace(p_brand, 'Brand#', 'B')        AS brand_short,
           CAST(contains(p_type, 'a') AS BOOLEAN) AS has_a,
           CAST(starts_with(p_brand, 'Brand#1') AS BOOLEAN) AS is_b1x
    FROM part
    """,
    doc="String function family: case, substring, length, concat, "
    "replace, containment, prefix (reference §2.6 string ops: "
    "endswith/split/basename/contains).",
    tags=("scalar",),
)
def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = t(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_type").alias("type_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        # concat (not concat_ws): concat_ws DROPS null inputs plus the
        # separator while the oracle's concat(a,'|',b) keeps the bar —
        # latent divergence on null columns
        F.concat(F.col("p_brand"), F.lit("|"), F.col("p_type")).alias("brand_type"),
        F.replace(F.col("p_brand"), F.lit("Brand#"), F.lit("B")).alias("brand_short"),
        F.col("p_type").contains("a").alias("has_a"),
        F.col("p_brand").startswith("Brand#1").alias("is_b1x"),
    )


@register(
    "date_functions",
    oracle="""
    SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           CAST(year(o_orderdate) AS INT)    AS order_year,
           CAST(month(o_orderdate) AS INT)   AS order_month,
           CAST(quarter(o_orderdate) AS INT) AS order_quarter,
           count(*) AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS DOUBLE)
               / 100 AS total
    FROM orders
    GROUP BY 1, 2, 3, 4
    """,
    doc="Date/time function family: truncation, field extraction, "
    "formatted output (absent from reference — SURVEY §2.6 date row). "
    "total is an exact integer cents sum emitted once through double "
    "division — same 50x summation-order class as group_cube.",
    tags=("scalar",),
)
def date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
                "month_start"
            ),
            F.year("o_orderdate").alias("order_year"),
            F.month("o_orderdate").alias("order_month"),
            F.quarter("o_orderdate").alias("order_quarter"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (
                F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).cast(
                    "double"
                )
                / 100
            ).alias("total"),
        )
    )


@register(
    "case_when_bucketing",
    oracle="""
    SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
                WHEN o_totalprice < 200000 THEN 'medium'
                ELSE 'large' END AS price_band,
           o_orderstatus,
           count(*) AS n,
           round(avg(o_totalprice), 2) AS avg_price
    FROM orders
    GROUP BY 1, 2
    """,
    doc="CASE WHEN bucketing + grouped agg (scalar conditional surface).",
    tags=("scalar",),
)
def case_when_bucketing(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    band = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 200000, "medium")
        .otherwise("large")
        .alias("price_band")
    )
    return orders.groupBy(band, F.col("o_orderstatus")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("o_totalprice"), 2).alias("avg_price"),
    )


@register(
    "math_functions",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(sqrt(l_extendedprice), 6)        AS price_sqrt,
           round(ln(l_extendedprice), 6)          AS price_ln,
           round(pow(l_quantity, 2), 6)           AS qty_sq,
           round(abs(l_discount - 0.05), 6)       AS disc_dev,
           round(cos(l_quantity), 6)              AS qty_cos,
           round(sin(l_quantity), 6)              AS qty_sin,
           CAST(floor(l_quantity / 10) AS BIGINT) AS qty_decile,
           CAST(l_quantity % 7 AS DOUBLE)         AS qty_mod
    FROM lineitem WHERE l_orderkey < 1000
    """,
    doc="Math scalar family incl. the trig used by bbox corner "
    "generation (reference P12, data_utils.py:117-127).",
    tags=("scalar",),
)
def math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 1000)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
        F.round(F.log("l_extendedprice"), 6).alias("price_ln"),
        F.round(F.pow("l_quantity", F.lit(2)), 6).alias("qty_sq"),
        F.round(F.abs(F.col("l_discount") - 0.05), 6).alias("disc_dev"),
        F.round(F.cos("l_quantity"), 6).alias("qty_cos"),
        F.round(F.sin("l_quantity"), 6).alias("qty_sin"),
        F.floor(F.col("l_quantity") / 10).alias("qty_decile"),
        (F.col("l_quantity") % 7).alias("qty_mod"),
    )


@register(
    "corner_explode",
    oracle="""
    WITH boxes AS (
        SELECT p_partkey,
               CAST(p_size AS DOUBLE) AS h,
               p_retailprice / 1000.0 AS w,
               CAST(p_partkey % 20 + 1 AS DOUBLE) AS l,
               CAST(p_partkey % 7 AS DOUBLE) * 0.5 - 1.5 AS rot
        FROM part
    )
    SELECT p_partkey, CAST(ci AS INTEGER) AS ci,
           round(cos(rot) * (CASE WHEN ci IN (0,3,4,7) THEN -l/2 ELSE l/2 END)
                 + sin(rot) * (CASE WHEN ci IN (0,1,4,5) THEN -w/2 ELSE w/2 END), 6) AS cx,
           round(CASE WHEN ci >= 4 THEN -h ELSE 0.0 END, 6) AS cy,
           round(-sin(rot) * (CASE WHEN ci IN (0,3,4,7) THEN -l/2 ELSE l/2 END)
                 + cos(rot) * (CASE WHEN ci IN (0,1,4,5) THEN -w/2 ELSE w/2 END), 6) AS cz
    FROM boxes
    CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS ci)
    """,
    doc="Generator / UDTF shape: 1 row -> 8 corner rows of a rotated 3-D "
    "box, all closed-form column expressions + explode (reference P11 "
    "get_3d_bbox, data_utils.py:111-137; corner index layout "
    "data_utils.py:117-119, Y-rotation data_utils.py:124-128). The "
    "KITTI-exact version incl. translation + axis remap lives in "
    "kittispark.operators.kitti.bbox_corners.",
    tags=("explode", "kitti-analog"),
)
def corner_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = t(spark, sf_dir, "part")
    boxes = part.select(
        "p_partkey",
        F.col("p_size").cast("double").alias("h"),
        (F.col("p_retailprice") / 1000.0).alias("w"),
        ((F.col("p_partkey") % 20 + 1).cast("double")).alias("l"),
        ((F.col("p_partkey") % 7).cast("double") * 0.5 - 1.5).alias("rot"),
    )
    ci = F.explode(F.sequence(F.lit(0), F.lit(7))).alias("ci")
    exploded = boxes.select("*", ci)
    xoff = F.when(F.col("ci").isin(0, 3, 4, 7), -F.col("l") / 2).otherwise(
        F.col("l") / 2
    )
    zoff = F.when(F.col("ci").isin(0, 1, 4, 5), -F.col("w") / 2).otherwise(
        F.col("w") / 2
    )
    yoff = F.when(F.col("ci") >= 4, -F.col("h")).otherwise(F.lit(0.0))
    return exploded.select(
        "p_partkey",
        "ci",
        F.round(F.cos("rot") * xoff + F.sin("rot") * zoff, 6).alias("cx"),
        F.round(yoff, 6).alias("cy"),
        F.round(-F.sin("rot") * xoff + F.cos("rot") * zoff, 6).alias("cz"),
    )


@register(
    "salted_skew_join",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, s.s_name,
           round(l.l_extendedprice, 2) AS price
    FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
    """,
    doc="Skew-resilient salted join (kittispark.operators.skew): the "
    "fat side is split across 8 salt sub-partitions per key, the slim "
    "side replicated once per salt. The oracle is the PLAIN join — "
    "salting is pure placement and must not change a single row.",
    tags=("join", "skew"),
)
def salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kittispark.operators.skew import salted_join

    lineitem = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_suppkey", "l_extendedprice"
    )
    supplier = t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return salted_join(
        lineitem,
        supplier.withColumnRenamed("s_suppkey", "l_suppkey"),
        on="l_suppkey",
        salt_from="l_orderkey",
        n_salts=8,
    ).select(
        "l_orderkey",
        "l_linenumber",
        "s_name",
        F.round("l_extendedprice", 2).alias("price"),
    )


@register(
    "array_functions",
    oracle="""
    SELECT vec_id,
           len(embedding) AS dim,
           round(list_aggregate(embedding::DOUBLE[], 'sum'), 4) + 0.0 AS sum_all,
           round(list_max(embedding::DOUBLE[]), 4) + 0.0 AS max_val,
           round(embedding[1]::DOUBLE, 4) + 0.0 AS first_val,
           round(list_aggregate(list_slice(embedding::DOUBLE[], 1, 8), 'sum'), 4)
               + 0.0 AS sum_head8,
           len(list_filter(embedding::DOUBLE[], x -> x > 0)) AS n_pos
    FROM embeddings
    """,
    doc="Array / higher-order function family (SURVEY §2.6 array row): "
    "size, element_at, slice, filter, and a left-to-right aggregate "
    "fold — all JVM-side Column expressions, no UDF.",
    tags=("scalar", "array"),
)
def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    add = lambda acc, x: acc + x  # noqa: E731
    # round(...) + 0.0 on BOTH sides: a tiny-negative value rounds to
    # -0.0 in DuckDB but +0.0 in Spark (BigDecimal has no signed
    # zero); the IEEE identity -0.0 + 0.0 = +0.0 normalizes both.
    # Latent at the sf0.01 driver gate — first embedding[1] that
    # rounds to zero appears at sf0.1 (r8 strict sweep).
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        (F.round(F.aggregate(v, F.lit(0.0), add), 4) + 0.0).alias("sum_all"),
        (F.round(F.array_max(v), 4) + 0.0).alias("max_val"),
        (F.round(F.element_at(v, 1), 4) + 0.0).alias("first_val"),
        (F.round(F.aggregate(F.slice(v, 1, 8), F.lit(0.0), add), 4) + 0.0).alias("sum_head8"),
        F.size(F.filter(v, lambda x: x > 0)).alias("n_pos"),
    )


@register(
    "map_literal_lookup",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           round(sum(value * CASE event_type
               WHEN 'click' THEN 1.0 WHEN 'view' THEN 0.5
               WHEN 'purchase' THEN 5.0 WHEN 'signup' THEN 2.0
               ELSE 0.0 END), 2) AS weighted_value
    FROM events GROUP BY event_type
    """,
    doc="Literal-map dimension lookup — the reference's class->color "
    "dict (J3, visualize.py:10-20,97) as a create_map literal indexed "
    "by a column; constant-folded JVM-side, no join needed for a "
    "fixed tiny dimension.",
    tags=("scalar", "map", "kitti-analog"),
)
def map_literal_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from itertools import chain

    weights = {"click": 1.0, "view": 0.5, "purchase": 5.0, "signup": 2.0, "error": 0.0}
    m = F.create_map(*[F.lit(x) for x in chain.from_iterable(weights.items())])
    events = t(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        # coalesce(0.0): an UNMAPPED event type must weight to zero like
        # the oracle's CASE ELSE — a bare map lookup would yield NULL
        # and silently null the whole group's sum
        F.round(
            F.sum(F.col("value") * F.coalesce(m[F.col("event_type")], F.lit(0.0))),
            2,
        ).alias("weighted_value"),
    )


@register(
    "unpivot_measures",
    oracle="""
    WITH long AS (
        SELECT 'quantity' AS measure, l_quantity AS val FROM lineitem
        UNION ALL
        SELECT 'extendedprice', l_extendedprice FROM lineitem
        UNION ALL
        SELECT 'discount', l_discount FROM lineitem
    )
    SELECT measure, count(*) AS n, round(avg(val), 6) AS avg_val
    FROM long GROUP BY measure
    """,
    doc="Unpivot (wide->long melt) of three measure columns + grouped "
    "agg — Spark's unpivot operator vs the UNION ALL relational "
    "equivalent. Melt is projection-only (no shuffle until the agg).",
    tags=("reshape",),
)
def unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    long = li.unpivot(
        [],
        ["l_quantity", "l_extendedprice", "l_discount"],
        "measure_raw",
        "val",
    ).select(
        F.regexp_replace("measure_raw", "^l_", "").alias("measure"), "val"
    )
    return long.groupBy("measure").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.avg("val"), 6).alias("avg_val")
    )


@register(
    "approx_count_distinct",
    oracle="""
    SELECT count(DISTINCT o_custkey) AS exact_custs,
           count(*) AS n_orders,
           1 AS estimate_within_3pct
    FROM orders
    """,
    doc="HyperLogLog++ distinct-count sketch over customers/orders — "
    "the single-pass mergeable cardinality aggregate for 100 TB "
    "(exact distinct shuffles every key; the sketch merges partials). "
    "rsd=0.01. Oracle-checkable form: the exact countDistinct is "
    "hash-compared, and the HLL estimate is folded into a boolean "
    "relative-error bound (<=3%) that the SQL twin asserts as 1.",
    tags=("agg", "sketch"),
)
def approx_count_distinct_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    agg = orders.agg(
        F.approx_count_distinct("o_custkey", rsd=0.01).alias("_approx"),
        F.countDistinct("o_custkey").alias("exact_custs"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    # empty input: exact == approx == 0 and the estimate is trivially
    # in bound — without the guard the ANSI division throws
    rel_err = F.abs(F.col("_approx") - F.col("exact_custs")) / F.nullif(
        F.col("exact_custs"), F.lit(0)
    )
    flag = F.when(
        F.col("exact_custs") == 0, (F.col("_approx") == 0).cast("int")
    ).otherwise((rel_err <= 0.03).cast("int"))
    return agg.select(
        "exact_custs",
        "n_orders",
        flag.alias("estimate_within_3pct"),
    )


@register(
    "grouping_sets_explicit",
    oracle="""
    SELECT coalesce(o_orderpriority, 'ALL') AS priority,
           coalesce(o_orderstatus, 'ALL') AS status,
           count(*) AS n,
           CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS DOUBLE)
               / 100 AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
    HAVING count(*) > 0  -- see group_rollup: empty-input alignment
    """,
    doc="Explicit GROUPING SETS (the general form behind rollup/cube): "
    "three aggregation granularities in ONE pass — Spark expands rows "
    "once (Expand) and hash-aggregates, instead of three scans + "
    "union. Total is an exact integer cents sum (order-independent; "
    "float round(sum, 2) differed across engines by one ulp at the "
    "3.7e11 grand total of sf1synth).",
    tags=("agg",),
)
def grouping_sets_explicit(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT coalesce(o_orderpriority, 'ALL') AS priority,
               coalesce(o_orderstatus, 'ALL') AS status,
               count(*) AS n,
               CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS DOUBLE)
                   / 100 AS total
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
        """
    )


@register(
    "correlation_stats",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           round(corr(value, epoch(ts)), 6) AS corr_vt,
           round(covar_samp(value, epoch(ts)), 4) AS covar_vt,
           round(var_samp(value), 6) AS var_value
    FROM events GROUP BY event_type
    """,
    doc="Bivariate moment aggregates (corr, covar_samp, var_samp) — "
    "single-pass mergeable statistics (partial co-moments combine "
    "associatively, the same partial+final shape as sum/avg).",
    tags=("agg",),
)
def correlation_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = t(spark, sf_dir, "events")
    ep = F.col("ts").cast("double")
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.corr("value", ep), 6).alias("corr_vt"),
        F.round(F.covar_samp("value", ep), 4).alias("covar_vt"),
        F.round(F.var_samp("value"), 6).alias("var_value"),
    )


@register(
    "null_safe_join",
    oracle="""
    WITH l AS (
        SELECT l_orderkey,
               CASE WHEN l_linenumber % 3 = 0 THEN NULL
                    ELSE l_linenumber % 5 END AS bucket
        FROM lineitem WHERE l_orderkey < 200
    ),
    r AS (
        SELECT DISTINCT CASE WHEN x % 3 = 0 THEN NULL ELSE x END AS bucket,
               CASE WHEN x % 3 = 0 THEN 'null-bucket'
                    ELSE 'b' || CAST(x AS VARCHAR) END AS tag
        FROM (SELECT unnest([0, 1, 2, 3, 4]) AS x)
    )
    SELECT l.l_orderkey, l.bucket, r.tag
    FROM l JOIN r ON l.bucket IS NOT DISTINCT FROM r.bucket
    """,
    doc="Null-safe equi-join (<=> / IS NOT DISTINCT FROM): NULL keys "
    "match each other instead of vanishing — still a hash join (NULL "
    "hashes like any value under null-safe equality), not a fallback "
    "to nested loops.",
    tags=("join", "nulls"),
)
def null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 200)
    l = li.select(
        "l_orderkey",
        F.when(F.col("l_linenumber") % 3 == 0, F.lit(None))
        .otherwise(F.col("l_linenumber") % 5)
        .alias("bucket"),
    )
    r = (
        spark.range(5)
        .select(
            F.when(F.col("id") % 3 == 0, F.lit(None))
            .otherwise(F.col("id"))
            .cast("int")
            .alias("bucket"),
            F.when(F.col("id") % 3 == 0, F.lit("null-bucket"))
            .otherwise(F.concat(F.lit("b"), F.col("id")))
            .alias("tag"),
        )
        .distinct()
    )
    return l.join(F.broadcast(r), l["bucket"].eqNullSafe(r["bucket"])).select(
        "l_orderkey", l["bucket"].alias("bucket"), "tag"
    )


@register(
    "full_outer_join",
    oracle="""
    WITH big_cust AS (
        SELECT o_custkey, count(*) AS n_orders
        FROM orders GROUP BY o_custkey HAVING count(*) >= 12
    ),
    rich_cust AS (
        SELECT c_custkey, round(c_acctbal, 2) AS acctbal
        FROM customer WHERE c_acctbal > 9000
    )
    SELECT coalesce(b.o_custkey, r.c_custkey) AS custkey,
           b.n_orders, r.acctbal
    FROM big_cust b FULL OUTER JOIN rich_cust r ON b.o_custkey = r.c_custkey
    """,
    doc="Full outer join of two filtered aggregates — both unmatched "
    "sides survive with nulls; compiles to a shuffle join (full outer "
    "can't broadcast either side).",
    tags=("join",),
)
def full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    customer = t(spark, sf_dir, "customer")
    big = (
        orders.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") >= 12)
    )
    rich = customer.filter(F.col("c_acctbal") > 9000).select(
        "c_custkey", F.round("c_acctbal", 2).alias("acctbal")
    )
    return big.join(
        rich, big["o_custkey"] == rich["c_custkey"], "full_outer"
    ).select(
        F.coalesce(big["o_custkey"], rich["c_custkey"]).alias("custkey"),
        "n_orders",
        "acctbal",
    )


@register(
    "union_all_counts",
    oracle="""
    WITH u AS (
        SELECT o_custkey AS custkey, 'order' AS src FROM orders
        UNION ALL
        SELECT c_custkey, 'customer' FROM customer
    )
    SELECT src, count(*) AS n, count(DISTINCT custkey) AS n_keys
    FROM u GROUP BY src
    """,
    doc="UNION ALL (bag semantics, no dedup shuffle on the union "
    "itself) of two heterogeneous sources via unionByName + grouped "
    "distinct count.",
    tags=("setop",),
)
def union_all_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"), F.lit("order").alias("src")
    )
    customer = t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"), F.lit("customer").alias("src")
    )
    return (
        orders.unionByName(customer)
        .groupBy("src")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("custkey").alias("n_keys"),
        )
    )


@register(
    "scalar_subquery_avg_qty",
    oracle="""
    WITH thresh AS (
        SELECT l_partkey, 0.5 * avg(l_quantity) AS qty_thresh
        FROM lineitem GROUP BY l_partkey
    )
    SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly,
           count(*) AS n_small
    FROM lineitem l JOIN thresh p ON l.l_partkey = p.l_partkey
    WHERE l.l_quantity < p.qty_thresh
    """,
    doc="TPC-H Q17 shape: correlated scalar subquery decorrelated into "
    "a per-part aggregate re-joined to the detail (reference analog: "
    "J2 aggregate-to-detail rejoin, data_pipeline.py:29-30). The "
    "per-part averages table is orders of magnitude smaller than "
    "lineitem, so it broadcasts; at 100 TB the fact side never "
    "shuffles.",
    tags=("join", "agg", "subquery"),
)
def scalar_subquery_avg_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    thresh = li.groupBy("l_partkey").agg(
        (F.avg("l_quantity") * 0.5).alias("qty_thresh")
    )
    return (
        li.join(F.broadcast(thresh), "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_thresh"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_small"),
        )
    )


@register(
    "window_distribution",
    oracle="""
    SELECT o_orderkey,
           o_orderpriority,
           ntile(4)       OVER w AS quartile,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist()    OVER w, 6) AS cume
    FROM orders
    WHERE o_totalprice > 250000
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice, o_orderkey)
    """,
    doc="Distribution window functions (ntile / percent_rank / "
    "cume_dist) per priority class; ordering key is made unique with "
    "the orderkey tiebreak so ntile is deterministic. One shuffle on "
    "the partition key, sort within partitions — no global sort.",
    tags=("window",),
)
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 250000)
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.ntile(4).over(w).alias("quartile"),
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cume"),
        )
    )


@register(
    "argmax_best_order",
    oracle="""
    SELECT o_custkey,
           o_orderkey AS best_order,
           round(o_totalprice, 2) AS best_price
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY o_custkey
            ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn
        FROM orders
    ) WHERE rn = 1
    """,
    doc="Argmax per group via max_by over a (price, orderkey) struct — "
    "a single partial+final hash aggregation with NO sort and NO "
    "window shuffle-and-sort; ties broken by orderkey so the result "
    "is deterministic. The SQL twin spells the same semantics with "
    "row_number, the classic formulation max_by replaces at scale.",
    tags=("agg", "argmax"),
)
def argmax_best_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    ordkey = F.struct("o_totalprice", "o_orderkey")
    return orders.groupBy("o_custkey").agg(
        F.max_by("o_orderkey", ordkey).alias("best_order"),
        F.round(F.max("o_totalprice"), 2).alias("best_price"),
    )


@register(
    "median_mode_agg",
    oracle="""
    WITH c AS (
        SELECT o_orderstatus, o_orderpriority, count(*) AS n
        FROM orders GROUP BY 1, 2
    ),
    m AS (
        SELECT o_orderstatus, o_orderpriority AS top_priority
        FROM (SELECT *, row_number() OVER (PARTITION BY o_orderstatus
                  ORDER BY n DESC, o_orderpriority ASC) AS rk FROM c)
        WHERE rk = 1
    )
    SELECT o.o_orderstatus,
           round(median(o.o_totalprice), 2) AS median_price,
           any_value(m.top_priority)        AS top_priority,
           count(*)                         AS n_orders
    FROM orders o JOIN m USING (o_orderstatus)
    GROUP BY o.o_orderstatus
    """,
    doc="Ordered-set aggregates per group: exact interpolated median "
    "(percentile 0.5) and deterministic mode (most frequent value, "
    "lowest value on frequency ties). Both run in one hash "
    "aggregation; the SQL twin spells mode's tie-break out as a "
    "count + row_number subquery because DuckDB's mode() leaves ties "
    "engine-defined.",
    tags=("agg",),
)
def median_mode_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.round(F.median("o_totalprice"), 2).alias("median_price"),
        F.mode("o_orderpriority", deterministic=True).alias("top_priority"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@register(
    "sorted_array_agg",
    oracle="""
    SELECT o_custkey,
           array_to_string(list_sort(list(o_orderpriority)), '|') AS priorities,
           count(*) AS n_orders
    FROM orders WHERE o_custkey < 200 GROUP BY o_custkey
    """,
    doc="Row-to-array aggregation: collect each customer's order "
    "priorities into a sorted array (collect_list + sort_array — the "
    "per-key sequence-building step of every features-per-entity "
    "pipeline). Sorting inside the aggregate makes the array "
    "deterministic under any row order, so it is safe under "
    "partitioned, order-free execution. The array is serialized with "
    "'|' on both sides because the gate's canonicalizer hashes scalar "
    "cells, not list cells.",
    tags=("agg", "array"),
)
def sorted_array_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 200)
    return orders.groupBy("o_custkey").agg(
        F.array_join(
            F.sort_array(F.collect_list("o_orderpriority")), "|"
        ).alias("priorities"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@register(
    "snapshot_diff",
    oracle="""
    WITH a AS (
        SELECT o_orderkey AS key, o_totalprice AS price FROM orders
    ),
    b AS (
        SELECT o_orderkey AS key,
               CASE WHEN o_orderkey % 7 = 0
                    THEN o_totalprice * 1.25
                    ELSE o_totalprice END AS price
        FROM orders WHERE o_orderkey % 13 <> 0
        UNION ALL
        SELECT -o_orderkey AS key, o_totalprice AS price
        FROM orders WHERE o_orderkey % 17 = 0
    )
    SELECT COALESCE(a.key, b.key) AS key,
           CASE WHEN b.key IS NULL THEN 'removed'
                WHEN a.key IS NULL THEN 'added'
                ELSE 'changed' END AS action,
           a.price AS old_price,
           b.price AS new_price
    FROM a FULL OUTER JOIN b ON a.key = b.key
    WHERE a.key IS NULL OR b.key IS NULL OR a.price <> b.price
    """,
    doc="Snapshot diff / table versioning: classify every key of two "
    "table versions as added, removed, or changed (unchanged rows "
    "drop out) via one full-outer join on the key — the reconcile "
    "primitive behind incremental loads and data-quality audits of "
    "100 TB table pairs; both sides shuffle once on the join key and "
    "unchanged rows never leave the executors. The second snapshot "
    "is synthesized deterministically from the first (x1.25 price "
    "bump on keys %7 — a single IEEE multiply, bit-identical in both "
    "engines; drop %13, add negated %17) so both engines derive the "
    "same pair of versions from one stored table.",
    tags=("join", "cdc"),
)
def snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    a = orders.select(
        F.col("o_orderkey").alias("key"), F.col("o_totalprice").alias("price")
    )
    b = (
        orders.filter(F.col("o_orderkey") % 13 != 0)
        .select(
            F.col("o_orderkey").alias("key"),
            F.when(
                F.col("o_orderkey") % 7 == 0,
                F.col("o_totalprice") * 1.25,
            )
            .otherwise(F.col("o_totalprice"))
            .alias("price"),
        )
        .unionAll(
            orders.filter(F.col("o_orderkey") % 17 == 0).select(
                (-F.col("o_orderkey")).alias("key"),
                F.col("o_totalprice").alias("price"),
            )
        )
    )
    av, bv = a.alias("a"), b.alias("b")
    joined = av.join(bv, F.col("a.key") == F.col("b.key"), "full_outer")
    return joined.filter(
        F.col("a.key").isNull()
        | F.col("b.key").isNull()
        | (F.col("a.price") != F.col("b.price"))
    ).select(
        F.coalesce(F.col("a.key"), F.col("b.key")).alias("key"),
        F.when(F.col("b.key").isNull(), "removed")
        .when(F.col("a.key").isNull(), "added")
        .otherwise("changed")
        .alias("action"),
        F.col("a.price").alias("old_price"),
        F.col("b.price").alias("new_price"),
    )


@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                    * CAST(round(l_discount * 100, 0) AS BIGINT)) AS DOUBLE)
               / 10000 AS revenue,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.04 AND 0.08
      AND l_quantity < 24
    """,
    doc="TPC-H Q6 (forecasting revenue change): a pure scan-side "
    "query — three conjunctive predicates that all push into the "
    "parquet reader (PushedFilters on shipdate/discount/quantity) "
    "feeding one partial+final agg with NO shuffle of any wide "
    "data. The canonical 'filter early' showcase: at 100 TB this "
    "reads only the min/max-pruned row groups of 4 columns. "
    "Revenue is the exact integer sum (price cents x discount "
    "points, /1e4 at the end — the join_three_way/q5 pattern): "
    "order-dependent float sum + round drifts one ulp cross-engine "
    "at 1e10+ magnitudes; the int64 sum is exact below ~6e15.",
    tags=("relational", "tpch"),
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount") >= 0.04)
            & (F.col("l_discount") <= 0.08)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            (
                F.sum(
                    F.round(F.col("l_extendedprice") * 100, 0).cast("long")
                    * F.round(F.col("l_discount") * 100, 0).cast("long")
                ).cast("double")
                / 10000
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "bloom_prune_semi_join",
    oracle="""
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n_items,
           round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem
    WHERE l_orderkey IN (
        SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
    )
    GROUP BY l_returnflag
    """,
    doc="Semi-join with an explicit broadcast Bloom pre-filter "
    "(operators/bloom.py): urgent-order keys build a packed bitmap "
    "(array<bigint> words; bit positions pmod(xxhash64(key, seed), "
    "m), k=3) that is broadcast to prune lineitem BEFORE the "
    "shuffle with O(1) element_at + shift/mask probes, all codegen "
    "expressions; an exact left_semi confirms survivors, so the "
    "result equals the plain semi-join the oracle computes — the "
    "filter changes data movement, never the answer. This is the "
    "shuffle-avoidance pattern for selective joins at 100 TB (the "
    "explicit form of Spark's runtime row-level bloom filter).",
    tags=("relational", "join", "scale"),
)
def bloom_prune_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kittispark.operators.bloom import bloom_pruned_semi_join

    li = t(spark, sf_dir, "lineitem")
    urgent = t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    matched = bloom_pruned_semi_join(
        li, urgent, probe_key="l_orderkey", build_key="o_orderkey"
    )
    return matched.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


@register(
    "q4_priority_order_counts",
    oracle="""
    SELECT o.o_orderpriority,
           CAST(count(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1996-07-01'
      AND EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey
            AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o.o_orderpriority
    """,
    doc="TPC-H Q4 (order-priority checking), adapted to this "
    "lineitem schema (no commit/receipt dates): orders in a "
    "half-year window with at least one line item shipped more than "
    "60 days after the order date, counted by priority. The EXISTS "
    "compiles to a left_semi join (never inner+distinct) and the "
    "date window pushes into the orders scan.",
    tags=("relational", "tpch"),
)
def q4_priority_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-07-01")
    )
    li = (
        t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_shipdate")
        # Derived scan bound (r10, surfaced by the 250x engine pass):
        # the join keeps only l_shipdate > o_orderdate + 60d and the
        # orders window floors o_orderdate at 1996-01-01, so every
        # qualifying line item has l_shipdate > 1996-01-01 + 60d.
        # Catalyst cannot infer range constraints through a non-equi
        # join condition, so without this literal the lineitem scan
        # carried no shipdate pushdown and the semi-join shuffled the
        # FULL fact table (150M rows at 250x). With it the bound
        # reaches PushedFilters and min/max row-group pruning — the
        # filter-early rule at 100 TB. Semantics unchanged: the join
        # condition still applies the exact per-row comparison.
        .filter(
            F.col("l_shipdate")
            > F.to_timestamp(F.lit("1996-01-01")) + F.expr("INTERVAL 60 DAYS")
        )
    )
    late = orders.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        # timestamp + interval (not date_add, which would truncate the
        # time-of-day the oracle's `+ INTERVAL 60 DAY` keeps)
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


@register(
    "q14_promo_revenue_share",
    oracle="""
    WITH s AS (
        SELECT CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
               * (100 - CAST(round(l.l_discount * 100, 0) AS BIGINT)) AS rev_s,
               p.p_type
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE l.l_shipdate >= TIMESTAMP '1996-03-01'
          AND l.l_shipdate <  TIMESTAMP '1996-04-01'
    )
    SELECT round(
               100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
                                     THEN rev_s ELSE 0 END) AS DOUBLE)
               / NULLIF(sum(rev_s), 0), 6
           ) AS promo_revenue_pct,
           CAST(count(*) AS BIGINT) AS n_items
    FROM s
    """,
    doc="TPC-H Q14 (promotion effect): share of one month's revenue "
    "from PROMO-type parts. The month filter pushes into the "
    "lineitem scan BEFORE the part join, the part side broadcasts, "
    "and the conditional ratio folds into one partial+final agg. "
    "Both ratio terms are exact integer revenue sums (cents x "
    "(100 - discount points)) so the double division sees identical "
    "operands on both engines at any magnitude; NULLIF keeps the "
    "oracle's zero-denominator semantics version-independent.",
    tags=("relational", "tpch"),
)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-03-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    part = t(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev_s = F.round(F.col("l_extendedprice") * 100, 0).cast("long") * (
        F.lit(100) - F.round(F.col("l_discount") * 100, 0).cast("long")
    )
    num = F.sum(F.when(F.col("p_type") == "PROMO", rev_s).otherwise(F.lit(0)))
    den = F.sum(rev_s)
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                100.0 * num.cast("double") / F.nullif(den, F.lit(0)), 6
            ).alias("promo_revenue_pct"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "zscore_outlier_stats",
    oracle="""
    WITH stats AS (
        SELECT event_type,
               avg(value) AS mu,
               stddev_samp(value) AS sigma
        FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CASE WHEN abs((e.value - s.mu) / NULLIF(s.sigma, 0)) > 2
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           round(max(abs((e.value - s.mu) / NULLIF(s.sigma, 0))), 6) AS max_abs_z
    FROM events e JOIN stats s ON e.event_type = s.event_type
    GROUP BY e.event_type
    """,
    doc="Per-group z-score outlier screening: group mean/stddev "
    "(sample) computed once and rejoined to the stream "
    "(aggregate-to-detail, broadcast group-stats side), events "
    "flagged beyond 2 sigma, per-group outlier counts and max |z|. "
    "The anomaly-detection primitive for data-quality monitoring at "
    "ingest; two hash aggs + one broadcast equi-join.",
    tags=("events", "analytics"),
)
def zscore_outlier_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.avg("value").alias("mu"), F.stddev_samp("value").alias("sigma")
    )
    # sigma == 0 (constant-valued group): NULL z, matching the
    # oracle's NULL-on-zero-division — ANSI mode would throw instead
    z = F.when(
        F.col("sigma") != 0, F.abs((F.col("value") - F.col("mu")) / F.col("sigma"))
    )
    return (
        ev.join(F.broadcast(stats), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.when(z > 2, 1).otherwise(0)).alias("n_outliers"),
            F.round(F.max(z), 6).alias("max_abs_z"),
        )
    )


_REV_SCALED_SQL = (
    "CAST(round(l_extendedprice * 100, 0) AS BIGINT)"
    " * (100 - CAST(round(l_discount * 100, 0) AS BIGINT))"
)


@register(
    "q7_volume_shipping",
    oracle=f"""
    SELECT ns.n_name AS supp_nation,
           nc.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l.l_shipdate) AS INT) AS l_year,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum({_REV_SCALED_SQL}) AS DOUBLE) / 10000 AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation ns ON s.s_nationkey = ns.n_nationkey
    JOIN nation nc ON c.c_nationkey = nc.n_nationkey
    WHERE ns.n_nationkey <> nc.n_nationkey
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY 1, 2, 3
    """,
    doc="TPC-H Q7 (volume shipping), generalized to ALL distinct "
    "(supplier nation, customer nation) pairs: a 6-way star join — "
    "lineitem shuffles once on orderkey for the orders join; "
    "customer, supplier, and both nation aliases broadcast, so no "
    "other fact shuffle exists; the two-year window pushes into the "
    "scan. Revenue is the exact int64 cents x discount-points sum. "
    "The canonical many-dim star shape at 100 TB: one fact shuffle "
    "total.",
    tags=("relational", "tpch", "join"),
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    ns = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    nc = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("c_nk"))
        .filter(F.col("s_nk") != F.col("c_nk"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            (_rev_scaled_sum().cast("double") / 10000).alias("revenue"),
        )
    )


@register(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name, revenue, c_acctbal, nation,
           CAST(rk AS INT) AS rk
    FROM (
        SELECT c.c_custkey, c.c_name,
               CAST(sum({_REV_SCALED_SQL}) AS DOUBLE) / 10000 AS revenue,
               round(c.c_acctbal, 2) AS c_acctbal,
               n.n_name AS nation,
               row_number() OVER (
                   ORDER BY sum({_REV_SCALED_SQL}) DESC, c.c_custkey) AS rk
        FROM (
            SELECT l.*, o.o_custkey FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            WHERE o.o_orderdate >= TIMESTAMP '1996-07-01'
              AND o.o_orderdate <  TIMESTAMP '1996-10-01'
              AND l.l_returnflag = 'R'
        ) lr
        JOIN customer c ON lr.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    )
    WHERE rk <= 20
    """,
    doc="TPC-H Q10 (returned-item reporting): revenue lost to 'R' "
    "returns in one quarter, per customer, top 20. The quarter "
    "filter pushes into the orders scan and the returnflag filter "
    "into lineitem BEFORE their join; customer/nation broadcast; "
    "ranking runs on the exact int64 scaled sum (ties impossible to "
    "misorder cross-engine) with custkey tiebreak -> "
    "TakeOrderedAndProject.",
    tags=("relational", "tpch", "join"),
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-07-01")
        & (F.col("o_orderdate") < "1996-10-01")
    ).select("o_orderkey", "o_custkey")
    cust = t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey"
    )
    nation = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    grouped = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(_rev_scaled_sum().alias("__rev_s"))
    )
    w = W.orderBy(F.desc("__rev_s"), F.asc("c_custkey"))
    return (
        grouped.select(
            "c_custkey",
            "c_name",
            (F.col("__rev_s").cast("double") / 10000).alias("revenue"),
            F.round("c_acctbal", 2).alias("c_acctbal"),
            F.col("n_name").alias("nation"),
            F.row_number().over(w).alias("rk"),
        )
        .filter(F.col("rk") <= 20)
    )


@register(
    "q15_top_supplier",
    oracle=f"""
    WITH rev AS (
        SELECT l_suppkey AS suppkey,
               sum({_REV_SCALED_SQL}) AS total_s
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name,
           CAST(r.total_s AS DOUBLE) / 10000 AS total_revenue
    FROM rev r JOIN supplier s ON r.suppkey = s.s_suppkey
    WHERE r.total_s = (SELECT max(total_s) FROM rev)
    """,
    doc="TPC-H Q15 (top supplier): quarterly revenue per supplier, "
    "emitting every supplier achieving the maximum — the classic "
    "agg + scalar-subquery-max equality pattern. The equality is "
    "safe ONLY because revenue is an exact int64 scaled sum (a "
    "float max would tie-break on summation order); quarter filter "
    "pushed to the scan, supplier side broadcast.",
    tags=("relational", "tpch"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    rev = li.groupBy(F.col("l_suppkey").alias("suppkey")).agg(
        _rev_scaled_sum().alias("total_s")
    )
    mx = rev.agg(F.max("total_s").alias("__mx"))
    supp = t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_s") == F.col("__mx"))
        .join(F.broadcast(supp), F.col("suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            (F.col("total_s").cast("double") / 10000).alias("total_revenue"),
        )
    )


@register(
    "q18_large_volume_customers",
    oracle="""
    WITH big AS (
        SELECT l_orderkey,
               CAST(round(sum(l_quantity), 0) AS BIGINT) AS sum_qty
        FROM lineitem GROUP BY l_orderkey
        HAVING sum(l_quantity) > 250
    )
    SELECT c.c_custkey, c.c_name, o.o_orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           round(o.o_totalprice, 2) AS o_totalprice,
           b.sum_qty
    FROM big b
    JOIN orders o ON b.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    """,
    doc="TPC-H Q18 (large-volume customers): orders whose line-item "
    "quantity total exceeds 250 (99th percentile), joined back to "
    "order and customer detail. The HAVING aggregate runs FIRST so "
    "only qualifying orderkeys (1% of orders) reach the joins — "
    "aggregate-then-join, never join-then-aggregate; the surviving "
    "key set joins orders on the shared orderkey and broadcasts "
    "customer. Quantities are integer-valued; the emitted sum is "
    "cast via round so both engines agree exactly.",
    tags=("relational", "tpch", "join"),
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("__sq"))
        .filter(F.col("__sq") > 250)
        .select(
            "l_orderkey",
            F.round("__sq", 0).cast("long").alias("sum_qty"),
        )
    )
    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "sum_qty",
        )
    )


# --------------------------------------------------------------------------
# Bucketed co-located join — the storage-layout lever for repeated
# fact-fact joins at 100 TB. Tables are written ONCE per
# process+sf_dir (like the persisted IVF/MinHash indexes).
# --------------------------------------------------------------------------

# (applicationId, sf_dir) -> (orders_table, lineitem_table)
_BUCKETED_TABLES: dict[tuple[str, str], tuple[str, str]] = {}
_BUCKETED_ROOTS: list[str] = []


def _cleanup_bucketed_roots() -> None:
    import shutil

    for root in _BUCKETED_ROOTS:
        shutil.rmtree(root, ignore_errors=True)


atexit.register(_cleanup_bucketed_roots)


def _bucketed_tables(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Write orders and lineitem as 8-bucket tables hashed on the
    order key (data under a tmp path, metadata in the session
    catalog), once per (application, sf_dir). Table names carry an
    md5 tag of sf_dir so two sf dirs never collide in one catalog.

    The cache key includes the APPLICATION id, not just sf_dir: the
    file-path fixtures (jsonl/minhash/rollup/daypart) survive a Spark
    restart because they cache paths, but saveAsTable metadata lives
    in the application's catalog — a process that stops and recreates
    its SparkContext would otherwise hit dangling table names."""
    import hashlib
    import os
    import tempfile

    cache_key = (spark.sparkContext.applicationId, sf_dir)
    cached = _BUCKETED_TABLES.get(cache_key)
    if cached is not None:
        return cached
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    oname, lname = f"ks_orders_b_{tag}", f"ks_lineitem_b_{tag}"
    root = tempfile.mkdtemp(prefix="kittispark-bucketed-")
    _BUCKETED_ROOTS.append(root)
    for tbl, name, key in (
        ("orders", oname, "o_orderkey"),
        ("lineitem", lname, "l_orderkey"),
    ):
        (
            t(spark, sf_dir, tbl)
            .write.mode("overwrite")
            .bucketBy(8, key)
            .sortBy(key)
            .option("path", os.path.join(root, name))
            .format("parquet")
            .saveAsTable(name)
        )
    _BUCKETED_TABLES[cache_key] = (oname, lname)
    return oname, lname


@register(
    "bucketed_join_colocated",
    oracle="""
    SELECT o.o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT))
                AS DOUBLE) / 100 AS gross_revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
    doc="Fact-fact join over BUCKETED tables — the storage-layout "
    "lever none of the shuffle-side levers replace at 100 TB: both "
    "orders and lineitem are persisted bucketed into 8 hash buckets "
    "on the order key (written once per process; "
    "spark.sql.sources.bucketing.enabled reads the layout back), so "
    "the join is CO-LOCATED — bucket i joins bucket i with ZERO "
    "shuffle of either fact table, the plan every nightly "
    "fact-to-fact pipeline should converge to instead of re-sorting "
    "terabytes per run (pinned in tests/test_plans.py: no Exchange "
    "under the SortMergeJoin; the merge hint keeps AQE from hiding "
    "the property behind a small-scale broadcast). Revenue uses the "
    "exact integer-cents sum.",
    tags=("relational", "join", "storage"),
)
def bucketed_join_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    oname, lname = _bucketed_tables(spark, sf_dir)
    o = spark.table(oname).select("o_orderkey", "o_orderpriority")
    li = spark.table(lname).select("l_orderkey", "l_extendedprice")
    return (
        li.hint("merge")
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            (
                F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long"))
                .cast("double")
                / 100
            ).alias("gross_revenue"),
        )
    )
