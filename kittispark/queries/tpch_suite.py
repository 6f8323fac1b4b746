"""TPC-H completion suite (Q2/Q8/Q9/Q11/Q12/Q13/Q16/Q17/Q19/Q20/Q21/Q22).

With these, every TPC-H query shape is registered (Q1/3/4/5/6/7/10/
14/15/18 live in ``relational.py``), adapted to the fixture schema:
there is no ``partsupp`` table (the distinct ``(l_partkey,
l_suppkey)`` pairs of ``lineitem`` serve as the part-supplier
relation), no ``l_shipmode``/``l_commitdate``/``l_receiptdate``
(lateness is derived from ``l_shipdate - o_orderdate``), and no
``c_phone``/comments (nation keys and account-balance signs stand in
for country codes and complaint strings). Each adaptation preserves
the *plan shape* the original exercises — correlated scalar
subqueries, disjunctive join predicates, left-outer count histograms,
EXISTS/NOT EXISTS double anti-joins, scalar-subquery thresholds —
because those shapes, not the literal predicates, are what a 100 TB
plan must get right.

Money arithmetic follows the exact-int64 discipline from
``relational.py``: prices in cents x discount-points summed as BIGINT
(order-independent, bit-identical across engines), converted to
double only at emission. Quantities are integer-valued; threshold
comparisons against averages are cross-multiplied into integer form
(``5 * qty * cnt < sum_qty`` instead of ``qty < 0.2 * avg``) so no
float boundary can flip between engines.

Reference scope note: the reference pipeline (data_pipeline.py:31-96)
computes fold-style aggregates and filtered joins over frame tables;
this module generalizes those A1-A7/J1-J3 shapes to the full ad-hoc
relational surface a warehouse user would expect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kittispark.registry import register
from kittispark.queries._util import t, table_rows

# Exact int64 money/quantity atoms (see relational._rev_scaled_sum).
_REV_SQL = (
    "CAST(round(l_extendedprice * 100, 0) AS BIGINT)"
    " * (100 - CAST(round(l_discount * 100, 0) AS BIGINT))"
)
_QTY_SQL = "CAST(round(l_quantity, 0) AS BIGINT)"


def _cents(col: str):
    return F.round(F.col(col) * 100, 0).cast("long")


def _rev_scaled():
    return _cents("l_extendedprice") * (F.lit(100) - _cents("l_discount"))


def _qty_long():
    return F.round(F.col("l_quantity"), 0).cast("long")


# --------------------------------------------------------------------------
# Q8 — national market share
# --------------------------------------------------------------------------


@register(
    "q8_market_share",
    oracle=f"""
    SELECT o_year,
           round(CAST(nat_rev AS DOUBLE) / CAST(total_rev AS DOUBLE), 6)
               AS mkt_share
    FROM (
        SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS INT) AS o_year,
               CAST(sum(CASE WHEN ns.n_name = 'NATION_3'
                             THEN {_REV_SQL} ELSE 0 END) AS BIGINT) AS nat_rev,
               CAST(sum({_REV_SQL}) AS BIGINT) AS total_rev
        FROM lineitem l
        JOIN orders o    ON l.l_orderkey = o.o_orderkey
        JOIN part p      ON l.l_partkey = p.p_partkey AND p.p_type = 'ECONOMY'
        JOIN customer c  ON o.o_custkey = c.c_custkey
        JOIN nation nc   ON c.c_nationkey = nc.n_nationkey
        JOIN region r    ON nc.n_regionkey = r.r_regionkey
                            AND r.r_name = 'ASIA'
        JOIN supplier s  ON l.l_suppkey = s.s_suppkey
        JOIN nation ns   ON s.s_nationkey = ns.n_nationkey
        GROUP BY 1
    )
    """,
    doc="TPC-H Q8 (national market share): NATION_3 suppliers' share of "
    "ECONOMY-part revenue sold into ASIA customers, per order year. "
    "One conditional aggregate computes both numerator and "
    "denominator in a single pass over the 7-way star join (no "
    "self-join, no second scan). Join order is the scale design "
    "(VERDICT r8 #2 — the old li-join-orders-first form spilled at "
    "the 250x tier): BOTH sides of the orderkey fact-fact join are "
    "pruned and narrowed BEFORE it. The lineitem side takes the "
    "selective ECONOMY-part broadcast (~1/6 of lines) and the "
    "supplier-nation broadcast first and is projected down to "
    "(l_orderkey, rev int64, is_nat bool); the orders side takes the "
    "ASIA-customer broadcast (~1/5 of orders) first and is projected "
    "to (o_orderkey, o_year). At test SF the pruned orders side "
    "auto-broadcasts (zero fact shuffles); past the threshold the "
    "sort-merge join sorts ~6x fewer and ~5x narrower rows per side "
    "than the unpruned form — the spill fix is the plan, not a knob. "
    "The share is a ratio of two exact int64 sums — both engines "
    "divide the same integers, so round(.., 6) is stable.",
    tags=("relational", "tpch", "join"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    part = t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY").select("p_partkey")
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")

    # Size-aware broadcast hints: Catalyst cannot estimate a
    # post-join/post-filter cardinality without CBO stats, so a
    # derived build side either gets NO hint (static planner
    # sort-merges; AQE converts only after the exchange already ran)
    # or an UNCONDITIONAL hint (OOMs when the table outgrows memory
    # at real scale). The parquet footer row count is the missing
    # statistic — a metadata-only peek, no data read. Below the bound
    # the pruned side is hinted broadcast; above it the planner keeps
    # the (pruned, narrowed) shuffle path, which is the 250x spill
    # fix. On any metadata error table_rows returns a large sentinel:
    # degrade to the shuffle path, never a forced broadcast.
    def bc(df: DataFrame, table: str, max_rows: int) -> DataFrame:
        return F.broadcast(df) if table_rows(sf_dir, table) <= max_rows else df

    # ASIA nation keys (nation x region is fixed-cardinality: always
    # broadcast), then ASIA customer keys — gated: customer is
    # unbounded at 100 TB.
    nc = nation.join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    ).select(F.col("n_nationkey").alias("c_nk"))
    cust_asia = bc(
        cust.join(F.broadcast(nc), F.col("c_nationkey") == F.col("c_nk")).select(
            "c_custkey"
        ),
        "customer",
        30_000_000,
    )
    # supplier -> is_nat flag (nation name resolved at build time so
    # the fact never carries the string); gated like customer.
    ns = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    supp_nat = bc(
        supp.join(F.broadcast(ns), F.col("s_nationkey") == F.col("s_nk")).select(
            "s_suppkey", (F.col("supp_nation") == "NATION_3").alias("is_nat")
        ),
        "supplier",
        30_000_000,
    )
    # Orders pruned to ASIA customers and narrowed to (orderkey, year)
    # BEFORE the fact-fact join. Tighter bound: the broadcast happens
    # AFTER the ~1/5 ASIA prune, and 5M orders -> ~1M narrow rows.
    orders_asia = bc(
        orders.join(cust_asia, F.col("o_custkey") == F.col("c_custkey")).select(
            "o_orderkey", F.year("o_orderdate").alias("o_year")
        ),
        "orders",
        5_000_000,
    )
    # Lineitem pruned by the ECONOMY part filter (gated: part is
    # unbounded at 100 TB) and narrowed to (orderkey, rev, is_nat)
    # BEFORE the fact-fact join: the revenue atom is computed
    # map-side so the (potential) sort never carries
    # price/discount/partkey/suppkey.
    li_pruned = (
        li.join(
            bc(part, "part", 30_000_000), F.col("l_partkey") == F.col("p_partkey")
        )
        .join(supp_nat, F.col("l_suppkey") == F.col("s_suppkey"))
        .select("l_orderkey", _rev_scaled().alias("rev"), "is_nat")
    )
    return (
        li_pruned.join(orders_asia, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_year")
        .agg(
            F.sum(F.when(F.col("is_nat"), F.col("rev")).otherwise(F.lit(0))).alias(
                "__nat"
            ),
            F.sum("rev").alias("__tot"),
        )
        .select(
            "o_year",
            F.round(
                F.col("__nat").cast("double") / F.col("__tot").cast("double"), 6
            ).alias("mkt_share"),
        )
    )


# --------------------------------------------------------------------------
# Q9 — product-type profit
# --------------------------------------------------------------------------


@register(
    "q9_product_profit",
    oracle=f"""
    SELECT ns.n_name AS nation,
           CAST(EXTRACT(year FROM o.o_orderdate) AS INT) AS o_year,
           CAST(CAST(sum(
               {_REV_SQL}
               - CAST(round(p.p_retailprice * 100, 0) AS BIGINT)
                 * {_QTY_SQL} * 100
           ) AS BIGINT) AS DOUBLE) / 10000 AS sum_profit
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN part p     ON l.l_partkey = p.p_partkey AND p.p_type = 'STANDARD'
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation ns  ON s.s_nationkey = ns.n_nationkey
    GROUP BY 1, 2
    """,
    doc="TPC-H Q9 (product-type profit) adapted: no partsupp, so cost "
    "is p_retailprice x quantity instead of ps_supplycost x quantity "
    "— the plan shape (fact joined to part/supplier/nation with a "
    "signed per-row profit expression aggregated by nation x year) "
    "is identical. Profit is computed entirely in a 1e-4-dollar "
    "int64 lattice: price-cents x discount-points minus retail-cents "
    "x quantity x 100, summed as BIGINT, so the signed sum is "
    "order-independent and cross-engine exact. Emitted as the raw "
    "int/1e4 double WITHOUT round(..,2): a group sum ending in 50 "
    "lands on a .005 midpoint whose nearest-double rounding differs "
    "per engine (caught by the sf1synth sweep at r4 magnitudes).",
    tags=("relational", "tpch", "join"),
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    part = (
        t(spark, sf_dir, "part")
        .filter(F.col("p_type") == "STANDARD")
        .select("p_partkey", "p_retailprice")
    )
    supp = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = t(spark, sf_dir, "nation").select("n_nationkey", F.col("n_name").alias("nation"))
    profit = _rev_scaled() - _cents("p_retailprice") * _qty_long() * F.lit(100)
    # Prune + narrow the fact BEFORE the fact-fact orderkey join (the
    # q8 discipline, applied here by the r10 250x engine pass): the
    # broadcast part join is the selective step (p_type = 'STANDARD'
    # keeps ~1/6 of parts -> ~1/6 of lineitem) and costs no shuffle,
    # so it must run first; the big SMJ then shuffles only the
    # surviving rows, pre-reduced to (l_orderkey, nation, profit).
    # Written fact-first-into-orders before r10, the full 150M-row
    # fact shuffled at 250x and the join took 60-100 s; pruned+
    # narrowed it is ~6x less shuffle volume. Catalyst does not
    # reorder joins without CBO stats, so the order is load-bearing.
    li_slim = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("l_orderkey", "nation", profit.alias("__profit"))
    )
    return (
        li_slim.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg((F.sum("__profit").cast("double") / 10000).alias("sum_profit"))
    )


# --------------------------------------------------------------------------
# Q12 — shipping-speed vs order priority
# --------------------------------------------------------------------------


@register(
    "q12_ship_speed_priority",
    oracle="""
    SELECT CASE WHEN date_diff('day', o.o_orderdate, l.l_shipdate) <= 30
                THEN 'FAST'
                WHEN date_diff('day', o.o_orderdate, l.l_shipdate) <= 90
                THEN 'REGULAR'
                ELSE 'SLOW' END AS ship_speed,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY 1
    """,
    doc="TPC-H Q12 (shipping modes / critical priority) adapted: no "
    "l_shipmode column, so lines bucket by shipping latency "
    "(shipdate - orderdate: <=30d FAST, <=90d REGULAR, else SLOW) "
    "and the aggregate still splits urgent vs non-urgent order "
    "priorities per bucket with two conditional counts in one pass. "
    "The year filter pushes into the lineitem scan before the "
    "orderkey shuffle join; both timestamps are midnight-aligned so "
    "day arithmetic is exact in both engines.",
    tags=("relational", "tpch", "join"),
)
def q12_ship_speed_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    lag = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    speed = (
        F.when(lag <= 30, "FAST").when(lag <= 90, "REGULAR").otherwise("SLOW")
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(speed.alias("ship_speed"))
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~is_high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# --------------------------------------------------------------------------
# Q13 — customer order-count distribution
# --------------------------------------------------------------------------


@register(
    "q13_customer_distribution",
    oracle="""
    SELECT CAST(c_count AS INT) AS c_count,
           count(*) AS custdist
    FROM (
        SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN orders o
          ON c.c_custkey = o.o_custkey
         AND o.o_orderpriority <> '4-NOT SPECIFIED'
        GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
    doc="TPC-H Q13 (customer distribution): histogram of per-customer "
    "order counts INCLUDING zero-order customers — the left-outer "
    "join with a join-side filter (priority <> '4-NOT SPECIFIED' "
    "standing in for the NOT LIKE comment filter) is the point: "
    "the filter must live in the join condition, not a WHERE, or "
    "zero-order customers vanish. Plan: orders pre-filtered map-side, "
    "one shuffle on custkey for join+count, then a second tiny "
    "shuffle on the count value for the histogram.",
    tags=("relational", "tpch", "join", "outer"),
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer").select("c_custkey")
    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    )
    per_cust = (
        cust.join(
            orders,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "4-NOT SPECIFIED"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("__n"))
    )
    return (
        per_cust.groupBy(F.col("__n").cast("int").alias("c_count"))
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


# --------------------------------------------------------------------------
# Q17 — small-quantity-order revenue
# --------------------------------------------------------------------------


@register(
    "q17_small_quantity_revenue",
    oracle=f"""
    WITH pa AS (
        SELECT l_partkey AS pk,
               CAST(sum({_QTY_SQL}) AS BIGINT) AS sq,
               count(*) AS cnt
        FROM lineitem GROUP BY l_partkey
    )
    SELECT round(CAST(CAST(sum(
               CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
           ) AS BIGINT) AS DOUBLE) / 700.0, 2) AS avg_yearly
    FROM lineitem l
    JOIN pa   ON l.l_partkey = pa.pk
    JOIN part p ON p.p_partkey = l.l_partkey AND p.p_brand = 'Brand#1'
    WHERE CAST(round(l.l_quantity, 0) AS BIGINT) * 5 * pa.cnt < pa.sq
    """,
    doc="TPC-H Q17 (small-quantity-order revenue): yearly-averaged "
    "revenue of Brand#1 lines whose quantity is below 20% of that "
    "part's average quantity. The correlated AVG subquery becomes "
    "aggregate-then-rejoin (one extra shuffle on partkey, the J2 "
    "shape); the 20%-of-average threshold is cross-multiplied to "
    "integer form — qty * 5 * cnt < sum_qty — so no float average "
    "can straddle a boundary differently per engine. The brand "
    "filter broadcasts; the /7.0 yearly average divides identical "
    "int64 sums in both engines.",
    tags=("relational", "tpch", "join", "subquery"),
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    pa = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(_qty_long()).alias("sq"), F.count(F.lit(1)).alias("cnt")
    )
    part = (
        t(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#1")
        .select("p_partkey")
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(pa, F.col("l_partkey") == F.col("pk"))
        .filter(_qty_long() * 5 * F.col("cnt") < F.col("sq"))
        .agg(
            F.round(
                F.sum(_cents("l_extendedprice")).cast("double") / 700.0, 2
            ).alias("avg_yearly")
        )
    )


# --------------------------------------------------------------------------
# Q19 — disjunctive brand/size/quantity predicates
# --------------------------------------------------------------------------


@register(
    "q19_disjunctive_revenue",
    oracle=f"""
    SELECT CAST(count(*) AS BIGINT) AS n_lines,
           CAST(CAST(sum({_REV_SQL}) AS BIGINT) AS DOUBLE) / 10000 AS revenue
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
    doc="TPC-H Q19 (discounted revenue, disjunctive predicates): the "
    "classic OR-of-conjunctions join filter that defeats naive "
    "pushdown. The equi-key (partkey) still drives a hash join — "
    "Catalyst extracts it from under the OR — while the residual "
    "disjunction evaluates post-match; the part side additionally "
    "pre-filters to the union of the three brand/size envelopes "
    "(brand IN + size <= 15) so the broadcast build side shrinks "
    "~10x before the OR is applied. Revenue is the exact int64 sum.",
    tags=("relational", "tpch", "join"),
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    # Union-envelope pre-filter: every OR branch requires one of the
    # three brands and size within its cap, so the build side can be
    # cut to the envelope before the per-branch residual runs.
    part = (
        t(spark, sf_dir, "part")
        .filter(
            F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3")
            & (F.col("p_size") >= 1)
            & (F.col("p_size") <= 15)
        )
        .select("p_partkey", "p_brand", "p_size")
    )
    q = F.col("l_quantity")
    branch = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 5)
            & q.between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 10)
            & q.between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 15)
            & q.between(20, 30)
        )
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(branch)
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            (F.sum(_rev_scaled()).cast("double") / 10000).alias("revenue"),
        )
    )

# --------------------------------------------------------------------------
# Q2 — minimum-cost supplier (correlated min subquery)
# --------------------------------------------------------------------------


@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH po AS (
        SELECT l_partkey AS pk, l_suppkey AS sk,
               CAST(min(CAST(round(l_extendedprice * 100, 0) AS BIGINT))
                    AS BIGINT) AS offer_c
        FROM lineitem GROUP BY 1, 2
    ),
    best AS (SELECT pk, min(offer_c) AS best_c FROM po GROUP BY pk)
    SELECT p.p_partkey, p.p_type,
           s.s_name, round(s.s_acctbal, 2) AS s_acctbal,
           n.n_name AS nation,
           CAST(po.offer_c AS DOUBLE) / 100 AS min_price
    FROM po
    JOIN best    ON po.pk = best.pk AND po.offer_c = best.best_c
    JOIN part p  ON p.p_partkey = po.pk AND p.p_size = 15
    JOIN supplier s ON s.s_suppkey = po.sk
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
                       AND r.r_name = 'EUROPE'
    """,
    doc="TPC-H Q2 (minimum-cost supplier) adapted: with no partsupp, "
    "the observed minimum l_extendedprice per (part, supplier) pair "
    "in lineitem is the supply-cost relation, and the correlated "
    "'cost = (SELECT min(cost) ... for this part)' subquery becomes "
    "aggregate-then-self-equijoin on (partkey, exact-cents price) — "
    "ALL suppliers tying the minimum are emitted, which is only "
    "deterministic because the price is int64 cents. Size and "
    "region filters cut the probe after the min resolution; "
    "supplier/nation/region broadcast.",
    tags=("relational", "tpch", "subquery"),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    po = li.groupBy(
        F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk")
    ).agg(F.min(_cents("l_extendedprice")).alias("offer_c"))
    best = po.groupBy(F.col("pk").alias("bpk")).agg(
        F.min("offer_c").alias("best_c")
    )
    part = (
        t(spark, sf_dir, "part")
        .filter(F.col("p_size") == 15)
        .select("p_partkey", "p_type")
    )
    supp = t(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_acctbal", "s_nationkey"
    )
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    nr = nation.join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    ).select("n_nationkey", F.col("n_name").alias("nation"))
    return (
        po.join(
            best,
            (F.col("pk") == F.col("bpk")) & (F.col("offer_c") == F.col("best_c")),
        )
        .join(F.broadcast(part), F.col("pk") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("sk") == F.col("s_suppkey"))
        .join(F.broadcast(nr), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "p_partkey",
            "p_type",
            "s_name",
            F.round("s_acctbal", 2).alias("s_acctbal"),
            "nation",
            (F.col("offer_c").cast("double") / 100).alias("min_price"),
        )
    )


# --------------------------------------------------------------------------
# Q11 — important stock (scalar-subquery share threshold)
# --------------------------------------------------------------------------


@register(
    "q11_important_stock",
    oracle=f"""
    WITH pv AS (
        SELECT l.l_partkey AS pk,
               CAST(sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
                        * {_QTY_SQL}) AS BIGINT) AS val_c
        FROM lineitem l
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        WHERE s.s_nationkey < 5
        GROUP BY 1
    )
    SELECT pk AS p_partkey,
           CAST(val_c AS DOUBLE) / 100 AS stock_value
    FROM pv
    WHERE val_c * 500 > (SELECT CAST(sum(val_c) AS BIGINT) FROM pv)
    """,
    doc="TPC-H Q11 (important stock) adapted: per-part inventory value "
    "(price-cents x quantity from lineitem, suppliers of nations "
    "0-4 standing in for GERMANY's partsupp) filtered to parts "
    "holding more than 0.2% of the total. The scalar subquery "
    "becomes a single-row broadcast cross-join; the share predicate "
    "is cross-multiplied (val * 500 > total) so the threshold is "
    "integer-exact — a float '> 0.002 * total' could admit a "
    "different boundary part per engine. One shuffle on partkey; "
    "the total reuses the same aggregate, not a second scan.",
    tags=("relational", "tpch", "subquery"),
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    supp = (
        t(spark, sf_dir, "supplier")
        .filter(F.col("s_nationkey") < 5)
        .select("s_suppkey")
    )
    pv = (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.col("l_partkey").alias("pk"))
        .agg(F.sum(_cents("l_extendedprice") * _qty_long()).alias("val_c"))
    )
    total = pv.agg(F.sum("val_c").alias("__tot"))
    return (
        pv.crossJoin(F.broadcast(total))
        .filter(F.col("val_c") * 500 > F.col("__tot"))
        .select(
            F.col("pk").alias("p_partkey"),
            (F.col("val_c").cast("double") / 100).alias("stock_value"),
        )
    )


# --------------------------------------------------------------------------
# Q16 — supplier-relationship count (anti-join exclusion)
# --------------------------------------------------------------------------


@register(
    "q16_parts_supplier_count",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(count(DISTINCT ps.sk) AS BIGINT) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey AS pk, l_suppkey AS sk FROM lineitem) ps
    JOIN part p ON p.p_partkey = ps.pk
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_type <> 'LARGE'
      AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND ps.sk NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY 1, 2, 3
    """,
    doc="TPC-H Q16 (parts/supplier relationship) adapted: distinct "
    "(partkey, suppkey) pairs from lineitem are the partsupp "
    "relation; negative-balance suppliers stand in for the "
    "complaint-comment exclusion. Shape preserved exactly: "
    "NOT IN -> broadcast left_anti join (safe: s_suppkey is never "
    "NULL, the NOT IN NULL trap doesn't apply), negated + IN-list "
    "part filters broadcast, then count(DISTINCT supplier) per "
    "(brand, type, size) — a two-level shuffle (pair-distinct on "
    "partkey, then the group keys).",
    tags=("relational", "tpch", "join", "subquery"),
)
def q16_parts_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    pairs = li.select(
        F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk")
    ).distinct()
    part = (
        t(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#1")
            & (F.col("p_type") != "LARGE")
            & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    bad_supp = (
        t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select(F.col("s_suppkey").alias("bad_sk"))
    )
    return (
        pairs.join(F.broadcast(bad_supp), F.col("sk") == F.col("bad_sk"), "left_anti")
        .join(F.broadcast(part), F.col("pk") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("sk").alias("supplier_cnt"))
    )


# --------------------------------------------------------------------------
# Q20 — dominant shippers (nested IN subqueries)
# --------------------------------------------------------------------------


@register(
    "q20_dominant_shippers",
    oracle=f"""
    WITH pq AS (
        SELECT l_partkey AS pk, l_suppkey AS sk,
               CAST(sum({_QTY_SQL}) AS BIGINT) AS sq
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
        GROUP BY 1, 2
    ),
    pt AS (SELECT pk, CAST(sum(sq) AS BIGINT) AS tot FROM pq GROUP BY pk)
    SELECT s.s_name, n.n_name AS nation
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE s.s_suppkey IN (
        SELECT pq.sk
        FROM pq
        JOIN pt ON pq.pk = pt.pk
        JOIN part p ON p.p_partkey = pq.pk AND p.p_type = 'SMALL'
        WHERE pq.sq * 2 > pt.tot
    )
    """,
    doc="TPC-H Q20 (excess-stock shippers) adapted: suppliers who "
    "shipped more than half of some SMALL part's total 1997 volume "
    "(availqty > 0.5 * sum(qty) becomes supplier-share > 50% of the "
    "part's shipped quantity). The nested IN subqueries keep their "
    "shape: inner agg per (part, supplier), per-part total by "
    "partial reuse of that agg (second groupBy of the FIRST agg's "
    "output — no rescan), integer cross-multiplied share test, then "
    "a left_semi into supplier. Quantity sums are int64 so the 2x "
    "comparison is exact.",
    tags=("relational", "tpch", "join", "subquery"),
)
def q20_dominant_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    pq = li.groupBy(
        F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk")
    ).agg(F.sum(_qty_long()).alias("sq"))
    pt = pq.groupBy("pk").agg(F.sum("sq").alias("tot"))
    part = (
        t(spark, sf_dir, "part")
        .filter(F.col("p_type") == "SMALL")
        .select("p_partkey")
    )
    dominant = (
        pq.join(pt, "pk")
        .join(F.broadcast(part), F.col("pk") == F.col("p_partkey"))
        .filter(F.col("sq") * 2 > F.col("tot"))
        .select("sk")
    )
    supp = t(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    nation = t(spark, sf_dir, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation")
    )
    return (
        supp.join(dominant, F.col("s_suppkey") == F.col("sk"), "left_semi")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", "nation")
    )


# --------------------------------------------------------------------------
# Q21 — suppliers who kept orders waiting (EXISTS / NOT EXISTS)
# --------------------------------------------------------------------------


@register(
    "q21_waiting_suppliers",
    oracle="""
    SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM lineitem l1
    JOIN orders o   ON o.o_orderkey = l1.l_orderkey
                       AND o.o_orderstatus = 'F'
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    WHERE l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY s.s_name
    """,
    doc="TPC-H Q21 (suppliers who kept orders waiting) adapted: with no "
    "receipt/commit dates, a line is 'late' when it ships more than "
    "60 days after the order date. Counts, per supplier, late lines "
    "in finalized multi-supplier orders where THIS supplier was the "
    "only late one. The EXISTS / NOT EXISTS pair is implemented as "
    "ONE orderkey-partitioned window pass over the joined fact: "
    "per-order distinct-supplier counts (collect_set sizes, overall "
    "and late-only) computed alongside each line, then filtered to "
    "n_supp > 1 AND n_late = 1 AND this-line-late. One lineitem scan, "
    "two joins (filtered orders — broadcast at test SF — plus the "
    "broadcast supplier name attach), one window shuffle — the "
    "previous aggregate-then-semi-join form consumed the joined fact "
    "TWICE (no exchange reuse: the two consumers diverge before the "
    "shuffle), and the correlated rewrite would be two more "
    "self-joins of lineitem. Measured 1.6x faster at sf0.1 and 3x at "
    "250x (spill-bound) vs the two-pass form. Window buffer is "
    "bounded by lines-per-order (the unbounded frame buffers the "
    "order's lines); only the collect_set STATE inside it is "
    "bounded by suppliers-per-order.",
    tags=("relational", "tpch", "join", "subquery", "window"),
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    is_late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    w = Window.partitionBy("l_orderkey")
    flagged = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select("l_orderkey", "l_suppkey", is_late.alias("__late"))
        .select(
            "l_suppkey",
            "__late",
            F.size(F.collect_set("l_suppkey").over(w)).alias("__n_supp"),
            F.size(
                F.collect_set(
                    F.when(F.col("__late"), F.col("l_suppkey"))
                ).over(w)
            ).alias("__n_late"),
        )
    )
    supp = t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        flagged.filter(
            (F.col("__n_supp") > 1) & (F.col("__n_late") == 1) & F.col("__late")
        )
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


# --------------------------------------------------------------------------
# Q22 — global sales opportunity (anti-join + scalar-subquery average)
# --------------------------------------------------------------------------


@register(
    "q22_sales_opportunity",
    oracle="""
    WITH pool AS (
        SELECT c_custkey, c_nationkey,
               CAST(round(c_acctbal * 100, 0) AS BIGINT) AS bal_c
        FROM customer
        WHERE c_nationkey IN (3, 5, 7, 11, 13, 17, 19)
    ),
    thr AS (
        SELECT CAST(sum(bal_c) AS BIGINT) AS s, count(*) AS c
        FROM pool WHERE bal_c > 0
    )
    SELECT CAST(p.c_nationkey AS INT) AS cntry,
           CAST(count(*) AS BIGINT) AS numcust,
           CAST(CAST(sum(p.bal_c) AS BIGINT) AS DOUBLE) / 100 AS totacctbal
    FROM pool p, thr
    WHERE p.bal_c * thr.c > thr.s
      AND NOT EXISTS (
          SELECT 1 FROM orders o WHERE o.o_custkey = p.c_custkey
      )
    GROUP BY 1
    """,
    doc="TPC-H Q22 (global sales opportunity) adapted: nation keys "
    "stand in for phone country codes. Customers of 7 target "
    "nations with above-average positive balances and NO orders, "
    "grouped by nation. The scalar AVG subquery ships as a 1-row "
    "broadcast (sum, count) and the comparison cross-multiplies to "
    "integer cents (bal * n > sum) — exact where 'bal > avg' "
    "float-ties; the NOT EXISTS is a left_anti shuffle join against "
    "orders on custkey (orders is the big side: anti joins "
    "partition cleanly on the probe key at 100 TB). Balance totals "
    "emit from exact cents.",
    tags=("relational", "tpch", "join", "subquery"),
)
def q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    pool = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_nationkey").isin(3, 5, 7, 11, 13, 17, 19))
        .select(
            "c_custkey",
            "c_nationkey",
            _cents("c_acctbal").alias("bal_c"),
        )
    )
    thr = pool.filter(F.col("bal_c") > 0).agg(
        F.sum("bal_c").alias("__s"), F.count(F.lit(1)).alias("__c")
    )
    orders = t(spark, sf_dir, "orders").select("o_custkey")
    return (
        pool.crossJoin(F.broadcast(thr))
        .filter(F.col("bal_c") * F.col("__c") > F.col("__s"))
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").cast("int").alias("cntry"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            (F.sum("bal_c").cast("double") / 100).alias("totacctbal"),
        )
    )
