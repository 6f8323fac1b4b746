"""Extended analytics surface: time-series gap-fill, rank fusion,
intra-document dedup, graph centrality, and weighted sampling.

Five operator families a warehouse / training-data user reaches for
that no earlier module covers:

- ``timeseries_gapfill`` — calendar-spine densification + forward
  fill (the standard "daily report with no missing days" op);
- ``rank_fusion_rrf`` — reciprocal-rank fusion of two retrieval
  rankings (cosine + euclidean) over the same query set;
- ``intra_doc_chunk_dedup`` — C4/Dolma-style removal of repeated
  chunks WITHIN a document, order-preserving reassembly;
- ``pagerank_nation_flow`` — two damped power iterations over the
  customer-nation -> supplier-nation trade graph;
- ``systematic_weighted_sample`` — deterministic PPS (probability-
  proportional-to-size) systematic sampling in pure integer
  arithmetic, with a distributed two-level prefix sum.

Cross-engine float discipline (SCALING.md): money in integer cents;
prefix sums and sampling thresholds in pure int64 (integer DIV, no
float boundaries); forward fill via the count-partition trick (plain
ANSI window composition, no IGNORE NULLS divergence); dot products
folded in array order on both engines; PageRank emits round(.., 6)
on O(1)-magnitude values where hash-agg summation-order drift is
~1e-16.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from kittispark.operators.util import materialize

from kittispark.registry import register
from kittispark.queries._util import t
from kittispark.operators.similarity import as_double, dot


# --------------------------------------------------------------------------
# Time-series gap fill
# --------------------------------------------------------------------------


@register(
    "timeseries_gapfill",
    oracle="""
    WITH daily AS (
        SELECT user_id, CAST(ts AS DATE) AS day,
               CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
                   AS day_cents
        FROM events WHERE user_id < 20
        GROUP BY 1, 2
    ),
    span AS (
        SELECT user_id, min(day) AS dmin, max(day) AS dmax
        FROM daily GROUP BY user_id
    ),
    spine AS (
        SELECT user_id,
               CAST(unnest(generate_series(dmin, dmax, INTERVAL 1 DAY))
                    AS DATE) AS day
        FROM span
    ),
    joined AS (
        SELECT s.user_id, s.day, d.day_cents,
               count(d.day_cents) OVER (
                   PARTITION BY s.user_id ORDER BY s.day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS grp
        FROM spine s
        LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day
    )
    SELECT user_id, strftime(day, '%Y-%m-%d') AS day,
           CAST(max(day_cents) OVER (PARTITION BY user_id, grp)
                AS DOUBLE) / 100 AS filled_value,
           (day_cents IS NULL) AS is_gap
    FROM joined
    """,
    doc="Calendar densification + forward fill: per-user daily value "
    "sums are exploded onto a contiguous date spine (sequence() "
    "between that user's first and last active day) and gaps carry "
    "the last observed value forward. The fill uses the "
    "count-partition trick — running count of non-nulls defines a "
    "group per observed value, max() within (user, grp) fills it — "
    "pure ANSI window composition, identical in both engines "
    "(IGNORE NULLS support/semantics varies across engines). Sums "
    "are exact cents. Scale: everything partitions by user_id; the "
    "spine explode is per-user-bounded, no global window anywhere.",
    tags=("timeseries", "window"),
)
def timeseries_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kittispark.operators.analytics import gapfill_daily

    ev = t(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    return gapfill_daily(ev, "user_id", "ts", "value")


# --------------------------------------------------------------------------
# Reciprocal-rank fusion
# --------------------------------------------------------------------------


@register(
    "rank_fusion_rrf",
    oracle="""
    WITH q AS (
        SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
        FROM embeddings WHERE vec_id < 5
    ),
    c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv
          FROM embeddings),
    scored AS (
        SELECT query_id, neighbor_id,
               list_dot_product(qv, cv)
                 / NULLIF(sqrt(list_dot_product(qv, qv))
                          * sqrt(list_dot_product(cv, cv)), 0) AS cos_raw,
               (list_dot_product(qv, qv) + list_dot_product(cv, cv))
                 - 2 * list_dot_product(qv, cv) AS l2_raw
        FROM c CROSS JOIN q
        WHERE query_id <> neighbor_id
    ),
    ranked AS (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                   ORDER BY cos_raw DESC, neighbor_id) AS rk_cos,
               row_number() OVER (PARTITION BY query_id
                   ORDER BY l2_raw ASC, neighbor_id) AS rk_l2
        FROM scored WHERE cos_raw IS NOT NULL
    ),
    fused AS (
        SELECT query_id, neighbor_id,
               1.0 / (60 + rk_cos) + 1.0 / (60 + rk_l2) AS rrf_raw
        FROM ranked
    )
    SELECT query_id, neighbor_id, round(rrf_raw, 6) AS rrf_score,
           CAST(rk AS INT) AS rk
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
              ORDER BY rrf_raw DESC, neighbor_id) AS rk
          FROM fused)
    WHERE rk <= 10
    """,
    doc="Reciprocal-rank fusion (k=60) of two retrieval rankings — "
    "cosine similarity and euclidean distance — over the same 5 "
    "query vectors, top-10 fused results per query. Both scores "
    "derive from the same three array-order dot products (l2^2 = "
    "|q|^2 + |c|^2 - 2<q,c>, same parenthesization both engines) so "
    "the rankings, and hence the 1/(60+rank) rational fusion "
    "scores, are bit-identical. Plan: queries broadcast against the "
    "corpus (one pass computes all three dots), two window ranks "
    "partitioned per query, TakeOrdered top-k.",
    tags=("similarity", "retrieval"),
)
def rank_fusion_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    # Self-dots are per-ROW quantities: fold them once before the pair
    # join (the cosine_topk idiom) instead of re-folding |q|^2 and
    # |c|^2 inside every pair — interpreted HOF folds are the cost
    # center here, and this plus sharing ONE <q,c> fold across both
    # scores cuts the per-pair fold count 4x. Values are bit-identical
    # to the per-pair form (same fold on the same array), so the
    # oracle — which still writes the textbook per-pair expressions —
    # is unchanged.
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), as_double("embedding").alias("qv")
    ).withColumn("q2", dot("qv", "qv"))
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"), as_double("embedding").alias("cv")
    ).withColumn("c2", dot("cv", "cv"))
    paired = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            "q2",
            "c2",
            dot("qv", "cv").alias("d"),
        )
    )
    scored = paired.select(
        "query_id",
        "neighbor_id",
        (
            F.col("d")
            / F.nullif(
                F.sqrt(F.col("q2")) * F.sqrt(F.col("c2")), F.lit(0.0)
            )
        ).alias("cos_raw"),
        ((F.col("q2") + F.col("c2")) - 2 * F.col("d")).alias("l2_raw"),
    )
    # zero-norm neighbors have undefined cosine -> excluded from BOTH
    # rankings (a pair must hold both ranks for the fusion sum)
    scored = scored.filter(F.col("cos_raw").isNotNull())
    wq = W.partitionBy("query_id")
    ranked = scored.select(
        "query_id",
        "neighbor_id",
        F.row_number()
        .over(wq.orderBy(F.desc("cos_raw"), F.asc("neighbor_id")))
        .alias("rk_cos"),
        F.row_number()
        .over(wq.orderBy(F.asc("l2_raw"), F.asc("neighbor_id")))
        .alias("rk_l2"),
    )
    fused = ranked.select(
        "query_id",
        "neighbor_id",
        (
            F.lit(1.0) / (F.lit(60) + F.col("rk_cos"))
            + F.lit(1.0) / (F.lit(60) + F.col("rk_l2"))
        ).alias("rrf_raw"),
    )
    return (
        fused.select(
            "query_id",
            "neighbor_id",
            F.round("rrf_raw", 6).alias("rrf_score"),
            F.row_number()
            .over(wq.orderBy(F.desc("rrf_raw"), F.asc("neighbor_id")))
            .alias("rk"),
        )
        .filter(F.col("rk") <= 10)
    )


# --------------------------------------------------------------------------
# Intra-document repeated-chunk removal
# --------------------------------------------------------------------------


@register(
    "intra_doc_chunk_dedup",
    oracle="""
    WITH words AS (
        SELECT doc_id,
               unnest(string_split(text, ' ')) AS w,
               CAST(generate_subscripts(string_split(text, ' '), 1) AS INT) - 1
                   AS pos
        FROM documents
    ),
    chunks AS (
        SELECT doc_id, pos // 8 AS cid,
               string_agg(w, ' ' ORDER BY pos) AS chunk
        FROM words GROUP BY doc_id, pos // 8
    ),
    firsts AS (
        SELECT doc_id, chunk, min(cid) AS keep_cid
        FROM chunks GROUP BY doc_id, chunk
    ),
    stats AS (
        SELECT doc_id, count(*) AS n_chunks FROM chunks GROUP BY doc_id
    )
    SELECT f.doc_id,
           string_agg(f.chunk, ' ' ORDER BY f.keep_cid) AS clean_text,
           CAST(any_value(s.n_chunks) AS BIGINT) AS n_chunks,
           count(*) AS n_kept
    FROM firsts f JOIN stats s ON f.doc_id = s.doc_id
    GROUP BY f.doc_id
    """,
    doc="Intra-document repeated-chunk removal (C4/Dolma-style "
    "boilerplate dedup WITHIN a doc): text splits into consecutive "
    "8-word chunks, only the first occurrence of each distinct "
    "chunk survives, and the document reassembles in original chunk "
    "order. All grouping is keyed by doc_id (+ chunk id), so the "
    "op is embarrassingly document-parallel — no corpus-wide state; "
    "reassembly uses array_sort(collect_list(struct(pos, w))) "
    "(the order-restoring idiom from operators.text."
    "prune_frequent_tokens, which dedups across the CORPUS rather "
    "than within docs).",
    tags=("text", "dedup", "llm"),
)
def intra_doc_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kittispark.operators.analytics import dedup_chunks

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    return dedup_chunks(docs, "doc_id", "text", chunk_words=8)


# --------------------------------------------------------------------------
# PageRank over the nation trade graph
# --------------------------------------------------------------------------


@register(
    "pagerank_nation_flow",
    oracle="""
    WITH edges AS (
        SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
               CAST(count(*) AS BIGINT) AS w
        FROM lineitem l
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        GROUP BY 1, 2
    ),
    outw AS (SELECT src, CAST(sum(w) AS BIGINT) AS ow FROM edges GROUP BY src),
    frac AS (
        SELECT e.src, e.dst, CAST(e.w AS DOUBLE) / CAST(o.ow AS DOUBLE) AS f
        FROM edges e JOIN outw o ON e.src = o.src
    ),
    pr1 AS (
        SELECT n.n_nationkey AS node,
               0.15 / 25 + 0.85 * coalesce(sum(f.f * (1.0 / 25)), 0.0) AS pr
        FROM nation n LEFT JOIN frac f ON f.dst = n.n_nationkey
        GROUP BY 1
    ),
    pr2 AS (
        SELECT n.n_nationkey AS node,
               0.15 / 25 + 0.85 * coalesce(sum(f.f * p.pr), 0.0) AS pr
        FROM nation n
        LEFT JOIN frac f ON f.dst = n.n_nationkey
        LEFT JOIN pr1 p  ON f.src = p.node
        GROUP BY 1
    )
    SELECT nn.n_name AS nation,
           round(p1.pr, 6) AS pr_iter1,
           round(p2.pr, 6) AS pr_iter2
    FROM pr2 p2
    JOIN pr1 p1 ON p1.node = p2.node
    JOIN nation nn ON nn.n_nationkey = p2.node
    """,
    doc="Two damped PageRank power iterations (d=0.85) over the "
    "customer-nation -> supplier-nation trade graph, edge weight = "
    "lineitem count, uniform 1/25 init. The graph materializes once "
    "(one fact pass), iterations are k-node joins over the tiny "
    "edge list — the iterative-algorithm pattern where each "
    "iteration is a declarative agg, not a driver loop. At 100 TB "
    "only the one-time edge aggregation touches the fact table; "
    "iterations cost O(edges) independent of fact size. Ranks are "
    "O(1)-magnitude doubles; round(6) absorbs the ~1e-16 "
    "summation-order drift of the <=25-term per-node sums.",
    tags=("graph", "iterative"),
)
def pagerank_nation_flow(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kittispark.operators.analytics import pagerank_fractions, pagerank_step

    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    edges = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(
            F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst")
        )
        .agg(F.count(F.lit(1)).alias("w"))
    )
    nodes = nation.select(F.col("n_nationkey").alias("node"))
    # one fact pass, checkpointed: pr2's plan must reference the 625-row
    # fraction table, not replay the 4-table edge aggregation (the
    # lineage otherwise doubles per iteration — see operators.pagerank)
    frac = materialize(pagerank_fractions(edges))
    pr0 = nodes.select("node", (F.lit(1.0) / 25).alias("pr"))
    pr1 = materialize(pagerank_step(nodes, frac, pr0, n=25))
    pr2 = pagerank_step(nodes, frac, pr1, n=25)
    pr1_out = pr1.select(F.col("node").alias("node1"), F.col("pr").alias("pr1v"))
    return (
        pr2.join(F.broadcast(pr1_out), F.col("node") == F.col("node1"))
        .join(F.broadcast(nation), F.col("node") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.round("pr1v", 6).alias("pr_iter1"),
            F.round("pr", 6).alias("pr_iter2"),
        )
    )


# --------------------------------------------------------------------------
# Deterministic PPS systematic sampling
# --------------------------------------------------------------------------


@register(
    "systematic_weighted_sample",
    oracle="""
    WITH wt AS (
        SELECT doc_id, n_chars AS w FROM documents
    ),
    tot AS (SELECT CAST(sum(w) AS BIGINT) AS total FROM wt),
    cum AS (
        SELECT doc_id, w,
               CAST(sum(w) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS c
        FROM wt
    )
    SELECT doc_id, CAST(w AS BIGINT) AS w,
           CAST((c * 50) // total - ((c - w) * 50) // total AS BIGINT)
               AS picks
    FROM cum, tot
    WHERE (c * 50) // total > ((c - w) * 50) // total
    """,
    doc="Probability-proportional-to-size systematic sampling of 50 "
    "docs weighted by n_chars, fully deterministic and in pure "
    "int64: a doc is picked when its cumulative-weight interval "
    "crosses a multiple of total/50, tested as integer-DIV "
    "inequality (c*50 DIV total) — no float thresholds, no RNG, so "
    "both engines select the identical sample. The prefix sum is "
    "two-level (per-256-doc-bucket running sums + a running offset "
    "over the tiny bucket-total table), never a single global "
    "window over the corpus — the distributed scan-sum shape that "
    "survives 100 TB where ORDER BY over everything cannot.",
    tags=("sampling", "llm"),
)
def systematic_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kittispark.operators.analytics import pps_systematic_sample

    docs = t(spark, sf_dir, "documents")
    return pps_systematic_sample(docs, "doc_id", "n_chars", k=50, bucket_size=256)


@register(
    "weighted_median_supplier_price",
    oracle="""
    WITH c AS (
        SELECT l_suppkey, l_extendedprice, l_quantity,
               sum(l_quantity) OVER (
                   PARTITION BY l_suppkey
                   ORDER BY l_extendedprice, l_orderkey, l_linenumber
                   ROWS UNBOUNDED PRECEDING) AS cum_qty,
               sum(l_quantity) OVER (PARTITION BY l_suppkey) AS tot_qty
        FROM lineitem
    )
    SELECT l_suppkey,
           CAST(count(*) AS BIGINT) AS n_items,
           round(max(tot_qty), 2) AS total_qty,
           round(min(CASE WHEN 2 * cum_qty >= tot_qty
                          THEN l_extendedprice END), 2) AS wmedian_price
    FROM c GROUP BY l_suppkey
    """,
    doc="Weighted median (lower) of line price per supplier, weighted "
    "by quantity: the order statistic procurement/pricing analytics "
    "ask for when a plain median over-counts small lots. One "
    "supplier-partitioned ordered window computes the cumulative "
    "weight; the median is the first price whose cumulative weight "
    "reaches half the total (2*cum >= tot in pure integral-double "
    "arithmetic — quantities are whole numbers, so both engines "
    "compare exactly; the order is totalized by (price, orderkey, "
    "linenumber)). Supplier keys are high-cardinality, so the "
    "partitioned window parallelizes at any scale — for a handful "
    "of huge groups the global_rank two-level lift is the "
    "documented alternative. The window's shuffle is reused by the "
    "final per-supplier agg: one Exchange total.",
    tags=("analytics", "window"),
)
def weighted_median_supplier_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kittispark.operators.analytics import weighted_median

    li = t(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice", "l_quantity", "l_orderkey", "l_linenumber"
    )
    wm = weighted_median(
        li,
        "l_suppkey",
        "l_extendedprice",
        "l_quantity",
        "l_orderkey",
        "l_linenumber",
        out_col="__wm",
    )
    return wm.select(
        "l_suppkey",
        F.col("n_rows").alias("n_items"),
        F.round("total_weight", 2).alias("total_qty"),
        F.round("__wm", 2).alias("wmedian_price"),
    )


@register(
    "constraint_audit_report",
    oracle="""
    WITH fk_orders AS (
        SELECT count(*) AS v FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM customer c
                          WHERE c.c_custkey = o.o_custkey)
    ),
    fk_lineitem AS (
        SELECT count(*) AS v FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_orderkey = l.l_orderkey)
    ),
    qty_range AS (
        SELECT count(*) AS v FROM lineitem
        WHERE l_quantity <= 0 OR l_quantity > 50
    ),
    pk_orders AS (
        SELECT count(*) AS v FROM (
            SELECT o_orderkey FROM orders
            GROUP BY o_orderkey HAVING count(*) > 1
        )
    ),
    price_sum AS (
        SELECT l_orderkey,
               sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                   * (100 - CAST(round(l_discount * 100) AS BIGINT))
                   * (100 + CAST(round(l_tax * 100) AS BIGINT))) AS micro
        FROM lineitem GROUP BY l_orderkey
    ),
    price_consistency AS (
        SELECT count(*) AS v
        FROM orders o JOIN price_sum p ON p.l_orderkey = o.o_orderkey
        WHERE abs(p.micro - CAST(round(o.o_totalprice * 100) AS BIGINT)
                            * 10000) > 5000
    ),
    checked AS (
        SELECT (SELECT count(*) FROM orders) AS n_orders,
               (SELECT count(*) FROM lineitem) AS n_lineitem
    )
    SELECT rule, CAST(n_violations AS BIGINT) AS n_violations,
           CAST(n_checked AS BIGINT) AS n_checked,
           round(CAST(n_violations AS DOUBLE) / NULLIF(n_checked, 0), 6)
               AS violation_rate
    FROM (
        SELECT 'fk_orders_custkey' AS rule, v AS n_violations,
               n_orders AS n_checked FROM fk_orders, checked
        UNION ALL
        SELECT 'fk_lineitem_orderkey', v, n_lineitem FROM fk_lineitem, checked
        UNION ALL
        SELECT 'lineitem_quantity_range', v, n_lineitem FROM qty_range, checked
        UNION ALL
        SELECT 'orders_pk_unique', v, n_orders FROM pk_orders, checked
        UNION ALL
        SELECT 'orders_totalprice_consistent', v, n_orders
        FROM price_consistency, checked
    )
    """,
    doc="Data-quality constraint audit (the dbt-test / Deequ pattern "
    "as one declarative pass): referential integrity orders->customer "
    "and lineitem->orders via anti-join counts, a value-range rule on "
    "quantity, primary-key uniqueness on orderkey, and an order-total "
    "consistency rule that recomputes each order's lineitem total in "
    "EXACT integer micro-units (price cents x discount points x tax "
    "points — order-independent, the house exact-cents discipline) "
    "against o_totalprice with a half-cent tolerance. Emits one row "
    "per rule with violation count and rate. Scale shape: every rule "
    "is an equi/anti join or partial+final agg on its natural key; "
    "the five rule branches scan each table independently and union "
    "five one-row aggregates — trivially parallel, no rule ever "
    "blocks another.",
    tags=("relational", "audit"),
)
def constraint_audit_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    lineitem = t(spark, sf_dir, "lineitem")
    customer = t(spark, sf_dir, "customer")

    # checked-row totals stay IN the returned plan (broadcast one-row
    # aggregates, the shuffle_skew_report pattern) — eager .count()
    # here would run two full scans at query-CONSTRUCTION time, before
    # and outside anything the caller times or explains
    totals = F.broadcast(
        orders.agg(F.count(F.lit(1)).alias("__n_orders")).crossJoin(
            lineitem.agg(F.count(F.lit(1)).alias("__n_lineitem"))
        )
    )

    def one(rule: str, df_v, checked_col: str) -> DataFrame:
        return (
            df_v.agg(F.count(F.lit(1)).alias("n_violations"))
            .crossJoin(totals)
            .select(
                F.lit(rule).alias("rule"),
                F.col("n_violations"),
                F.col(checked_col).alias("n_checked"),
            )
        )

    fk_orders = orders.join(
        customer, orders["o_custkey"] == customer["c_custkey"], "left_anti"
    )
    fk_lineitem = lineitem.join(
        orders, lineitem["l_orderkey"] == orders["o_orderkey"], "left_anti"
    )
    qty_range = lineitem.filter(
        (F.col("l_quantity") <= 0) | (F.col("l_quantity") > 50)
    )
    pk_orders = (
        orders.groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
    )
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    dpts = F.lit(100) - F.round(F.col("l_discount") * 100, 0).cast("long")
    tpts = F.lit(100) + F.round(F.col("l_tax") * 100, 0).cast("long")
    price_sum = lineitem.groupBy("l_orderkey").agg(
        F.sum(cents * dpts * tpts).alias("micro")
    )
    price_bad = orders.join(
        price_sum, orders["o_orderkey"] == price_sum["l_orderkey"]
    ).filter(
        F.abs(
            F.col("micro")
            - F.round(F.col("o_totalprice") * 100, 0).cast("long") * 10000
        )
        > 5000
    )
    report = (
        one("fk_orders_custkey", fk_orders, "__n_orders")
        .unionByName(one("fk_lineitem_orderkey", fk_lineitem, "__n_lineitem"))
        .unionByName(one("lineitem_quantity_range", qty_range, "__n_lineitem"))
        .unionByName(one("orders_pk_unique", pk_orders, "__n_orders"))
        .unionByName(
            one("orders_totalprice_consistent", price_bad, "__n_orders")
        )
    )
    return report.select(
        "rule",
        "n_violations",
        "n_checked",
        # NULL rate over zero checked rows (empty table), both engines
        F.round(
            F.col("n_violations") / F.nullif(F.col("n_checked"), F.lit(0)), 6
        ).alias("violation_rate"),
    )


@register(
    "shuffle_skew_report",
    oracle="""
    WITH sizes AS (
        SELECT l_suppkey, count(*) AS cnt FROM lineitem GROUP BY l_suppkey
    ),
    g AS (
        SELECT count(*) AS n_keys,
               sum(cnt) AS total_rows,
               sum(cnt * cnt) AS sum_sq,
               max(cnt) AS max_cnt
        FROM sizes
    )
    SELECT CAST(rk AS INT) AS rk, l_suppkey, CAST(cnt AS BIGINT) AS cnt,
           round(CAST(cnt AS DOUBLE) / total_rows, 6) AS pct_of_total,
           round(CAST(max_cnt AS DOUBLE) * n_keys / total_rows, 6)
               AS skew_factor,
           round(sqrt(CAST(sum_sq AS DOUBLE) / n_keys
                      - (CAST(total_rows AS DOUBLE) / n_keys)
                        * (CAST(total_rows AS DOUBLE) / n_keys))
                 / (CAST(total_rows AS DOUBLE) / n_keys), 6) AS cv
    FROM (
        SELECT *, row_number() OVER (ORDER BY cnt DESC, l_suppkey) AS rk
        FROM sizes
    ), g
    WHERE rk <= 10
    """,
    doc="Shuffle-skew diagnosis for a join/agg key — the measurement "
    "that decides whether a key needs salting (operators.skew) or an "
    "AQE skew-join split before a 100 TB run: per-key row counts for "
    "the lineitem->supplier join key, the 10 hottest keys with their "
    "share, a skew factor (hottest key vs mean key), and the "
    "coefficient of variation of key sizes. The CV is computed from "
    "EXACT integer sums (sum of counts, sum of squared counts — no "
    "engine-dependent variance algorithm, no float accumulation "
    "order), one float sqrt at the end. Scale shape: one "
    "partial+final count agg on the key, a 4-scalar global agg "
    "broadcast back, and the top-10 via TakeOrderedAndProject — the "
    "report costs one shuffle regardless of corpus size.",
    tags=("relational", "skew", "audit"),
)
def shuffle_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = t(spark, sf_dir, "lineitem")
    sizes = lineitem.groupBy("l_suppkey").agg(F.count(F.lit(1)).alias("cnt"))
    g = sizes.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("cnt").alias("total_rows"),
        F.sum(F.col("cnt") * F.col("cnt")).alias("sum_sq"),
        F.max("cnt").alias("max_cnt"),
    )
    top = sizes.orderBy(F.desc("cnt"), F.asc("l_suppkey")).limit(10)
    w = W.orderBy(F.desc("cnt"), F.asc("l_suppkey"))
    ranked = top.select(
        F.row_number().over(w).alias("rk"), "l_suppkey", "cnt"
    )
    mean = F.col("total_rows").cast("double") / F.col("n_keys")
    return ranked.crossJoin(F.broadcast(g)).select(
        "rk",
        "l_suppkey",
        "cnt",
        F.round(F.col("cnt") / F.col("total_rows"), 6).alias("pct_of_total"),
        F.round(
            F.col("max_cnt").cast("double") * F.col("n_keys")
            / F.col("total_rows"),
            6,
        ).alias("skew_factor"),
        F.round(
            F.sqrt(
                F.col("sum_sq").cast("double") / F.col("n_keys") - mean * mean
            )
            / mean,
            6,
        ).alias("cv"),
    )


# --------------------------------------------------------------------------
# 2-D skyline (Pareto front)
# --------------------------------------------------------------------------


def skyline_2d(df: DataFrame, max_col: str, min_col: str) -> DataFrame:
    """Two-phase 2-D skyline over integer columns: rows maximizing
    ``max_col`` and minimizing ``min_col`` under strict Pareto
    dominance (duplicated points all survive). Phase 1 prunes each
    hash partition with two windows (RANGE-frame prefix-min of
    min_col over strictly-greater max_col; min within the exact
    max_col tie group); phase 2 reruns the same logic over the tiny
    union of local survivors — correct because skyline is
    distributive. Property-tested against brute-force dominance on
    random point sets (tests/test_graph_property.py)."""

    def _pass(d: DataFrame, *part_cols: str) -> DataFrame:
        w_strict = (
            W.partitionBy(*part_cols)
            .orderBy(F.col(max_col).desc())
            .rangeBetween(W.unboundedPreceding, -1)
        )
        w_tie = W.partitionBy(*[*part_cols, max_col])
        m_strict = F.min(min_col).over(w_strict)
        m_tie = F.min(min_col).over(w_tie)
        return (
            d.withColumn("_ms", m_strict)
            .withColumn("_mt", m_tie)
            .where(
                (F.col("_ms").isNull() | (F.col("_ms") > F.col(min_col)))
                & (F.col("_mt") == F.col(min_col))
            )
            .drop("_ms", "_mt")
        )

    local = _pass(
        df.withColumn("_pid", F.spark_partition_id()), "_pid"
    ).drop("_pid")
    return _pass(local)




@register(
    "pareto_front_orders",
    oracle="""
    WITH o AS (
        SELECT o_orderkey,
               CAST(round(o_totalprice * 100, 0) AS BIGINT) AS price_cents,
               CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT) AS order_day
        FROM orders
        WHERE o_totalprice IS NOT NULL AND o_orderdate IS NOT NULL
    )
    , bp AS (
        SELECT price_cents, min(order_day) AS bd
        FROM o GROUP BY price_cents
    ),
    runm AS (
        SELECT price_cents, bd,
               min(bd) OVER (ORDER BY price_cents DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS ms
        FROM bp
    )
    SELECT r.o_orderkey, r.price_cents, r.order_day
    FROM o r JOIN runm b USING (price_cents)
    WHERE r.order_day = b.bd AND (b.ms IS NULL OR b.ms > r.order_day)
    ORDER BY r.price_cents DESC, r.order_day, r.o_orderkey
    """,
    doc="2-D skyline (Pareto front) of orders maximizing total price "
    "and minimizing order date: a row survives iff no other order "
    "is >= on price AND <= on date with at least one strict. "
    "Distributed as the classic TWO-PHASE skyline: a local pass "
    "prunes each hash partition with two windows (prefix-min of "
    "date over strictly-higher prices via a RANGE frame; min date "
    "within the exact price tie-group), then the same logic runs "
    "once more over the union of local survivors — correct because "
    "skyline is distributive (a locally dominated row is globally "
    "dominated; transitivity keeps its dominator's dominator). The "
    "final pass's window is unpartitioned but its input is only "
    "the local skylines (O(partitions x per-partition front), "
    "~log-sized on real distributions) — the full fact table never "
    "sees a global sort. Duplicated (price, date) points dominate "
    "each other strictly on neither axis, so all survive — ties "
    "deterministic. Rows with NULL price or date are excluded by "
    "contract — dominance is undefined under three-valued "
    "comparison and the engines would fork on it. The ORACLE is "
    "an independent derivation: collapse to one best (minimum) "
    "day per distinct price, take the ROWS-frame running min of "
    "those days down the price-descending order, and keep rows "
    "matching their price's best day with every strictly-higher "
    "price's best day later — grouped-reduction + rows-frame "
    "mechanics, none of the Spark side's RANGE/tie-partition "
    "windows (the naive NOT EXISTS dominance anti-join was "
    "measured quadratic in DuckDB: 238 s at sf0.1). Exact cents "
    "/ epoch-day integers.",
    tags=("window", "analytics"),
)
def pareto_front_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders").where(
        F.col("o_totalprice").isNotNull() & F.col("o_orderdate").isNotNull()
    ).select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100, 0)
        .cast("bigint")
        .alias("price_cents"),
        # o_orderdate reads as TIMESTAMP_NTZ; cast through session-tz
        # TIMESTAMP (UTC) before the epoch cast — NTZ has no direct
        # long cast in Spark 4
        F.floor(
            F.col("o_orderdate").cast("timestamp").cast("long") / 86400
        )
        .cast("bigint")
        .alias("order_day"),
    )
    front = skyline_2d(o, "price_cents", "order_day")
    return front.orderBy(
        F.col("price_cents").desc(), "order_day", "o_orderkey"
    ).select("o_orderkey", "price_cents", "order_day")


# --------------------------------------------------------------------------
# One-pass table profiler
# --------------------------------------------------------------------------

# (column, kind) of the orders table; kind drives which stats apply.
_PROFILE_COLS = (
    ("o_orderkey", "num"),
    ("o_custkey", "num"),
    ("o_orderstatus", "str"),
    ("o_totalprice", "num"),
    ("o_orderdate", "ts"),
    ("o_orderpriority", "str"),
)


def _profile_duck_select(col: str, kind: str) -> str:
    if kind == "num":
        mn = f"CAST(min({col}) AS DOUBLE)"
        mx = f"CAST(max({col}) AS DOUBLE)"
        ln = "CAST(NULL AS BIGINT)"
    elif kind == "ts":
        mn = f"CAST(floor(epoch(min({col}))) AS DOUBLE)"
        mx = f"CAST(floor(epoch(max({col}))) AS DOUBLE)"
        ln = "CAST(NULL AS BIGINT)"
    else:
        mn = "CAST(NULL AS DOUBLE)"
        mx = "CAST(NULL AS DOUBLE)"
        ln = f"CAST(max(length({col})) AS BIGINT)"
    return f"""
        SELECT '{col}' AS column_name,
               CAST(count(*) - count({col}) AS BIGINT) AS n_nulls,
               CAST(count(DISTINCT {col}) AS BIGINT) AS n_distinct,
               {mn} AS min_num, {mx} AS max_num, {ln} AS max_len
        FROM orders
    """


@register(
    "table_profile_report",
    oracle=" UNION ALL ".join(
        _profile_duck_select(c, k) for c, k in _PROFILE_COLS
    )
    + " ORDER BY column_name",
    doc="One-pass data profiler over the orders table: per column, "
    "null count, exact distinct count, numeric/timestamp min-max "
    "(timestamps as epoch seconds; ids and money are < 2^53 so the "
    "double carries them exactly), and max string length. All 6 "
    "columns' aggregates run in ONE aggregation (Catalyst plans "
    "the multi-distinct via expand, a single scan of the table), "
    "then one literal-array inline pivots the single row to "
    "per-column rows — profiling cost at 100 TB is one pass, not "
    "one pass per column, which is the difference between a "
    "nightly audit and an unrunnable one. The oracle is the naive "
    "6-scan UNION ALL — independent formulation, same facts.",
    tags=("analytics", "aggregate"),
)
def table_profile_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c, kind in _PROFILE_COLS:
        aggs.append(F.count(c).alias(f"{c}__nn"))
        aggs.append(F.countDistinct(c).alias(f"{c}__nd"))
        if kind == "num":
            aggs.append(F.min(c).cast("double").alias(f"{c}__mn"))
            aggs.append(F.max(c).cast("double").alias(f"{c}__mx"))
        elif kind == "ts":
            ep = F.col(c).cast("timestamp").cast("long")
            aggs.append(F.min(ep).cast("double").alias(f"{c}__mn"))
            aggs.append(F.max(ep).cast("double").alias(f"{c}__mx"))
        else:
            aggs.append(F.max(F.length(c)).cast("bigint").alias(f"{c}__ml"))
    row = o.agg(*aggs)

    structs = []
    for c, kind in _PROFILE_COLS:
        mn = F.col(f"{c}__mn") if kind in ("num", "ts") else F.lit(None).cast(
            "double"
        )
        mx = F.col(f"{c}__mx") if kind in ("num", "ts") else F.lit(None).cast(
            "double"
        )
        ml = (
            F.col(f"{c}__ml")
            if kind == "str"
            else F.lit(None).cast("bigint")
        )
        structs.append(
            F.struct(
                F.lit(c).alias("column_name"),
                (F.col("_n") - F.col(f"{c}__nn"))
                .cast("bigint")
                .alias("n_nulls"),
                F.col(f"{c}__nd").cast("bigint").alias("n_distinct"),
                mn.alias("min_num"),
                mx.alias("max_num"),
                ml.alias("max_len"),
            )
        )
    return (
        row.select(F.inline(F.array(*structs)))
        .orderBy("column_name")
    )
