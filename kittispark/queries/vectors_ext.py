"""Extended vector operators: binary (sign) quantization, Hamming
ANN, recall audit vs the exact cosine baseline, and per-dimension
whitening (standardization).

Oracle discipline (every value adjudicated):
- packed words are 32-bit little-endian BIGINTs — reproducible in
  ANSI SQL on both engines with no sign-bit overflow;
- Hamming distances are integer-exact (XOR + popcount);
- whitening moments use the exact-integer idiom: components are
  floored to nano-scale BIGINTs, sums of squares ride DECIMAL(38,0)/
  HUGEINT, so every aggregate is order-independent and bit-equal
  across engines (the same exact-cents discipline as q1/q6).

Reference parity: the reference (kitti_utils.py) has no vector
search; this family is part of the LLM-pipeline extension
(SURVEY.md §6) alongside operators/similarity.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kittispark.operators.binaryvec import hamming_topk, sign_pack
from kittispark.queries._util import t
from kittispark.registry import register

_DIM = 64
_N_WORDS = 2

# Shared DuckDB CTE: little-endian 32-bit sign-pack of the embedding
# table (the SQL twin of operators.binaryvec.sign_pack).
_PACK_CTE = f"""
    packed AS (
        SELECT vec_id,
               CAST(sum(CASE WHEN i < 32 AND embedding[CAST(i + 1 AS INT)] > 0
                    THEN 1::BIGINT << CAST(i AS INT) ELSE 0 END) AS BIGINT) AS w0,
               CAST(sum(CASE WHEN i >= 32 AND embedding[CAST(i + 1 AS INT)] > 0
                    THEN 1::BIGINT << CAST(i - 32 AS INT) ELSE 0 END) AS BIGINT) AS w1
        FROM embeddings CROSS JOIN range(0, {_DIM}) t(i)
        GROUP BY vec_id
    )
"""


@register(
    "binary_sign_pack",
    oracle=f"""
    WITH {_PACK_CTE}
    SELECT vec_id, w0, w1 FROM packed WHERE vec_id < 200
    """,
    doc="Binary quantization: 64-dim float32 embeddings collapse to "
    "64 sign bits packed into two 32-bit little-endian words (the "
    "faiss IndexBinaryFlat / pgvector bit-column layout, 32x smaller "
    "than the floats). The pack is a per-row expression fold "
    "(operators/binaryvec.py:sign_word_expr) — whole-stage codegen, "
    "no explode, no shuffle, no Python; at 100 TB this is a "
    "map-only densification pass that turns ANN candidate scans "
    "into XOR+popcount bandwidth.",
    tags=("similarity", "quantization"),
)
def binary_sign_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return sign_pack(emb, dim=_DIM).where(F.col("vec_id") < 200).select(
        "vec_id", "w0", "w1"
    )


@register(
    "hamming_ann_topk",
    oracle=f"""
    WITH {_PACK_CTE},
    q AS (SELECT vec_id AS query_id, w0 AS q_w0, w1 AS q_w1
          FROM packed WHERE vec_id < 8),
    scored AS (
        SELECT query_id, vec_id AS neighbor_id,
               CAST(bit_count(xor(q_w0, w0)) + bit_count(xor(q_w1, w1))
                    AS BIGINT) AS hamming
        FROM packed CROSS JOIN q
        WHERE vec_id <> query_id
    )
    SELECT query_id, neighbor_id, hamming, CAST(rk AS INT) AS rk
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                ORDER BY hamming, neighbor_id) AS rk
          FROM scored)
    WHERE rk <= 5
    """,
    doc="Exact Hamming top-5 over sign-packed embeddings for 8 query "
    "vectors: broadcast the packed queries, XOR+popcount per corpus "
    "row (map-side, integer-exact), per-query row_number window on "
    "(distance, neighbor_id). The corpus never shuffles — the only "
    "exchange is the query_id-keyed top-k window; the scan reads 16 "
    "bytes per vector instead of 256. operators/binaryvec.py:"
    "hamming_topk.",
    tags=("similarity",),
)
def hamming_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    packed = sign_pack(emb, dim=_DIM)
    queries = packed.where(F.col("vec_id") < 8)
    return hamming_topk(packed, queries, n_words=_N_WORDS, k=5)


@register(
    "hamming_recall_vs_cosine",
    oracle=f"""
    WITH {_PACK_CTE},
    q AS (SELECT vec_id AS query_id, w0 AS q_w0, w1 AS q_w1
          FROM packed WHERE vec_id < 5),
    ham AS (
        SELECT query_id, neighbor_id FROM (
            SELECT q.query_id, p.vec_id AS neighbor_id,
                   row_number() OVER (PARTITION BY q.query_id ORDER BY
                       bit_count(xor(q.q_w0, p.w0))
                       + bit_count(xor(q.q_w1, p.w1)), p.vec_id) AS rk
            FROM packed p CROSS JOIN q WHERE p.vec_id <> q.query_id)
        WHERE rk <= 10
    ),
    qv AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
           FROM embeddings WHERE vec_id < 5),
    cos AS (
        SELECT query_id, neighbor_id FROM (
            SELECT qv.query_id, c.vec_id AS neighbor_id,
                   row_number() OVER (PARTITION BY qv.query_id ORDER BY
                       list_dot_product(qv.qv, c.embedding::DOUBLE[])
                         / NULLIF(sqrt(list_dot_product(qv.qv, qv.qv))
                                  * sqrt(list_dot_product(
                                        c.embedding::DOUBLE[],
                                        c.embedding::DOUBLE[])), 0)
                       DESC, c.vec_id) AS rk
            FROM embeddings c CROSS JOIN qv
            WHERE c.vec_id <> qv.query_id
              AND list_dot_product(c.embedding::DOUBLE[],
                                   c.embedding::DOUBLE[]) <> 0
              AND list_dot_product(qv.qv, qv.qv) <> 0)
        WHERE rk <= 10
    )
    SELECT CAST(count(DISTINCT query_id) AS BIGINT) AS n_queries,
           round(CAST(sum(hit) AS DOUBLE) / (count(DISTINCT query_id) * 10), 4)
               AS recall_at_10
    FROM (SELECT cos.query_id,
                 CASE WHEN ham.neighbor_id IS NOT NULL THEN 1 ELSE 0 END AS hit
          FROM cos LEFT JOIN ham USING (query_id, neighbor_id))
    """,
    doc="Recall@10 of binary-Hamming ANN against the exact cosine "
    "baseline for 5 queries — the quantified version of the 32x "
    "compression trade. Both rankings replay with deterministic "
    "(score, neighbor_id) tie-breaks on both engines, so the recall "
    "scalar is engine-exact, not statistical. The audit an ANN "
    "deployment runs before swapping float scans for bit scans.",
    tags=("similarity", "audit"),
)
def hamming_recall_vs_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    packed = sign_pack(emb, dim=_DIM)
    ham = hamming_topk(
        packed, packed.where(F.col("vec_id") < 5), n_words=_N_WORDS, k=10
    ).select("query_id", "neighbor_id")

    qv = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    dot = "aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * y), 0D, (s, v) -> s + v)"
    sim = (
        F.expr(dot.format(a="qv", b="embedding"))
        / F.nullif(
            F.sqrt(F.expr(dot.format(a="qv", b="qv")))
            * F.sqrt(F.expr(dot.format(a="embedding", b="embedding"))),
            F.lit(0.0),
        )
    )
    win = Window.partitionBy("query_id").orderBy(
        F.desc("sim_raw"), F.col("neighbor_id")
    )
    cos = (
        emb.crossJoin(F.broadcast(qv))
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            sim.alias("sim_raw"),
        )
        .where(F.col("sim_raw").isNotNull())
        .withColumn("rk", F.row_number().over(win))
        .where(F.col("rk") <= 10)
        .select("query_id", "neighbor_id")
    )
    hits = cos.join(
        ham.withColumn("hit", F.lit(1)), ["query_id", "neighbor_id"], "left"
    ).select("query_id", F.coalesce("hit", F.lit(0)).alias("hit"))
    return hits.agg(
        F.countDistinct("query_id").alias("n_queries"),
        F.round(
            F.sum("hit").cast("double") / (F.countDistinct("query_id") * 10), 4
        ).alias("recall_at_10"),
    )


@register(
    "embedding_whitening",
    oracle=f"""
    WITH x AS (
        SELECT vec_id, CAST(i AS INT) AS i,
               CAST(floor(embedding[CAST(i + 1 AS INT)] * 1e9) AS BIGINT) AS xn
        FROM embeddings CROSS JOIN range(0, {_DIM}) t(i)
    ),
    stats AS (
        SELECT i, count(*) AS n, CAST(sum(xn) AS BIGINT) AS s,
               sum(CAST(xn AS HUGEINT) * xn) AS ss
        FROM x GROUP BY i
    ),
    st2 AS (
        SELECT i, CAST(s AS DOUBLE) / (n * 1e9) AS mu,
               sqrt((CAST(ss AS DOUBLE)
                     - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) / n) / 1e9
                   AS sigma
        FROM stats
    ),
    z AS (
        SELECT vec_id,
               CAST(floor((xn / 1e9 - mu) / sigma * 1e6) AS BIGINT) AS zn
        FROM x JOIN st2 USING (i)
    )
    SELECT vec_id,
           round(CAST(sum(CAST(zn AS HUGEINT) * zn) AS DOUBLE) / 1e12, 6)
               AS white_norm2
    FROM z WHERE vec_id < 100 GROUP BY vec_id
    """,
    doc="Per-dimension whitening (standardization) of the embedding "
    "corpus — the preprocessing step ANN indexes and PQ codebooks "
    "assume: each dimension centered on its corpus mean and scaled "
    "by its corpus stddev, reported as the squared norm of the "
    "standardized vector. Exact-integer discipline end-to-end: "
    "components floor to nano-scale BIGINTs, second moments ride "
    "DECIMAL(38,0)/HUGEINT, so every sum is order-independent and "
    "both engines agree bit-for-bit (no float-summation-order "
    "drift). Shape at 100 TB: one posexplode shuffle to 64 dimension "
    "keys for the moment table (which then broadcasts back), one "
    "vec_id-keyed agg for the norms.",
    tags=("similarity", "quantization"),
)
def embedding_whitening(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    x = emb.select(
        "vec_id",
        F.posexplode("embedding").alias("i", "xval"),
    ).select(
        "vec_id",
        "i",
        F.floor(F.col("xval").cast("double") * F.lit(1e9))
        .cast("long")
        .alias("xn"),
    )
    stats = x.groupBy("i").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("xn").alias("s"),
        F.sum(F.col("xn").cast("decimal(38,0)") * F.col("xn")).alias("ss"),
    )
    st2 = stats.select(
        "i",
        (F.col("s").cast("double") / (F.col("n") * F.lit(1e9))).alias("mu"),
        (
            F.sqrt(
                (
                    F.col("ss").cast("double")
                    - F.col("s").cast("double")
                    * F.col("s").cast("double")
                    / F.col("n")
                )
                / F.col("n")
            )
            / F.lit(1e9)
        ).alias("sigma"),
    )
    z = x.join(F.broadcast(st2), "i").select(
        "vec_id",
        F.floor(
            (F.col("xn") / F.lit(1e9) - F.col("mu"))
            / F.col("sigma")
            * F.lit(1e6)
        )
        .cast("long")
        .alias("zn"),
    )
    return (
        z.where(F.col("vec_id") < 100)
        .groupBy("vec_id")
        .agg(
            F.round(
                F.sum(F.col("zn").cast("decimal(38,0)") * F.col("zn")).cast(
                    "double"
                )
                / F.lit(1e12),
                6,
            ).alias("white_norm2")
        )
    )


# --------------------------------------------------------------------------
# Matryoshka-style dimension-truncation recall
# --------------------------------------------------------------------------

_TRUNC_DIM = 16
_TRUNC_K = 10


@register(
    "dim_truncation_recall",
    oracle=f"""
    WITH q AS (
        SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
        FROM embeddings WHERE vec_id < 20
    ),
    c AS (
        SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv
        FROM embeddings
    ),
    full_rk AS (
        SELECT query_id, neighbor_id,
               row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY list_dot_product(qv, cv)
                            / NULLIF(sqrt(list_dot_product(qv, qv))
                                     * sqrt(list_dot_product(cv, cv)), 0)
                            DESC, neighbor_id) AS rk
        FROM q JOIN c ON query_id <> neighbor_id
        WHERE list_dot_product(qv, cv)
              / NULLIF(sqrt(list_dot_product(qv, qv))
                       * sqrt(list_dot_product(cv, cv)), 0) IS NOT NULL
    ),
    tr AS (
        SELECT query_id, qv[1:{_TRUNC_DIM}] AS qt FROM q
    ),
    tc AS (
        SELECT neighbor_id, cv[1:{_TRUNC_DIM}] AS ct FROM c
    ),
    trunc_rk AS (
        SELECT query_id, neighbor_id,
               row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY list_dot_product(qt, ct)
                            / NULLIF(sqrt(list_dot_product(qt, qt))
                                     * sqrt(list_dot_product(ct, ct)), 0)
                            DESC, neighbor_id) AS rk
        FROM tr JOIN tc ON query_id <> neighbor_id
        WHERE list_dot_product(qt, ct)
              / NULLIF(sqrt(list_dot_product(qt, qt))
                       * sqrt(list_dot_product(ct, ct)), 0) IS NOT NULL
    )
    SELECT f.query_id,
           CAST(count(t.neighbor_id) AS BIGINT) AS n_hit,
           round(CAST(count(t.neighbor_id) AS DOUBLE) / {_TRUNC_K}, 4)
               AS recall
    FROM (SELECT * FROM full_rk WHERE rk <= {_TRUNC_K}) f
    LEFT JOIN (SELECT * FROM trunc_rk WHERE rk <= {_TRUNC_K}) t
           ON f.query_id = t.query_id AND f.neighbor_id = t.neighbor_id
    GROUP BY f.query_id
    ORDER BY f.query_id
    """,
    doc=f"Matryoshka-style truncation audit: for 20 query vectors, "
    f"the exact cosine top-{_TRUNC_K} using only the FIRST "
    f"{_TRUNC_DIM} of {_DIM} dimensions is scored against the "
    f"full-dimension top-{_TRUNC_K}; recall@{_TRUNC_K} per query. "
    "This is the measurement behind prefix-truncated embedding "
    "serving (Kusupati et al. 2022, 'Matryoshka Representation "
    "Learning'): if recall holds, the ANN index can run at a "
    "quarter of the dimension and re-rank with full vectors — the "
    "same cheap-assign / exact-refine split the IVF and PQ paths "
    "use. Both rankings ride the canonical rank_topk tiebreak "
    "(desc sim, asc id) and the r5 zero-norm NULL contract; the "
    "truncated side EXCLUDES vectors whose 16-dim prefix is "
    "zero-norm, exactly like the full scorer excludes zero "
    "vectors. Plan: two broadcast-queries scans of the corpus + "
    "one hash join on (query, neighbor) — no global window, "
    "corpus never collected.",
    tags=("similarity", "vectors"),
)
def dim_truncation_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from kittispark.operators.similarity import as_double, dot, norm

    # ONE corpus pass scores BOTH geometries (r11, guide §2.3/§2.4):
    # the former two cosine_topk calls each ran their own broadcast-
    # queries corpus scan (6 parquet scans / 3 BNLJ / 2 joins in the
    # before plan); here full and truncated sims ride the same pair
    # row, the two rank windows share one query_id exchange, and
    # "hit" becomes a per-row predicate (rk_full <= K AND
    # rk_trunc <= K) — the semi-join and the n_full/n_hit join
    # disappear entirely. Rank equivalence: row_number over
    # (sim DESC, neighbor_id ASC) with Spark's DESC = NULLS LAST
    # gives every non-NULL row exactly the rank it had after the old
    # pre-window isNotNull filter (NULLs sort strictly after all
    # non-NULLs), and membership additionally requires sim IS NOT
    # NULL — so both top-k sets are bit-identical to the
    # rank_topk-based form, per the r5 zero-norm NULL contract.
    emb = t(spark, sf_dir, "embeddings")
    q = (
        emb.filter(F.col("vec_id") < 20)
        .select(F.col("vec_id").alias("query_id"), as_double("embedding").alias("qv"))
        .select(
            "query_id",
            "qv",
            F.slice(F.col("qv"), 1, _TRUNC_DIM).alias("qt"),
        )
        .select(
            "query_id", "qv", "qt",
            norm("qv").alias("qn"),
            norm("qt", _TRUNC_DIM).alias("qtn"),
        )
    )
    c = (
        emb.select(
            F.col("vec_id").alias("neighbor_id"),
            as_double("embedding").alias("cv"),
        )
        .select(
            "neighbor_id",
            "cv",
            F.slice(F.col("cv"), 1, _TRUNC_DIM).alias("ct"),
        )
        .select(
            "neighbor_id", "cv", "ct",
            norm("cv").alias("cn"),
            norm("ct", _TRUNC_DIM).alias("ctn"),
        )
    )
    scored = c.join(
        F.broadcast(q), F.col("query_id") != F.col("neighbor_id")
    ).select(
        "query_id",
        "neighbor_id",
        (
            dot("qv", "cv")
            / F.nullif(F.col("qn") * F.col("cn"), F.lit(0.0))
        ).alias("sim_full"),
        (
            dot("qt", "ct", _TRUNC_DIM)
            / F.nullif(F.col("qtn") * F.col("ctn"), F.lit(0.0))
        ).alias("sim_tr"),
    )
    wf = W.partitionBy("query_id").orderBy(
        F.desc("sim_full"), F.asc("neighbor_id")
    )
    wt = W.partitionBy("query_id").orderBy(
        F.desc("sim_tr"), F.asc("neighbor_id")
    )
    ranked = scored.select(
        "query_id",
        "sim_full",
        "sim_tr",
        F.row_number().over(wf).alias("rkf"),
        F.row_number().over(wt).alias("rkt"),
    )
    hit = (
        (F.col("rkt") <= _TRUNC_K) & F.col("sim_tr").isNotNull()
    ).cast("int")
    return (
        ranked.filter(
            (F.col("rkf") <= _TRUNC_K) & F.col("sim_full").isNotNull()
        )
        .groupBy("query_id")
        .agg(F.sum(hit).cast("bigint").alias("n_hit"))
        .select(
            "query_id",
            "n_hit",
            F.round(F.col("n_hit").cast("double") / _TRUNC_K, 4).alias(
                "recall"
            ),
        )
        .orderBy("query_id")
    )
