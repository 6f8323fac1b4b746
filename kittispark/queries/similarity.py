"""Similarity-search queries over the embeddings table.

The brute-force cosine top-k is oracle-checked: both engines fold the
dot product left-to-right in double precision, so values agree to the
rounding digit. The LSH-bucketed ANN uses deterministic seeded
hyperplanes — rows-only check, recall measured in tests against the
brute-force baseline.
"""

from __future__ import annotations

import atexit

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kittispark.operators.util import materialize

from kittispark.registry import register
from kittispark.queries._util import t
from kittispark.operators.similarity import (
    ann_lsh_topk,
    cosine_near_dup_pairs,
    cosine_topk,
)

_EMBED_DIM = 64


@register(
    "cosine_topk_bruteforce",
    oracle="""
    WITH q AS (
        SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
        FROM embeddings WHERE vec_id < 5
    ),
    c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings),
    scored AS (
        SELECT query_id, neighbor_id,
               list_dot_product(qv, cv)
                 / NULLIF(sqrt(list_dot_product(qv, qv))
                          * sqrt(list_dot_product(cv, cv)), 0) AS sim_raw
        FROM c CROSS JOIN q
        WHERE query_id <> neighbor_id
    )
    SELECT query_id, neighbor_id, round(sim_raw, 4) AS sim,
           CAST(rk AS INT) AS rk
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                ORDER BY sim_raw DESC, neighbor_id) AS rk
          FROM scored WHERE sim_raw IS NOT NULL)
    WHERE rk <= 5
    """,
    doc="Brute-force cosine top-5 for 5 query vectors against the "
    "corpus: broadcast queries, double-precision zip_with dot "
    "product, deterministic rank tiebreak — the exhaustive ANN "
    "baseline.",
    tags=("similarity",),
)
def cosine_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return cosine_topk(emb, queries, k=5)


@register(
    "cosine_near_dup",
    oracle="""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
                 / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
                    * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))),
                 4) AS sim
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
          / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
             * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[])))
          >= 0.45
    """,
    doc="Embedding-cosine near-duplicate pairs over the half matrix, "
    "computed as a distributed block-pair GEMM (applyInPandas per "
    "block pair, nothing collected to the driver — see "
    "operators.similarity.cosine_near_dup_pairs). Threshold keeps "
    "output bounded; LSH bucket join is the sub-quadratic path.",
    tags=("similarity", "dedup"),
)
def cosine_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    return cosine_near_dup_pairs(emb, threshold=0.45)


def _ann_recall_df(ann: DataFrame, brute: DataFrame, floor: int) -> DataFrame:
    """Per-query verification summary of an ANN result against the
    exhaustive baseline: n_ann (result-set size — must be exactly k)
    and recall_ok (>= `floor` of the true top-k found). Both are
    deterministic under the seeded sketches, so the summary is
    hash-checkable by a closed-form oracle even though the ANN
    neighbor ids themselves are not SQL-reproducible."""
    hits = ann.join(
        brute.select("query_id", "neighbor_id"),
        ["query_id", "neighbor_id"],
        "left_semi",
    )
    n_hits = hits.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_hit"))
    return (
        ann.groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_ann"))
        .join(n_hits, "query_id", "left")
        .select(
            "query_id",
            "n_ann",
            (F.coalesce(F.col("n_hit"), F.lit(0)) >= floor).alias("recall_ok"),
        )
    )


_ANN_RECALL_ORACLE = """
    SELECT vec_id AS query_id,
           CAST(5 AS BIGINT) AS n_ann,
           TRUE AS recall_ok
    FROM embeddings WHERE vec_id < 5
    """


@register(
    "ann_lsh_topk",
    oracle=_ANN_RECALL_ORACLE,
    doc="Multi-table LSH approximate top-k (8 tables x 5 hyperplanes, "
    "sign sketch, bucket equi-join, OR-amplified candidate union), "
    "oracle-bound via the approx_count_distinct pattern: the "
    "deterministic per-query summary (exactly k results; >= 1 of the "
    "true top-5 recalled, measured floor 2 at sf0.01 / 1 at sf0.001) "
    "is hash-checked against the closed-form oracle — a broken "
    "sketch, bucket join, or ranking flips n_ann/recall_ok and fails "
    "the hash. Full recall floor also asserted in tests.",
    tags=("similarity",),
)
def ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    ann = ann_lsh_topk(emb, queries, dim=_EMBED_DIM, k=5)
    return _ann_recall_df(ann, cosine_topk(emb, queries, k=5), floor=1)


@register(
    "ann_ivf_topk",
    oracle="""
    WITH e AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ),
    seed AS (
        SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
        FROM embeddings ORDER BY vec_id LIMIT 8
    ),
    d1 AS (
        SELECT e.vec_id, s.cid,
               list_sum(list_transform(
                   generate_series(1, len(e.v)),
                   i -> (e.v[i] - s.cv[i]) * (e.v[i] - s.cv[i])
               )) AS d2
        FROM e, seed s
    ),
    b1 AS (
        SELECT vec_id, cid FROM d1
        QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) = 1
    ),
    cent1d AS (
        SELECT b.cid, i.i AS dim, avg(e.v[i.i]) AS val
        FROM b1 b JOIN e USING (vec_id),
             LATERAL (SELECT unnest(generate_series(1, len(e.v))) AS i) i
        GROUP BY b.cid, i.i
    ),
    cent1 AS (
        SELECT cid, list(val ORDER BY dim) AS cv FROM cent1d GROUP BY cid
    ),
    d2c AS (
        SELECT e.vec_id, c.cid,
               list_sum(list_transform(
                   generate_series(1, len(e.v)),
                   i -> (e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i])
               )) AS d2
        FROM e, cent1 c
    ),
    asg AS (
        SELECT vec_id, cid FROM d2c
        QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) = 1
    ),
    probe AS (
        SELECT vec_id AS query_id, cid FROM d2c WHERE vec_id < 5
        QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) <= 2
    ),
    scored AS (
        SELECT p.query_id, a.vec_id AS neighbor_id,
               list_dot_product(qe.v, ne.v)
                 / NULLIF(sqrt(list_dot_product(qe.v, qe.v))
                          * sqrt(list_dot_product(ne.v, ne.v)), 0) AS sim_raw
        FROM probe p
        JOIN asg a ON a.cid = p.cid AND a.vec_id <> p.query_id
        JOIN e qe ON qe.vec_id = p.query_id
        JOIN e ne ON ne.vec_id = a.vec_id
    )
    SELECT query_id, neighbor_id, round(sim_raw, 4) AS sim,
           CAST(rk AS INT) AS rk
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                ORDER BY sim_raw DESC, neighbor_id) AS rk
          FROM scored WHERE sim_raw IS NOT NULL)
    WHERE rk <= 5
    """,
    doc="IVF approximate top-k, fully value-adjudicated "
    "(operators.similarity.ivf_topk_declarative): one Lloyd round of "
    "deterministic lowest-id-seeded training, squared-L2 Voronoi "
    "cells, nprobe=2 probing, in-cell cosine scoring with the "
    "(desc sim, asc id) tiebreak. Every float folds in dimension "
    "order, so the oracle replays training, assignment, probing, AND "
    "scoring bit-for-bit — no rows-only escape hatch. The NumPy-"
    "sample-trained variant (ann_ivf_topk in operators) stays gated "
    "by ann_ivf_recall / ann_ivf_indexed_match; its driver-side BLAS "
    "means are not SQL-reproducible, which is exactly why this "
    "declarative twin exists.",
    tags=("similarity",),
)
def ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kittispark.operators.similarity import ivf_topk_declarative

    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return ivf_topk_declarative(emb, queries, k=5, n_centroids=8, nprobe=2)


@register(
    "ann_ivf_recall",
    oracle=_ANN_RECALL_ORACLE,
    doc="Driver-adjudicated recall gate for ann_ivf_topk: per query, "
    "exactly k results and >= 2 of the true top-5 recalled (measured "
    "floor 3 at both SFs), hash-checked against the closed-form "
    "oracle. Companion to the benched ann_ivf_topk so the sketch is "
    "value-verified without polluting the headline timing.",
    tags=("similarity",),
)
def ann_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kittispark.operators.similarity import ann_ivf_topk

    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    ann = ann_ivf_topk(emb, queries, k=5)
    return _ann_recall_df(ann, cosine_topk(emb, queries, k=5), floor=2)


@register(
    "embedding_quantize_int8",
    oracle="""
    WITH mm AS (
        SELECT vec_id,
               CAST(list_min(embedding) AS DOUBLE) AS vmin,
               CAST(list_max(embedding) AS DOUBLE) AS vmax,
               embedding
        FROM embeddings WHERE vec_id < 200
    )
    SELECT vec_id, vmin, vmax,
           CAST(len(embedding) AS INT) AS n_dims,
           array_to_string(
               CASE WHEN vmax = vmin
                    THEN list_transform(embedding, x -> 0)
                    ELSE list_transform(embedding, x ->
                         CAST(floor(((CAST(x AS DOUBLE) - vmin) * 127.0)
                                    / (vmax - vmin)) AS INT))
               END, ',') AS q_codes
    FROM mm
    """,
    doc="Int8 scalar quantization of the embedding column (the "
    "compression step before shipping vectors to an ANN index at "
    "100 TB): per-vector min/max affine codes in [0,127], computed "
    "element-wise with the identical double-precision expression "
    "((x - vmin) * 127.0) / (vmax - vmin) on both engines, so floor "
    "is bit-exact and the oracle needs no tolerance. Pure map-side "
    "transform over the array column — no shuffle, no Python. Codes "
    "are emitted ','-joined in dimension order (the driver's pandas "
    "canonicalizer cannot sort raw array columns).",
    tags=("similarity", "llm-pipeline"),
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    vmin = F.array_min("embedding").cast("double")
    vmax = F.array_max("embedding").cast("double")
    mm = emb.select("vec_id", vmin.alias("vmin"), vmax.alias("vmax"), "embedding")
    code = lambda x: F.floor(  # noqa: E731
        ((x.cast("double") - F.col("vmin")) * F.lit(127.0))
        / (F.col("vmax") - F.col("vmin"))
    ).cast("int")
    return mm.select(
        "vec_id",
        "vmin",
        "vmax",
        F.size("embedding").alias("n_dims"),
        F.array_join(
            F.when(
                F.col("vmax") == F.col("vmin"),
                F.transform("embedding", lambda x: F.lit("0")),
            ).otherwise(F.transform("embedding", lambda x: code(x).cast("string"))),
            ",",
        ).alias("q_codes"),
    )


# --------------------------------------------------------------------------
# Persisted IVF index (built once per process+sf_dir, like the KITTI
# file fixtures) — lets the driver adjudicate the partition-pruned
# serving path, not just the in-memory operator.
# --------------------------------------------------------------------------

_IVF_INDEX_ROOT: dict[str, str] = {}


def _cleanup_ivf_roots() -> None:
    import shutil

    # _IVF_APPEND_ROOT/_PQ_INDEX_ROOT are defined further down;
    # resolved at call time
    for store in (_IVF_INDEX_ROOT, _IVF_APPEND_ROOT, _PQ_INDEX_ROOT):
        for root in store.values():
            shutil.rmtree(root, ignore_errors=True)


atexit.register(_cleanup_ivf_roots)


def _ivf_index_path(spark: SparkSession, sf_dir: str) -> str:
    import os
    import tempfile

    from kittispark.operators.similarity import ivf_write_index

    cached = _IVF_INDEX_ROOT.get(sf_dir)
    if cached is not None and os.path.isdir(cached):
        return cached
    root = tempfile.mkdtemp(prefix="kittispark-ivf-")
    ivf_write_index(t(spark, sf_dir, "embeddings"), root)
    _IVF_INDEX_ROOT[sf_dir] = root
    return root


@register(
    "ann_ivf_indexed_match",
    oracle="""
    SELECT vec_id AS query_id,
           CAST(5 AS BIGINT) AS n_served,
           TRUE AS index_matches_inmemory
    FROM embeddings WHERE vec_id < 5
    """,
    doc="Driver-adjudicated gate for the PERSISTED IVF index "
    "(operators.similarity.ivf_write_index / ann_ivf_topk_indexed): "
    "the corpus is written partitioned by centroid id once per "
    "process, then served with `cid IN (probed)` partition pruning — "
    "the scan touches nprobe/C of the index, the layout that makes "
    "IVF work at 100 TB. Per query the served rows must equal the "
    "in-memory operator on every column (ids, rounded sims, ranks); "
    "a training/assignment/pruning divergence flips "
    "index_matches_inmemory and fails the closed-form hash.",
    tags=("similarity",),
)
def ann_ivf_indexed_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kittispark.operators.similarity import ann_ivf_topk, ann_ivf_topk_indexed

    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    idx = _ivf_index_path(spark, sf_dir)
    served = ann_ivf_topk_indexed(spark, idx, queries, k=5, nprobe=2)
    inmem = ann_ivf_topk(emb, queries, k=5, nprobe=2)
    matched = (
        served.join(inmem, ["query_id", "neighbor_id", "sim", "rk"], "inner")
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_matched"))
    )
    return (
        served.groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_served"))
        .join(matched, "query_id", "left")
        .select(
            "query_id",
            "n_served",
            (
                (F.col("n_served") == 5)
                & (F.coalesce(F.col("n_matched"), F.lit(0)) == 5)
            ).alias("index_matches_inmemory"),
        )
    )


@register(
    "kmeans_lloyd_step",
    oracle="""
    WITH e AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ),
    c AS (
        SELECT vec_id AS cid, embedding::DOUBLE[] AS cv FROM e0
    ),
    e0 AS (
        SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 8
    ),
    d AS (
        SELECT e.vec_id, c.cid,
               list_sum(list_transform(
                   generate_series(1, len(e.v)),
                   i -> (e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i])
               )) AS d2
        FROM e, c
    ),
    best AS (
        SELECT vec_id, cid FROM d
        QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) = 1
    ),
    asg AS (SELECT b.cid, e.v FROM best b JOIN e USING (vec_id)),
    upd AS (
        SELECT cid, i AS dim, round(avg(v[i]), 6) AS centroid_val
        FROM asg,
             LATERAL (SELECT unnest(generate_series(1, len(v))) AS i) g
        GROUP BY cid, i
    ),
    cnt AS (SELECT cid, count(*) AS n_assigned FROM best GROUP BY cid)
    SELECT u.cid, CAST(u.dim AS INT) AS dim, u.centroid_val,
           CAST(cnt.n_assigned AS BIGINT) AS n_assigned
    FROM upd u JOIN cnt USING (cid)
    """,
    doc="One Lloyd iteration of k-means (k=8, seeded by the 8 "
    "lowest-id vectors — deterministic, SQL-checkable): argmin "
    "squared-L2 assignment against the broadcast centroid table "
    "(tie -> lowest cid via struct-ordered min_by, one hash agg, no "
    "per-vector window), then per-(cluster, dimension) re-averaging "
    "via posexplode. The clustering primitive under IVF builds / "
    "semantic dedup, value-adjudicated per coordinate. Scale shape: "
    "k-row broadcast + two partial/final hash aggs.",
    tags=("similarity", "clustering"),
)
def kmeans_lloyd_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kittispark.operators.similarity import kmeans_lloyd_step as step

    return step(t(spark, sf_dir, "embeddings"), k=8)


@register(
    "kmeans_two_iterations",
    oracle="""
    WITH e AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ),
    seed AS (
        SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
        FROM embeddings ORDER BY vec_id LIMIT 8
    ),
    d1 AS (
        SELECT e.vec_id, s.cid,
               list_sum(list_transform(
                   generate_series(1, len(e.v)),
                   i -> (e.v[i] - s.cv[i]) * (e.v[i] - s.cv[i])
               )) AS d2
        FROM e, seed s
    ),
    b1 AS (
        SELECT vec_id, cid FROM d1
        QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) = 1
    ),
    cent1 AS (
        SELECT b.cid, i.i AS dim, avg(e.v[i.i]) AS val
        FROM b1 b JOIN e USING (vec_id),
             LATERAL (SELECT unnest(generate_series(1, len(e.v))) AS i) i
        GROUP BY b.cid, i.i
    ),
    cent1l AS (
        SELECT cid, list(val ORDER BY dim) AS cv FROM cent1 GROUP BY cid
    ),
    d2t AS (
        SELECT e.vec_id, c.cid,
               list_sum(list_transform(
                   generate_series(1, len(e.v)),
                   i -> (e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i])
               )) AS d2
        FROM e, cent1l c
    ),
    b2 AS (
        SELECT vec_id, cid FROM d2t
        QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) = 1
    ),
    cent2 AS (
        SELECT b.cid, i.i AS dim, round(avg(e.v[i.i]), 6) AS centroid_val
        FROM b2 b JOIN e USING (vec_id),
             LATERAL (SELECT unnest(generate_series(1, len(e.v))) AS i) i
        GROUP BY b.cid, i.i
    ),
    cnt AS (SELECT cid, count(*) AS n_assigned FROM b2 GROUP BY cid)
    SELECT c.cid, CAST(c.dim AS INT) AS dim, c.centroid_val,
           CAST(n.n_assigned AS BIGINT) AS n_assigned
    FROM cent2 c JOIN cnt n USING (cid)
    """,
    doc="TWO chained Lloyd iterations in one lazy plan "
    "(operators.similarity.kmeans_centroids): iteration 1's "
    "unrounded centroids feed iteration 2's assignment, so this "
    "adjudicates the iterate-reassign-reaverage COMPOSITION, not "
    "just one step — the convergence path a production clustering "
    "run takes. Oracle replays both rounds in SQL; assignments are "
    "argmin with lowest-cid tie-break in both engines, and the "
    "iteration-2 distance is an ordered list fold over dimensions "
    "(NOT a hash-agg sum, whose nondeterministic accumulation order "
    "could flip a near-tie assignment) — matching the Spark fold "
    "exactly.",
    tags=("similarity", "clustering"),
)
def kmeans_two_iterations(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kittispark.operators.similarity import kmeans_centroids

    return kmeans_centroids(t(spark, sf_dir, "embeddings"), k=8, iters=2)


@register(
    "semantic_dedup_clustered",
    oracle="""
    WITH e AS (
        SELECT vec_id,
               list_transform(embedding::DOUBLE[],
                   x -> x / sqrt(list_dot_product(embedding::DOUBLE[],
                                                  embedding::DOUBLE[]))) AS nv
        FROM embeddings
        WHERE list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) > 0
    ),
    k AS (
        SELECT greatest(8, CAST(count(*) // 12500 AS BIGINT)) AS k
        FROM embeddings
    ),
    seed AS (
        SELECT vec_id AS cid, nv AS cv FROM e
        ORDER BY vec_id LIMIT (SELECT k FROM k)
    ),
    d1 AS (
        SELECT e.vec_id, s.cid,
               list_sum(list_transform(
                   generate_series(1, len(e.nv)),
                   i -> (e.nv[i] - s.cv[i]) * (e.nv[i] - s.cv[i])
               )) AS d2
        FROM e, seed s
    ),
    asg AS (
        SELECT vec_id, cid FROM d1
        QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) = 1
    ),
    pairs AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.cid,
               list_dot_product(ea.nv, eb.nv) AS sim
        FROM asg a JOIN asg b ON a.cid = b.cid AND a.vec_id < b.vec_id
        JOIN e ea ON ea.vec_id = a.vec_id
        JOIN e eb ON eb.vec_id = b.vec_id
    )
    SELECT id_a, id_b, CAST(cid AS BIGINT) AS cid, round(sim, 4) AS sim
    FROM pairs WHERE sim > 0.45
    """,
    doc="Semantic near-dedup, cluster-bucketed — the scale path for "
    "embedding dedup: vectors are assigned to deterministic-seed "
    "k-means cells (broadcast argmin, same seeding the kmeans "
    "queries adjudicate) and candidate pairs form ONLY within a "
    "cell, so the all-pairs O(n^2) becomes sum of per-cell "
    "quadratics, triangle-blocked over (cid, lo-block, hi-block) "
    "keys so no single task owns a whole cell's quadratic. Cell "
    "count scales with the corpus — k = max(8, n // 12500), same "
    "formula in the oracle — capping cells at ~12.5k vectors so "
    "total pair work is LINEAR in n (the fixed-k form went "
    "quadratic at the 250x tier). "
    "Assignment and scoring run on UNIT "
    "vectors (spherical cells — L2 over raw vectors would split "
    "high-cosine pairs differing in magnitude); pairs above cosine "
    "0.45 are reported "
    "with their cell; the oracle replays assignment AND scoring in "
    "SQL, so bucketing and the similarity cut are value-checked. "
    "Recall caveat vs exhaustive cosine_near_dup is inherent to "
    "bucketing (cross-cell pairs unseen) — that exhaustive twin is "
    "adjudicated separately.",
    tags=("similarity", "dedup", "clustering"),
)
def semantic_dedup_clustered(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kittispark.operators.similarity import as_double, dot, norm

    emb = t(spark, sf_dir, "embeddings")
    v = as_double("embedding")
    # spherical form: assignment AND scoring run on unit vectors, so
    # the bucketing geometry matches the cosine it serves (L2 cells
    # over raw vectors would split high-cosine pairs that differ in
    # magnitude) and the pair score is a plain dot product
    # materialize vector and norm as bound columns before the lambda
    # (a lambda closing over the raw expressions would re-reduce the
    # array per element — the O(n^2)-closure pitfall); zero-norm
    # vectors are excluded on BOTH sides — cosine is undefined for
    # them, and ANSI mode would turn the division into a crash
    base = (
        emb.select("vec_id", v.alias("__v"))
        .select("vec_id", "__v", norm("__v").alias("__n"))
        .filter(F.col("__n") > 0)
        .select(
            "vec_id",
            F.transform("__v", lambda x: x / F.col("__n")).alias("nv"),
        )
    )
    # Cell count scales with corpus size (250x tier finding, r11): a
    # FIXED k makes within-cell pair enumeration O(n^2/k) — quadratic
    # in the corpus; at 500k vectors the 250x run sat at ~1.6e10 dot
    # products (hours). Capping cells at ~12.5k vectors makes total
    # pair work n * 6250 — LINEAR — while k = max(8, n // 12500)
    # keeps k = 8 at every certified fixture (2k / 20k / 50x's 100k
    # all floor to 8), so the change is value-identical below the
    # engine tier. The oracle computes the same k from count(*).
    k = max(8, emb.count() // 12500)
    cents = (
        base.orderBy("vec_id")
        .limit(k)
        .select(F.col("vec_id").alias("cid"), F.col("nv").alias("cv"))
    )
    # shared fold_d2: same left-to-right association as the former
    # inline zip_with fold, now riding the guarded _STATIC_DIM
    # codegen fast path (r11)
    from kittispark.operators.similarity import fold_d2

    d2 = fold_d2("nv", "cv")
    asg = (
        base.crossJoin(F.broadcast(cents))
        .select("vec_id", "cid", d2.alias("d2"))
        .groupBy("vec_id")
        .agg(F.min_by("cid", F.struct("d2", "cid")).alias("cid"))
    )
    # triangle block-pair enumeration: a join keyed on cid alone puts
    # each cell's FULL quadratic on one task (k cells => at most k fat
    # tasks; the measured bench variance concentrated exactly there,
    # and at 100 TB a fat cell serializes the stage). Splitting each
    # cell into B id-hash blocks and joining on (cid, lo-block,
    # hi-block) spreads the same pairs over k*B*(B+1)/2 buckets for a
    # 2B-fold row replication — negligible next to the per-cell
    # quadratic whenever rows-per-cell >> B. Every unordered pair
    # {x, y} with blocks (px <= py) lands in exactly bucket (px, py):
    # x explodes the lo-side buckets (px, j >= px), y the hi-side
    # buckets (i <= py, py). Same-block buckets dedupe with a strict
    # id inequality; cross-block buckets are disjoint by construction,
    # and least/greatest restores the id_a < id_b output contract
    # (dot on unit vectors is bit-symmetric: same products, same
    # element-index fold order).
    blocks = 4
    # the assigned+normalized side feeds BOTH halves of the pair
    # join: materialize it once (localCheckpoint, the shared-frontier
    # idiom) — re-deriving it per side replays the parquet read, the
    # interpreted unit-normalize transform, the 8-centroid argmin,
    # and the assignment join, measured at ~1.6 s per replay of the
    # ~3.4 s sf0.1 total
    sided = materialize(
        asg.join(base, "vec_id")
        .withColumn("blk", F.pmod(F.col("vec_id"), F.lit(blocks)))
    )
    a = sided.select(
        "cid",
        F.col("vec_id").alias("id_a"),
        F.col("nv").alias("va"),
        F.col("blk").alias("ba"),
        F.explode(F.sequence(F.col("blk"), F.lit(blocks - 1))).alias("bj"),
    )
    b = sided.select(
        F.col("cid").alias("cid_b"),
        F.col("vec_id").alias("id_b"),
        F.col("nv").alias("vb"),
        F.col("blk").alias("bb"),
        F.explode(F.sequence(F.lit(0), F.col("blk"))).alias("bi"),
    )
    return (
        a.join(
            b,
            (F.col("cid") == F.col("cid_b"))
            & (F.col("ba") == F.col("bi"))
            & (F.col("bj") == F.col("bb")),
        )
        .filter((F.col("ba") < F.col("bb")) | (F.col("id_a") < F.col("id_b")))
        .select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
            "cid",
            dot("va", "vb").alias("sim"),
        )
        .filter(F.col("sim") > 0.45)
        .select("id_a", "id_b", "cid", F.round("sim", 4).alias("sim"))
    )


@register(
    "embedding_decontamination",
    oracle="""
    WITH e AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ),
    train AS (SELECT vec_id, v FROM e WHERE vec_id < 400),
    eval_ AS (SELECT vec_id, v FROM e WHERE vec_id >= 400),
    scored AS (
        SELECT ev.vec_id AS eval_id,
               max(list_dot_product(ev.v, tr.v)
                   / NULLIF(sqrt(list_dot_product(ev.v, ev.v))
                            * sqrt(list_dot_product(tr.v, tr.v)), 0)) AS max_sim,
               sum(CASE WHEN list_dot_product(ev.v, tr.v)
                             / NULLIF(sqrt(list_dot_product(ev.v, ev.v))
                                      * sqrt(list_dot_product(tr.v, tr.v)), 0)
                             >= 0.4
                        THEN 1 ELSE 0 END) AS n_close_raw
        FROM eval_ ev, train tr
        GROUP BY ev.vec_id
    )
    SELECT eval_id,
           round(max_sim, 4) AS max_train_sim,
           CAST(n_close_raw AS BIGINT) AS n_train_close,
           max_sim >= 0.4 AS contaminated
    FROM scored
    """,
    doc="Embedding-level eval-set decontamination — the semantic "
    "complement of the 5-gram contamination sweep: each eval vector "
    "(id >= 400) reports its max cosine against the train split and "
    "how many train vectors sit above the 0.4 threshold. Broadcast "
    "eval side against the train corpus (asymmetric split of one "
    "table — the standard train/eval membership check before a "
    "benchmark run); exhaustive by contract at gate scale, with "
    "semantic_dedup_clustered/LSH as the documented sub-quadratic "
    "path.",
    tags=("similarity", "llm-pipeline"),
)
def embedding_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kittispark.operators.similarity import as_double, dot, norm

    emb = t(spark, sf_dir, "embeddings")
    base = (
        emb.select("vec_id", as_double("embedding").alias("__v"))
        .select("vec_id", "__v", norm("__v").alias("__n"))
    )
    train = base.filter(F.col("vec_id") < 400).select(
        F.col("vec_id").alias("train_id"),
        F.col("__v").alias("tv"),
        F.col("__n").alias("tn"),
    )
    ev = base.filter(F.col("vec_id") >= 400).select(
        F.col("vec_id").alias("eval_id"),
        F.col("__v").alias("ev"),
        F.col("__n").alias("en"),
    )
    sim = dot("ev", "tv") / F.nullif(
        F.col("en") * F.col("tn"), F.lit(0.0)
    )
    return (
        train.crossJoin(F.broadcast(ev))
        .select("eval_id", sim.alias("sim"))
        .groupBy("eval_id")
        .agg(
            F.round(F.max("sim"), 4).alias("max_train_sim"),
            F.sum(F.when(F.col("sim") >= 0.4, 1).otherwise(0)).alias(
                "n_train_close"
            ),
            (F.max("sim") >= 0.4).alias("contaminated"),
        )
    )


_PQ_ADC_ORACLE = """
WITH e AS (
    SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
),
sub AS (
    SELECT vec_id, s,
           list_slice(v, s * (len(v) // 4) + 1, (s + 1) * (len(v) // 4)) AS sv
    FROM e, unnest(generate_series(0, 3)) AS u(s)
),
cb AS (
    -- mirror pq_codebooks: donors are the n_codes LOWEST ids (not
    -- `id < n`, which assumes dense 0-based ids), codes densified
    -- to 0..n-1 by id rank (dense_rank is constant across a donor's
    -- m slices, so every subspace gets the same donor->code map)
    SELECT s, code, sv AS cv FROM (
        SELECT s, sv, dense_rank() OVER (ORDER BY vec_id) - 1 AS code
        FROM sub
    ) WHERE code < 16
),
enc AS (
    SELECT vec_id, s, code FROM (
        SELECT sub.vec_id, sub.s, cb.code,
               list_sum(list_transform(
                   generate_series(1, len(sub.sv)),
                   i -> (sub.sv[i] - cb.cv[i]) * (sub.sv[i] - cb.cv[i])
               )) AS d2
        FROM sub JOIN cb USING (s)
    )
    QUALIFY row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, code) = 1
),
dtab AS (
    SELECT q.vec_id AS query_id, q.s, cb.code,
           CAST(round(list_sum(list_transform(
               generate_series(1, len(q.sv)),
               i -> (q.sv[i] - cb.cv[i]) * (q.sv[i] - cb.cv[i])
           )) * 1e9) AS BIGINT) AS pd2n
    FROM sub q JOIN cb USING (s)
    WHERE q.vec_id < 5
),
scored AS (
    SELECT d.query_id, enc.vec_id AS neighbor_id,
           sum(d.pd2n) AS adc_nanos
    FROM enc JOIN dtab d ON d.s = enc.s AND d.code = enc.code
    WHERE enc.vec_id <> d.query_id
    GROUP BY d.query_id, enc.vec_id
)
SELECT query_id, neighbor_id, CAST(adc_nanos AS BIGINT) AS adc_nanos,
       CAST(rk AS INT) AS rk
FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY adc_nanos, neighbor_id) AS rk
    FROM scored
)
WHERE rk <= 5
"""


@register(
    "pq_adc_topk",
    oracle=_PQ_ADC_ORACLE,
    doc="Product-quantization ADC top-k (Jegou et al. 2011): 64-dim "
    "embeddings compressed to 4 subspace codes (16 sampled codewords "
    "per subspace, deterministic donors), queries served by summing "
    "4 broadcast distance-table lookups per candidate. Distances are "
    "scaled to integer nanounits BEFORE the per-candidate sum so the "
    "accumulation is order-independent and every ranked value is "
    "bit-adjudicated by the SQL twin (codebook build, encoding "
    "argmin, table build, scan, and ranking all replayed). Scale "
    "shape: encode = m-fold explode + broadcast codebook join + "
    "partial/final argmin agg; serve = broadcast distance table + "
    "linear code scan (PQ's bandwidth win) — compose with the "
    "persisted IVF layout for the pruned IVFADC system.",
    tags=("similarity", "ann", "llm-pipeline"),
)
def pq_adc_topk_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kittispark.operators.similarity import pq_adc_topk

    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    # 64-dim embeddings, m=4 -> 16-wide slices: statically-known, so
    # the codegen-expanded d2 replaces the interpreted HOF fold
    return pq_adc_topk(emb, queries, k=5, m=4, n_codes=16, sub_dim=16)


_PQ_RERANK_ORACLE = """
WITH e AS (
    SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
),
sub AS (
    SELECT vec_id, s,
           list_slice(v, s * (len(v) // 16) + 1, (s + 1) * (len(v) // 16)) AS sv
    FROM e, unnest(generate_series(0, 15)) AS u(s)
),
cb AS (
    -- rank-densified donor codebook; see _PQ_ADC_ORACLE's cb note
    SELECT s, code, sv AS cv FROM (
        SELECT s, sv, dense_rank() OVER (ORDER BY vec_id) - 1 AS code
        FROM sub
    ) WHERE code < 64
),
enc AS (
    SELECT vec_id, s, code FROM (
        SELECT sub.vec_id, sub.s, cb.code,
               list_sum(list_transform(
                   generate_series(1, len(sub.sv)),
                   i -> (sub.sv[i] - cb.cv[i]) * (sub.sv[i] - cb.cv[i])
               )) AS d2
        FROM sub JOIN cb USING (s)
    )
    QUALIFY row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, code) = 1
),
dtab AS (
    SELECT q.vec_id AS query_id, q.s, cb.code,
           CAST(round(list_sum(list_transform(
               generate_series(1, len(q.sv)),
               i -> (q.sv[i] - cb.cv[i]) * (q.sv[i] - cb.cv[i])
           )) * 1e9) AS BIGINT) AS pd2n
    FROM sub q JOIN cb USING (s)
    WHERE q.vec_id < 5
),
shortlist AS (
    SELECT query_id, neighbor_id FROM (
        SELECT d.query_id, enc.vec_id AS neighbor_id,
               sum(d.pd2n) AS adc_nanos
        FROM enc JOIN dtab d ON d.s = enc.s AND d.code = enc.code
        WHERE enc.vec_id <> d.query_id
        GROUP BY d.query_id, enc.vec_id
    )
    QUALIFY row_number() OVER (PARTITION BY query_id
                               ORDER BY adc_nanos, neighbor_id) <= 100
),
rr AS (
    SELECT sl.query_id, sl.neighbor_id,
           list_sum(list_transform(
               generate_series(1, len(qe.v)),
               i -> (qe.v[i] - ne.v[i]) * (qe.v[i] - ne.v[i])
           )) AS d2
    FROM shortlist sl
    JOIN e qe ON qe.vec_id = sl.query_id
    JOIN e ne ON ne.vec_id = sl.neighbor_id
)
SELECT query_id, neighbor_id, round(d2, 6) AS d2, CAST(rk AS INT) AS rk
FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY d2, neighbor_id) AS rk
    FROM rr
)
WHERE rk <= 5
"""


@register(
    "pq_rerank_topk",
    oracle=_PQ_RERANK_ORACLE,
    doc="PQ shortlist + exact re-rank (the '+R' refinement of "
    "IVFADC, Jegou et al. 2011 §V): a 16-subspace, 64-codeword ADC "
    "pass prunes the corpus to 100 candidates per query over "
    "compressed codes, then only those candidates' full vectors are "
    "fetched (equi-join point lookups, not a scan) and re-scored "
    "with exact ordered-fold squared L2. Recovers 0.92-1.0 recall@5 "
    "where raw ADC ranking measures 0.12-0.68 on the isotropic "
    "synthetic embeddings (distance concentration — PQ's documented "
    "worst case). Every stage is deterministic: integer-nano ADC "
    "with id tiebreaks picks the shortlist, bit-exact folds rank it, "
    "so the SQL twin replays codebooks, codes, shortlist, and final "
    "ranking row-for-row.",
    tags=("similarity", "ann", "llm-pipeline"),
)
def pq_rerank_topk_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kittispark.operators.similarity import pq_rerank_topk

    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    # 64-dim, m=16 -> 4-wide slices: codegen-expanded d2 (sub_dim)
    # replaces 5.1M interpreted HOF folds in the encode stage
    return pq_rerank_topk(
        emb, queries, k=5, shortlist=100, m=16, n_codes=64, sub_dim=4
    )


# --------------------------------------------------------------------------
# Persisted PQ index (VERDICT r9 #2): codes + codebooks written once
# per (process, sf_dir, geometry), served many — the pq_* analogue of
# the IVF index fixture above. Keyed by geometry because the ADC and
# rerank queries use different (m, n_codes).
# --------------------------------------------------------------------------

_PQ_INDEX_ROOT: dict[tuple, str] = {}


def _pq_index_path(
    spark: SparkSession, sf_dir: str, m: int, n_codes: int, sub_dim: int
) -> str:
    import os
    import tempfile

    from kittispark.operators.similarity import pq_write_index

    # sub_dim is part of the key (ADVICE r10): it selects the encode
    # distance path (d2_static vs fold_d2), so two geometries sharing
    # (m, n_codes) but not sub_dim must never reuse each other's index.
    key = (sf_dir, m, n_codes, sub_dim)
    cached = _PQ_INDEX_ROOT.get(key)
    if cached is not None and os.path.isdir(cached):
        return cached
    root = tempfile.mkdtemp(prefix="kittispark-pq-")
    pq_write_index(
        t(spark, sf_dir, "embeddings"), root, m=m, n_codes=n_codes,
        sub_dim=sub_dim,
    )
    _PQ_INDEX_ROOT[key] = root
    return root


@register(
    "pq_adc_topk_indexed",
    oracle=_PQ_ADC_ORACLE,
    doc="Persisted-index PQ ADC serving (VERDICT r9 #2): codebooks + "
    "corpus codes are WRITTEN ONCE (pq_write_index — the encode pass "
    "that turns a 100 TB float corpus into m bytes/vector), then each "
    "query batch reads the code parquet and runs the shared ADC serve "
    "stage (broadcast distance table + linear code scan). The oracle "
    "is the SAME SQL as the build-inclusive pq_adc_topk — the "
    "persisted path must reproduce the in-memory ranking "
    "value-for-value, which adjudicates the write/read roundtrip of "
    "both artifacts, not just the serve math.",
    tags=("similarity", "ann", "llm-pipeline"),
)
def pq_adc_topk_indexed_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kittispark.operators.similarity import pq_adc_topk_indexed

    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    idx = _pq_index_path(spark, sf_dir, m=4, n_codes=16, sub_dim=16)
    return pq_adc_topk_indexed(spark, idx, queries, k=5, m=4, sub_dim=16)


@register(
    "pq_rerank_topk_indexed",
    oracle=_PQ_RERANK_ORACLE,
    doc="Persisted-index PQ shortlist + exact re-rank (VERDICT r9 "
    "#2): the ADC shortlist comes from the written 16x64 code index; "
    "only the 100 shortlisted candidates' full vectors are fetched "
    "from the source table (point-lookup equi-join — the corpus is "
    "NOT part of the index). Same oracle as the build-inclusive "
    "pq_rerank_topk: the serve-from-disk path must reproduce the "
    "in-memory ranking value-for-value.",
    tags=("similarity", "ann", "llm-pipeline"),
)
def pq_rerank_topk_indexed_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kittispark.operators.similarity import pq_rerank_topk_indexed

    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    idx = _pq_index_path(spark, sf_dir, m=16, n_codes=64, sub_dim=4)
    return pq_rerank_topk_indexed(
        spark, idx, emb, queries, k=5, shortlist=100, m=16, sub_dim=4
    )


_IVF_APPEND_ROOT: dict[str, str] = {}


def _ivf_appended_index_path(spark: SparkSession, sf_dir: str) -> str:
    """Index trained + built from the BASE corpus (80%: vec_id % 5 !=
    0), then the arriving batch (20%) appended WITHOUT retraining —
    the steady-state ingest path ann_ivf_index_append adjudicates."""
    import os
    import tempfile

    from kittispark.operators.similarity import ivf_append_index, ivf_write_index

    cached = _IVF_APPEND_ROOT.get(sf_dir)
    if cached is not None and os.path.isdir(cached):
        return cached
    root = tempfile.mkdtemp(prefix="kittispark-ivfapp-")
    emb = t(spark, sf_dir, "embeddings")
    base = emb.filter(F.pmod(F.col("vec_id"), F.lit(5)) != 0)
    batch = emb.filter(F.pmod(F.col("vec_id"), F.lit(5)) == 0)
    ivf_write_index(base, root)
    ivf_append_index(spark, root, batch)
    _IVF_APPEND_ROOT[sf_dir] = root
    return root


@register(
    "ann_ivf_index_append",
    oracle="""
    SELECT vec_id AS query_id,
           CAST(5 AS BIGINT) AS n_served,
           TRUE AS append_matches_full
    FROM embeddings WHERE vec_id < 5
    """,
    doc="Index MAINTENANCE gate for the persisted IVF layout: the "
    "index is trained and built from the 80% base corpus, then the "
    "20% arriving batch is appended by assigning it to the EXISTING "
    "centroids (ivf_append_index — same GEMM kernel, same layout, "
    "no retrain) as extra files inside the cid partition dirs. "
    "Serving from the appended index must be row-identical (ids, "
    "rounded sims, ranks) to an in-memory scoring of the FULL corpus "
    "assigned to those same base-trained centroids — proving the "
    "append path neither loses, duplicates, nor misassigns arriving "
    "vectors. This is the hourly-ingest contract at 100 TB: one "
    "assignment pass over the batch, directory-pruned serving picks "
    "up old and new files alike, retraining stays a policy decision. "
    "Oracle is the closed form of the gate (5 served, match TRUE per "
    "query).",
    tags=("similarity", "cdc"),
)
def ann_ivf_index_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    from kittispark.operators.similarity import (
        _assigned_corpus,
        _assign_nearest,
        _score_bucketed_topk,
        _unit_rows,
        ann_ivf_topk_indexed,
        as_double,
        norm,
    )

    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    idx = _ivf_appended_index_path(spark, sf_dir)
    served = ann_ivf_topk_indexed(spark, idx, queries, k=5, nprobe=2)

    # comparator: FULL corpus assigned in-memory to the SAME
    # base-trained centroids (read back from the index), scored
    # through the shared bucketed-topk kernel
    cent_rows = (
        spark.read.schema("cid int, centroid array<double>")
        .parquet(f"{idx}/centroids")
        .orderBy("cid")
        .collect()
    )
    cents = (
        np.array([r["centroid"] for r in cent_rows], dtype="float64")
        if cent_rows
        else np.zeros((0, 1), dtype="float64")
    )
    norm_c = _unit_rows(cents)
    bc = spark.sparkContext.broadcast(norm_c)
    c = _assigned_corpus(emb, cents, "embedding", "vec_id", bc=bc).withColumn(
        "cn", norm("cv")
    )
    q = (
        _assign_nearest(queries, cents, "embedding", "__c", nprobe=2, bc=bc)
        .select(
            F.col("vec_id").alias("query_id"),
            as_double("embedding").alias("qv"),
            F.explode("__c").alias("cid"),
        )
        .withColumn("qn", norm("qv"))
    )
    inmem = _score_bucketed_topk(c, q, 5)

    matched = (
        served.join(inmem, ["query_id", "neighbor_id", "sim", "rk"], "inner")
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_matched"))
    )
    return (
        served.groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_served"))
        .join(matched, "query_id", "left")
        .select(
            "query_id",
            "n_served",
            (
                (F.col("n_served") == 5)
                & (F.coalesce(F.col("n_matched"), F.lit(0)) == 5)
            ).alias("append_matches_full"),
        )
    )


_IVFADC_ORACLE = """
WITH e AS (
    SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
),
seed AS (
    SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
    FROM embeddings ORDER BY vec_id LIMIT 8
),
d1 AS (
    SELECT e.vec_id, s.cid,
           list_sum(list_transform(
               generate_series(1, len(e.v)),
               i -> (e.v[i] - s.cv[i]) * (e.v[i] - s.cv[i])
           )) AS d2
    FROM e, seed s
),
b1 AS (
    SELECT vec_id, cid FROM d1
    QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) = 1
),
cent1d AS (
    SELECT b.cid, i.i AS dim, avg(e.v[i.i]) AS val
    FROM b1 b JOIN e USING (vec_id),
         LATERAL (SELECT unnest(generate_series(1, len(e.v))) AS i) i
    GROUP BY b.cid, i.i
),
cent1 AS (
    SELECT cid, list(val ORDER BY dim) AS cv FROM cent1d GROUP BY cid
),
d2c AS (
    SELECT e.vec_id, c.cid,
           list_sum(list_transform(
               generate_series(1, len(e.v)),
               i -> (e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i])
           )) AS d2
    FROM e, cent1 c
),
asg AS (
    SELECT vec_id, cid FROM d2c
    QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) = 1
),
probe AS (
    SELECT vec_id AS query_id, cid FROM d2c WHERE vec_id < 5
    QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) <= 2
),
sub AS (
    SELECT vec_id, s,
           list_slice(v, s * (len(v) // 4) + 1, (s + 1) * (len(v) // 4)) AS sv
    FROM e, unnest(generate_series(0, 3)) AS u(s)
),
cb AS (
    SELECT s, code, sv AS cv FROM (
        SELECT s, sv, dense_rank() OVER (ORDER BY vec_id) - 1 AS code
        FROM sub
    ) WHERE code < 16
),
enc AS (
    SELECT vec_id, s, code FROM (
        SELECT sub.vec_id, sub.s, cb.code,
               list_sum(list_transform(
                   generate_series(1, len(sub.sv)),
                   i -> (sub.sv[i] - cb.cv[i]) * (sub.sv[i] - cb.cv[i])
               )) AS d2
        FROM sub JOIN cb USING (s)
    )
    QUALIFY row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, code) = 1
),
dtab AS (
    SELECT q.vec_id AS query_id, q.s, cb.code,
           CAST(round(list_sum(list_transform(
               generate_series(1, len(q.sv)),
               i -> (q.sv[i] - cb.cv[i]) * (q.sv[i] - cb.cv[i])
           )) * 1e9) AS BIGINT) AS pd2n
    FROM sub q JOIN cb USING (s)
    WHERE q.vec_id < 5
),
scored AS (
    SELECT p.query_id, enc.vec_id AS neighbor_id,
           sum(d.pd2n) AS adc_nanos
    FROM enc
    JOIN asg a ON a.vec_id = enc.vec_id
    JOIN probe p ON p.cid = a.cid
    JOIN dtab d ON d.query_id = p.query_id
              AND d.s = enc.s AND d.code = enc.code
    WHERE enc.vec_id <> p.query_id
    GROUP BY p.query_id, enc.vec_id
)
SELECT query_id, neighbor_id, CAST(adc_nanos AS BIGINT) AS adc_nanos,
       CAST(rk AS INT) AS rk
FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY adc_nanos, neighbor_id) AS rk
    FROM scored
)
WHERE rk <= 5
"""


@register(
    "ivfadc_topk",
    oracle=_IVFADC_ORACLE,
    doc="The composed IVFADC system (Jegou et al. 2011 §IV) — IVF "
    "cell pruning FIRST, then PQ asymmetric-distance scoring over "
    "only the probed cells' codes. This is the layout+compression "
    "pair that serves billion-vector corpora: prune to nprobe/C of "
    "the corpus via the Voronoi partition, then read m bytes per "
    "surviving vector instead of 4*dim. Assembled from the two "
    "already-adjudicated halves (ann_ivf_topk's declarative "
    "lowest-id-seeded Lloyd + squared-L2 assignment; pq_adc_topk's "
    "sampled codebooks + integer-nano broadcast distance tables), "
    "so the ENTIRE composition — training, assignment, probing, "
    "encoding, table build, pruned scan, ranking — is replayed "
    "bit-for-bit by the SQL twin. Scale: candidates come from a "
    "cid equi-join (the directory-pruned scan under the persisted "
    "ivf_write_index layout); the un-probed (C - nprobe)/C of the "
    "corpus is never touched by the scoring stage.",
    tags=("similarity", "ann", "llm-pipeline"),
)
def ivfadc_topk_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kittispark.operators.similarity import ivfadc_topk

    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return ivfadc_topk(
        emb, queries, k=5, n_centroids=8, train_iters=1, nprobe=2,
        m=4, n_codes=16, sub_dim=16,
    )


_OUTLIER_TOP = 5

_CENTROID_OUTLIER_ORACLE = """
WITH e AS (
    SELECT vec_id, label, embedding::DOUBLE[] AS v
    FROM embeddings
    WHERE embedding IS NOT NULL AND label IS NOT NULL
),
m AS (
    SELECT vec_id, label, u.i AS d,
           CAST(round(v[u.i] * 1e6) AS BIGINT) AS xm
    FROM e, unnest(generate_series(1, len(v))) AS u(i)
),
s AS (
    SELECT label, d, sum(xm) AS sm, CAST(count(*) AS BIGINT) AS nd
    FROM m GROUP BY label, d
),
dev AS (
    SELECT m.vec_id, m.label,
           CAST(m.xm * s.nd - s.sm AS HUGEINT) AS dv
    FROM m JOIN s ON s.label = m.label AND s.d = m.d
),
d2 AS (
    SELECT vec_id, label, sum(dv * dv) AS d2n2
    FROM dev GROUP BY vec_id, label
),
nl AS (
    SELECT label, CAST(count(*) AS BIGINT) AS n_label FROM e GROUP BY label
)
SELECT label, vec_id, n_label,
       round(CAST(d2n2 AS DOUBLE)
             / (CAST(n_label AS DOUBLE) * n_label * 1e12), 6) AS d2,
       CAST(rk AS INT) AS rk
FROM (
    SELECT d2.*, nl.n_label,
           row_number() OVER (PARTITION BY d2.label
                              ORDER BY d2.d2n2 DESC, d2.vec_id) AS rk
    FROM d2 JOIN nl ON nl.label = d2.label
)
WHERE rk <= 5
ORDER BY label, rk
"""


@register(
    "embedding_centroid_outliers",
    oracle=_CENTROID_OUTLIER_ORACLE,
    doc="Embedding-space outlier detection per label: the top-5 "
    "vectors farthest (squared L2) from their label centroid — the "
    "mislabeled/garbage-embedding screen run before clustering or "
    "dedup trusts the labels. Exactness: coordinates are scaled to "
    "integer MICROunits, and the distance to the mean is ranked as "
    "sum_d (n*x_d - S_d)^2 — the centroid never materializes as an "
    "inexact division; every compared quantity is an exact integer "
    "(decimal(38,0) on Spark, HUGEINT in DuckDB), so the outlier "
    "ranking is bit-deterministic and ties (exact-duplicate "
    "vectors) break on vec_id. The float d2 = d2n2/(n^2 * 1e12) "
    "appears once, at emission, rounded. Plan: per-dim explode is "
    "map-side (64x rows, combined by partial aggs); the per-"
    "(label,dim) moment table is tiny (labels x dims) and "
    "broadcast back; the only data-sized shuffles are the two "
    "hash aggs on (label,d) and vec_id; top-k runs per label "
    "(bounded k output). NULL label/embedding excluded by "
    "contract (no stratum / no point).",
    tags=("similarity", "quality", "llm-pipeline"),
)
def embedding_centroid_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings").where(
        F.col("embedding").isNotNull() & F.col("label").isNotNull()
    )
    return centroid_outlier_topk(emb, k=_OUTLIER_TOP)


def centroid_outlier_topk(emb: DataFrame, k: int) -> DataFrame:
    """Top-k farthest-from-label-centroid vectors per label over a
    (vec_id, label, embedding) table, ranked by the exact integer
    sum_d (n*x_d - S_d)^2 in micro-scaled coordinates — the centroid
    never materializes as an inexact division. Ties break on vec_id;
    the float d2 appears once, at emission."""
    from pyspark.sql import Window as W

    m = emb.select(
        "vec_id",
        "label",
        F.posexplode("embedding").alias("d0", "x"),
    ).select(
        "vec_id",
        "label",
        (F.col("d0") + 1).alias("d"),
        F.round(F.col("x").cast("double") * 1e6).cast("long").alias("xm"),
    )
    s = m.groupBy("label", "d").agg(
        F.sum("xm").alias("sm"), F.count(F.lit(1)).cast("bigint").alias("nd")
    )
    dev = m.join(F.broadcast(s), ["label", "d"]).select(
        "vec_id",
        "label",
        (F.col("xm") * F.col("nd") - F.col("sm"))
        .cast("decimal(38,0)")
        .alias("dv"),
    )
    d2 = dev.groupBy("vec_id", "label").agg(
        F.sum(F.col("dv") * F.col("dv")).alias("d2n2")
    )
    nl = emb.groupBy("label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_label")
    )
    w = W.partitionBy("label").orderBy(F.col("d2n2").desc(), "vec_id")
    return (
        d2.join(F.broadcast(nl), "label")
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select(
            "label",
            "vec_id",
            "n_label",
            F.round(
                F.col("d2n2").cast("double")
                / (F.col("n_label").cast("double") * F.col("n_label") * 1e12),
                6,
            ).alias("d2"),
            F.col("rk").cast("int").alias("rk"),
        )
        .orderBy("label", "rk")
    )
