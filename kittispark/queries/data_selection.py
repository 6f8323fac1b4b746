"""Data-selection operators: the curation steps that pick WHICH
examples a training run sees.

- ``contrastive_margin_mining`` — hard-negative mining for
  contrastive training: per query vector, the most-similar SAME-label
  vector (the positive) and the most-similar DIFFERENT-label vector
  (the hard negative), with the margin between them. Rows with tiny
  or negative margins are exactly the pairs a contrastive run needs
  (and the labeling errors a curation pass reviews). Broadcast
  queries x corpus scan — the cosine_topk shape with a label-aware
  double ranking.
- ``farthest_point_coreset`` — k-center greedy coreset selection
  (Gonzalez 1985; the geometric "pick diverse examples" primitive
  behind coreset data pruning): seed with the lowest id, then k-1
  rounds of "take the point farthest from the selected set",
  maintaining a RUNNING min-distance column so each round folds in
  only the newly selected center — one O(N) scan + 1-row argmax
  collect per round (the bounded-driver-state pattern of the BPE
  learner / connected components); distances ride the exact
  integer-micro lattice so both engines agree bit-for-bit.
- ``dataset_card_report`` — the one-row dataset-card summary
  (docs, languages, sources, chars, exact-duplicate rate, median
  length) that accompanies a corpus release.

Reference parity: none — SURVEY.md §6 LLM-pipeline breadth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kittispark.operators.similarity import as_double, dot, norm
from kittispark.queries._util import t
from kittispark.registry import register

_DIM = 64
_N_QUERIES = 30
_CORESET_K = 6

# cosine sim, DuckDB side (NULL on zero norms — excluded by both sides)
_SIM_DUCK = (
    "list_dot_product(qv, cv) / NULLIF(sqrt(list_dot_product(qv, qv))"
    " * sqrt(list_dot_product(cv, cv)), 0)"
)


@register(
    "contrastive_margin_mining",
    oracle=f"""
    WITH e AS (
        SELECT vec_id, label, embedding::DOUBLE[] AS v
        FROM embeddings
        WHERE embedding IS NOT NULL AND label IS NOT NULL
    ),
    q AS (
        SELECT vec_id AS query_id, label AS qlabel, v AS qv
        FROM e WHERE vec_id < {_N_QUERIES}
    ),
    scored AS (
        SELECT query_id, qlabel, neighbor_id, clabel,
               {_SIM_DUCK.format()} AS sim
        FROM (
            SELECT q.query_id, q.qlabel, q.qv,
                   c.vec_id AS neighbor_id, c.label AS clabel, c.v AS cv
            FROM e c CROSS JOIN q
            WHERE q.query_id <> c.vec_id
        )
    ),
    pos AS (
        SELECT query_id, qlabel, neighbor_id AS pos_id, sim AS pos_raw,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY sim DESC, neighbor_id) AS rk
        FROM scored WHERE clabel = qlabel AND sim IS NOT NULL
    ),
    neg AS (
        SELECT query_id, neighbor_id AS neg_id, sim AS neg_raw,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY sim DESC, neighbor_id) AS rk
        FROM scored WHERE clabel <> qlabel AND sim IS NOT NULL
    )
    SELECT p.query_id, p.qlabel AS label,
           p.pos_id, round(p.pos_raw, 4) + 0.0 AS pos_sim,
           n.neg_id, round(n.neg_raw, 4) + 0.0 AS neg_sim,
           round(p.pos_raw - n.neg_raw, 4) + 0.0 AS margin
    FROM pos p JOIN neg n USING (query_id)
    WHERE p.rk = 1 AND n.rk = 1
    ORDER BY query_id
    """,
    doc="Hard-negative mining for contrastive training: for each of "
    "30 query vectors, the most-similar SAME-label neighbor (the "
    "positive) and the most-similar DIFFERENT-label neighbor (the "
    "hard negative), with margin = pos_sim - neg_sim. Small or "
    "negative margins are the informative training pairs — and the "
    "label-error review queue. One broadcast of the query set into "
    "a single corpus scan (the cosine_topk shape), then two "
    "label-partitioned rankings; at 100 TB the corpus side stays a "
    "scan, never a pairwise join. Zero-norm vectors excluded via "
    "the NULLIF contract on both engines; margin rounded once at "
    "emission from the raw doubles.",
    tags=("similarity", "llm-pipeline"),
)
def contrastive_margin_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull() & F.col("label").isNotNull()
    )
    q = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("qlabel"),
        as_double("embedding").alias("qv"),
    ).withColumn("qn", norm("qv"))
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("clabel"),
        as_double("embedding").alias("cv"),
    ).withColumn("cn", norm("cv"))
    scored = c.join(
        F.broadcast(q), F.col("query_id") != F.col("neighbor_id")
    ).select(
        "query_id",
        "qlabel",
        "neighbor_id",
        "clabel",
        (
            dot("qv", "cv")
            / F.nullif(F.col("qn") * F.col("cn"), F.lit(0.0))
        ).alias("sim"),
    ).filter(F.col("sim").isNotNull())
    # ONE partial/final hash agg replaces the former two
    # query_id-partitioned rank windows + their SortMergeJoin (r11,
    # guide §2.3 "aggregate before you shuffle"): the pos/neg filter
    # split duplicated the broadcast corpus scan (the differing
    # filters defeated exchange reuse — 4 parquet scans, 2 window
    # sorts, 1 SMJ in the before plan), while max_by over the
    # lexicographic (sim, -neighbor_id) key is EXACTLY
    # row_number(sim DESC, neighbor_id ASC) = 1: same double total
    # order, integer tiebreak, bit-identical winners. Map-side
    # partial aggregation reduces each task to one row per query
    # before the (30-group) shuffle — nothing corpus-sized crosses.
    pos_key = F.when(
        F.col("clabel") == F.col("qlabel"),
        F.struct(F.col("sim"), (-F.col("neighbor_id")).alias("nid")),
    )
    neg_key = F.when(
        F.col("clabel") != F.col("qlabel"),
        F.struct(F.col("sim"), (-F.col("neighbor_id")).alias("nid")),
    )
    cand = F.struct(F.col("neighbor_id"), F.col("sim"))
    best = scored.groupBy("query_id", F.col("qlabel").alias("label")).agg(
        F.max(pos_key.isNotNull()).alias("__hp"),
        F.max_by(cand, pos_key).alias("__p"),
        F.max(neg_key.isNotNull()).alias("__hn"),
        F.max_by(cand, neg_key).alias("__n"),
    )
    return (
        # inner-join semantics of the old pos JOIN neg: a query with
        # no same-label or no different-label neighbor emits nothing
        best.filter(F.col("__hp") & F.col("__hn"))
        .select(
            "query_id",
            "label",
            F.col("__p.neighbor_id").alias("pos_id"),
            # + 0.0 on all three: cosine sims and margins can sit
            # within 5e-5 of zero on the negative side, where DuckDB's
            # round emits -0.0 and Spark's +0.0 (the r9 agghash-tier
            # latent class; see rescale_by_percentile)
            (F.round(F.col("__p.sim"), 4) + 0.0).alias("pos_sim"),
            F.col("__n.neighbor_id").alias("neg_id"),
            (F.round(F.col("__n.sim"), 4) + 0.0).alias("neg_sim"),
            (F.round(F.col("__p.sim") - F.col("__n.sim"), 4) + 0.0).alias(
                "margin"
            ),
        )
        .orderBy("query_id")
    )


# integer-micro squared L2, Spark side: DECIMAL-free — diffs are
# <= ~2e6 per dim, squares <= 4e12, 64-dim sums <= 2.6e14, and even
# k rounds of mins stay far inside int64.
def _micro(col):
    return F.expr(
        f"transform({col}, x -> CAST(round(x * 1000000, 0) AS BIGINT))"
    )


_D2_SPARK = (
    "aggregate(sequence(0, {n}), cast(0 as bigint), (acc, i) -> "
    "acc + (element_at({a}, i + 1) - element_at({b}, i + 1))"
    " * (element_at({a}, i + 1) - element_at({b}, i + 1)))"
)
_D2_DUCK = (
    "list_sum(list_transform(range({n1}), i -> "
    "({a}[CAST(i + 1 AS INT)] - {b}[CAST(i + 1 AS INT)])"
    " * ({a}[CAST(i + 1 AS INT)] - {b}[CAST(i + 1 AS INT)])))"
)


def _coreset_oracle(k: int = _CORESET_K) -> str:
    d2 = _D2_DUCK.format(n1=_DIM, a="v.vn", b="sv.vn")
    parts = [f"""
    v AS (
        SELECT vec_id,
               list_transform(embedding::DOUBLE[],
                              x -> CAST(round(x * 1000000) AS BIGINT)) AS vn
        FROM embeddings WHERE embedding IS NOT NULL
    ),
    sel1 AS (
        SELECT 1 AS r, min(vec_id) AS vec_id, CAST(NULL AS BIGINT) AS d2_micro
        FROM v
        HAVING count(*) > 0
    )"""]
    for r in range(2, k + 1):
        prev = " UNION ALL ".join(f"SELECT vec_id FROM sel{i}" for i in range(1, r))
        parts.append(f""",
    dm{r} AS (
        SELECT v.vec_id, min({d2}) AS dm
        FROM v JOIN v sv ON sv.vec_id IN ({prev})
        WHERE v.vec_id NOT IN ({prev})
        GROUP BY v.vec_id
    ),
    sel{r} AS (
        SELECT {r} AS r, vec_id, CAST(dm AS BIGINT) AS d2_micro
        FROM dm{r} ORDER BY dm DESC, vec_id LIMIT 1
    )""")
    union = " UNION ALL ".join(f"SELECT * FROM sel{i}" for i in range(1, k + 1))
    return (
        "WITH " + "".join(parts)
        + f" SELECT CAST(r AS INT) AS selection_round, vec_id, d2_micro"
        f" FROM ({union}) ORDER BY selection_round"
    )


@register(
    "farthest_point_coreset",
    oracle=_coreset_oracle(),
    doc="k-center greedy coreset selection (Gonzalez 1985) in its "
    "canonical INCREMENTAL form — the farthest-point-sampling "
    "primitive behind diversity-driven training-data pruning: seed "
    "with the lowest vec_id, then 5 rounds of 'take the point whose "
    "distance to the nearest already-selected point is largest' "
    "(ties to the lower id). The state is a running per-point "
    "min-distance column: each round broadcasts ONLY the newly "
    "selected center (one 64-dim row, collected with the argmax) "
    "into one corpus scan and folds it in with least(dmin, d2) — "
    "O(N) work per round regardless of how many centers are "
    "already selected, vs O(|selected|*N) for re-scoring against "
    "the whole set (VERDICT r6 #3). Round state is pinned via "
    "materialize() (the BPE-learner / connected-components "
    "pattern); driver state stays bounded at one (id, dmin, "
    "center-vector) row per round. Distances are exact squared L2 "
    "on the integer-micro lattice (max 64 * (2e6)^2 = 2.6e14, deep "
    "inside int64), so argmax ties can never fork between engines. "
    "The oracle replays all k rounds with chained CTEs from a "
    "generator, the same learn-replay discipline as BPE.",
    tags=("similarity", "llm-pipeline", "iterative"),
)
def farthest_point_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kittispark.operators.util import materialize, release

    emb = t(spark, sf_dir, "embeddings").filter(F.col("embedding").isNotNull())
    v = emb.select("vec_id", _micro("embedding").alias("vn"))
    # asc_nulls_last: Spark's plain orderBy is NULLS FIRST, so a NULL
    # vec_id row would become the seed, empty the state via
    # vec_id != NULL, and collapse the result — while the oracle's
    # NULL-ignoring min(vec_id) still picks a real seed (ADVICE r7).
    seed = v.orderBy(F.col("vec_id").asc_nulls_last()).limit(1).collect()
    if not seed:  # empty corpus: no seed, empty result
        return spark.createDataFrame(
            [], "selection_round int, vec_id long, d2_micro long"
        )
    rows = [(1, seed[0].vec_id, None)]
    d2 = F.expr(_D2_SPARK.format(n=_DIM - 1, a="vn", b="svn"))

    def center_lit(vn_values) -> F.Column:
        # the new center as a 64-literal bigint array — no join, the
        # center folds into the scan as a constant (codegen-friendly).
        # Built as ONE parsed expression: the per-literal Column form
        # cost ~130 py4j round-trips per round of driver time (the
        # r12 one-parse discipline; values identical — 123L parses to
        # the same int64 literal the lit().cast() pair folded to).
        return F.expr(
            "array(" + ", ".join(f"{int(x)}L" for x in vn_values) + ")"
        )

    # round-1 state: every non-seed point, dmin = d2 to the seed
    state = materialize(
        v.filter(F.col("vec_id") != seed[0].vec_id)
        .select("vec_id", "vn", center_lit(seed[0].vn).alias("svn"))
        .select("vec_id", "vn", d2.alias("dmin"))
    )
    for r in range(2, _CORESET_K + 1):
        # argmax of the running min-distance; ship the winner's vn
        # back with it (one bounded row) so the next fold needs no
        # second lookup scan.
        cand = state.orderBy(F.col("dmin").desc(), "vec_id").limit(1).collect()
        if not cand:
            break
        rows.append((r, cand[0].vec_id, int(cand[0].dmin)))
        if r == _CORESET_K:
            break  # no fold needed after the final selection
        prev_state = state
        state = materialize(
            state.filter(F.col("vec_id") != cand[0].vec_id)
            .select("vec_id", "vn", "dmin", center_lit(cand[0].vn).alias("svn"))
            .select(
                "vec_id", "vn", F.least(F.col("dmin"), d2).alias("dmin")
            )
        )
        release(prev_state)  # dead round's pinned frontier (ADVICE r7)
    release(state)  # selections are collected; the last frontier is dead
    return spark.createDataFrame(
        rows, "selection_round int, vec_id long, d2_micro long"
    ).orderBy("selection_round")


@register(
    "dataset_card_report",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(coalesce(sum(n_chars), 0) AS BIGINT) AS total_chars,
           round(1.0 - CAST(count(DISTINCT md5(text)) AS DOUBLE)
                 / NULLIF(count(text), 0), 6) AS exact_dup_rate,
           round(median(n_chars), 2) AS median_chars
    FROM documents
    """,
    doc="The one-row dataset card that accompanies a corpus release: "
    "document / language / source counts, total characters, the "
    "exact-duplicate rate (1 - distinct md5 texts / non-null "
    "texts, NULLIF-guarded for the empty corpus), and the median "
    "document length (interpolated median, the median_mode_agg "
    "convention). One aggregation pass; the distinct counts are "
    "the only shuffles. The numbers a release reviewer checks "
    "against SCALING.md's dedup and mixture tables before shipping.",
    tags=("governance", "aggregate", "llm-pipeline"),
)
def dataset_card_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return docs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.countDistinct("lang").cast("bigint").alias("n_langs"),
        F.countDistinct("source").cast("bigint").alias("n_sources"),
        F.coalesce(F.sum("n_chars"), F.lit(0))
        .cast("bigint")
        .alias("total_chars"),
        F.round(
            1.0
            - F.countDistinct(F.md5("text")).cast("double")
            / F.nullif(F.count("text"), F.lit(0)),
            6,
        ).alias("exact_dup_rate"),
        F.round(F.median("n_chars"), 2).alias("median_chars"),
    )
