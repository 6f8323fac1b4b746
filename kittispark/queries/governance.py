"""Data-governance and curation-planning operators.

Three first-class steps of a production training-data pipeline that
sit AFTER cleaning/dedup and BEFORE the data ships to a trainer:

- ``kanonymity_audit`` — k-anonymity of the customer table under a
  quasi-identifier tuple (nation, market segment, balance bucket):
  the privacy re-identification audit (Sweeney 2002). One hash
  aggregation over the QI key at any scale; the equivalence-class
  table never leaves the executors — only the five audit scalars do.
- ``record_linkage_blocked_pairs`` — blocked fuzzy entity
  resolution between two entity tables (customers vs suppliers):
  candidate pairs share a BLOCKING KEY (nation + id-digit prefix),
  then an edit-distance comparator scores each candidate. Blocking
  is THE scale move of record linkage (Fellegi-Sunter pipelines):
  the comparator never sees the quadratic cross product, only the
  per-block candidates, and the join is a plain equi-shuffle on the
  block key.
- ``curriculum_phase_mix`` — curriculum-ordering plan: documents are
  split into 4 difficulty phases (NTILE over a length proxy) and the
  per-(phase, lang) mixing table is emitted — the artifact a
  curriculum-training scheduler consumes and the reviewer checks for
  per-phase language balance. The global NTILE is computed WITHOUT a
  single-partition window via the two-level ``global_rank`` operator
  (rank r of N -> floor((r-1)*4/N)+1 — the SQL-standard NTILE
  closed form), so the plan scales to any corpus size.

Reference parity: none — the reference (NumPy KITTI scripts,
``kitti_data_pipeline/*.py``) has no governance surface; this is
SURVEY.md §6 large-pipeline breadth.

Cross-engine discipline: every aggregate here is integer-exact
(counts, cent-scaled buckets, edit distances); the only floats are
final single-division ratios, rounded identically on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kittispark.queries._util import t
from kittispark.registry import register

# balance bucket: exact cents shifted non-negative (acctbal >= -1000
# by the data model), then truncating div == floor div — no
# engine-specific negative-division semantics anywhere.
_BUCKET_SQL = (
    "(CAST(round(c_acctbal * 100, 0) AS BIGINT) + 100000) // 100000"
)


@register(
    "kanonymity_audit",
    oracle=f"""
    WITH classes AS (
        SELECT c_nationkey, c_mktsegment,
               {_BUCKET_SQL} AS bal_bucket,
               CAST(count(*) AS BIGINT) AS sz
        FROM customer
        GROUP BY 1, 2, 3
    )
    SELECT CAST(min(sz) AS BIGINT) AS k_anonymity,
           CAST(count(*) AS BIGINT) AS n_classes,
           CAST(count(*) FILTER (sz < 5) AS BIGINT) AS n_small_classes,
           CAST(coalesce(sum(sz) FILTER (sz < 5), 0) AS BIGINT)
               AS rows_at_risk,
           CAST(coalesce(sum(sz), 0) AS BIGINT) AS n_rows
    FROM classes
    """,
    doc="k-anonymity audit (Sweeney 2002) of the customer table "
    "under the quasi-identifier tuple (nation, market segment, "
    "1000-unit balance bucket): the minimum equivalence-class size "
    "IS the table's k, and classes below k=5 are the "
    "re-identification risk surface (their row count is what a "
    "release reviewer suppresses or generalizes). One hash "
    "aggregation on the QI key + one 5-scalar fold — at 100 TB the "
    "class table stays distributed and only the audit row moves. "
    "The balance bucket rides the exact-cents grid shifted "
    "non-negative, so truncating and flooring division agree and "
    "the bucket can never fork between engines.",
    tags=("governance", "aggregate"),
)
def kanonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    cents = F.round(F.col("c_acctbal") * 100, 0).cast("long")
    shifted = cents + F.lit(100000)
    bucket = (shifted - (shifted % 100000)) / F.lit(100000)
    classes = (
        cust.select(
            "c_nationkey",
            "c_mktsegment",
            bucket.cast("long").alias("bal_bucket"),
        )
        .groupBy("c_nationkey", "c_mktsegment", "bal_bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("sz"))
    )
    small = F.col("sz") < 5
    return classes.agg(
        F.min("sz").cast("bigint").alias("k_anonymity"),
        F.count(F.lit(1)).cast("bigint").alias("n_classes"),
        F.coalesce(F.sum(F.when(small, 1).otherwise(0)), F.lit(0))
        .cast("bigint")
        .alias("n_small_classes"),
        F.coalesce(F.sum(F.when(small, F.col("sz")).otherwise(0)), F.lit(0))
        .cast("bigint")
        .alias("rows_at_risk"),
        F.coalesce(F.sum("sz"), F.lit(0)).cast("bigint").alias("n_rows"),
    )


@register(
    "record_linkage_blocked_pairs",
    oracle="""
    WITH c AS (
        SELECT c_nationkey AS nationkey,
               substring(c_name, 10, 9) AS digits,
               substring(c_name, 10, 7) AS blk
        FROM customer
    ),
    s AS (
        SELECT s_nationkey AS nationkey,
               substring(s_name, 10, 9) AS digits,
               substring(s_name, 10, 7) AS blk
        FROM supplier
    ),
    cand AS (
        SELECT c.nationkey,
               levenshtein(c.digits, s.digits) AS lev
        FROM c JOIN s ON c.nationkey = s.nationkey AND c.blk = s.blk
    )
    SELECT CAST(nationkey AS BIGINT) AS nationkey,
           CAST(count(*) AS BIGINT) AS n_candidates,
           CAST(count(*) FILTER (lev <= 2) AS BIGINT) AS n_matches,
           CAST(min(lev) AS BIGINT) AS min_lev
    FROM cand
    GROUP BY nationkey
    ORDER BY nationkey
    """,
    doc="Blocked record linkage (Fellegi-Sunter shape): customer and "
    "supplier entities are candidates only when they share the "
    "blocking key (nation, 7-digit id prefix) — the classic "
    "blocking-key design that replaces the |C|x|S| cross product "
    "with per-block candidate sets, a plain equi-shuffle join at "
    "any scale — then each candidate is scored with Levenshtein "
    "edit distance over the 9-digit entity keys and pairs at "
    "distance <= 2 count as matches. Emits the per-nation linkage "
    "profile (candidates, matches, closest distance). All-integer, "
    "engine-exact: both engines implement the classic Wagner-"
    "Fischer distance.",
    tags=("governance", "join", "text"),
)
def record_linkage_blocked_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"),
        F.substring("c_name", 10, 9).alias("c_digits"),
        F.substring("c_name", 10, 7).alias("blk"),
    )
    s = t(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"),
        F.substring("s_name", 10, 9).alias("s_digits"),
        F.substring("s_name", 10, 7).alias("blk"),
    )
    cand = c.join(s, ["nationkey", "blk"]).select(
        "nationkey",
        F.levenshtein("c_digits", "s_digits").alias("lev"),
    )
    return (
        cand.groupBy(F.col("nationkey").cast("bigint").alias("nationkey"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_candidates"),
            F.sum(F.when(F.col("lev") <= 2, 1).otherwise(0))
            .cast("bigint")
            .alias("n_matches"),
            F.min("lev").cast("bigint").alias("min_lev"),
        )
        .orderBy("nationkey")
    )


@register(
    "curriculum_phase_mix",
    oracle="""
    WITH ranked AS (
        SELECT lang, n_chars,
               ntile(4) OVER (ORDER BY n_chars NULLS FIRST,
                              doc_id NULLS FIRST) AS phase
        FROM documents
    )
    SELECT CAST(phase AS INT) AS phase,
           lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           CAST(min(n_chars) AS BIGINT) AS min_chars,
           CAST(max(n_chars) AS BIGINT) AS max_chars
    FROM ranked
    GROUP BY phase, lang
    ORDER BY phase, lang
    """,
    doc="Curriculum-ordering plan: the corpus is split into 4 "
    "difficulty phases by document length (the standard curriculum "
    "proxy), and the (phase, lang) mixing table is emitted — docs "
    "per phase per language with char budgets, the artifact a "
    "curriculum scheduler consumes and a reviewer checks for "
    "language balance drift across phases. The phase assignment is "
    "SQL-standard NTILE but computed WITHOUT a single-partition "
    "window: the two-level global_rank operator "
    "(operators/analytics.py) provides exact rank r and total N in "
    "one distributed pass, and the shared ntile_from_rank closed "
    "form maps (r, N) to a phase (the first N%4 buckets take "
    "ceil(N/4) rows, the rest floor(N/4) — larger buckets FIRST, "
    "which is what distinguishes NTILE from equi-width bucketing, "
    "all in _exact_div integer discipline). The oracle "
    "uses DuckDB's native ntile() — an independent derivation the "
    "closed form must agree with. All-integer end to end.",
    tags=("governance", "window", "llm-pipeline"),
)
def curriculum_phase_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kittispark.operators.analytics import global_rank, ntile_from_rank

    docs = t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    # NULLS FIRST explicitly on both order keys: Spark's ascending
    # default is nulls-first but DuckDB's is nulls-last, so the
    # contract is spelled out on BOTH sides (the r5 class-B lesson).
    # global_rank's total_col exists precisely for the ntile consumer
    # (ADVICE r6: reuse the shared closed form, don't re-derive it).
    ranked = global_rank(
        docs,
        F.col("n_chars").asc_nulls_first(),
        F.col("doc_id").asc_nulls_first(),
        out_col="__r",
        total_col="__n",
    )
    phase = ntile_from_rank(F.col("__r"), F.col("__n"), 4)
    return (
        ranked.select(phase.alias("phase"), "lang", "n_chars")
        .groupBy("phase", "lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
            F.min("n_chars").cast("bigint").alias("min_chars"),
            F.max("n_chars").cast("bigint").alias("max_chars"),
        )
        .orderBy("phase", "lang")
    )
