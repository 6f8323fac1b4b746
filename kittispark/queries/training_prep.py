"""Training-preparation operators: the deterministic plans a
pretraining job consumes after the corpus is cleaned and packed.

- ``mlm_masking_plan`` — the BERT masked-LM corruption plan (Devlin
  et al. 2019): select 15% of token positions, and of the selected
  mask 80% / substitute 10% / keep 10%. Selection and action both
  derive from the engine-portable md5 hash of (doc, position,
  token), so the plan is REPLAYABLE — the property a distributed
  trainer needs for deterministic restarts — and the DuckDB oracle
  re-derives every decision bit-for-bit. Map-side only: one
  posexplode + hash projection + per-doc agg; no shuffle beyond the
  doc-key aggregation at any corpus size.
- ``stratified_kfold_assign`` — stratified k-fold split (k=5):
  within each language stratum documents are ordered by the
  portable hash (a deterministic shuffle) and dealt round-robin
  into folds, giving exact ±1 fold balance per stratum — what
  sklearn's StratifiedKFold guarantees, derived distributively.
  The window partitions by stratum, so the shuffle key is lang;
  for a mega-stratum (one language dominating a 100 TB corpus)
  the same dealing runs on the two-level ``global_rank`` instead —
  documented swap, same contract.

Reference parity: none — the reference (NumPy KITTI scripts) has no
training-prep surface; SURVEY.md §6 LLM-pipeline breadth.

Cross-engine discipline: every decision derives from integer hash
arithmetic (no floats anywhere); per-group outputs are integer
counts and an integer position checksum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kittispark.operators.dedup import portable_hash64
from kittispark.queries._util import t
from kittispark.registry import register

# DuckDB side of operators/dedup.py:portable_hash64 (first 15 hex
# chars of md5, base 16) — same expression curation.py uses.
_DUCK_H = "CAST(('0x' || substring(md5({col}), 1, 15)) AS UBIGINT)"


@register(
    "mlm_masking_plan",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id,
               CAST(pos AS BIGINT) AS pos,
               string_split(text, ' ')[pos] AS w
        FROM documents,
             LATERAL (SELECT unnest(generate_series(
                 1, len(string_split(text, ' ')))) AS pos) g
        WHERE text IS NOT NULL
    ),
    plan AS (
        SELECT doc_id, pos,
               {_DUCK_H.format(col="doc_id || ':' || pos || ':' || w")}
                   AS h
        FROM toks
    ),
    acted AS (
        SELECT doc_id, pos,
               h % 100 < 15 AS selected,
               CASE WHEN h % 100 < 15 THEN (h // 100) % 10 END AS act
        FROM plan
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(count(*) FILTER (selected) AS BIGINT) AS n_selected,
           CAST(count(*) FILTER (act <= 7) AS BIGINT) AS n_masked,
           CAST(count(*) FILTER (act = 8) AS BIGINT) AS n_random,
           CAST(count(*) FILTER (act = 9) AS BIGINT) AS n_kept,
           CAST(coalesce(sum(pos) FILTER (act <= 7), 0) AS BIGINT)
               AS masked_pos_sum
    FROM acted
    GROUP BY doc_id
    ORDER BY doc_id
    """,
    doc="BERT MLM corruption plan (Devlin et al. 2019 §3.1): 15% of "
    "token positions are selected, and selected positions are "
    "masked (action 0-7, 80%), substituted with a random token "
    "(action 8, 10%), or kept (action 9, 10%). Both decisions come "
    "from the engine-portable md5 hash of 'doc:pos:token' — "
    "h%100<15 selects, (h//100)%10 picks the action — so the plan "
    "replays bit-identically on any cluster, any partitioning, any "
    "restart (the determinism a distributed trainer requires; "
    "hash-derived, never RNG-state-dependent). Emits the per-doc "
    "corruption profile plus an integer checksum of masked "
    "positions, so the oracle adjudicates WHICH positions were "
    "masked, not just how many. Map-side hash projection + one "
    "doc-key aggregation — no other shuffle at any corpus size.",
    tags=("llm-pipeline", "udf-free", "aggregate"),
)
def mlm_masking_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("pos0", "w"),
    ).select(
        "doc_id", (F.col("pos0") + 1).cast("long").alias("pos"), "w"
    )
    h = portable_hash64(
        F.concat_ws(":", F.col("doc_id"), F.col("pos"), F.col("w"))
    )
    # `div` (integer division), NOT `/`: h is a 60-bit value, and a
    # double-typed h/100 loses exactness above 2^53 — the action
    # digit would silently fork from the oracle's h // 100.
    acted = toks.select("doc_id", "pos", h.alias("h")).select(
        "doc_id",
        "pos",
        (F.col("h") % 100 < 15).alias("selected"),
        F.when(
            F.col("h") % 100 < 15, F.expr("(h div 100) % 10")
        ).alias("act"),
    )
    return (
        acted.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.sum(F.when(F.col("selected"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_selected"),
            F.sum(F.when(F.col("act") <= 7, 1).otherwise(0))
            .cast("bigint")
            .alias("n_masked"),
            F.sum(F.when(F.col("act") == 8, 1).otherwise(0))
            .cast("bigint")
            .alias("n_random"),
            F.sum(F.when(F.col("act") == 9, 1).otherwise(0))
            .cast("bigint")
            .alias("n_kept"),
            F.coalesce(
                F.sum(F.when(F.col("act") <= 7, F.col("pos"))), F.lit(0)
            )
            .cast("bigint")
            .alias("masked_pos_sum"),
        )
        .orderBy("doc_id")
    )


@register(
    "stratified_kfold_assign",
    oracle=f"""
    WITH dealt AS (
        SELECT lang, n_chars,
               (row_number() OVER (
                    PARTITION BY lang
                    ORDER BY {_DUCK_H.format(col="CAST(doc_id AS VARCHAR)")}
                             NULLS FIRST,
                             doc_id NULLS FIRST) - 1) % 5 AS fold
        FROM documents
    )
    SELECT CAST(fold AS INT) AS fold,
           lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(coalesce(sum(n_chars), 0) AS BIGINT) AS sum_chars
    FROM dealt
    GROUP BY fold, lang
    ORDER BY fold, lang
    """,
    doc="Stratified 5-fold split: within each language stratum, "
    "documents are ordered by the portable md5 hash of their id (a "
    "deterministic shuffle — no RNG state) and dealt round-robin "
    "into folds, so every stratum lands within +-1 document of "
    "perfect fold balance (the sklearn StratifiedKFold contract, "
    "derived distributively). Emits the (fold, lang) audit table a "
    "cross-validation harness checks before training. One shuffle "
    "on the stratum key; the per-stratum window is "
    "stratum-partitioned, never global — for a corpus where one "
    "stratum IS the corpus, the identical dealing runs on the "
    "two-level global_rank (operators/analytics.py) instead. "
    "NULL ids hash to NULL and sort first by explicit contract on "
    "both engines.",
    tags=("llm-pipeline", "window", "aggregate"),
)
def stratified_kfold_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        portable_hash64(F.col("doc_id").cast("string")).asc_nulls_first(),
        F.col("doc_id").asc_nulls_first(),
    )
    dealt = docs.select(
        "lang",
        "n_chars",
        ((F.row_number().over(w) - 1) % 5).cast("int").alias("fold"),
    )
    return (
        dealt.groupBy("fold", "lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.coalesce(F.sum("n_chars"), F.lit(0))
            .cast("bigint")
            .alias("sum_chars"),
        )
        .orderBy("fold", "lang")
    )
