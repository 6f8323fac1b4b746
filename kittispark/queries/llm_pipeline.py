"""End-to-end LLM training-data pipeline operators beyond the
per-family queries: sequence packing (the pretraining batch layout),
decontamination (train/eval n-gram overlap), and the composed
corpus-prep pipeline (dedup -> quality filter -> split -> rollup).

All three are pure JVM column expressions / equi-joins with full
DuckDB oracle twins — value-adjudicated by the driver like every
other component.
"""

from __future__ import annotations

import atexit

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kittispark.registry import register
from kittispark.queries._util import t
from kittispark.operators.dedup import shingle_rows
from kittispark.operators.text import pack_sequences


@register(
    "sequence_pack_chunks",
    oracle="""
    WITH tok AS (
        SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
        FROM documents
    ),
    c AS (
        SELECT doc_id, n_tokens,
               sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
                   - n_tokens AS cb
        FROM tok
    )
    SELECT doc_id,
           CAST(n_tokens AS INT) AS n_tokens,
           CAST(cb // 256 AS BIGINT) AS first_seq,
           CAST((cb + n_tokens - 1) // 256 AS BIGINT) AS last_seq,
           CAST((cb + n_tokens - 1) // 256 - cb // 256 + 1 AS BIGINT) AS n_seqs
    FROM c
    """,
    doc="Concat-then-chunk sequence packing (GPT-style pretraining "
    "layout): docs laid end to end in id order, token stream cut "
    "into 256-token sequences; per doc the first/last sequence "
    "spanned. Spark side computes the global ordered cumsum WITHOUT "
    "a single-task global window (bucketed two-pass: partitioned "
    "window + tiny bucket-offset broadcast — "
    "operators.text.pack_sequences); the oracle uses the plain "
    "global window, so hash-match proves the distributed cumsum "
    "equals the sequential one.",
    tags=("llm-pipeline", "text"),
)
def sequence_pack_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return pack_sequences(docs, budget=256, bucket_width=64)


@register(
    "contamination_overlap",
    oracle="""
    WITH sh AS (
        SELECT DISTINCT doc_id,
               unnest(list_transform(
                   generate_series(1, greatest(len(toks) - 4, 0)),
                   i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]
                        || ' ' || toks[i + 3] || ' ' || toks[i + 4]
               )) AS shingle
        FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    ),
    hits AS (
        SELECT e.doc_id AS eval_doc_id,
               count(DISTINCT t.doc_id) AS n_train_overlap
        FROM sh e JOIN sh t
          ON e.shingle = t.shingle AND e.doc_id >= 450 AND t.doc_id < 450
        GROUP BY 1
    )
    SELECT d.doc_id AS eval_doc_id,
           coalesce(h.n_train_overlap, 0) AS n_train_overlap,
           coalesce(h.n_train_overlap, 0) > 0 AS contaminated
    FROM documents d LEFT JOIN hits h ON h.eval_doc_id = d.doc_id
    WHERE d.doc_id >= 450
    """,
    doc="Decontamination check — the train/eval overlap sweep every "
    "pretraining corpus needs: eval docs (id >= 450) are flagged "
    "when they share any 5-gram with a training doc. Inverted-index "
    "shape (distinct shingles -> equi-join on shingle), so cost is "
    "output-bounded, not |train| x |eval|; the oracle reproduces the "
    "shingle join in SQL, including zero-overlap eval rows.",
    tags=("llm-pipeline", "dedup"),
)
def contamination_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    sh_eval = (
        shingle_rows(docs.filter(F.col("doc_id") >= 450), n=5)
        .distinct()
        .select(F.col("doc_id").alias("eval_doc_id"), "sh")
    )
    sh_train = (
        shingle_rows(docs.filter(F.col("doc_id") < 450), n=5)
        .distinct()
        .select(F.col("doc_id").alias("train_doc_id"), "sh")
    )
    hits = (
        sh_eval.join(sh_train, "sh")
        .groupBy("eval_doc_id")
        .agg(F.count_distinct("train_doc_id").alias("n_train_overlap"))
    )
    evals = docs.filter(F.col("doc_id") >= 450).select(
        F.col("doc_id").alias("eval_doc_id")
    )
    return evals.join(hits, "eval_doc_id", "left").select(
        "eval_doc_id",
        F.coalesce("n_train_overlap", F.lit(0)).alias("n_train_overlap"),
        (F.coalesce("n_train_overlap", F.lit(0)) > 0).alias("contaminated"),
    )


@register(
    "llm_corpus_prep",
    oracle="""
    WITH survivors AS (
        SELECT * FROM documents d
        WHERE doc_id = (SELECT min(doc_id) FROM documents d2
                        WHERE d2.text = d.text)
    ),
    quality AS (
        SELECT *, len(string_split(text, ' ')) AS n_tokens,
               CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                   / len(string_split(text, ' ')) AS ttr
        FROM survivors
    ),
    kept AS (
        SELECT *,
               instr('0123456789abcdef',
                     substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 < 13
                   AS is_train
        FROM quality
        WHERE n_tokens >= 5 AND ttr >= 0.3
    )
    SELECT lang, is_train,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           round(avg(n_tokens), 6) AS avg_tokens
    FROM kept GROUP BY lang, is_train
    """,
    doc="The composed corpus-prep pipeline a pretraining run actually "
    "executes, end to end in ONE lazy plan: exact-dedup survivors "
    "(min-id per text, window-free semi-join) -> quality filter "
    "(min length + type/token ratio) -> deterministic md5-nibble "
    "train/holdout split -> per (lang, split) doc/token rollup. "
    "Every stage is a previously-verified operator; this entry "
    "verifies their COMPOSITION (column flow, filter ordering, "
    "join keys) against a single SQL twin.",
    tags=("llm-pipeline", "text", "dedup"),
)
def llm_corpus_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kittispark.operators.text import tokens_col

    docs = t(spark, sf_dir, "documents")
    keep = docs.groupBy("text").agg(F.min("doc_id").alias("doc_id"))
    survivors = docs.join(keep, ["text", "doc_id"], "left_semi")
    toks = tokens_col("text")
    quality = survivors.select(
        "doc_id",
        "lang",
        F.size(toks).alias("n_tokens"),
        (
            F.size(F.array_distinct(toks)).cast("double") / F.size(toks)
        ).alias("ttr"),
    )
    bucket = (
        F.instr(
            F.lit("0123456789abcdef"),
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1),
        )
        - 1
    )
    kept = quality.filter((F.col("n_tokens") >= 5) & (F.col("ttr") >= 0.3))
    return (
        kept.withColumn("is_train", bucket < 13)
        .groupBy("lang", "is_train")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.round(F.avg("n_tokens"), 6).alias("avg_tokens"),
        )
    )


@register(
    "corpus_epoch_plan",
    oracle="""
    WITH s AS (
        SELECT lang,
               count(*) AS n_docs,
               sum(len(string_split(text, ' '))) AS n_tokens
        FROM documents GROUP BY lang
    ),
    tot AS (
        -- z as an exact scaled-int sum: sqrt() is IEEE-identical per
        -- language, but a float SUM of the sqrts is accumulation-
        -- order-dependent; summing round(sqrt*1e6) in int64 makes z
        -- engine-exact so floor() below cannot flip at a boundary
        SELECT CAST(sum(CAST(round(sqrt(CAST(n_tokens AS DOUBLE)) * 1000000,
                              0) AS BIGINT)) AS BIGINT) AS zs,
               CAST(sum(n_tokens) AS BIGINT) AS total_tokens
        FROM s
    ),
    rf AS (
        SELECT lang,
               greatest(CAST(floor(
                   ((sqrt(CAST(n_tokens AS DOUBLE))
                     / (CAST(zs AS DOUBLE) / 1000000))
                    / (CAST(n_tokens AS DOUBLE)
                       / CAST(total_tokens AS DOUBLE))) * 2
               ) AS BIGINT), 1) AS repeat_factor
        FROM s, tot
    ),
    epoch AS (
        SELECT d.lang, d.doc_id, g.rep
        FROM documents d
        JOIN rf USING (lang),
             LATERAL (SELECT unnest(generate_series(1, rf.repeat_factor))
                      AS rep) g
    )
    SELECT lang,
           CAST(max(rep) AS BIGINT) AS repeat_factor,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS epoch_rows
    FROM epoch GROUP BY lang
    """,
    doc="Epoch materialization plan for a temperature-balanced "
    "training mixture: the per-language upsample factor (alpha=0.5, "
    "same algebra as mixture_temperature_weights) is integerized to "
    "a repeat factor (floor(2x), min 1), every document is actually "
    "EXPLODED into its epoch repetitions (sequence/generate_series — "
    "the row stream a packing/shuffling stage consumes), and the "
    "result is folded back to per-language accounting. Counts only "
    "in the output, so adjudication is exact; the repeat join is a "
    "broadcast of one row per language. At 100 TB the epoch stream "
    "feeds sequence packing directly instead of re-aggregating.",
    tags=("llm-pipeline",),
)
def corpus_epoch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kittispark.operators.text import tokens_col

    docs = t(spark, sf_dir, "documents")
    s = docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(tokens_col("text"))).alias("n_tokens"),
    )
    # z summed as exact scaled int64 (see oracle comment): a float sum
    # of sqrts is the order-dependent class the r3/r4 sweeps chase
    tot = s.agg(
        F.sum(
            F.round(F.sqrt(F.col("n_tokens").cast("double")) * 1_000_000, 0)
            .cast("long")
        ).alias("zs"),
        F.sum("n_tokens").alias("total_tokens"),
    )
    w = F.sqrt(F.col("n_tokens").cast("double")) / (
        F.col("zs").cast("double") / 1_000_000
    )
    natural = F.col("n_tokens").cast("double") / F.col("total_tokens").cast(
        "double"
    )
    rf = (
        s.crossJoin(F.broadcast(tot))
        .select(
            "lang",
            F.greatest(
                F.floor((w / natural) * 2).cast("long"), F.lit(1)
            ).alias("repeat_factor"),
        )
    )
    epoch = docs.join(F.broadcast(rf), "lang").select(
        "lang",
        "doc_id",
        F.explode(F.sequence(F.lit(1), F.col("repeat_factor"))).alias("rep"),
    )
    return epoch.groupBy("lang").agg(
        F.max("rep").alias("repeat_factor"),
        F.count_distinct("doc_id").alias("n_docs"),
        F.count(F.lit(1)).alias("epoch_rows"),
    )


# --------------------------------------------------------------------------
# JSONL corpus interchange — written once per process+sf_dir, like
# the persisted IVF / MinHash indexes and the KITTI file fixtures.
# --------------------------------------------------------------------------

_JSONL_ROOT: dict[str, str] = {}


def _cleanup_jsonl_roots() -> None:
    import shutil

    for root in _JSONL_ROOT.values():
        shutil.rmtree(root, ignore_errors=True)


atexit.register(_cleanup_jsonl_roots)


def _jsonl_path(spark: SparkSession, sf_dir: str) -> str:
    import os
    import tempfile

    cached = _JSONL_ROOT.get(sf_dir)
    if cached is not None and os.path.isdir(cached):
        return cached
    root = tempfile.mkdtemp(prefix="kittispark-jsonl-")
    (
        t(spark, sf_dir, "documents")
        .select("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite")
        .json(root)
    )
    _JSONL_ROOT[sf_dir] = root
    return root


@register(
    "jsonl_corpus_roundtrip",
    oracle="""
    SELECT doc_id, lang, source, n_chars,
           CAST(length(text) AS INT) AS text_len,
           md5(text) AS text_md5
    FROM documents
    """,
    doc="JSONL (line-delimited JSON) corpus roundtrip — the dominant "
    "interchange format for LLM training corpora: the documents table "
    "is written once per process through Spark's native distributed "
    "JSON sink (one file per partition, no driver funnel) and read "
    "back through the JSON source with an EXPLICIT schema (production "
    "discipline: schema inference is a second full pass over 100 TB). "
    "The query emits every roundtripped row with an md5 digest of the "
    "text; the oracle recomputes the same projection straight from "
    "the parquet table, so a hash match proves every document body "
    "byte (including JSON-escaped newlines/quotes/unicode), id, and "
    "metadata field survived the serialize/parse cycle exactly. At "
    "100 TB both sides are embarrassingly parallel scans — the sink "
    "and source are per-partition with zero shuffles.",
    tags=("llm-pipeline", "text", "source"),
)
def jsonl_corpus_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    back = spark.read.schema(schema).json(_jsonl_path(spark, sf_dir))
    return back.select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        F.length("text").alias("text_len"),
        F.md5("text").alias("text_md5"),
    )


@register(
    "corpus_shard_manifest",
    oracle="""
    WITH r AS (
        SELECT doc_id, n_chars,
               row_number() OVER (ORDER BY n_chars DESC, doc_id) AS rk
        FROM documents
    )
    SELECT CAST((rk - 1) % 16 AS INT) AS shard_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(min(rk) AS BIGINT) AS first_rank,
           CAST(max(rk) AS BIGINT) AS last_rank
    FROM r GROUP BY 1
    """,
    doc="Balanced output-shard manifest — the write-planning step "
    "before materializing a training corpus: documents are ranked "
    "globally by size (n_chars desc, doc_id tiebreak) and dealt "
    "round-robin into 16 shards, the classic greedy balancer that "
    "bounds shard skew to one max-document (a naive hash split "
    "leaves the largest docs free to pile into one shard, and one "
    "fat shard gates the whole training read). The global rank uses "
    "operators.analytics.global_rank — repartitionByRange + "
    "per-partition row_number + a broadcast two-level prefix-sum "
    "lift, NO single-task global window, so the ranking itself "
    "scales; the oracle replays rank, deal, and per-shard totals "
    "with a plain window.",
    tags=("llm-pipeline", "sampling"),
)
def corpus_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kittispark.operators.analytics import global_rank

    docs = t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    ranked = global_rank(
        docs, F.col("n_chars").desc(), F.col("doc_id").asc(), out_col="rk"
    )
    return (
        ranked.select(
            "n_chars", "rk", ((F.col("rk") - 1) % 16).cast("int").alias("shard_id")
        )
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("rk").alias("first_rank"),
            F.max("rk").alias("last_rank"),
        )
    )


_CSV_ROOT: dict[str, str] = {}


def _cleanup_csv_roots() -> None:
    import shutil

    for root in _CSV_ROOT.values():
        shutil.rmtree(root, ignore_errors=True)


atexit.register(_cleanup_csv_roots)


def _csv_path(spark: SparkSession, sf_dir: str) -> str:
    import os
    import tempfile

    cached = _CSV_ROOT.get(sf_dir)
    if cached is not None and os.path.isdir(cached):
        return cached
    root = tempfile.mkdtemp(prefix="kittispark-csv-")
    (
        t(spark, sf_dir, "documents")
        .select("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite")
        .option("header", True)
        .option("quote", '"')
        .option("escape", '"')  # RFC-4180 quote doubling
        .option("nullValue", "\\N")  # keep NULL distinct from ''
        .option("emptyValue", '""')
        # the CSV WRITER trims cell whitespace by default (univocity
        # legacy) — a whitespace-only document would come back empty
        .option("ignoreLeadingWhiteSpace", False)
        .option("ignoreTrailingWhiteSpace", False)
        .csv(root)
    )
    _CSV_ROOT[sf_dir] = root
    return root


@register(
    "csv_corpus_roundtrip",
    oracle="""
    SELECT doc_id, lang, source, n_chars,
           CAST(length(text) AS INT) AS text_len,
           md5(text) AS text_md5
    FROM documents
    """,
    doc="CSV corpus roundtrip — the other ubiquitous corpus delivery "
    "format, and a deliberate contrast with jsonl_corpus_roundtrip: "
    "document text with embedded newlines forces RFC-4180 quoting "
    "(quote-doubling escape) and multiLine=true on read, which makes "
    "each CSV file NON-SPLITTABLE — one task per file regardless of "
    "size, versus JSONL's line-splittable parallel scan; that "
    "asymmetry is exactly why JSONL is the 100 TB interchange choice "
    "and CSV is an ingest-then-convert format. NULL-vs-empty-string "
    "fidelity needs the explicit nullValue sentinel ('\\\\N') and "
    "emptyValue ('\"\"') write options — the CSV defaults conflate "
    "the two (probed: a default roundtrip turns '' into NULL). Same "
    "md5 adjudication as the JSONL twin: a hash match proves every "
    "body byte, id, and metadata field survived quoting, escaping, "
    "and the multiLine parse.",
    tags=("llm-pipeline", "text", "source"),
)
def csv_corpus_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    back = (
        spark.read.schema(schema)
        .option("header", True)
        .option("quote", '"')
        .option("escape", '"')
        .option("multiLine", True)
        .option("nullValue", "\\N")
        .csv(_csv_path(spark, sf_dir))
    )
    return back.select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        F.length("text").alias("text_len"),
        F.md5("text").alias("text_md5"),
    )


_ORC_ROOT: dict[str, str] = {}


def _cleanup_orc_roots() -> None:
    import shutil

    for root in _ORC_ROOT.values():
        shutil.rmtree(root, ignore_errors=True)


atexit.register(_cleanup_orc_roots)


def _orc_path(spark: SparkSession, sf_dir: str) -> str:
    import os
    import tempfile

    cached = _ORC_ROOT.get(sf_dir)
    if cached is not None and os.path.isdir(cached):
        return cached
    root = tempfile.mkdtemp(prefix="kittispark-orc-")
    (
        t(spark, sf_dir, "documents")
        .select("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite")
        .orc(root)
    )
    _ORC_ROOT[sf_dir] = root
    return root


@register(
    "orc_corpus_roundtrip",
    oracle="""
    SELECT doc_id, lang, source, n_chars,
           CAST(length(text) AS INT) AS text_len,
           md5(text) AS text_md5
    FROM documents
    WHERE n_chars >= 64
    """,
    doc="ORC corpus roundtrip — completes the at-rest columnar half "
    "of the interchange matrix (parquet is the native test fixture; "
    "JSONL/CSV are the row interchange twins): the documents table "
    "is written through Spark's native ORC sink and read back with "
    "a pushed predicate. Unlike the CSV twin, ORC stays fully "
    "SPLITTABLE with embedded newlines (stripes carry their own "
    "index; no multiLine parse), and the n_chars >= 64 filter "
    "reaches the reader as a real pushdown — ORC row-group stats "
    "skip stripes the way parquet row groups do, which is the "
    "mechanism that makes a 100 TB at-rest scan selective instead "
    "of exhaustive. Same md5 adjudication as the JSONL/CSV twins: "
    "a hash match proves every surviving body byte, id, and "
    "metadata field crossed the columnar encode/decode exactly.",
    tags=("llm-pipeline", "text", "source"),
)
def orc_corpus_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    back = spark.read.orc(_orc_path(spark, sf_dir))
    return back.filter(F.col("n_chars") >= 64).select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        F.length("text").alias("text_len"),
        F.md5("text").alias("text_md5"),
    )


@register(
    "length_grouped_batches",
    oracle="""
    WITH tok AS (
        SELECT doc_id, len(string_split(text, ' ')) AS n FROM documents
    ),
    r AS (
        SELECT doc_id, n,
               row_number() OVER (ORDER BY n DESC, doc_id) AS rk
        FROM tok
    ),
    b AS (SELECT CAST((rk - 1) // 32 AS BIGINT) AS batch_id, n FROM r)
    SELECT batch_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(max(n) AS BIGINT) AS max_len,
           CAST(sum(n) AS BIGINT) AS total_tokens,
           CAST(count(*) * max(n) - sum(n) AS BIGINT) AS padding_waste,
           round(CAST(count(*) * max(n) - sum(n) AS DOUBLE)
                 / (count(*) * max(n)), 6) AS waste_frac
    FROM b GROUP BY batch_id
    """,
    doc="Length-grouped batch packing with padding-waste accounting "
    "(the group_by_length training-efficiency lever): documents are "
    "totally ordered by token count (doc_id tiebreak), dealt into "
    "fixed-size batches of 32, and each batch reports its max "
    "length, total tokens, absolute padding waste (what a "
    "pad-to-batch-max collator burns), and waste fraction — "
    "length-sorted batching drives waste_frac toward 0 where random "
    "batching pays the corpus length variance on every batch. The "
    "global ordering uses operators.analytics.global_rank "
    "(repartitionByRange + per-partition row_number + a broadcast "
    "prefix-sum lift — NO single-partition window), so the ranking "
    "itself scales; everything after is one partial+final agg on "
    "batch_id.",
    tags=("llm-pipeline", "sampling"),
)
def length_grouped_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kittispark.operators.analytics import global_rank
    from kittispark.operators.text import tokens_col

    docs = t(spark, sf_dir, "documents").select(
        "doc_id", F.size(tokens_col("text")).alias("n")
    )
    ranked = global_rank(
        docs, F.col("n").desc(), F.col("doc_id").asc(), out_col="rk"
    )
    batched = ranked.select(
        "n", ((F.col("rk") - 1) / 32).cast("long").alias("batch_id")
    )
    agg = batched.groupBy("batch_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.max("n").cast("long").alias("max_len"),
        F.sum("n").alias("total_tokens"),
    )
    waste = F.col("n_docs") * F.col("max_len") - F.col("total_tokens")
    return agg.select(
        "batch_id",
        "n_docs",
        "max_len",
        "total_tokens",
        waste.alias("padding_waste"),
        F.round(waste / (F.col("n_docs") * F.col("max_len")), 6).alias(
            "waste_frac"
        ),
    )


@register(
    "split_leakage_audit",
    oracle="""
    WITH b AS (
        SELECT md5(text) AS digest, doc_id,
               CASE WHEN instr('0123456789abcdef',
                        substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 < 13
                    THEN 1 ELSE 0 END AS tr
        FROM documents WHERE text IS NOT NULL
    ),
    g AS (
        SELECT digest,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(tr) AS BIGINT) AS n_train,
               CAST(count(*) - sum(tr) AS BIGINT) AS n_holdout,
               array_to_string(list_sort(list(doc_id)), ',') AS doc_ids
        FROM b GROUP BY digest
    )
    SELECT digest, n_docs, n_train, n_holdout, doc_ids
    FROM g WHERE n_train > 0 AND n_holdout > 0
    ORDER BY digest
    """,
    doc="Split-leakage audit: exact-duplicate clusters (md5 text "
    "digest) that span BOTH sides of the deterministic hash split "
    "(train = first md5 nibble of doc_id < 13, the hash_split_sample "
    "convention) — each emitted row is a verbatim eval-set "
    "contamination: the same text trains AND evaluates. This is the "
    "integrity gate run after split assignment and before training; "
    "it composes the dedup digest convention with the split "
    "convention so the two certified pieces audit each other. "
    "Member ids are emitted as a sorted comma-joined string "
    "(engine-portable serialization, the quality_filter reasons "
    "pattern). Plan: one map-side digest+split projection, one "
    "digest-keyed hash agg, a post-agg group filter — leakage "
    "detection costs one shuffle at any corpus size. NULL text "
    "excluded by contract (no digest).",
    tags=("dedup", "llm-pipeline", "quality"),
)
def split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kittispark.operators.text import md5_nibble

    docs = t(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    b = docs.select(
        F.md5("text").alias("digest"),
        "doc_id",
        F.when(md5_nibble(F.col("doc_id"), 1) < 13, 1)
        .otherwise(0)
        .alias("tr"),
    )
    g = b.groupBy("digest").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("tr").cast("bigint").alias("n_train"),
        (F.count(F.lit(1)) - F.sum("tr")).cast("bigint").alias("n_holdout"),
        F.expr(
            "array_join(transform(sort_array(collect_list(doc_id)), "
            "x -> cast(x as string)), ',')"
        ).alias("doc_ids"),
    )
    return (
        g.where((F.col("n_train") > 0) & (F.col("n_holdout") > 0))
        .select("digest", "n_docs", "n_train", "n_holdout", "doc_ids")
        .orderBy("digest")
    )
