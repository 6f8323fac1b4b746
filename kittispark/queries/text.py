"""Text-analysis queries over the documents table (BASELINE.json
north-star: token counting, quality scoring, language-ID,
fingerprinting for a large-scale training-data pipeline). All are
pure built-in column expressions (JVM-side, whole-stage codegen) —
no Python UDFs in the hot path; reusable operator forms live in
kittispark.operators.text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kittispark.registry import register
from kittispark.queries._util import t
from kittispark.operators.text import (
    EN_STOPWORDS,
    doc_fingerprint_cols,
    quality_cols,
    tokens_col,
)


@register(
    "token_count",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
           CAST(length(text) AS INT) AS n_chars_computed,
           n_chars
    FROM documents
    """,
    doc="Whitespace token counting per document (north-star text "
    "analysis; single narrow projection over the scan).",
    tags=("text",),
)
def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(tokens_col("text")).alias("n_tokens"),
        F.length("text").alias("n_chars_computed"),
        "n_chars",
    )


@register(
    "text_quality",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INT)                AS n_tokens,
           CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS n_distinct_tokens,
           round(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                 / len(string_split(text, ' ')), 6)                 AS type_token_ratio,
           round(CAST(length(replace(text, ' ', '')) AS DOUBLE)
                 / len(string_split(text, ' ')), 6)                 AS avg_token_len
    FROM documents
    """,
    doc="Quality scoring: token counts, type/token ratio (repetition "
    "signal), mean token length — the length/ratio heuristics a "
    "pretraining-data filter applies per document.",
    tags=("text",),
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return docs.select("doc_id", *quality_cols("text"))


@register(
    "lang_id_heuristic",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, lang,
               round(CAST(len(list_filter(string_split(text, ' '),
                         x -> x IN ({", ".join("'" + w + "'" for w in sorted(EN_STOPWORDS))})))
                     AS DOUBLE) / len(string_split(text, ' ')), 6) AS en_score
        FROM documents
    )
    SELECT doc_id, lang, en_score,
           CASE WHEN en_score >= 0.10 THEN 'en' ELSE 'other' END AS lang_pred
    FROM scored
    """,
    doc="Language-ID by stopword-hit-rate heuristic (n-gram/stopword "
    "profile approach; higher-order char-n-gram variant is "
    "operators.text.lang_id_ngram, rows-only checked).",
    tags=("text",),
)
def lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kittispark.operators.text import stopword_score

    docs = t(spark, sf_dir, "documents")
    en_score = F.round(stopword_score("text", EN_STOPWORDS), 6)
    return docs.select(
        "doc_id",
        "lang",
        en_score.alias("en_score"),
        F.when(en_score >= 0.10, "en").otherwise("other").alias("lang_pred"),
    )


@register(
    "doc_fingerprint",
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               unnest(string_split(text, ' ')) AS tok,
               unnest(generate_series(1, len(string_split(text, ' ')))) AS pos
        FROM documents
    )
    SELECT doc_id,
           CAST(sum((pos * 31 + length(tok) * 17
                     + ascii(substr(tok, 1, 1))) % 1000000007) % 1000000007
                AS BIGINT) AS fingerprint,
           count(*) AS n_tokens
    FROM toks GROUP BY doc_id
    """,
    doc="Order-sensitive document fingerprint: positional polynomial "
    "over tokens folded mod 1e9+7 — a rolling-hash-style signature "
    "computed with posexplode + one hash-agg (engine-portable "
    "arithmetic; no engine-specific hash function).",
    tags=("text",),
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return doc_fingerprint_cols(docs)


@register(
    "tfidf_top_terms",
    oracle="""
    WITH tokens AS (
        SELECT doc_id, t.term
        FROM documents,
             LATERAL (SELECT unnest(string_split_regex(
                          translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
                                    'abcdefghijklmnopqrstuvwxyz'), '[^a-z]+'))
                      AS term) t
        WHERE doc_id < 50 AND t.term <> ''
    ),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM tokens GROUP BY 1, 2),
    n AS (SELECT count(*) AS n_docs FROM documents WHERE doc_id < 50),
    scored AS (
        SELECT tf.doc_id, tf.term,
               tf.tf * ln(n.n_docs /
                   (count(*) OVER (PARTITION BY tf.term))) AS tfidf
        FROM tf CROSS JOIN n
    )
    SELECT doc_id, term, round(tfidf, 6) AS tfidf, CAST(rk AS INT) AS rk
    FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
               ORDER BY tfidf DESC, term) AS rk
          FROM scored)
    WHERE rk <= 3
    """,
    doc="tf-idf top-3 terms per document (docs 0-49): ASCII-only case "
    "fold (translate A-Z, not lower() — full-Unicode case mappings "
    "differ between JVM and utf8proc), tokenize with a "
    "shared [^a-z]+ regex, tf per (doc,term), idf = ln(N/df), "
    "deterministic rank tiebreak. The aggregation skeleton of every "
    "bag-of-words feature pipeline. ONE tokenize pass: df comes from a "
    "window over tf (tf already has one row per (doc,term), so "
    "count(*) per term IS the document frequency) and N comes from the "
    "raw documents table — branching df/N off `tokens` instead would "
    "re-scan and re-explode the corpus per branch, because column "
    "pruning specializes each branch's scan and defeats ReuseExchange.",
    tags=("text",),
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    tokens = docs.select(
        "doc_id",
        # ASCII-only case fold (translate, not lower): JVM full-Unicode
        # lowercasing maps U+0130 'İ' to "i"+combining-dot while
        # utf8proc maps it to plain "i" — the engines fork on any
        # locale-sensitive mapping. Non-ASCII letters pass through
        # untouched and the [a-z] token class drops them identically
        # on both engines.
        F.explode(
            F.split(
                F.translate(
                    "text",
                    "ABCDEFGHIJKLMNOPQRSTUVWXYZ",
                    "abcdefghijklmnopqrstuvwxyz",
                ),
                "[^a-z]+",
            )
        ).alias("term"),
    ).filter(F.col("term") != "")
    tf = tokens.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    # Document frequency as a window over tf — tf has one row per
    # (doc, term), so count(*) per term IS df, and the corpus is
    # tokenized exactly once (a groupBy branch would re-scan it).
    df_w = F.count(F.lit(1)).over(W.partitionBy("term"))
    # n_docs from the raw documents table (no tokenize), as a 1-row
    # aggregate cross-joined in (broadcast nested loop), not an eager
    # .count(): one Spark job instead of two.
    n = docs.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    scored = tf.withColumn("df", df_w).crossJoin(F.broadcast(n)).select(
        "doc_id",
        "term",
        (F.col("tf") * F.log(F.col("n_docs") / F.col("df"))).alias("tfidf_raw"),
    )
    w = W.partitionBy("doc_id").orderBy(F.desc("tfidf_raw"), F.asc("term"))
    return (
        scored.select(
            "doc_id",
            "term",
            F.round("tfidf_raw", 6).alias("tfidf"),
            F.row_number().over(w).alias("rk"),
        )
        .filter(F.col("rk") <= 3)
    )


@register(
    "regexp_functions",
    oracle="""
    SELECT doc_id,
           regexp_extract(text, '^([A-Za-z]+)', 1) AS first_word,
           regexp_matches(text, '[0-9]') AS has_digit,
           length(regexp_replace(text, '[aeiou]', '', 'g')) AS n_non_vowel
    FROM documents WHERE doc_id < 200
    """,
    doc="Regexp scalar family: anchored capture-group extraction, "
    "boolean pattern predicate (rlike), global replace — all JVM "
    "codegen expressions; patterns restricted to the class syntax "
    "shared by Java regex and DuckDB's RE2.",
    tags=("scalar", "text"),
)
def regexp_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return docs.select(
        "doc_id",
        F.regexp_extract("text", r"^([A-Za-z]+)", 1).alias("first_word"),
        F.col("text").rlike("[0-9]").alias("has_digit"),
        F.length(F.regexp_replace("text", "[aeiou]", "")).alias("n_non_vowel"),
    )


@register(
    "hash_split_sample",
    oracle="""
    WITH b AS (
        SELECT lang, n_chars,
               instr('0123456789abcdef',
                     substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1
                   AS bucket
        FROM documents
    )
    SELECT lang,
           count(*) FILTER (WHERE bucket < 13)  AS n_train,
           count(*) FILTER (WHERE bucket >= 13) AS n_holdout,
           round(avg(n_chars) FILTER (WHERE bucket < 13), 2)
               AS train_avg_chars
    FROM b GROUP BY lang
    """,
    doc="Deterministic hash-based train/holdout split (the standard "
    "way to carve reproducible splits from a 100 TB corpus without a "
    "global shuffle or a stored assignment table): bucket 0-15 from "
    "the first md5 hex nibble of the stable doc_id, train = buckets "
    "0-12 (~81%). Pure map-side expression — the only shuffle is the "
    "final tiny per-lang rollup; identical rows land in the same "
    "split on every engine and every run.",
    tags=("text", "sampling"),
)
def hash_split_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kittispark.operators.text import md5_nibble

    docs = t(spark, sf_dir, "documents")
    train = md5_nibble(F.col("doc_id"), 1) < 13
    return docs.withColumn("is_train", train).groupBy("lang").agg(
        F.count(F.when(F.col("is_train"), 1)).alias("n_train"),
        F.count(F.when(~F.col("is_train"), 1)).alias("n_holdout"),
        F.round(
            F.avg(F.when(F.col("is_train"), F.col("n_chars"))), 2
        ).alias("train_avg_chars"),
    )


@register(
    "stratified_sample_rates",
    oracle="""
    SELECT doc_id, lang,
           (instr('0123456789abcdef',
                  substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
         + (instr('0123456789abcdef',
                  substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) AS bucket
    FROM documents
    WHERE (instr('0123456789abcdef',
                 substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
        + (instr('0123456789abcdef',
                 substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1)
        < CASE lang WHEN 'en' THEN 64 WHEN 'es' THEN 128 ELSE 256 END
    """,
    doc="Stratified sampling with per-class rates (downsample the "
    "dominant language: en 25%, es 50%, rest 100%) — the sampleBy "
    "shape rebalancing a training corpus. The keep decision is a "
    "deterministic hash bucket (0-255 from the first md5 byte of the "
    "stable doc_id), not an RNG draw: a pure map-side filter with no "
    "shuffle and no stored assignment, reproducible on any engine at "
    "any parallelism.",
    tags=("text", "sampling"),
)
def stratified_sample_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kittispark.operators.text import md5_nibble

    docs = t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    bucket = md5_nibble(did, 1) * 16 + md5_nibble(did, 2)
    threshold = (
        F.when(F.col("lang") == "en", 64)
        .when(F.col("lang") == "es", 128)
        .otherwise(256)
    )
    return docs.select("doc_id", "lang", bucket.alias("bucket")).filter(
        F.col("bucket") < threshold
    )


@register(
    "pii_redaction",
    oracle=r"""
    WITH raw AS (
        SELECT doc_id,
               text || repeat(' u' || CAST(doc_id AS VARCHAR) || '@ex.com',
                              CAST(doc_id % 3 AS INT))
                    || repeat(' call +1-555-'
                              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'),
                              CAST(doc_id % 2 AS INT)) AS t
        FROM documents WHERE doc_id < 300
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(t, '[a-z0-9]+@[a-z]+\.[a-z]+'))
                AS INT) AS n_emails,
           CAST(len(regexp_extract_all(t, '\+[0-9]-[0-9]{3}-[0-9]{4}'))
                AS INT) AS n_phones,
           CAST(length(regexp_replace(regexp_replace(t,
                    '[a-z0-9]+@[a-z]+\.[a-z]+', '<EMAIL>', 'g'),
                    '\+[0-9]-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g'))
                AS INT) AS redacted_len,
           right(regexp_replace(regexp_replace(t,
                    '[a-z0-9]+@[a-z]+\.[a-z]+', '<EMAIL>', 'g'),
                    '\+[0-9]-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g'), 40)
               AS redacted_tail
    FROM raw
    """,
    doc="PII scrubbing: detect and redact email addresses and phone "
    "numbers with shared Java-regex/RE2 class patterns (the standard "
    "pre-release pass over a training corpus). The corpus text has no "
    "PII, so a deterministic per-doc contact string is appended first "
    "(doc_id%3 emails, doc_id%2 phones) — counts, redacted length, "
    "and the redacted tail are then exactly reproducible on both "
    "engines. Pure map-side regexp expressions, no shuffle.",
    tags=("text", "llm-pipeline"),
)
def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    email = r"[a-z0-9]+@[a-z]+\.[a-z]+"
    phone = r"\+[0-9]-[0-9]{3}-[0-9]{4}"
    raw = F.concat(
        F.col("text"),
        F.expr("repeat(' u' || CAST(doc_id AS STRING) || '@ex.com', "
               "CAST(doc_id % 3 AS INT))"),
        F.expr("repeat(' call +1-555-' || lpad(CAST(doc_id % 10000 AS STRING),"
               " 4, '0'), CAST(doc_id % 2 AS INT))"),
    )
    red = F.regexp_replace(
        F.regexp_replace(raw, email, "<EMAIL>"), phone, "<PHONE>"
    )
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(raw, F.lit(email), 0)).alias("n_emails"),
        F.size(F.regexp_extract_all(raw, F.lit(phone), 0)).alias("n_phones"),
        F.length(red).alias("redacted_len"),
        F.right(red, F.lit(40)).alias("redacted_tail"),
    )


@register(
    "top_bigram_repetition",
    oracle="""
    WITH grams AS (
        SELECT doc_id,
               unnest(list_transform(
                   generate_series(1, len(string_split(text, ' ')) - 1),
                   i -> string_split(text, ' ')[i] || ' '
                        || string_split(text, ' ')[i + 1])) AS bigram
        FROM documents WHERE doc_id < 200
    ),
    counts AS (
        SELECT doc_id, bigram, count(*) AS bigram_count
        FROM grams GROUP BY doc_id, bigram
    )
    SELECT doc_id, bigram AS top_bigram,
           CAST(bigram_count AS INT) AS top_count,
           CAST(n_bigrams AS INT) AS n_bigrams
    FROM (SELECT *,
                 sum(bigram_count) OVER (PARTITION BY doc_id) AS n_bigrams,
                 row_number() OVER (PARTITION BY doc_id
                     ORDER BY bigram_count DESC, bigram) AS rk
          FROM counts)
    WHERE rk = 1
    """,
    doc="Gopher-style repetition signal: the most frequent word bigram "
    "per document with its count and the total bigram count (the "
    "top-2-gram-fraction quality rule, kept as exact integers so the "
    "oracle needs no float tolerance; ties broken by lexicographic "
    "bigram). Bigrams are built JVM-side by zipping the token array "
    "with its tail (transform over a slice — no self-join), then one "
    "hash-agg per (doc, bigram) and a per-doc window for the argmax; "
    "partitioning by doc_id keeps both shuffles on the same key.",
    tags=("text", "llm-pipeline"),
)
def top_bigram_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from kittispark.operators.text import bigram_rows

    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    counts = (
        bigram_rows(docs)
        .select("doc_id", F.concat_ws(" ", "w1", "w2").alias("bigram"))
        .groupBy("doc_id", "bigram")
        .agg(F.count(F.lit(1)).alias("bigram_count"))
    )
    w_doc = W.partitionBy("doc_id")
    ranked = counts.select(
        "doc_id",
        "bigram",
        "bigram_count",
        F.sum("bigram_count").over(w_doc).alias("n_bigrams_l"),
        F.row_number()
        .over(w_doc.orderBy(F.desc("bigram_count"), F.asc("bigram")))
        .alias("rk"),
    )
    return ranked.filter(F.col("rk") == 1).select(
        "doc_id",
        F.col("bigram").alias("top_bigram"),
        F.col("bigram_count").cast("int").alias("top_count"),
        F.col("n_bigrams_l").cast("int").alias("n_bigrams"),
    )


@register(
    "lang_balance_quota",
    oracle="""
    WITH quota AS (
        SELECT min(c) AS q
        FROM (SELECT count(*) AS c FROM documents GROUP BY lang)
    ),
    ranked AS (
        SELECT doc_id, lang,
               row_number() OVER (PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        FROM documents
    )
    SELECT doc_id, lang, CAST(rk AS INT) AS rk
    FROM ranked CROSS JOIN quota WHERE rk <= q
    """,
    doc="Language rebalancing by uniform quota: every language is "
    "downsampled to the size of the smallest language class (the "
    "multilingual-corpus balancing step before training). Selection "
    "order is a deterministic md5 hash of the stable doc_id — a "
    "reproducible uniform draw with no RNG state — and the quota is a "
    "1-row aggregate broadcast against the ranked rows, so the only "
    "data-sized shuffle is the per-lang window partitioning.",
    tags=("text", "sampling", "llm-pipeline"),
)
def lang_balance_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = t(spark, sf_dir, "documents")
    quota = (
        docs.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.min("c").alias("q"))
    )
    rk = F.row_number().over(
        W.partitionBy("lang").orderBy(
            F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
        )
    )
    return (
        docs.select("doc_id", "lang", rk.alias("rk"))
        .crossJoin(F.broadcast(quota))
        .filter(F.col("rk") <= F.col("q"))
        .select("doc_id", "lang", "rk")
    )


@register(
    "quality_filter_composite",
    oracle="""
    WITH m AS (
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
                   AS n_distinct,
               CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_nonspace
        FROM documents
    )
    SELECT doc_id, n_tokens,
           COALESCE(array_to_string(list_filter([
               CASE WHEN n_tokens IS NULL THEN 'no_text' END,
               CASE WHEN n_tokens < 50 THEN 'too_short' END,
               CASE WHEN n_tokens > 120 THEN 'too_long' END,
               CASE WHEN n_distinct * 10 < n_tokens * 3
                    THEN 'low_diversity' END,
               CASE WHEN n_nonspace > n_tokens * 8 THEN 'long_words' END
           ], x -> x IS NOT NULL), '|'), '') AS reasons,
           (n_tokens IS NOT NULL
            AND n_tokens >= 50 AND n_tokens <= 120
            AND n_distinct * 10 >= n_tokens * 3
            AND n_nonspace <= n_tokens * 8) AS keep
    FROM m
    """,
    doc="Composite pretraining quality filter (the Gopher-rule shape): "
    "length band, type/token-ratio floor, and mean-word-length "
    "ceiling, each emitting its rule name into a reasons array; keep "
    "= no rule fired. Thresholds are compared as cross-multiplied "
    "integers (TTR < 0.3 as n_distinct*10 < n_tokens*3) so the "
    "verdict is exact on every engine — no float tolerance in a "
    "drop/keep decision that gates corpus membership. Map-side only. "
    "Reasons are emitted '|'-joined in fixed rule order (the driver's "
    "pandas canonicalizer cannot sort raw array columns — the "
    "sorted_array_agg convention, queries/relational.py).",
    tags=("text", "llm-pipeline"),
)
def quality_filter_composite(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    toks = tokens_col("text")
    m = docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
        F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
        .cast("long")
        .alias("n_nonspace"),
    )
    rules = [
        # NULL text trips an explicit rule: without it every other
        # predicate is NULL, when() drops them all, and a text-less
        # doc would sail through with keep=true while the oracle's
        # three-valued AND said NULL
        (F.col("n_tokens").isNull(), "no_text"),
        (F.col("n_tokens") < 50, "too_short"),
        (F.col("n_tokens") > 120, "too_long"),
        (F.col("n_distinct") * 10 < F.col("n_tokens") * 3, "low_diversity"),
        (F.col("n_nonspace") > F.col("n_tokens") * 8, "long_words"),
    ]
    reasons = F.array_compact(
        F.array(*[F.when(cond, name) for cond, name in rules])
    )
    return m.select(
        "doc_id",
        "n_tokens",
        F.array_join(reasons, "|").alias("reasons"),
        (F.size(reasons) == 0).alias("keep"),
    )


@register(
    "bpe_pretoken_count",
    oracle=r"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text,
                ' ?[a-z]+| ?[A-Z][a-z]*| ?[0-9]+| ?[^a-zA-Z0-9 ]+'))
                AS INT) AS n_bpe_tokens,
           CAST(len(string_split(text, ' ')) AS INT) AS n_ws_tokens
    FROM documents
    """,
    doc="BPE-style pre-tokenization count: the GPT-2 pre-tokenizer "
    "shape (leading space attaches to the following word; letter "
    "runs, case-boundary splits, digit runs, and punctuation runs "
    "are separate tokens), restricted to the lookahead-free regex "
    "subset Java regex and RE2 share. A narrow map-side projection — "
    "the cost model of tokenizer-aware corpus budgeting at 100 TB.",
    tags=("text",),
)
def bpe_pretoken_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    pat = r" ?[a-z]+| ?[A-Z][a-z]*| ?[0-9]+| ?[^a-zA-Z0-9 ]+"
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(pat), 0)).alias("n_bpe_tokens"),
        F.size(tokens_col("text")).alias("n_ws_tokens"),
    )


_BM25_TERMS = ("join", "scan", "window")
_BM25_K1, _BM25_B = 1.2, 0.75


def _bm25_sql() -> str:
    """DuckDB mirror of the BM25 scorer: identical expression tree
    per term (idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))),
    summed in fixed term order — no hash-agg float sum anywhere, so
    both engines accumulate identically."""
    k1, b = _BM25_K1, _BM25_B
    tf_cols = ",\n               ".join(
        f"len(list_filter(tk, x -> x = '{t}')) AS tf{i}"
        for i, t in enumerate(_BM25_TERMS)
    )
    df_cols = ",\n               ".join(
        f"sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS df{i}"
        for i in range(len(_BM25_TERMS))
    )
    terms = "\n             + ".join(
        f"(CASE WHEN tf{i} = 0 THEN 0.0 ELSE "
        f"ln((n_docs - df{i} + 0.5) / (df{i} + 0.5) + 1.0)"
        f" * (tf{i} * {k1 + 1}) / "
        f"(tf{i} + {k1} * (1 - {b} + {b} * dl / "
        f"(CAST(sumdl AS DOUBLE) / n_docs))) END)"
        for i in range(len(_BM25_TERMS))
    )
    return f"""
    WITH base AS (
        SELECT doc_id, len(tk) AS dl,
               {tf_cols}
        FROM (SELECT doc_id, string_split(text, ' ') AS tk FROM documents)
    ),
    stats AS (
        SELECT count(*) AS n_docs, sum(dl) AS sumdl,
               {df_cols}
        FROM base
    ),
    scored AS (
        SELECT doc_id,
               {terms} AS score
        FROM base, stats
    )
    SELECT doc_id, round(score, 6) AS bm25,
           CAST(rk AS INT) AS rk
    FROM (SELECT *, row_number() OVER (ORDER BY score DESC, doc_id) AS rk
          FROM scored)
    WHERE rk <= 20
    """


@register(
    "bm25_topk_docs",
    oracle=_bm25_sql(),
    doc="BM25 ranked retrieval (Lucene idf form, k1=1.2, b=0.75) for "
    "a fixed 3-term query over the corpus: per-term tf via array "
    "filters on the bound token array (one tokenize per doc), corpus "
    "stats (N, avg doclen, per-term df) in ONE 1-row aggregate "
    "broadcast back, contributions summed in FIXED term order as "
    "column arithmetic — no hash-agg float sum, so the score is "
    "bit-reproducible and the oracle replays it exactly. Top-20 with "
    "the (desc score, asc doc_id) tiebreak -> TakeOrderedAndProject. "
    "The search-side primitive of a retrieval-augmented corpus "
    "pipeline; at 100 TB tf/df come from an inverted index, same "
    "algebra.",
    tags=("text", "search"),
)
def bm25_topk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    k1, b = _BM25_K1, _BM25_B
    docs = t(spark, sf_dir, "documents")

    def _eq(term: str):
        # closure factory, NOT a default arg: a 2-parameter lambda
        # would make the HOF pass (element, index) and bind the term
        # slot to the array index
        return lambda x: x == F.lit(term)

    base = docs.select("doc_id", tokens_col("text").alias("__tk")).select(
        "doc_id",
        F.size("__tk").alias("dl"),
        *[
            F.size(F.filter("__tk", _eq(term))).alias(f"tf{i}")
            for i, term in enumerate(_BM25_TERMS)
        ],
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("sumdl"),
        *[
            F.sum(F.when(F.col(f"tf{i}") > 0, 1).otherwise(0)).alias(f"df{i}")
            for i in range(len(_BM25_TERMS))
        ],
    )
    avgdl = F.col("sumdl").cast("double") / F.col("n_docs")
    score = None
    for i in range(len(_BM25_TERMS)):
        tf, df = F.col(f"tf{i}"), F.col(f"df{i}")
        idf = F.log((F.col("n_docs") - df + 0.5) / (df + 0.5) + 1.0)
        contrib = F.when(tf == 0, 0.0).otherwise(
            idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * F.col("dl") / avgdl))
        )
        score = contrib if score is None else score + contrib
    scored = base.crossJoin(F.broadcast(stats)).select(
        "doc_id", score.alias("score")
    )
    w = W.orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.select(
            "doc_id",
            F.round("score", 6).alias("bm25"),
            F.row_number().over(w).alias("rk"),
        )
        .filter(F.col("rk") <= 20)
    )


@register(
    "lang_source_chisq",
    oracle="""
    WITH obs AS (
        SELECT lang, source, CAST(count(*) AS DOUBLE) AS o
        FROM documents GROUP BY lang, source
    ),
    rows_ AS (SELECT lang, sum(o) AS rt FROM obs GROUP BY lang),
    cols_ AS (SELECT source, sum(o) AS ct FROM obs GROUP BY source),
    tot AS (SELECT sum(o) AS n FROM obs)
    SELECT obs.lang, obs.source,
           CAST(o AS BIGINT) AS observed,
           round(rt * ct / n, 6) AS expected,
           round((o - rt * ct / n) * (o - rt * ct / n) / (rt * ct / n), 6)
               AS chisq_cell
    FROM obs JOIN rows_ USING (lang) JOIN cols_ USING (source), tot
    """,
    doc="Chi-square contingency cells for the lang x source "
    "cross-tabulation — the corpus-composition drift monitor (is the "
    "language mix independent of the source?): observed counts, "
    "expected = row_total * col_total / N, and each cell's chi-square "
    "contribution. Emitted PER CELL, never summed across cells — a "
    "cross-cell float total would hash-agg in nondeterministic order; "
    "the per-cell arithmetic is a fixed expression both engines "
    "evaluate identically. Three small hash aggs + broadcast joins.",
    tags=("text", "analytics"),
)
def lang_source_chisq(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    obs = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("double").alias("o")
    )
    rows_ = obs.groupBy("lang").agg(F.sum("o").alias("rt"))
    cols_ = obs.groupBy("source").agg(F.sum("o").alias("ct"))
    tot = obs.agg(F.sum("o").alias("n"))
    e = F.col("rt") * F.col("ct") / F.col("n")
    return (
        obs.join(F.broadcast(rows_), "lang")
        .join(F.broadcast(cols_), "source")
        .crossJoin(F.broadcast(tot))
        .select(
            "lang",
            "source",
            F.col("o").cast("long").alias("observed"),
            F.round(e, 6).alias("expected"),
            F.round((F.col("o") - e) * (F.col("o") - e) / e, 6).alias(
                "chisq_cell"
            ),
        )
    )


@register(
    "cms_heavy_hitters",
    oracle="""
    WITH toks AS (
        SELECT unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    tok_counts AS (
        SELECT tok, CAST(count(*) AS BIGINT) AS exact_cnt
        FROM toks GROUP BY tok
    ),
    top AS (
        SELECT tok, exact_cnt FROM (
            SELECT tok, exact_cnt,
                   row_number() OVER (ORDER BY exact_cnt DESC, tok) AS rk
            FROM tok_counts
        ) WHERE rk <= 20
    ),
    rows AS (SELECT unnest([0, 1, 2, 3]) AS r),
    hashed AS (
        SELECT rows.r,
               CAST(CAST(('0x' || substring(
                   md5('r' || CAST(rows.r AS VARCHAR) || '|' || toks.tok),
                   1, 15)) AS UBIGINT) % 512 AS BIGINT) AS b
        FROM toks CROSS JOIN rows
    ),
    sketch AS (
        SELECT r, b, CAST(count(*) AS BIGINT) AS c
        FROM hashed GROUP BY r, b
    ),
    cand AS (
        SELECT t.tok, t.exact_cnt, rows.r,
               CAST(CAST(('0x' || substring(
                   md5('r' || CAST(rows.r AS VARCHAR) || '|' || t.tok),
                   1, 15)) AS UBIGINT) % 512 AS BIGINT) AS b
        FROM top t CROSS JOIN rows
    )
    SELECT c.tok AS token, c.exact_cnt,
           CAST(min(s.c) AS BIGINT) AS est_cnt,
           CAST(min(s.c) - c.exact_cnt AS BIGINT) AS overest
    FROM cand c JOIN sketch s ON c.r = s.r AND c.b = s.b
    GROUP BY c.tok, c.exact_cnt
    """,
    doc="Count-min-sketch heavy hitters: a 4x512 CMS of corpus token "
    "frequencies (one pass, <= 2048 counters total regardless of "
    "corpus size) point-estimates the exact top-20 tokens. Hashing "
    "is the engine-portable md5 scheme, so the DuckDB twin rebuilds "
    "the identical sketch and the per-token estimates hash-match "
    "bit-for-bit — the approx_count_distinct adjudication pattern "
    "applied to a sketch WE implement rather than one Spark ships. "
    "CMS is one-sided: overest >= 0 always (pinned in tests). At "
    "100 TB the sketch is the point: a 2048-row summary replaces a "
    "vocabulary-sized shuffle when only heavy-hitter estimates are "
    "needed; the exact top-20 here exists to grade the estimates.",
    tags=("text", "sketch", "llm"),
)
def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W
    from kittispark.operators.text import cms_estimate, cms_token_sketch

    docs = t(spark, sf_dir, "documents")
    toks = docs.select(F.explode(tokens_col("text")).alias("tok"))
    sketch = cms_token_sketch(toks, "tok", depth=4, width=512)
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("exact_cnt"))
    top = (
        counts.select(
            "*",
            F.row_number()
            .over(W.orderBy(F.desc("exact_cnt"), F.asc("tok")))
            .alias("rk"),
        )
        .filter(F.col("rk") <= 20)
        .drop("rk")
    )
    return cms_estimate(top, sketch, "tok", depth=4, width=512).select(
        F.col("tok").alias("token"),
        "exact_cnt",
        "est_cnt",
        (F.col("est_cnt") - F.col("exact_cnt")).alias("overest"),
    )
