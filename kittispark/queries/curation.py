"""Data-curation operators for pretraining-corpus selection (round-5
breadth: the selection / novelty / chunking layer that sits between
raw dedup and the packed training corpus).

Reference parity note: the reference repo (KITTI_Data-Pipeline) has
no text-curation surface — these extend the engine along the
LLM-data-pipeline axis the brief designates as first-class. Every
query is built from whole-stage-codegen column expressions plus the
repo's shared scale-safe primitives (portable_hash64 for
engine-portable hashing, shingle_rows for one-shuffle shingling,
global_rank for windowless global ordering), and every float
aggregate goes through integer-nano sums so the DuckDB twin is
order-independent and bit-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from kittispark.registry import register
from kittispark.queries._util import t
from kittispark.operators.dedup import portable_hash64, shingle_rows
from kittispark.operators.text import tokens_col

# DSIR feature-space size: hashed unigram buckets. Small enough that
# the per-bucket model is always a broadcast table (512 rows at ANY
# corpus scale — the model size is fixed by construction, which is
# the whole point of hashed features), large enough to separate the
# target distribution at our vocab (~100s of distinct tokens).
_DSIR_BUCKETS = 512

# The portable md5 hash expression, DuckDB side (see
# operators/dedup.py:42 — first 15 hex chars of md5, base-16).
_DUCK_H = "CAST(('0x' || substring(md5({col}), 1, 15)) AS UBIGINT)"


@register(
    "dsir_importance_weights",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, lang,
               CAST({_DUCK_H.format(col="u.tok")} % {_DSIR_BUCKETS} AS BIGINT)
                   AS bucket
        FROM documents, unnest(string_split(text, ' ')) AS u(tok)
    ),
    model AS (
        SELECT bucket,
               CAST(count(*) AS BIGINT) AS cr,
               CAST(count(*) FILTER (WHERE lang = 'en') AS BIGINT) AS ct
        FROM tok GROUP BY bucket
    ),
    tot AS (
        SELECT sum(ct) AS nt, sum(cr) AS nr FROM model
    ),
    scored AS (
        SELECT bucket,
               CAST(round((ln((ct + 1.0) / (nt + {_DSIR_BUCKETS}))
                         - ln((cr + 1.0) / (nr + {_DSIR_BUCKETS}))) * 1e9)
                    AS BIGINT) AS dn
        FROM model, tot
    ),
    per_doc AS (
        SELECT t.doc_id, any_value(t.lang) AS lang,
               CAST(count(*) AS INT) AS n_tokens,
               sum(s.dn) AS wn
        FROM tok t JOIN scored s USING (bucket)
        GROUP BY t.doc_id
    )
    SELECT doc_id, lang, n_tokens, round(wn / 1e9, 6) AS weight
    FROM per_doc
    ORDER BY wn DESC, doc_id
    LIMIT 50
    """,
    doc="DSIR data selection (Xie et al. 2023, 'Data Selection for "
    "Language Models via Importance Resampling'): importance weight "
    "log p_target(x) - log p_raw(x) under bag-of-hashed-unigram "
    "models (512 md5 buckets, add-1 smoothing), target = the 'en' "
    "slice, raw = the whole corpus; top-50 docs by weight. The "
    "feature model is 512 rows at ANY corpus size, so the scoring "
    "join is a broadcast map-side join — the corpus is touched by "
    "exactly two shuffles (bucket-count agg, per-doc sum), and the "
    "top-50 is a TakeOrdered, never a global sort. Per-token log "
    "ratios are rounded to integer nanos before summing so the "
    "per-doc sum is order-independent and the DuckDB twin matches "
    "bit-for-bit.",
    tags=("curation", "sampling", "text"),
)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        "lang",
        F.explode(tokens_col("text")).alias("tok"),
    ).withColumn("bucket", F.pmod(portable_hash64("tok"), F.lit(_DSIR_BUCKETS)))
    model = tok.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("cr"),
        F.count(F.when(F.col("lang") == "en", 1)).alias("ct"),
    )
    tot = model.agg(
        F.sum("ct").alias("nt"), F.sum("cr").alias("nr")
    )
    scored = model.crossJoin(F.broadcast(tot)).select(
        "bucket",
        F.round(
            (
                F.log((F.col("ct") + 1.0) / (F.col("nt") + _DSIR_BUCKETS))
                - F.log((F.col("cr") + 1.0) / (F.col("nr") + _DSIR_BUCKETS))
            )
            * 1e9
        )
        .cast("long")
        .alias("dn"),
    )
    per_doc = (
        tok.join(F.broadcast(scored), "bucket")
        .groupBy("doc_id")
        .agg(
            F.first("lang").alias("lang"),
            F.count(F.lit(1)).cast("int").alias("n_tokens"),
            F.sum("dn").alias("wn"),
        )
    )
    return (
        per_doc.orderBy(F.col("wn").desc(), "doc_id")
        .limit(50)
        .select(
            "doc_id", "lang", "n_tokens", F.round(F.col("wn") / 1e9, 6).alias("weight")
        )
    )


@register(
    "ngram_novelty_score",
    oracle="""
    WITH grams AS (
        SELECT doc_id,
               array_to_string(toks[i : i + 2], ' ') AS sh
        FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
             unnest(generate_series(1, len(toks) - 2)) AS g(i)
    ),
    firsts AS (
        SELECT sh, min(doc_id) AS first_doc FROM grams GROUP BY sh
    )
    SELECT g.doc_id,
           CAST(count(*) AS BIGINT) AS n_grams,
           CAST(count(*) FILTER (WHERE f.first_doc = g.doc_id) AS BIGINT)
               AS n_novel,
           round(CAST(count(*) FILTER (WHERE f.first_doc = g.doc_id) AS DOUBLE)
                 / count(*), 6) AS novelty
    FROM grams g JOIN firsts f USING (sh)
    GROUP BY g.doc_id
    """,
    doc="Per-document n-gram novelty (corpus-growth curation signal: "
    "how much of each doc is text the corpus has not seen in any "
    "earlier doc): explode 3-token shingles, take min(doc_id) per "
    "distinct shingle as its global first sighting, and score each "
    "doc by the fraction of its shingle instances it is first to "
    "contribute. Shape at 100 TB: shingle_rows is the repo's "
    "one-shuffle shingler (operators/dedup.py:79), the firsts table "
    "and the score join both shuffle on the shingle key — two "
    "co-keyed shuffles, no all-pairs, and the second shuffle reuses "
    "the first's partitioning. Docs shorter than 3 tokens have no "
    "shingles and are (deliberately) absent, matching the oracle's "
    "inner join.",
    tags=("curation", "dedup", "text"),
)
def ngram_novelty_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    grams = shingle_rows(docs, "text", "doc_id", n=3)
    firsts = grams.groupBy("sh").agg(F.min("doc_id").alias("first_doc"))
    return (
        grams.join(firsts, "sh")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count(F.when(F.col("first_doc") == F.col("doc_id"), 1)).alias(
                "n_novel"
            ),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_novel",
            F.round(F.col("n_novel") / F.col("n_grams"), 6).alias("novelty"),
        )
    )


# Sliding-window chunking parameters: 32-token windows, stride 24
# (25% overlap) — the RAG/embedding-prep shape; sized to the
# synthetic docs' ~128 tokens so every doc yields several chunks.
_CHUNK_W, _CHUNK_S = 32, 24


@register(
    "tokenizer_chunk_windows",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, string_split(text, ' ') AS toks,
               len(string_split(text, ' ')) AS n
        FROM documents
        WHERE text IS NOT NULL
    ),
    c AS (
        SELECT doc_id, n, CAST(k AS INT) AS chunk_id,
               CAST(1 + {_CHUNK_S} * k AS INT) AS start_tok,
               toks[1 + {_CHUNK_S} * k :
                    least(1 + {_CHUNK_S} * k + {_CHUNK_W} - 1, n)] AS chunk
        FROM d, unnest(generate_series(
                 0, CAST(ceil(greatest(n - {_CHUNK_W}, 0)
                              / CAST({_CHUNK_S} AS DOUBLE)) AS BIGINT)))
                 AS g(k)
    )
    SELECT doc_id, chunk_id, start_tok,
           CAST(len(chunk) AS INT) AS chunk_len,
           md5(array_to_string(chunk, ' ')) AS chunk_md5
    FROM c
    """,
    doc="Sliding-window token chunking (context-window / RAG "
    "embedding prep): each document's whitespace tokens are cut into "
    "32-token windows at stride 24; the final window is allowed to "
    "run short so every token is covered and chunk k's start is the "
    "closed form 1+24k (n_chunks = 1 + ceil(max(0, n-32)/24)). "
    "Entirely map-side — sequence/transform build every chunk inside "
    "one whole-stage-codegen projection, zero shuffles at any scale; "
    "the md5 digest of each chunk's joined text gives the oracle "
    "byte-level adjudication of the chunk boundaries.",
    tags=("curation", "text", "llm-pipeline"),
)
def tokenizer_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NULL text -> zero chunks (without the filter both engines emit
    # one phantom chunk whose digest forks: concat_ws serves '' for a
    # NULL array while array_to_string serves NULL)
    docs = t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    d = docs.select(
        "doc_id", tokens_col("text").alias("toks")
    ).withColumn("n", F.size("toks"))
    n_last = F.ceil(
        F.greatest(F.col("n") - _CHUNK_W, F.lit(0)) / float(_CHUNK_S)
    ).cast("long")
    chunks = d.select(
        "doc_id",
        "n",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_last),
                lambda k: F.slice(F.col("toks"), k * _CHUNK_S + 1, _CHUNK_W),
            )
        ).alias("chunk_id", "chunk"),
    )
    return chunks.select(
        "doc_id",
        F.col("chunk_id").cast("int").alias("chunk_id"),
        (F.col("chunk_id") * _CHUNK_S + 1).cast("int").alias("start_tok"),
        F.size("chunk").alias("chunk_len"),
        F.md5(F.concat_ws(" ", F.col("chunk"))).alias("chunk_md5"),
    )


@register(
    "repetition_signals",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS tk
        FROM documents
    ),
    g2 AS (
        SELECT doc_id,
               array_to_string(tk[i : i + 1], ' ') AS sh,
               CAST(count(*) AS BIGINT) AS c
        FROM toks, unnest(generate_series(1, len(tk) - 1)) AS u(i)
        GROUP BY doc_id, array_to_string(tk[i : i + 1], ' ')
    ),
    top2 AS (
        SELECT doc_id, sh, c
        FROM g2
        QUALIFY row_number() OVER (
            PARTITION BY doc_id ORDER BY c DESC, sh) = 1
    ),
    g3 AS (
        SELECT doc_id,
               array_to_string(tk[i : i + 2], ' ') AS sh,
               CAST(count(*) AS BIGINT) AS c
        FROM toks, unnest(generate_series(1, len(tk) - 2)) AS u(i)
        GROUP BY doc_id, array_to_string(tk[i : i + 2], ' ')
    ),
    d3 AS (
        SELECT doc_id,
               round(CAST(sum(c) FILTER (WHERE c >= 2) AS DOUBLE)
                     / sum(c), 6) AS dup3_frac
        FROM g3 GROUP BY doc_id
    )
    SELECT t.doc_id,
           round(CAST(t.c * length(t.sh) AS DOUBLE) / length(doc.text), 6)
               AS top2_char_frac,
           coalesce(d3.dup3_frac, 0.0) AS dup3_frac
    FROM top2 t
    JOIN documents doc USING (doc_id)
    LEFT JOIN d3 USING (doc_id)
    """,
    doc="Gopher-style repetition signals (Rae et al. 2021, Table A1; "
    "also C4/RefinedWeb): per document, (a) the fraction of "
    "characters covered by occurrences of the single most frequent "
    "word 2-gram (ties broken lexicographically for determinism) and "
    "(b) the fraction of word-3-gram INSTANCES whose gram repeats "
    "within the doc. High values flag boilerplate/templated text a "
    "pretraining filter drops. All grouping keys are doc-local "
    "(doc_id, gram) so every shuffle partitions by doc — no global "
    "hot key is possible, and the per-doc top-1 window runs inside "
    "the same doc-partitioned exchange.",
    tags=("curation", "text"),
)
def repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").select(
        "doc_id", "text", F.length("text").alias("n_chars")
    )
    g2 = (
        shingle_rows(docs, "text", "doc_id", n=2)
        .groupBy("doc_id", "sh")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = W.partitionBy("doc_id").orderBy(F.col("c").desc(), F.col("sh"))
    top2 = (
        g2.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    g3 = (
        shingle_rows(docs, "text", "doc_id", n=3)
        .groupBy("doc_id", "sh")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    d3 = g3.groupBy("doc_id").agg(
        F.round(
            F.sum(F.when(F.col("c") >= 2, F.col("c")))
            / F.sum("c"),
            6,
        ).alias("dup3_frac")
    )
    return (
        top2.join(docs.select("doc_id", "n_chars"), "doc_id")
        .join(d3, "doc_id", "left")
        .select(
            "doc_id",
            F.round(
                (F.col("c") * F.length("sh")) / F.col("n_chars"), 6
            ).alias("top2_char_frac"),
            F.coalesce("dup3_frac", F.lit(0.0)).alias("dup3_frac"),
        )
    )


@register(
    "lm_score_deciles",
    oracle="""
    WITH tok AS (
        SELECT doc_id, u.tok
        FROM documents, unnest(string_split(text, ' ')) AS u(tok)
    ),
    uni AS (
        SELECT tok, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY tok
    ),
    tot AS (
        SELECT sum(c) AS n, count(*) AS v FROM uni
    ),
    lp AS (
        SELECT tok,
               CAST(round(ln((c + 1.0) / (n + v)) * 1e9) AS BIGINT) AS lpn
        FROM uni, tot
    ),
    per_doc AS (
        SELECT t.doc_id,
               CAST(count(*) AS BIGINT) AS n_tokens,
               CAST(floor(CAST(sum(l.lpn) AS DOUBLE) / count(*)) AS BIGINT)
                   AS doc_lpn
        FROM tok t JOIN lp l USING (tok)
        GROUP BY t.doc_id
    ),
    ranked AS (
        SELECT doc_id, n_tokens, doc_lpn,
               row_number() OVER (ORDER BY doc_lpn DESC, doc_id) AS rk,
               count(*) OVER () AS n_docs
        FROM per_doc
    )
    SELECT CAST(floor((rk - 1) * 10.0 / n_docs) AS INT) AS decile,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           round(CAST(floor(CAST(sum(doc_lpn) AS DOUBLE) / count(*)) AS BIGINT)
                 / 1e9, 6) AS avg_lp
    FROM ranked
    GROUP BY 1
    """,
    doc="CCNet-style LM-score bucketing (Wenzek et al. 2020): train "
    "a unigram LM on the corpus itself (add-1 smoothing over the "
    "observed vocab), score each doc by its mean token log-prob, "
    "rank all docs and cut into deciles, and report each decile's "
    "doc count / token mass / mean score — the table a curation run "
    "reads to decide which perplexity band to keep. The vocab table "
    "is corpus-distinct-tokens sized and joins back planner-chosen "
    "(broadcast while small, hash join at web-corpus vocab); "
    "the global decile rank goes through operators.analytics."
    "global_rank (range-repartition + two-level prefix sum — no "
    "single-partition window at any scale). All score math is "
    "integer-nano: per-token log-probs round to nanos, per-doc means "
    "are floored integer division, so every engine computes the "
    "identical longs.",
    tags=("curation", "text", "sampling"),
)
def lm_score_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kittispark.operators.analytics import global_rank

    docs = t(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokens_col("text")).alias("tok"))
    uni = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    tot = uni.agg(
        F.sum("c").alias("n"), F.count(F.lit(1)).alias("v")
    )
    lp = uni.crossJoin(F.broadcast(tot)).select(
        "tok",
        F.round(F.log((F.col("c") + 1.0) / (F.col("n") + F.col("v"))) * 1e9)
        .cast("long")
        .alias("lpn"),
    )
    per_doc = (
        # per-TOKEN log-prob table: vocab-sized, data-scaled — no
        # forced broadcast; the planner broadcasts while the vocab is
        # small and falls back to a hash join at web-corpus vocab
        tok.join(lp, "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.floor(F.sum("lpn") / F.count(F.lit(1))).alias("doc_lpn"),
        )
    )
    ranked = global_rank(
        per_doc,
        F.col("doc_lpn").desc(),
        F.col("doc_id").asc(),
        out_col="rk",
        total_col="n_docs",
    )
    return (
        ranked.groupBy(
            F.floor((F.col("rk") - 1) * 10 / F.col("n_docs"))
            .cast("int")
            .alias("decile")
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.round(
                F.floor(F.sum("doc_lpn") / F.count(F.lit(1))) / 1e9, 6
            ).alias("avg_lp"),
        )
    )


# ---------------------------------------------------------------------------
# Cross-corpus deduplication: held-in reference set A (source 'src0')
# vs candidate set B (every other source) — the decontamination /
# fresh-crawl-vs-existing-corpus shape, where dedup is a JOIN BETWEEN
# corpora, not within one.
# ---------------------------------------------------------------------------


@register(
    "cross_corpus_exact_dedup",
    oracle="""
    WITH ref AS (
        SELECT DISTINCT md5(text) AS h FROM documents WHERE source = 'src0'
    )
    SELECT d.doc_id, d.source,
           CAST(CASE WHEN r.h IS NOT NULL THEN 1 ELSE 0 END AS INT) AS is_dup
    FROM documents d LEFT JOIN ref r ON md5(d.text) = r.h
    WHERE d.source <> 'src0'
    """,
    doc="Exact cross-corpus dedup: flag every candidate-corpus doc "
    "(source != 'src0') whose full text byte-hash already exists in "
    "the reference corpus (source = 'src0') — dedup expressed as a "
    "join BETWEEN corpora (fresh crawl vs existing training set), "
    "not within one. The join key is a 128-bit digest, so the "
    "shuffle moves 16-byte keys instead of document bodies; at 100 "
    "TB the reference digest set is typically orders of magnitude "
    "smaller than the crawl and Spark's AQE will broadcast it when "
    "it fits, else it is a plain co-partitioned hash join on an "
    "effectively unique key (no skew possible).",
    tags=("curation", "dedup"),
)
def cross_corpus_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    ref = (
        docs.filter(F.col("source") == "src0")
        .select(F.md5("text").alias("h"))
        .distinct()
    )
    cand = docs.filter(F.col("source") != "src0").select(
        "doc_id", "source", F.md5("text").alias("__h")
    )
    return cand.join(ref, cand["__h"] == ref["h"], "left").select(
        "doc_id",
        "source",
        F.when(F.col("h").isNotNull(), 1).otherwise(0).cast("int").alias("is_dup"),
    )


def _cross_minhash_oracle() -> str:
    """DuckDB replay of the cross-corpus MinHash band probe, generated
    from the same MINHASH_PARAMS as the Spark operator (the pattern of
    queries/dedup.py:_minhash_cte_block, parameterized by a source
    split instead of a self-join)."""
    from kittispark.operators.dedup import MINHASH_P, MINHASH_PARAMS

    mins = ",\n           ".join(
        f"min(({a} * h + {b}) % {MINHASH_P}) AS m{i}"
        for i, (a, b) in enumerate(MINHASH_PARAMS)
    )
    bands = "\n        UNION ALL ".join(
        f"SELECT doc_id, {bi} AS band_id, "
        f"m{2 * bi} * {MINHASH_P} + m{2 * bi + 1} AS band_hash FROM sig"
        for bi in range(8)
    )
    return f"""
    WITH sh AS (
        SELECT doc_id,
               unnest(list_transform(
                   generate_series(1, greatest(len(tk) - 2, 0)),
                   i -> tk[i] || ' ' || tk[i + 1] || ' ' || tk[i + 2]
               )) AS sh
        FROM (SELECT doc_id, string_split(text, ' ') AS tk FROM documents)
    ),
    h AS (
        SELECT doc_id,
               CAST(CAST(('0x' || substring(md5(sh), 1, 15)) AS UBIGINT)
                    % {MINHASH_P} AS BIGINT) AS h
        FROM sh
    ),
    sig AS (
        SELECT doc_id, {mins} FROM h GROUP BY doc_id
    ),
    banded AS (
        {bands}
    ),
    src AS (SELECT doc_id, source FROM documents),
    matches AS (
        SELECT cb.doc_id, rb.doc_id AS ref_id
        FROM banded cb
        JOIN src cs ON cs.doc_id = cb.doc_id AND cs.source <> 'src0'
        JOIN banded rb ON rb.band_id = cb.band_id
                      AND rb.band_hash = cb.band_hash
        JOIN src rs ON rs.doc_id = rb.doc_id AND rs.source = 'src0'
    )
    SELECT d.doc_id, d.source,
           CAST(coalesce(m.n, 0) AS BIGINT) AS n_ref_partners,
           CAST(CASE WHEN coalesce(m.n, 0) > 0 THEN 1 ELSE 0 END AS INT)
               AS is_near_dup
    FROM documents d
    LEFT JOIN (
        SELECT doc_id, count(DISTINCT ref_id) AS n FROM matches GROUP BY doc_id
    ) m USING (doc_id)
    WHERE d.source <> 'src0'
    """


@register(
    "cross_corpus_minhash_dedup",
    oracle=_cross_minhash_oracle(),
    doc="Near-duplicate cross-corpus dedup: every candidate-corpus "
    "doc (source != 'src0') probes the reference corpus's banded "
    "MinHash signatures (16 hashes / 8 bands, the repo's portable "
    "md5 permutation family — operators/dedup.py:121) and reports "
    "how many distinct reference docs share at least one band "
    "bucket. This is the scale shape of decontaminating a crawl "
    "against an existing training set: candidate generation is a "
    "band-bucket equi-join between the two corpora's band rows — "
    "never an all-pairs comparison — and the 8-byte packed band key "
    "makes any hot bucket AQE-splittable. Docs too short to shingle "
    "(< 3 tokens) have no signature and report 0 partners via the "
    "left join, matching the oracle.",
    tags=("curation", "dedup"),
)
def cross_corpus_minhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kittispark.operators.dedup import minhash_band_rows

    docs = t(spark, sf_dir, "documents")
    banded = minhash_band_rows(docs, "text", "doc_id")
    src = docs.select("doc_id", "source")
    cand_bands = banded.join(
        src.filter(F.col("source") != "src0"), "doc_id"
    ).select("doc_id", "band_id", "band_hash")
    ref_bands = (
        banded.join(src.filter(F.col("source") == "src0"), "doc_id")
        .select(
            F.col("doc_id").alias("ref_id"), "band_id", "band_hash"
        )
    )
    matches = (
        cand_bands.join(ref_bands, ["band_id", "band_hash"])
        .groupBy("doc_id")
        .agg(F.count_distinct("ref_id").alias("n"))
    )
    return (
        docs.filter(F.col("source") != "src0")
        .select("doc_id", "source")
        .join(matches, "doc_id", "left")
        .select(
            "doc_id",
            "source",
            F.coalesce("n", F.lit(0)).alias("n_ref_partners"),
            F.when(F.coalesce("n", F.lit(0)) > 0, 1)
            .otherwise(0)
            .cast("int")
            .alias("is_near_dup"),
        )
    )


@register(
    "unicode_nfc_normalize",
    oracle="""
    WITH aug AS (
        SELECT doc_id, text || ' cafe' || chr(769) AS raw
        FROM documents
    )
    SELECT doc_id,
           CAST(length(raw) AS INT) AS raw_len,
           CAST(length(nfc_normalize(raw)) AS INT) AS nfc_len,
           CAST(CASE WHEN length(nfc_normalize(raw)) <> length(raw)
                THEN 1 ELSE 0 END AS INT) AS changed,
           md5(nfc_normalize(raw)) AS nfc_md5
    FROM aug
    """,
    doc="Unicode NFC normalization — the first pass of any "
    "web-corpus text cleaner (decomposed accents, width/compat "
    "forms, mojibake repair all start with a normalize): each doc is "
    "augmented with a decomposed 'e'+U+0301 combining sequence (so "
    "the test corpus genuinely exercises composition, not just "
    "ASCII identity) and normalized to NFC by a vectorized Arrow "
    "pandas UDF over unicodedata (operators/text.py:nfc_col — "
    "Python is required here because Spark SQL has no normalization "
    "builtin, and the batch-at-a-time UDF keeps the cost one Arrow "
    "roundtrip per partition, not per row). Map-side only at any "
    "scale; the md5 of the normalized bytes gives byte-exact "
    "adjudication against DuckDB's native nfc_normalize.",
    tags=("curation", "text", "udf"),
)
def unicode_nfc_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kittispark.operators.text import nfc_col

    docs = t(spark, sf_dir, "documents")
    aug = docs.select(
        "doc_id", F.concat(F.col("text"), F.lit(" café")).alias("raw")
    )
    return aug.select(
        "doc_id",
        F.length("raw").alias("raw_len"),
        F.length(nfc_col("raw")).alias("nfc_len"),
        # NULL text -> NULL raw: changed falls through to 0 exactly
        # like the oracle CASE (a bare boolean cast would emit NULL)
        F.when(F.length(nfc_col("raw")) != F.length("raw"), 1)
        .otherwise(0)
        .cast("int")
        .alias("changed"),
        F.md5(nfc_col("raw")).alias("nfc_md5"),
    )
