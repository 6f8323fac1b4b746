"""Evaluation and corruption-plan operators: ROUGE-1 overlap
scoring between paired documents, the top-k vocabulary coverage
curve, and a T5-style blockwise span-corruption plan.

All three follow the exact-determinism discipline: integer token
counts and hash-derived decisions everywhere, one rounded division
per emitted ratio.

Reference parity: none — SURVEY.md §6 LLM-pipeline breadth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kittispark.operators.dedup import portable_hash64
from kittispark.operators.text import (
    DE_STOPWORDS,
    EN_STOPWORDS,
    ES_STOPWORDS,
    FR_STOPWORDS,
)
from kittispark.queries._util import t
from kittispark.registry import register

_DUCK_H = "CAST(('0x' || substring(md5({col}), 1, 15)) AS UBIGINT)"

_COVERAGE_KS = (10, 30, 100, 300, 1000)


@register(
    "rouge1_eval_overlap",
    oracle="""
    WITH wc AS (
        SELECT doc_id, w, CAST(count(*) AS BIGINT) AS c
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
              FROM documents WHERE text IS NOT NULL)
        WHERE length(w) > 0
        GROUP BY doc_id, w
    ),
    lens AS (
        SELECT doc_id, CAST(sum(c) AS BIGINT) AS n FROM wc GROUP BY doc_id
    ),
    ov AS (
        SELECT c.doc_id AS cand_id, r.doc_id AS ref_id,
               CAST(sum(least(c.c, r.c)) AS BIGINT) AS overlap
        FROM wc c JOIN wc r
          ON r.doc_id = c.doc_id + 1 AND c.doc_id % 2 = 0
         AND r.w = c.w
        GROUP BY c.doc_id, r.doc_id
    ),
    pairs AS (
        SELECT lc.doc_id AS cand_id, lr.doc_id AS ref_id,
               CAST(coalesce(o.overlap, 0) AS BIGINT) AS overlap,
               lc.n AS n_cand, lr.n AS n_ref
        FROM lens lc
        JOIN lens lr ON lr.doc_id = lc.doc_id + 1 AND lc.doc_id % 2 = 0
        LEFT JOIN ov o ON o.cand_id = lc.doc_id
    )
    SELECT cand_id, ref_id, overlap, n_cand, n_ref,
           round(CAST(overlap AS DOUBLE) / NULLIF(n_cand, 0), 6)
               AS rouge1_precision,
           round(CAST(overlap AS DOUBLE) / NULLIF(n_ref, 0), 6)
               AS rouge1_recall,
           round(2.0 * overlap / NULLIF(n_cand + n_ref, 0), 6) AS rouge1_f1
    FROM pairs
    ORDER BY cand_id
    """,
    doc="ROUGE-1 overlap scoring (Lin 2004) between paired documents "
    "(candidate = even doc_id, reference = the next id — the "
    "generated-vs-reference pairing an eval harness produces): "
    "clipped unigram-multiset overlap sum(min(count_c, count_r)), "
    "precision/recall per pair, and F1 in its 2*ov/(|c|+|r|) exact "
    "form. Everything rides integer counts until the three final "
    "NULLIF-guarded divisions, so the scores cannot fork. Two "
    "vocab-collapsed count tables join on (adjacent-id, word) — at "
    "corpus scale this is a word-keyed equi-shuffle, never a "
    "pairwise document join.",
    tags=("text", "llm-pipeline", "aggregate"),
)
def rouge1_eval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    wc = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    lens = wc.groupBy("doc_id").agg(F.sum("c").cast("bigint").alias("n"))
    c = wc.select(
        F.col("doc_id").alias("cand_id"), "w", F.col("c").alias("cc")
    ).filter(F.col("cand_id") % 2 == 0)
    r = wc.select(
        F.col("doc_id").alias("ref_id"), "w", F.col("c").alias("rc")
    )
    ov = (
        c.join(r, (F.col("ref_id") == F.col("cand_id") + 1) & (c.w == r.w))
        .groupBy("cand_id", "ref_id")
        .agg(F.sum(F.least("cc", "rc")).cast("bigint").alias("overlap"))
    )
    lc = lens.select(F.col("doc_id").alias("cand_id"), F.col("n").alias("n_cand"))
    lr = lens.select(F.col("doc_id").alias("ref_id"), F.col("n").alias("n_ref"))
    pairs = (
        lc.filter(F.col("cand_id") % 2 == 0)
        .join(lr, F.col("ref_id") == F.col("cand_id") + 1)
        .join(ov, ["cand_id", "ref_id"], "left")
        .select(
            "cand_id",
            "ref_id",
            F.coalesce("overlap", F.lit(0)).cast("bigint").alias("overlap"),
            "n_cand",
            "n_ref",
        )
    )
    return pairs.select(
        "cand_id",
        "ref_id",
        "overlap",
        "n_cand",
        "n_ref",
        F.round(
            F.col("overlap").cast("double") / F.nullif(F.col("n_cand"), F.lit(0)), 6
        ).alias("rouge1_precision"),
        F.round(
            F.col("overlap").cast("double") / F.nullif(F.col("n_ref"), F.lit(0)), 6
        ).alias("rouge1_recall"),
        F.round(
            2.0 * F.col("overlap")
            / F.nullif(F.col("n_cand") + F.col("n_ref"), F.lit(0)),
            6,
        ).alias("rouge1_f1"),
    ).orderBy("cand_id")


@register(
    "vocab_coverage_curve",
    oracle=f"""
    WITH wf AS (
        SELECT w, CAST(count(*) AS BIGINT) AS freq
        FROM (SELECT unnest(string_split(text, ' ')) AS w
              FROM documents WHERE text IS NOT NULL)
        WHERE length(w) > 0
        GROUP BY w
    ),
    ranked AS (
        SELECT freq,
               row_number() OVER (ORDER BY freq DESC, w) AS rk
        FROM wf
    ),
    tot AS (SELECT sum(freq) AS n FROM ranked)
    SELECT CAST(k AS BIGINT) AS k,
           CAST(coalesce(sum(freq) FILTER (rk <= k), 0) AS BIGINT)
               AS covered_tokens,
           CAST(coalesce((SELECT n FROM tot), 0) AS BIGINT) AS total_tokens,
           round(CAST(coalesce(sum(freq) FILTER (rk <= k), 0) AS DOUBLE)
                 / NULLIF((SELECT n FROM tot), 0), 6) AS coverage
    FROM ranked,
         LATERAL (SELECT unnest([{", ".join(str(k) for k in _COVERAGE_KS)}])
                  AS k) g
    GROUP BY k
    ORDER BY k
    """,
    doc="Top-k vocabulary coverage curve: what fraction of all token "
    "instances the k most frequent words cover, for k in "
    "(10, 30, 100, 300, 1000) — the saturation curve that sizes a "
    "tokenizer vocabulary and prices an OOV budget. Word ranking "
    "runs on the two-level global_rank (freq desc, word tiebreak — "
    "NO single-partition window even over a billion-type vocab), "
    "then one conditional-sum aggregation produces all five curve "
    "points in a single pass. All-integer until the final rounded "
    "division; the oracle uses a native row_number window — an "
    "independent rank derivation the two-level form must agree "
    "with. Exercises the pid-remap-fixed global_rank on a "
    "DESCENDING key order.",
    tags=("text", "llm-pipeline", "aggregate"),
)
def vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kittispark.operators.analytics import global_rank

    docs = t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    wf = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
    )
    ranked = global_rank(
        wf, F.col("freq").desc(), F.col("w").asc(), out_col="rk"
    )
    tot = ranked.agg(F.coalesce(F.sum("freq"), F.lit(0)).alias("n"))
    ks = F.explode(
        F.array(*[F.lit(k) for k in _COVERAGE_KS])
    ).alias("k")
    expanded = ranked.select("freq", "rk", ks)
    return (
        expanded.groupBy("k")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("rk") <= F.col("k"), F.col("freq"))),
                F.lit(0),
            )
            .cast("bigint")
            .alias("covered_tokens")
        )
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("k").cast("bigint").alias("k"),
            "covered_tokens",
            F.col("n").cast("bigint").alias("total_tokens"),
            F.round(
                F.col("covered_tokens").cast("double")
                / F.nullif(F.col("n"), F.lit(0)),
                6,
            ).alias("coverage"),
        )
        .orderBy("k")
    )


_SPAN_BLOCK = 8  # positions per corruption block


@register(
    "span_corruption_plan",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, CAST(pos AS BIGINT) AS pos,
               (pos - 1) // {_SPAN_BLOCK} AS blk
        FROM documents,
             LATERAL (SELECT unnest(generate_series(
                 1, len(string_split(text, ' ')))) AS pos) g
        WHERE text IS NOT NULL
    ),
    blocks AS (
        SELECT doc_id, blk,
               {_DUCK_H.format(col="doc_id || '#' || blk")} AS hb,
               CAST(count(*) AS BIGINT) AS blk_n
        FROM toks GROUP BY doc_id, blk
    ),
    spans AS (
        SELECT doc_id, blk, blk_n,
               hb % 100 < 40 AS sel,
               blk * {_SPAN_BLOCK} + 1 + (hb // 100) % 5 AS sstart,
               2 + (hb // 10000) % 3 AS slen
        FROM blocks
    ),
    corrupted AS (
        SELECT t.doc_id, t.pos,
               s.sel AND t.pos >= s.sstart
                     AND t.pos < s.sstart + s.slen AS corrupt
        FROM toks t JOIN spans s USING (doc_id, blk)
    ),
    span_rows AS (
        SELECT doc_id,
               CAST(count(*) FILTER (sel AND sstart <= blk * {_SPAN_BLOCK}
                    + blk_n) AS BIGINT) AS n_spans,
               CAST(coalesce(sum(sstart) FILTER (sel AND sstart <=
                    blk * {_SPAN_BLOCK} + blk_n), 0) AS BIGINT)
                   AS span_start_sum
        FROM spans GROUP BY doc_id
    )
    SELECT c.doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(count(*) FILTER (corrupt) AS BIGINT) AS n_corrupted,
           round(CAST(count(*) FILTER (corrupt) AS DOUBLE)
                 / count(*), 6) AS corruption_rate,
           sr.n_spans, sr.span_start_sum
    FROM corrupted c JOIN span_rows sr USING (doc_id)
    GROUP BY c.doc_id, sr.n_spans, sr.span_start_sum
    ORDER BY c.doc_id
    """,
    doc="T5-style SPAN corruption plan, blockwise variant: token "
    "positions partition into 8-position blocks; each block is "
    "independently selected with probability 40% (hash-derived, "
    "replayable) and, if selected, contributes one contiguous span "
    "(start offset h//100 % 5, length 2 + h//10000 % 3 — mean 3), "
    "giving ~15% expected token corruption like the T5 recipe while "
    "keeping spans non-overlapping BY CONSTRUCTION (one span per "
    "block, always inside its block) — the property that makes the "
    "plan embarrassingly parallel instead of a sequential "
    "greedy-resolution scan (the honest deviation from t5's exact "
    "sampler, stated here). Per doc: token/corrupted counts, rate, "
    "span count and an integer span-start checksum, so the oracle "
    "adjudicates WHERE spans begin. A span whose start falls past "
    "the doc's last token in a short final block counts zero "
    "corrupted tokens and is excluded from n_spans by the same "
    "rule on both engines. Map-side hash projection + one doc-key "
    "aggregation.",
    tags=("llm-pipeline", "aggregate"),
)
def span_corruption_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    toks = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos0", "w")
    ).select(
        "doc_id",
        (F.col("pos0") + 1).cast("long").alias("pos"),
    ).withColumn(
        "blk", F.expr(f"(pos - 1) div {_SPAN_BLOCK}")
    )
    hb = portable_hash64(F.concat_ws("#", F.col("doc_id"), F.col("blk")))
    blocks = toks.groupBy("doc_id", "blk").agg(
        F.count(F.lit(1)).cast("bigint").alias("blk_n")
    ).withColumn("hb", hb)
    spans = blocks.select(
        "doc_id",
        "blk",
        "blk_n",
        (F.col("hb") % 100 < 40).alias("sel"),
        (
            F.col("blk") * _SPAN_BLOCK
            + 1
            + F.expr("(hb div 100) % 5")
        ).alias("sstart"),
        (F.lit(2) + F.expr("(hb div 10000) % 3")).alias("slen"),
    )
    corrupted = toks.join(spans, ["doc_id", "blk"]).select(
        "doc_id",
        "pos",
        (
            F.col("sel")
            & (F.col("pos") >= F.col("sstart"))
            & (F.col("pos") < F.col("sstart") + F.col("slen"))
        ).alias("corrupt"),
    )
    in_doc = F.col("sel") & (
        F.col("sstart") <= F.col("blk") * _SPAN_BLOCK + F.col("blk_n")
    )
    span_rows = spans.groupBy("doc_id").agg(
        F.sum(F.when(in_doc, 1).otherwise(0)).cast("bigint").alias("n_spans"),
        F.coalesce(F.sum(F.when(in_doc, F.col("sstart"))), F.lit(0))
        .cast("bigint")
        .alias("span_start_sum"),
    )
    per_doc = corrupted.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.sum(F.when(F.col("corrupt"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_corrupted"),
    )
    return (
        per_doc.join(span_rows, "doc_id")
        .select(
            "doc_id",
            "n_tokens",
            "n_corrupted",
            F.round(
                F.col("n_corrupted").cast("double") / F.col("n_tokens"), 6
            ).alias("corruption_rate"),
            "n_spans",
            "span_start_sum",
        )
        .orderBy("doc_id")
    )


def _sw_list_sql(words) -> str:
    return ", ".join("'" + w + "'" for w in sorted(words))


@register(
    "lang_confusion_matrix",
    oracle="""
    WITH scored AS (
        SELECT lang,
               CAST(len(list_filter(string_split(text, ' '),
                    x -> x IN ({en}))) AS DOUBLE)
                   / len(string_split(text, ' ')) AS s_en,
               CAST(len(list_filter(string_split(text, ' '),
                    x -> x IN ({de}))) AS DOUBLE)
                   / len(string_split(text, ' ')) AS s_de,
               CAST(len(list_filter(string_split(text, ' '),
                    x -> x IN ({es}))) AS DOUBLE)
                   / len(string_split(text, ' ')) AS s_es,
               CAST(len(list_filter(string_split(text, ' '),
                    x -> x IN ({fr}))) AS DOUBLE)
                   / len(string_split(text, ' ')) AS s_fr
        FROM documents
        WHERE text IS NOT NULL AND len(string_split(text, ' ')) > 0
    ),
    pred AS (
        SELECT lang,
               CASE WHEN greatest(s_en, s_de, s_es, s_fr) < 0.02 THEN 'unk'
                    WHEN s_en = greatest(s_en, s_de, s_es, s_fr) THEN 'en'
                    WHEN s_de = greatest(s_en, s_de, s_es, s_fr) THEN 'de'
                    WHEN s_es = greatest(s_en, s_de, s_es, s_fr) THEN 'es'
                    ELSE 'fr' END AS lang_pred
        FROM scored
    )
    SELECT lang, lang_pred, CAST(count(*) AS BIGINT) AS n_docs
    FROM pred
    GROUP BY lang, lang_pred
    ORDER BY lang NULLS FIRST, lang_pred
    """.format(
        en=_sw_list_sql(EN_STOPWORDS),
        de=_sw_list_sql(DE_STOPWORDS),
        es=_sw_list_sql(ES_STOPWORDS),
        fr=_sw_list_sql(FR_STOPWORDS),
    ),
    doc="Language-ID classifier AUDIT: the confusion matrix of the "
    "4-profile stopword classifier (operators.text."
    "lang_id_stopwords — argmax of per-language stopword hit rates "
    "with an 'unk' floor at 0.02) against the gold lang column — "
    "the per-class error table a curation reviewer reads before "
    "trusting automated language routing. The argmax tie order "
    "(en, de, es, fr) and the floor are replicated EXACTLY in the "
    "oracle's CASE chain; both engines compute each score with one "
    "identical int/int double division, so the float equality "
    "comparisons in the argmax cannot fork. Zero-token and NULL "
    "texts are excluded by explicit contract on both sides. One "
    "projection + one (gold, pred) hash aggregation at any scale.",
    tags=("text", "governance", "aggregate"),
)
def lang_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kittispark.operators.text import lang_id_stopwords, tokens_col

    docs = t(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & (F.size(tokens_col("text")) > 0)
    )
    pred = lang_id_stopwords(docs)
    return (
        pred.groupBy("lang", "lang_pred")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        .orderBy(F.col("lang").asc_nulls_first(), "lang_pred")
    )
