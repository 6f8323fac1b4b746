"""Corpus-level lexical analytics: sentence segmentation profile,
exact lexical-diversity indices, and collocation mining by lift.

These are the profile-the-corpus operators that run before any
training-data decision (which sources are boilerplate-heavy? how
lexically diverse is each language slice? which word pairs are
fused units?). All three keep the cross-engine discipline:

- tokenization is the shared ASCII fold + ``[^a-z]+`` split used by
  tfidf/token_count (full-Unicode case mapping forks JVM vs
  utf8proc; ASCII translate does not);
- NO logarithms cross the engine boundary: diversity uses the
  Simpson index (pure rational arithmetic — exact integer
  numerators/denominators, one final division) instead of Shannon
  entropy, and collocation strength uses LIFT (c_xy*N / (c_x*c_y),
  again one exact rational) instead of log-PMI — same orderings,
  zero float-accumulation or libm-variance risk;
- every cross-row sum is integer; floats appear once, at emission,
  rounded.

Reference parity: none (SURVEY.md §6 breadth).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from kittispark.queries._util import t
from kittispark.registry import register

# the shared ASCII-fold tokenizer (see tfidf_top_terms for why
# translate-not-lower)
_FOLD_SPARK = (
    "translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', "
    "'abcdefghijklmnopqrstuvwxyz')"
)
_FOLD_DUCK = (
    "translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', "
    "'abcdefghijklmnopqrstuvwxyz')"
)


@register(
    "sentence_split_profile",
    oracle="""
    WITH segs AS (
        SELECT lang, s.seg
        FROM documents,
             LATERAL (SELECT unnest(string_split_regex(text, '[.!?]+'))
                      AS seg) s
        WHERE text IS NOT NULL
    ),
    sent AS (
        SELECT lang, length(seg) AS n_chars
        FROM segs WHERE regexp_matches(seg, '[a-zA-Z0-9]')
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_sentences,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           round(CAST(sum(n_chars) AS DOUBLE) / count(*), 4)
               AS avg_sentence_chars
    FROM sent
    GROUP BY lang
    ORDER BY lang
    """,
    doc="Sentence segmentation profile per language: split on "
    "[.!?]+ runs, keep segments containing at least one "
    "alphanumeric (pure-punctuation/whitespace fragments are not "
    "sentences), count and measure them. Segment lengths include "
    "their incidental whitespace — a documented, engine-identical "
    "convention (trimming semantics differ subtly across engines; "
    "the raw length does not). The split and the keep-filter are "
    "the same RE2/Java-compatible character classes on both "
    "engines. Plan: one map-side explode + one hash agg keyed on "
    "lang — the explode multiplies rows but never shuffles "
    "un-aggregated sentences (partial aggregation combines "
    "map-side). NULL text excluded by contract.",
    tags=("text", "corpus"),
)
def sentence_split_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    segs = docs.select(
        "lang", F.explode(F.split(F.col("text"), r"[.!?]+")).alias("seg")
    )
    sent = segs.where(F.col("seg").rlike("[a-zA-Z0-9]")).select(
        "lang", F.length("seg").alias("n_chars")
    )
    return (
        sent.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sentences"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
        .select(
            "lang",
            "n_sentences",
            "total_chars",
            F.round(
                F.col("total_chars").cast("double") / F.col("n_sentences"),
                4,
            ).alias("avg_sentence_chars"),
        )
        .orderBy("lang")
    )


@register(
    "token_diversity_index",
    oracle=f"""
    WITH tokens AS (
        SELECT source, t.term
        FROM documents,
             LATERAL (SELECT unnest(string_split_regex(
                          {_FOLD_DUCK}, '[^a-z]+')) AS term) t
        WHERE text IS NOT NULL AND t.term <> ''
    ),
    tc AS (
        SELECT source, term, CAST(count(*) AS BIGINT) AS c
        FROM tokens GROUP BY 1, 2
    )
    SELECT source,
           CAST(sum(c) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS n_types,
           round(CAST(count(*) AS DOUBLE) / CAST(sum(c) AS DOUBLE), 6)
               AS type_token_ratio,
           round(1.0 - CAST(sum(c * c) AS DOUBLE)
                       / (CAST(sum(c) AS DOUBLE) * CAST(sum(c) AS DOUBLE)),
                 6) AS simpson_index
    FROM tc
    GROUP BY source
    ORDER BY source
    """,
    doc="Lexical diversity per source: token count, vocabulary size, "
    "type-token ratio, and the SIMPSON diversity index "
    "1 - sum(c_i^2)/N^2 — chosen over Shannon entropy precisely "
    "because it is pure rational arithmetic: the numerator and "
    "denominator are exact integer sums (DuckDB HUGEINT / Spark "
    "the same sums under 2^63 here because c_i^2 sums are bounded "
    "by N^2), so no per-term logarithm — whose libm rounding can "
    "differ across engines — ever crosses the comparison boundary. "
    "Same diversity ORDERING as entropy for the screening decision "
    "this feeds (flag low-diversity = template/boilerplate-heavy "
    "sources). Plan: tokenize once, two stacked hash aggs "
    "((source,term) then source) — both map-side combined.",
    tags=("text", "corpus", "aggregate"),
)
def token_diversity_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    tokens = docs.select(
        "source",
        F.explode(F.split(F.expr(_FOLD_SPARK), "[^a-z]+")).alias("term"),
    ).where(F.col("term") != "")
    tc = tokens.groupBy("source", "term").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    return (
        tc.groupBy("source")
        .agg(
            F.sum("c").cast("bigint").alias("n_tokens"),
            F.count(F.lit(1)).cast("bigint").alias("n_types"),
            F.sum(F.col("c") * F.col("c")).cast("bigint").alias("ssq"),
        )
        .select(
            "source",
            "n_tokens",
            "n_types",
            F.round(
                F.col("n_types").cast("double")
                / F.col("n_tokens").cast("double"),
                6,
            ).alias("type_token_ratio"),
            F.round(
                1.0
                - F.col("ssq").cast("double")
                / (
                    F.col("n_tokens").cast("double")
                    * F.col("n_tokens").cast("double")
                ),
                6,
            ).alias("simpson_index"),
        )
        .orderBy("source")
    )


_COLL_MIN_COUNT = 5
_COLL_TOP = 25


@register(
    "bigram_collocation_lift",
    oracle=f"""
    WITH raw AS (
        SELECT doc_id,
               unnest(string_split_regex({_FOLD_DUCK}, '[^a-z]+')) AS term,
               unnest(generate_series(1, len(string_split_regex(
                   {_FOLD_DUCK}, '[^a-z]+')))) AS p0
        FROM documents
        WHERE text IS NOT NULL
    ),
    toks AS (
        SELECT doc_id, term,
               row_number() OVER (PARTITION BY doc_id ORDER BY p0) AS pos
        FROM raw WHERE term <> ''
    ),
    uni AS (
        SELECT term, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY term
    ),
    n AS (SELECT CAST(count(*) AS BIGINT) AS nt FROM toks),
    bi AS (
        SELECT a.term AS w1, b.term AS w2, CAST(count(*) AS BIGINT) AS cb
        FROM toks a
        JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        GROUP BY 1, 2
    ),
    scored AS (
        SELECT w1, w2, cb,
               round(CAST(cb AS DOUBLE) * CAST(n.nt AS DOUBLE)
                     / (CAST(u1.c AS DOUBLE) * CAST(u2.c AS DOUBLE)), 6)
                   AS lift
        FROM bi
        JOIN uni u1 ON u1.term = bi.w1
        JOIN uni u2 ON u2.term = bi.w2
        CROSS JOIN n
        WHERE cb >= {_COLL_MIN_COUNT}
    )
    SELECT w1, w2, cb, lift
    FROM scored
    ORDER BY lift DESC, w1, w2
    LIMIT {_COLL_TOP}
    """,
    doc="Collocation mining by LIFT: adjacent-token bigrams with "
    f"count >= {_COLL_MIN_COUNT}, scored by cb*N/(c1*c2) — the "
    "PMI exponent — and the top "
    f"{_COLL_TOP} returned (lift desc, lexicographic tiebreak). "
    "Lift preserves PMI's ranking exactly (PMI = log2(lift), log "
    "is monotone) while keeping the score ONE exact rational: "
    "integer counts, one double division, no logarithm whose "
    "last-ulp could fork the engines. Token positions come from "
    "the split-array ordinality, so adjacency is a doc-partitioned "
    "self-join on pos+1 — at 100 TB this is posexplode + one "
    "(doc,pos)-keyed shuffle, never a corpus-wide window; unigram "
    "totals join back on the term key and N rides a 1-row "
    "broadcast. The same skeleton serves phrase detection for "
    "tokenizer vocab prep (word2vec-style phrase merging).",
    tags=("text", "corpus", "join"),
)
def bigram_collocation_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r11 optimization: the r8-r10 form materialized dense token
    # positions with a row_number() window (Exchange(doc_id) + Sort
    # over EVERY token row) and built adjacency with a toks-x-toks
    # self-join on pos+1 — the token pipeline evaluated 4x (bi twice,
    # uni, n), one copy BROADCAST (the entire tokenized corpus as a
    # hash relation — impossible past the 8 GB cap at real scale).
    # Adjacency among kept tokens is just consecutive elements of the
    # empty-filtered split array (array_filter preserves order, so
    # dense rank is the array ordinal for free): one Generate
    # materializes the kept-token array per doc, bigrams explode as
    # (ts[i], ts[i+1]) pairs per row, unigrams explode the same
    # array, and N = sum of unigram counts (tiny, derived from uni's
    # agg output instead of a fourth corpus scan). Zero corpus-wide
    # shuffles/windows/broadcasts remain — the only exchanges carry
    # partial-aggregated (term) and (w1,w2) count rows. Output
    # value-identical (same kept-token sequences -> same pairs/
    # counts/lift); certified against the unchanged oracle.
    docs = t(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    base = docs.select(
        F.explode(
            F.array(
                F.filter(
                    F.split(F.expr(_FOLD_SPARK), "[^a-z]+"),
                    lambda x: x != F.lit(""),
                )
            )
        ).alias("__ts")
    )
    uni = (
        base.select(F.explode("__ts").alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    n = uni.agg(F.sum("c").cast("bigint").alias("nt"))
    k = F.size("__ts")
    idx = F.when(k >= 2, F.sequence(F.lit(1), k - F.lit(1))).otherwise(
        F.array().cast("array<int>")
    )
    bi = (
        base.select("__ts", F.explode(idx).alias("__i"))
        .select(
            F.element_at("__ts", F.col("__i")).alias("w1"),
            F.element_at("__ts", F.col("__i") + F.lit(1)).alias("w2"),
        )
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cb"))
        .where(F.col("cb") >= _COLL_MIN_COUNT)
    )
    scored = (
        bi.join(uni.select(F.col("term").alias("w1"), F.col("c").alias("c1")), "w1")
        .join(uni.select(F.col("term").alias("w2"), F.col("c").alias("c2")), "w2")
        .crossJoin(F.broadcast(n))
        .select(
            "w1",
            "w2",
            "cb",
            F.round(
                F.col("cb").cast("double")
                * F.col("nt").cast("double")
                / (F.col("c1").cast("double") * F.col("c2").cast("double")),
                6,
            ).alias("lift"),
        )
    )
    return scored.orderBy(
        F.col("lift").desc(), "w1", "w2"
    ).limit(_COLL_TOP).select("w1", "w2", "cb", "lift")


_KEY_MIN_A = 5
_KEY_TOP = 25


@register(
    "term_keyness_chisq",
    oracle=f"""
    WITH tokens AS (
        SELECT source, t.term
        FROM documents,
             LATERAL (SELECT unnest(string_split_regex(
                          {_FOLD_DUCK}, '[^a-z]+')) AS term) t
        WHERE text IS NOT NULL AND t.term <> ''
    ),
    tc AS (
        SELECT source, term, CAST(count(*) AS BIGINT) AS a
        FROM tokens GROUP BY 1, 2
    ),
    st AS (SELECT source, CAST(sum(a) AS BIGINT) AS s_tot FROM tc GROUP BY source),
    tt AS (SELECT term, CAST(sum(a) AS BIGINT) AS t_tot FROM tc GROUP BY term),
    n AS (SELECT CAST(sum(a) AS BIGINT) AS nn FROM tc),
    cells AS (
        SELECT tc.source, tc.term, tc.a,
               tt.t_tot - tc.a            AS b,
               st.s_tot - tc.a            AS c,
               n.nn - tt.t_tot - st.s_tot + tc.a AS d,
               n.nn AS nn
        FROM tc JOIN st USING (source) JOIN tt USING (term) CROSS JOIN n
        WHERE tc.a >= {_KEY_MIN_A}
    )
    SELECT source, term, a AS n_in_source,
           round(CAST(CAST(nn AS HUGEINT)
                      * (CAST(a AS HUGEINT) * d - CAST(b AS HUGEINT) * c)
                      * (CAST(a AS HUGEINT) * d - CAST(b AS HUGEINT) * c)
                      AS DOUBLE)
                 / (CAST(CAST(a + b AS HUGEINT) * (c + d) AS DOUBLE)
                    * CAST(CAST(a + c AS HUGEINT) * (b + d) AS DOUBLE)),
                 4) AS chi2
    FROM cells
    ORDER BY chi2 DESC, source, term
    LIMIT {_KEY_TOP}
    """,
    doc="Distinctive-vocabulary mining (keyness): for every "
    "(source, term) cell of the token contingency table, the "
    "chi-square statistic of term-vs-source association — "
    "N(ad-bc)^2 / ((a+b)(c+d)(a+c)(b+d)) — ranked to surface the "
    f"top {_KEY_TOP} terms most characteristic of one source "
    "(min in-source count "
    f"{_KEY_MIN_A}; ties lexicographic). Chi-square keeps the "
    "no-log discipline: all four margins are exact integers, the "
    "statistic is one rational whose numerator rides "
    "DECIMAL(38,0)/HUGEINT (N*(ad-bc)^2 reaches ~1e26 at sf0.1 — "
    "int64 would overflow silently in a lesser engine and throw "
    "under ANSI here), and one double division lands on both "
    "engines identically. This is the corpus-curation 'what makes "
    "this source different' screen (template detection, source "
    "fingerprinting). Plan: tokenize once, (source,term) hash agg, "
    "margins via two small reaggregations joined back on their "
    "keys, N broadcast as a 1-row aggregate.",
    tags=("text", "corpus", "stats"),
)
def term_keyness_chisq(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    tokens = docs.select(
        "source",
        F.explode(F.split(F.expr(_FOLD_SPARK), "[^a-z]+")).alias("term"),
    ).where(F.col("term") != "")
    tc = tokens.groupBy("source", "term").agg(
        F.count(F.lit(1)).cast("bigint").alias("a")
    )
    st = tc.groupBy("source").agg(F.sum("a").cast("bigint").alias("s_tot"))
    tt = tc.groupBy("term").agg(F.sum("a").cast("bigint").alias("t_tot"))
    n = tc.agg(F.sum("a").cast("bigint").alias("nn"))
    dec = "decimal(38,0)"
    cells = (
        tc.join(F.broadcast(st), "source")
        .join(tt, "term")
        .crossJoin(F.broadcast(n))
        .where(F.col("a") >= _KEY_MIN_A)
        .select(
            "source",
            "term",
            "a",
            (F.col("t_tot") - F.col("a")).alias("b"),
            (F.col("s_tot") - F.col("a")).alias("c"),
            (F.col("nn") - F.col("t_tot") - F.col("s_tot") + F.col("a"))
            .alias("d"),
            "nn",
        )
    )
    adbc = (
        F.col("a").cast(dec) * F.col("d").cast(dec)
        - F.col("b").cast(dec) * F.col("c").cast(dec)
    )
    chi2 = F.round(
        (F.col("nn").cast(dec) * adbc * adbc).cast("double")
        / (
            ((F.col("a") + F.col("b")).cast(dec)
             * (F.col("c") + F.col("d")).cast(dec)).cast("double")
            * ((F.col("a") + F.col("c")).cast(dec)
               * (F.col("b") + F.col("d")).cast(dec)).cast("double")
        ),
        4,
    )
    return (
        cells.select(
            "source",
            "term",
            F.col("a").alias("n_in_source"),
            chi2.alias("chi2"),
        )
        .orderBy(F.col("chi2").desc(), "source", "term")
        .limit(_KEY_TOP)
    )


@register(
    "readability_profile",
    oracle=f"""
    WITH words AS (
        SELECT source, t.term,
               greatest(1, len(regexp_extract_all(t.term, '[aeiouy]+')))
                   AS syl
        FROM documents,
             LATERAL (SELECT unnest(string_split_regex(
                          {_FOLD_DUCK}, '[^a-z]+')) AS term) t
        WHERE text IS NOT NULL AND t.term <> ''
    ),
    wstats AS (
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_words,
               CAST(sum(syl) AS BIGINT) AS n_syllables
        FROM words GROUP BY source
    ),
    segs AS (
        SELECT source, s.seg
        FROM documents,
             LATERAL (SELECT unnest(string_split_regex(text, '[.!?]+'))
                      AS seg) s
        WHERE text IS NOT NULL
    ),
    sstats AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_sentences
        FROM segs WHERE regexp_matches(seg, '[a-zA-Z0-9]')
        GROUP BY source
    )
    SELECT w.source, n_words, n_sentences, n_syllables,
           round(CAST(n_words AS DOUBLE) / n_sentences, 4)
               AS words_per_sentence,
           round(CAST(n_syllables AS DOUBLE) / n_words, 4)
               AS syllables_per_word,
           round(0.39 * (CAST(n_words AS DOUBLE) / n_sentences)
                 + 11.8 * (CAST(n_syllables AS DOUBLE) / n_words)
                 - 15.59, 4) AS fk_grade
    FROM wstats w JOIN sstats s ON s.source = w.source
    ORDER BY w.source
    """,
    doc="Readability profile per source: words, sentences, "
    "vowel-group syllables, and the Flesch-Kincaid grade "
    "0.39*(W/S) + 11.8*(Syl/W) - 15.59 — a standard quality-"
    "screening feature for training corpora (too-low or too-high "
    "grades flag boilerplate and garbled text respectively). The "
    "syllable counter is the deterministic [aeiouy]+ group "
    "heuristic (min 1 per word), identical regex both engines; "
    "words use the shared ASCII-fold tokenizer and sentences the "
    "shared [.!?]+ alnum-segment convention, so all three counts "
    "are exact integers and the grade is one identical double "
    "expression per engine. Plan: two map-side explodes, two "
    "source-keyed hash aggs, one tiny join.",
    tags=("text", "corpus"),
)
def readability_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    words = docs.select(
        "source",
        F.explode(F.split(F.expr(_FOLD_SPARK), "[^a-z]+")).alias("term"),
    ).where(F.col("term") != "")
    words = words.select(
        "source",
        F.greatest(
            F.lit(1),
            F.size(
                F.regexp_extract_all(F.col("term"), F.lit("[aeiouy]+"), 0)
            ),
        ).alias("syl"),
    )
    wstats = words.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_words"),
        F.sum("syl").cast("bigint").alias("n_syllables"),
    )
    segs = docs.select(
        "source", F.explode(F.split(F.col("text"), r"[.!?]+")).alias("seg")
    )
    sstats = (
        segs.where(F.col("seg").rlike("[a-zA-Z0-9]"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_sentences"))
    )
    wps = F.col("n_words").cast("double") / F.col("n_sentences")
    spw = F.col("n_syllables").cast("double") / F.col("n_words")
    return (
        wstats.join(sstats, "source")
        .select(
            "source",
            "n_words",
            "n_sentences",
            "n_syllables",
            F.round(wps, 4).alias("words_per_sentence"),
            F.round(spw, 4).alias("syllables_per_word"),
            F.round(0.39 * wps + 11.8 * spw - 15.59, 4).alias("fk_grade"),
        )
        .orderBy("source")
    )


_HEAPS_BUCKET = 1024


@register(
    "heaps_vocab_growth",
    oracle=f"""
    WITH tokens AS (
        SELECT doc_id, t.term
        FROM documents,
             LATERAL (SELECT unnest(string_split_regex(
                          {_FOLD_DUCK}, '[^a-z]+')) AS term) t
        WHERE text IS NOT NULL AND t.term <> ''
    ),
    pd AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens
        FROM tokens GROUP BY doc_id
    ),
    ft AS (
        SELECT term, min(doc_id) AS fdoc FROM tokens GROUP BY term
    ),
    nv AS (
        SELECT fdoc AS doc_id, CAST(count(*) AS BIGINT) AS n_new_terms
        FROM ft GROUP BY fdoc
    )
    SELECT p.doc_id, p.n_tokens,
           CAST(COALESCE(v.n_new_terms, 0) AS BIGINT) AS n_new_terms,
           CAST(sum(p.n_tokens) OVER (ORDER BY p.doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum_tokens,
           CAST(sum(COALESCE(v.n_new_terms, 0)) OVER (ORDER BY p.doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum_vocab
    FROM pd p LEFT JOIN nv v ON v.doc_id = p.doc_id
    ORDER BY p.doc_id
    """,
    doc="Heaps-law vocabulary-growth curve: per document (in doc_id "
    "order) the token count, the number of never-seen-before terms "
    "(first occurrence attributed to min doc_id — deterministic "
    "regardless of scan order), and the running totals cum_tokens / "
    "cum_vocab. The curve is how corpus engineers decide when "
    "additional data stops buying vocabulary (V ~ k*N^beta "
    "flattening) and calibrate tokenizer vocab sizes. All counts "
    "are exact integers through the shared ASCII-fold tokenizer. "
    "Plan: the running sums are TWO-LEVEL — an intra-bucket window "
    f"partitioned by doc_id div {_HEAPS_BUCKET} (parallel) plus a "
    "broadcast running-offset join over the tiny bucket-partial "
    "table (the global_rank prefix-sum shape) — no single-partition "
    "window ever sees per-doc rows; only bucket partials "
    f"(corpus/{_HEAPS_BUCKET} rows) pass through the one global "
    "window. Docs with zero tokens (NULL/empty/punctuation-only "
    "text) are not curve points by contract.",
    tags=("text", "corpus", "window"),
)
def heaps_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    tokens = docs.select(
        "doc_id",
        F.explode(F.split(F.expr(_FOLD_SPARK), "[^a-z]+")).alias("term"),
    ).where(F.col("term") != "")
    return vocab_growth_curve(tokens)


def vocab_growth_curve(tokens: DataFrame) -> DataFrame:
    """Heaps-law curve over a (doc_id, term) occurrence table: per
    doc_id (ascending) the token count, never-seen-before term count
    (first occurrence = min doc_id), and the two running totals via
    the two-level bucket prefix-sum (no single-partition window over
    per-doc rows)."""
    pd_ = tokens.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens")
    )
    first = tokens.groupBy("term").agg(F.min("doc_id").alias("fdoc"))
    nv = first.groupBy(F.col("fdoc").alias("doc_id")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_new_terms")
    )
    base = (
        pd_.join(nv, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("n_new_terms", F.lit(0)).cast("bigint").alias(
                "n_new_terms"
            ),
        )
        .withColumn(
            "_b", (F.col("doc_id") - F.col("doc_id") % _HEAPS_BUCKET)
        )
    )
    w_loc = (
        W.partitionBy("_b")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    local = base.select(
        "doc_id",
        "n_tokens",
        "n_new_terms",
        "_b",
        F.sum("n_tokens").over(w_loc).alias("_ct_loc"),
        F.sum("n_new_terms").over(w_loc).alias("_cv_loc"),
    )
    partials = base.groupBy("_b").agg(
        F.sum("n_tokens").alias("_pt"), F.sum("n_new_terms").alias("_pv")
    )
    w_off = W.orderBy("_b").rowsBetween(W.unboundedPreceding, W.currentRow)
    offs = partials.select(
        F.col("_b").alias("_ob"),
        (F.sum("_pt").over(w_off) - F.col("_pt")).alias("_ot"),
        (F.sum("_pv").over(w_off) - F.col("_pv")).alias("_ov"),
    )
    return (
        local.join(F.broadcast(offs), F.col("_b") == F.col("_ob"))
        .select(
            "doc_id",
            "n_tokens",
            "n_new_terms",
            (F.col("_ot") + F.col("_ct_loc")).cast("bigint").alias(
                "cum_tokens"
            ),
            (F.col("_ov") + F.col("_cv_loc")).cast("bigint").alias(
                "cum_vocab"
            ),
        )
        .orderBy("doc_id")
    )


@register(
    "source_overlap_jaccard",
    oracle=f"""
    WITH vocab AS (
        SELECT DISTINCT source, t.term
        FROM documents,
             LATERAL (SELECT unnest(string_split_regex(
                          {_FOLD_DUCK}, '[^a-z]+')) AS term) t
        WHERE text IS NOT NULL AND source IS NOT NULL AND t.term <> ''
    ),
    sizes AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n FROM vocab GROUP BY 1
    ),
    inter AS (
        SELECT a.source AS source_a, b.source AS source_b,
               CAST(count(*) AS BIGINT) AS n_common
        FROM vocab a JOIN vocab b
          ON a.term = b.term AND a.source < b.source
        GROUP BY 1, 2
    )
    SELECT i.source_a, i.source_b,
           sa.n AS vocab_a, sb.n AS vocab_b, i.n_common,
           round(CAST(i.n_common AS DOUBLE)
                 / (sa.n + sb.n - i.n_common), 4) AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.source = i.source_a
    JOIN sizes sb ON sb.source = i.source_b
    ORDER BY i.source_a, i.source_b
    """,
    doc="Pairwise vocabulary overlap between sources: Jaccard "
    "|Va int Vb| / |Va u Vb| over the DISTINCT term sets of each "
    "source pair — the corpus-mixing diagnostic (near-identical "
    "vocabularies flag mirrored/scraped-twice sources; disjoint "
    "ones flag domain gaps a mixture must cover). One exact "
    "rational per pair, rounded at emission. Plan: vocabulary is "
    "collapsed to DISTINCT (source, term) FIRST, so the pair join "
    "is term-keyed over vocabulary rows, never corpus rows, and a "
    "term shared by all S sources yields at most S*(S-1)/2 pairs — "
    "bounded by the (small) source dimension squared, not the "
    "corpus; sizes join is a broadcast of |S| rows. Pairs with "
    "zero common terms are absent by inner-join semantics (their "
    "Jaccard is 0); NULL source excluded by contract.",
    tags=("text", "corpus", "dedup"),
)
def source_overlap_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").where(
        F.col("text").isNotNull() & F.col("source").isNotNull()
    )
    vocab = (
        docs.select(
            "source",
            F.explode(F.split(F.expr(_FOLD_SPARK), "[^a-z]+")).alias(
                "term"
            ),
        )
        .where(F.col("term") != "")
        .distinct()
    )
    return vocab_jaccard_pairs(vocab)


def vocab_jaccard_pairs(vocab: DataFrame) -> DataFrame:
    """Pairwise Jaccard over a DISTINCT (source, term) vocabulary
    table: term-keyed pair join + broadcast size joins; pairs with
    empty intersection are absent (their Jaccard is 0)."""
    sizes = vocab.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    a = vocab.select(F.col("source").alias("source_a"), "term")
    b = vocab.select(F.col("source").alias("source_b"), "term")
    inter = (
        a.join(b, "term")
        .where(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_common"))
    )
    sa = sizes.select(F.col("source").alias("source_a"), F.col("n").alias("vocab_a"))
    sb = sizes.select(F.col("source").alias("source_b"), F.col("n").alias("vocab_b"))
    return (
        inter.join(F.broadcast(sa), "source_a")
        .join(F.broadcast(sb), "source_b")
        .select(
            "source_a",
            "source_b",
            "vocab_a",
            "vocab_b",
            "n_common",
            F.round(
                F.col("n_common").cast("double")
                / (F.col("vocab_a") + F.col("vocab_b") - F.col("n_common")),
                4,
            ).alias("jaccard"),
        )
        .orderBy("source_a", "source_b")
    )


@register(
    "quantile_normalize_doclen",
    oracle="""
    WITH b AS (
        SELECT doc_id, source, n_chars FROM documents
        WHERE n_chars IS NOT NULL AND source IS NOT NULL
    ),
    sr AS (
        SELECT doc_id, source, n_chars,
               row_number() OVER (PARTITION BY source
                                  ORDER BY n_chars, doc_id) AS r,
               count(*) OVER (PARTITION BY source) AS m
        FROM b
    ),
    gr AS (
        SELECT n_chars AS norm_chars,
               row_number() OVER (ORDER BY n_chars, doc_id) AS g
        FROM b
    ),
    n AS (SELECT count(*) AS nn FROM b)
    SELECT sr.doc_id, sr.source, sr.n_chars,
           CAST(gr.norm_chars AS BIGINT) AS norm_chars
    FROM sr CROSS JOIN n
    JOIN gr ON gr.g = (sr.r * n.nn - 1) // sr.m + 1
    ORDER BY sr.doc_id
    """,
    doc="Quantile normalization of per-source document-length "
    "distributions onto the GLOBAL distribution — the calibration "
    "step that makes heterogeneous per-source scores comparable "
    "before one corpus-wide threshold is applied (here with "
    "n_chars as the score column; any score plugs into the same "
    "shape). Each doc at within-source rank r of m maps to the "
    "global order statistic at rank ceil(r*N/m) — pure integer "
    "arithmetic ((r*N - 1) DIV m + 1; exact while N*m < 2^63, the "
    "documented bound — past it, swap the exact global rank for "
    "bucketed quantiles). BOTH rank sides are two-level prefix-sum "
    "ranks (grouped_rank / global_rank), so no data-sized single-"
    "partition window exists; the final lookup is a rank-keyed "
    "equi-join. Ties break on doc_id; NULL n_chars/source excluded "
    "by contract.",
    tags=("stats", "corpus", "window"),
)
def quantile_normalize_doclen(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kittispark.operators.analytics import (
        _exact_div,
        global_rank,
        grouped_rank,
    )

    b = (
        t(spark, sf_dir, "documents")
        .where(F.col("n_chars").isNotNull() & F.col("source").isNotNull())
        .select("doc_id", "source", "n_chars")
    )
    sr = grouped_rank(
        b, ["source"], F.col("n_chars"), F.col("doc_id"), out_col="r",
        total_col="m",
    )
    gr = global_rank(
        b.select(F.col("n_chars").alias("norm_chars"), "doc_id"),
        F.col("norm_chars"),
        F.col("doc_id"),
        out_col="g",
        total_col="nn",
    ).select("norm_chars", "g", "nn")
    tgt = sr.join(
        F.broadcast(gr.agg(F.max("nn").alias("nn"))), how="cross"
    ).withColumn(
        "g_tgt",
        _exact_div(F.col("r") * F.col("nn") - 1, F.col("m")) + 1,
    )
    return (
        tgt.join(gr.drop("nn"), F.col("g") == F.col("g_tgt"))
        .select(
            "doc_id",
            "source",
            "n_chars",
            F.col("norm_chars").cast("bigint").alias("norm_chars"),
        )
        .orderBy("doc_id")
    )
