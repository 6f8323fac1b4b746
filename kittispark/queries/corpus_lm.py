"""Corpus-statistics / language-model queries for the LLM
training-data pipeline: bigram-LM quality scoring (perplexity-proxy
filtering), boilerplate token pruning with ordered reassembly,
vocabulary-coverage (OOV) profiling, and temperature-weighted data
mixture computation.

All four are pure JVM column expressions + hash aggregations with
full DuckDB oracle twins. They model the corpus-hygiene stages that
sit between dedup and packing in a real pretraining pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kittispark.operators.util import materialize, release

from kittispark.registry import register
from kittispark.queries._util import t
from kittispark.operators.text import (
    bigram_lm_scores,
    prune_frequent_tokens,
    tokens_col,
    vocab_coverage,
)


@register(
    "bigram_lm_score",
    oracle="""
    WITH tok AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    bg AS (
        SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
        FROM tok,
             LATERAL (SELECT unnest(generate_series(1, len(toks) - 1)) AS i) g
    ),
    c2 AS (SELECT w1, w2, count(*) AS n2 FROM bg GROUP BY 1, 2),
    c1 AS (SELECT w1, count(*) AS n1 FROM bg GROUP BY 1)
    SELECT b.doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           round(avg(ln(n2 / n1)), 6) AS avg_logprob
    FROM bg b
    JOIN c2 USING (w1, w2)
    JOIN c1 USING (w1)
    GROUP BY b.doc_id
    """,
    doc="Corpus-trained bigram-LM scoring — the perplexity-proxy "
    "quality filter of a pretraining pipeline, with the LM estimated "
    "from the corpus itself inside the same lazy plan: MLE "
    "p(w2|w1) = c(w1,w2)/c(w1,*) over bigram starts, doc score = "
    "mean log-prob of its bigrams. One explode projection feeds two "
    "hash aggs whose (vocab-bounded) outputs re-join the bigram "
    "stream on token keys — AQE broadcasts them at scale. Oracle "
    "recomputes the counts and the log mean in SQL.",
    tags=("llm-pipeline", "text"),
)
def bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bigram_lm_scores(t(spark, sf_dir, "documents"))


@register(
    "boilerplate_token_prune",
    oracle="""
    WITH tok AS (
        SELECT doc_id, toks[i] AS tok, i AS pos
        FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
             LATERAL (SELECT unnest(generate_series(1, len(toks))) AS i) g
    ),
    nd AS (SELECT count(*) AS n_docs FROM documents),
    boiler AS (
        SELECT tok FROM tok, nd GROUP BY tok, n_docs
        HAVING count(DISTINCT doc_id) > n_docs * 0.6
    ),
    reb AS (
        SELECT doc_id,
               string_agg(tok, ' ' ORDER BY pos) AS pruned_text,
               count(*) AS n_kept
        FROM tok WHERE tok NOT IN (SELECT tok FROM boiler)
        GROUP BY doc_id
    )
    SELECT d.doc_id,
           coalesce(r.pruned_text, '') AS pruned_text,
           CAST(coalesce(r.n_kept, 0) AS BIGINT) AS n_kept,
           CAST(len(string_split(d.text, ' ')) - coalesce(r.n_kept, 0)
                AS BIGINT) AS n_dropped
    FROM documents d LEFT JOIN reb r USING (doc_id)
    """,
    doc="Boilerplate pruning (C4-style, token-granular): tokens with "
    "document frequency > 60% of the corpus are dropped everywhere "
    "and each doc's text is reassembled IN ORDER from the survivors "
    "(array_sort(collect_list(struct(pos, tok))) — exact despite "
    "collect_list's task-order nondeterminism). The boilerplate set "
    "is vocab-bounded and broadcast into a left_anti join; docs "
    "losing every token still come back (empty text). Oracle rebuilds "
    "with string_agg ORDER BY pos — hash match proves the ordered "
    "reassembly byte-for-byte.",
    tags=("llm-pipeline", "text"),
)
def boilerplate_token_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    return prune_frequent_tokens(
        t(spark, sf_dir, "documents"), max_df_frac=0.6
    )


@register(
    "vocab_oov_coverage",
    oracle="""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    vocab AS (
        SELECT tok FROM tok GROUP BY tok
        ORDER BY count(*) DESC, tok LIMIT 30
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN tok IN (SELECT tok FROM vocab)
                         THEN 0 ELSE 1 END) AS BIGINT) AS n_oov,
           round(CAST(sum(CASE WHEN tok IN (SELECT tok FROM vocab)
                              THEN 0 ELSE 1 END) AS DOUBLE) / count(*),
                 6) AS oov_rate
    FROM tok GROUP BY doc_id
    """,
    doc="Vocabulary-coverage profiling: the 30 most frequent tokens "
    "(ties broken token-ascending, so the cut is deterministic) form "
    "the vocab; per doc, the count and fraction of token instances "
    "outside it — the OOV-rate signal tokenizer/vocab decisions are "
    "made from. Top-V compiles to TakeOrderedAndProject over the "
    "token-count agg (no global sort) and the V-row vocab is "
    "broadcast into the instance stream.",
    tags=("llm-pipeline", "text"),
)
def vocab_oov_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    return vocab_coverage(t(spark, sf_dir, "documents"), vocab_size=30)


@register(
    "mixture_temperature_weights",
    oracle="""
    WITH s AS (
        SELECT lang,
               count(*) AS n_docs,
               sum(len(string_split(text, ' '))) AS n_tokens
        FROM documents GROUP BY lang
    ),
    tot AS (
        SELECT sum(sqrt(CAST(n_tokens AS DOUBLE))) AS z,
               sum(CAST(n_tokens AS DOUBLE)) AS total_tokens
        FROM s
    )
    SELECT lang,
           CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           round(sqrt(CAST(n_tokens AS DOUBLE)) / z, 6) AS weight,
           round((sqrt(CAST(n_tokens AS DOUBLE)) / z)
                 / (CAST(n_tokens AS DOUBLE) / total_tokens), 6)
               AS upsample_factor
    FROM s, tot
    """,
    doc="Temperature-weighted data-mixture computation (alpha = 0.5, "
    "the multilingual-pretraining standard): per-language token "
    "counts, sampling weight n^alpha / sum(n^alpha), and the "
    "upsample factor vs the natural distribution (how much a "
    "low-resource language is boosted). One hash agg to language "
    "granularity; the normalizer is a 1-row broadcast cross join.",
    tags=("llm-pipeline", "text"),
)
def mixture_temperature_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    s = docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(tokens_col("text"))).alias("n_tokens"),
    )
    tot = s.agg(
        F.sum(F.sqrt(F.col("n_tokens").cast("double"))).alias("z"),
        F.sum(F.col("n_tokens").cast("double")).alias("total_tokens"),
    )
    w = F.sqrt(F.col("n_tokens").cast("double")) / F.col("z")
    natural = F.col("n_tokens").cast("double") / F.col("total_tokens")
    return s.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_docs",
        "n_tokens",
        F.round(w, 6).alias("weight"),
        F.round(w / natural, 6).alias("upsample_factor"),
    )


@register(
    "bpe_merge_pair_counts",
    oracle="""
    WITH wd AS (
        SELECT unnest(string_split(text, ' ')) AS w FROM documents
    ),
    wf AS (
        SELECT w, count(*) AS freq FROM wd WHERE length(w) > 0 GROUP BY w
    ),
    sym AS (
        SELECT freq,
               list_append(
                   list_transform(generate_series(1, length(w)),
                                  i -> substring(w, i, 1)),
                   '</w>') AS syms
        FROM wf
    ),
    p AS (
        SELECT freq,
               unnest(list_transform(
                   generate_series(1, len(syms) - 1),
                   i -> syms[i] || ' ' || syms[i + 1]
               )) AS pair
        FROM sym
    ),
    c AS (
        SELECT pair, CAST(sum(freq) AS BIGINT) AS pair_count
        FROM p GROUP BY pair
    )
    SELECT pair, pair_count, CAST(rk AS INT) AS rk
    FROM (
        SELECT *, row_number() OVER (ORDER BY pair_count DESC, pair) AS rk
        FROM c
    )
    WHERE rk <= 30
    """,
    doc="One round of BPE merge training (Sennrich et al. 2016): "
    "whitespace words get an end-of-word marker symbol, every "
    "adjacent symbol pair is counted weighted by word frequency, and "
    "the top-30 merge candidates are ranked (count desc, pair "
    "tiebreak) — the argmax of round 1 is exactly the first merge a "
    "BPE tokenizer would learn. Scale shape: the corpus collapses to "
    "the DISTINCT-word frequency table first (the classic BPE "
    "training layout — pair explosion runs over vocab, not corpus, "
    "so a 100 TB corpus costs one word-count agg plus a vocab-sized "
    "explode), pair counting is a partial+final hash agg on the "
    "pair key, and the global top-30 is TakeOrderedAndProject with "
    "the rank window applied only to the 30 survivors.",
    tags=("text", "llm-pipeline"),
)
def bpe_merge_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = t(spark, sf_dir, "documents")
    words = docs.select(F.explode(F.split("text", " ")).alias("w")).filter(
        F.length("w") > 0
    )
    wf = words.groupBy("w").agg(F.count(F.lit(1)).alias("freq"))
    syms = wf.select(
        "freq",
        F.array_append(
            F.expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))"),
            F.lit("</w>"),
        ).alias("syms"),
    )
    pairs = syms.select(
        "freq",
        F.explode(
            F.expr(
                "transform(sequence(1, size(syms) - 1),"
                " i -> concat(element_at(syms, i), ' ', element_at(syms, i + 1)))"
            )
        ).alias("pair"),
    )
    counts = pairs.groupBy("pair").agg(F.sum("freq").alias("pair_count"))
    top = counts.orderBy(F.desc("pair_count"), F.asc("pair")).limit(30)
    w = W.orderBy(F.desc("pair_count"), F.asc("pair"))
    return top.select(
        "pair", "pair_count", F.row_number().over(w).alias("rk")
    )


def _bpe_splice(sym_col, pair: str, merged: str):
    """Apply one BPE merge to a space-delimited symbol string with
    subword-nmt run semantics: a plain space-anchored replace
    UNDER-merges runs (' a a a a ' -> 'aa a a' — the first match
    consumes the shared boundary space), so the splice works in a
    DOUBLED-space domain where every symbol carries its own flanking
    spaces: double the delimiters, replace the doubled pair, collapse
    the doubles, trim. 'a a a a' with merge (a,a) then yields
    'aa aa', matching the reference left-to-right non-overlapping
    scan (subword-nmt uses non-consuming lookaround anchors, which
    RE2 — the oracle's regex engine — lacks; this literal-replace
    form is engine-portable). Oracle twin: _bpe_round_ctes."""
    doubled = F.concat(
        F.lit(" "), F.replace(sym_col, F.lit(" "), F.lit("  ")), F.lit(" ")
    )
    pat = " " + pair.replace(" ", "  ") + " "
    spliced = F.replace(doubled, F.lit(pat), F.lit(f" {merged} "))
    return F.trim(F.replace(spliced, F.lit("  "), F.lit(" ")))


# Learned-merge cache, scoped to the Spark application (localCheckpoint
# blocks die with the app — same scoping rule as the bucketed-table
# cache): bpe_learn_merges and bpe_segment_corpus share one training
# run per (app, sf_dir) instead of re-collecting 3 rounds each.
_BPE_CACHE: dict = {}


def _bpe_learn(
    spark: SparkSession, sf_dir: str, rounds: int = 3
) -> tuple[list[tuple[int, str, int]], DataFrame]:
    """The shared BPE training loop: returns the learned merge list
    [(round, pair, weighted_count)] AND the final per-word symbol
    table (w, freq, sym) with all merges applied — so the learner
    (bpe_learn_merges) and the applier (bpe_segment_corpus) can never
    fork on the merge convention. One 1-row collect per round; all
    heavy work is vocab-collapsed, and each round's table is
    localCheckpoint-ed so round r's collect never re-executes rounds
    1..r-1 from the raw corpus (the iterative-lineage trap
    connected_components documents)."""
    key = (spark.sparkContext.applicationId, sf_dir, rounds)
    cached = _BPE_CACHE.get(key)
    if cached is not None:
        return cached
    docs = t(spark, sf_dir, "documents")
    words = docs.select(F.explode(F.split("text", " ")).alias("w")).filter(
        F.length("w") > 0
    )
    wf = words.groupBy("w").agg(F.count(F.lit(1)).alias("freq"))
    cur = materialize(wf.select(
        "w",
        "freq",
        F.concat_ws(
            " ",
            F.array_append(
                F.expr(
                    "transform(sequence(1, length(w)), i -> substring(w, i, 1))"
                ),
                F.lit("</w>"),
            ),
        ).alias("sym"),
    ))
    # zip_with over shifted slices, NOT transform(sequence(1, n-1)):
    # once a word fully merges to a single symbol, n-1 = 0 and Spark's
    # sequence(1, 0) is the DESCENDING [1, 0] (element_at then throws
    # INVALID_ARRAY_INDEX_IN_ELEMENT_AT), whereas slice(syms, k, 0) is
    # empty — single-symbol words contribute no pairs, matching the
    # DuckDB oracle's empty generate_series(1, 0).
    pairs_expr = (
        "zip_with("
        " slice(split(sym, ' '), 1, size(split(sym, ' ')) - 1),"
        " slice(split(sym, ' '), 2, size(split(sym, ' ')) - 1),"
        " (a, b) -> concat(a, ' ', b))"
    )
    merges: list[tuple[int, str, int]] = []
    for rnd in range(1, rounds + 1):
        rows = (
            cur.select("freq", F.explode(F.expr(pairs_expr)).alias("pair"))
            .groupBy("pair")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("pair"))
            .limit(1)
            .collect()
        )
        if not rows:
            # no pair anywhere (empty corpus, or every word fully
            # merged): learning stops early with the merges found so
            # far — the oracle's per-round LIMIT 1 CTEs go empty the
            # same way
            break
        best = rows[0]
        merges.append((rnd, best["pair"], int(best["cnt"])))
        merged = best["pair"].replace(" ", "")
        prev_cur = cur
        cur = materialize(cur.select(
            "w",
            "freq",
            _bpe_splice(F.col("sym"), best["pair"], merged).alias("sym"),
        ))
        release(prev_cur)  # superseded round (final cur stays pinned
        # for _BPE_CACHE reuse) — ADVICE r7
    _BPE_CACHE[key] = (merges, cur)
    return merges, cur


def _bpe_round_ctes(rounds: int = 3, materialized: bool = False) -> str:
    """CTE chain replaying `rounds` BPE rounds in DuckDB (word table
    carried through, scalar-subquery argmax per round, the SAME
    doubled-space splice as _bpe_splice). Ends with s{rounds} holding
    (w, freq, sym). BOTH BPE oracles compose from this one generator
    so learner and applier can never adjudicate different merge
    semantics.

    materialized=True emits `AS MATERIALIZED` CTEs: each round
    references s{r-1} twice (pair counts + re-segmentation), so an
    inlining planner re-evaluates the chain ~2x per round — fine at
    3 rounds, EXPONENTIAL (~2^8) at 8 (the 8-round oracle timed out
    at sf0.001 before this). Materialization makes the replay linear
    in rounds. The 3-round oracles keep the original un-annotated
    text so their adjudicated SQL is byte-identical."""
    kw = " MATERIALIZED" if materialized else ""
    head = f"""
    wd AS{kw} (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
    ),
    wf AS{kw} (
        SELECT w, count(*) AS freq FROM wd WHERE length(w) > 0 GROUP BY w
    ),
    s0 AS{kw} (
        SELECT w, freq,
               array_to_string(list_append(
                   list_transform(generate_series(1, length(w)),
                                  i -> substring(w, i, 1)),
                   '</w>'), ' ') AS sym
        FROM wf
    )"""
    rounds_sql = []
    for r in range(1, rounds + 1):
        rounds_sql.append(f""",
    p{r} AS{kw} (
        SELECT sym2.pair, sum(freq) AS cnt FROM (
            SELECT freq, unnest(list_transform(
                generate_series(1, len(string_split(sym, ' ')) - 1),
                i -> string_split(sym, ' ')[i] || ' '
                     || string_split(sym, ' ')[i + 1])) AS pair
            FROM s{r - 1}
        ) sym2 GROUP BY pair
    ),
    m{r} AS{kw} (SELECT pair, cnt FROM p{r} ORDER BY cnt DESC, pair LIMIT 1),
    s{r} AS{kw} (
        SELECT w, freq,
               trim(replace(
                   replace(' ' || replace(sym, ' ', '  ') || ' ',
                           ' ' || replace((SELECT pair FROM m{r}),
                                          ' ', '  ') || ' ',
                           ' ' || replace((SELECT pair FROM m{r}),
                                          ' ', '') || ' '),
                   '  ', ' ')) AS sym
        FROM s{r - 1}
    )""")
    return head + "".join(rounds_sql)


@register(
    "bpe_learn_merges",
    oracle="WITH " + _bpe_round_ctes(3) + """
    SELECT CAST(round AS INT) AS round, pair,
           CAST(cnt AS BIGINT) AS merge_count
    FROM (
        SELECT 1 AS round, pair, cnt FROM m1
        UNION ALL SELECT 2, pair, cnt FROM m2
        UNION ALL SELECT 3, pair, cnt FROM m3
    )
    """,
    doc="Three rounds of BPE merge LEARNING (Sennrich et al. 2016) — "
    "the iterative algorithm, not just round-1 counts: each round "
    "counts adjacent symbol pairs over the vocab-collapsed symbol "
    "sequences, adopts the argmax pair (count desc, pair tiebreak) "
    "as a merge, and RE-SEGMENTS every word with the doubled-space "
    "literal splice (_bpe_splice — run-correct: 'a a a a' merges to "
    "'aa aa' like subword-nmt, where a plain anchored replace "
    "under-merges). The per-round argmax is a 1-row scalar witness "
    "collect (the connected-components pattern: bounded driver "
    "state, never data), each round localCheckpoint-ed so lineage "
    "never compounds; everything else is vocab-sized partial+final "
    "aggs. The oracle replays all three rounds with scalar "
    "subqueries from the SAME CTE generator the applier uses, so "
    "the learned merge TABLE itself is value-adjudicated and the "
    "two BPE oracles cannot fork.",
    tags=("text", "llm-pipeline", "iterative"),
)
def bpe_learn_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    merges, _ = _bpe_learn(spark, sf_dir, rounds=3)
    return spark.createDataFrame(
        merges, "round int, pair string, merge_count long"
    )


@register(
    "bpe_learn_merges_8r",
    oracle="WITH " + _bpe_round_ctes(8, materialized=True) + """
    SELECT CAST(round AS INT) AS round, pair,
           CAST(cnt AS BIGINT) AS merge_count
    FROM (
        SELECT 1 AS round, pair, cnt FROM m1
        UNION ALL SELECT 2, pair, cnt FROM m2
        UNION ALL SELECT 3, pair, cnt FROM m3
        UNION ALL SELECT 4, pair, cnt FROM m4
        UNION ALL SELECT 5, pair, cnt FROM m5
        UNION ALL SELECT 6, pair, cnt FROM m6
        UNION ALL SELECT 7, pair, cnt FROM m7
        UNION ALL SELECT 8, pair, cnt FROM m8
    )
    """,
    doc="EIGHT rounds of the same BPE merge learner (VERDICT r8 #4: "
    "bench the iterative compositions at a REAL iteration count — "
    "3 rounds underweights the per-round frontier churn that "
    "dominates a production merge-table build). Same algorithm, "
    "scalar-witness argmax, and per-round localCheckpoint as "
    "bpe_learn_merges; the oracle replays all eight rounds through "
    "the SAME parameterized CTE generator, so learner and oracle "
    "cannot fork at any round count. The deeper run also exercises "
    "the release() path: each round's superseded frontier is "
    "dropped, so persist_disk state stays one-frontier-deep at "
    "every round.",
    tags=("text", "llm-pipeline", "iterative"),
)
def bpe_learn_merges_8r(spark: SparkSession, sf_dir: str) -> DataFrame:
    merges, _ = _bpe_learn(spark, sf_dir, rounds=8)
    return spark.createDataFrame(
        merges, "round int, pair string, merge_count long"
    )


@register(
    "bpe_segment_corpus",
    oracle="WITH " + _bpe_round_ctes(3) + """,
    wn AS (
        SELECT w,
               CAST(length(w) + 1 AS BIGINT) AS n_before,
               CAST(len(string_split(sym, ' ')) AS BIGINT) AS n_after
        FROM s3
    )
    SELECT wd.doc_id,
           CAST(sum(wn.n_before) AS BIGINT) AS n_syms_before,
           CAST(sum(wn.n_after) AS BIGINT) AS n_syms_after,
           round(CAST(sum(wn.n_after) AS DOUBLE) / sum(wn.n_before), 6)
               AS compression
    FROM wd JOIN wn USING (w)
    GROUP BY wd.doc_id
    """,
    doc="BPE APPLICATION — segment the corpus with the 3 learned "
    "merges (the tokenize step that follows bpe_learn_merges; both "
    "run through the shared, per-application-cached _bpe_learn loop "
    "so the merge convention can never fork and training happens "
    "once per process): per document, symbol counts before (chars + "
    "end-marker per word) and after the merges, plus the compression "
    "ratio — the measurable benefit of the learned vocabulary. "
    "Segmentation happens on the DISTINCT-word table (vocab-sized, "
    "3 literal splices) and documents join their words back by an "
    "equi-key — the corpus is never re-segmented row by row. The "
    "oracle replays learning AND application, so every per-doc count "
    "is value-adjudicated end to end.",
    tags=("text", "llm-pipeline", "iterative"),
)
def bpe_segment_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, segmented = _bpe_learn(spark, sf_dir, rounds=3)
    wn = segmented.select(
        "w",
        (F.length("w") + 1).cast("long").alias("n_before"),
        F.size(F.split("sym", " ")).cast("long").alias("n_after"),
    )
    docs = t(spark, sf_dir, "documents")
    doc_words = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")
    ).filter(F.length("w") > 0)
    return (
        doc_words.join(wn, "w")
        .groupBy("doc_id")
        .agg(
            F.sum("n_before").alias("n_syms_before"),
            F.sum("n_after").alias("n_syms_after"),
        )
        .select(
            "doc_id",
            "n_syms_before",
            "n_syms_after",
            F.round(
                F.col("n_syms_after") / F.col("n_syms_before"), 6
            ).alias("compression"),
        )
    )


# ---------------------------------------------------------------------------
# WordPiece greedy segmentation (Wu et al. 2016 / BERT tokenizer):
# longest-match-first against a corpus-derived subword vocabulary.
# Complements the BPE family: BPE segments by replaying merge ORDER;
# WordPiece segments by greedy longest PREFIX match at serve time.
_WP_V = 48  # multi-char subword vocab slots (plus all single chars)
_WP_MAX_WLEN = 16  # BERT's max_input_chars_per_word analogue
_WP_FOLD = (
    "translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', "
    "'abcdefghijklmnopqrstuvwxyz')"
)


def _wp_step_sql(maxp: int) -> str:
    """The greedy step length at (w, pos): longest of 4/3/2 whose
    form-qualified substring is in vocab, else the single char
    (always in vocab by construction)."""
    def exists(n: int) -> str:
        return (
            f"length(substring(w, pos, {n})) = {n} AND EXISTS ("
            f"SELECT 1 FROM vocab v WHERE v.is_cont = (pos > 1) "
            f"AND v.sub = substring(w, pos, {n}))"
        )

    return (
        f"CASE WHEN {exists(4)} THEN 4 "
        f"WHEN {exists(3)} THEN 3 "
        f"WHEN {exists(2)} THEN 2 ELSE 1 END"
    )


def _wp_oracle() -> str:
    rounds = []
    for r in range(1, _WP_MAX_WLEN + 1):
        rounds.append(f""",
    seg{r} AS (
        SELECT w, freq,
               CASE WHEN active THEN pos + step ELSE pos END AS pos,
               CASE WHEN active THEN
                   (CASE WHEN toks = '' THEN '' ELSE toks || ' ' END)
                   || (CASE WHEN pos > 1 THEN '##' ELSE '' END)
                   || substring(w, pos, step)
               ELSE toks END AS toks
        FROM (SELECT w, freq, pos, toks, pos <= length(w) AS active,
                     {_wp_step_sql(r)} AS step
              FROM seg{r - 1})
    )""")
    return f"""
    WITH tok AS (
        SELECT t.term AS w
        FROM documents,
             LATERAL (SELECT unnest(string_split_regex(
                          {_WP_FOLD}, '[^a-z]+')) AS term) t
        WHERE text IS NOT NULL AND t.term <> ''
    ),
    wf AS (
        SELECT w, CAST(count(*) AS BIGINT) AS freq FROM tok GROUP BY w
    ),
    pos AS (
        SELECT w, freq, u.p
        FROM wf, unnest(generate_series(1, length(w))) AS u(p)
    ),
    subs AS (
        SELECT (p > 1) AS is_cont, substring(w, p, s.s) AS sub, freq
        FROM pos, (SELECT unnest([2, 3, 4]) AS s) s
        WHERE p + s.s - 1 <= length(w)
    ),
    vick AS (
        SELECT is_cont, sub, sum(freq) AS w8 FROM subs GROUP BY 1, 2
    ),
    vocab AS (
        SELECT is_cont, sub FROM vick
        ORDER BY w8 DESC, is_cont, sub LIMIT {_WP_V}
    ),
    seg0 AS (
        SELECT w, freq, 1 AS pos, CAST('' AS VARCHAR) AS toks
        FROM wf WHERE length(w) <= {_WP_MAX_WLEN}
    ){''.join(rounds)}
    SELECT w, freq,
           CAST(len(string_split(toks, ' ')) AS BIGINT) AS n_tokens,
           toks AS wp_tokens
    FROM seg{_WP_MAX_WLEN}
    UNION ALL
    SELECT w, freq, CAST(1 AS BIGINT), '[UNK]'
    FROM wf WHERE length(w) > {_WP_MAX_WLEN}
    ORDER BY freq DESC, w
    """


@register(
    "wordpiece_segment_vocab",
    oracle=_wp_oracle(),
    doc="WordPiece tokenization (Wu et al. 2016; the BERT serving "
    "tokenizer): greedy longest-match-first segmentation of every "
    "distinct corpus word against a corpus-derived subword "
    "vocabulary — the top-"
    f"{_WP_V} length-2..4 substrings by occurrence-weighted "
    "frequency (initial vs '##'-continuation forms counted "
    "separately, ties by form then string) plus every single "
    "character (so segmentation never dead-ends). Words longer "
    f"than {_WP_MAX_WLEN} chars emit [UNK], BERT's "
    "max_input_chars_per_word contract, which also statically "
    f"bounds the match loop at {_WP_MAX_WLEN} rounds — each round "
    "one whole-stage-codegen SELECT over the DISTINCT-word table "
    "(the BPE family's vocab-collapsed discipline: the corpus is "
    "never re-segmented row by row; doc-level rollups join by "
    "word). The subword vocabulary is a bounded driver collect "
    f"(≤ {_WP_V} + 2*26 entries — the broadcast-centroids "
    "pattern) embedded as literal IN-lists; the oracle re-derives "
    "the SAME vocab in SQL and replays all "
    f"{_WP_MAX_WLEN} greedy rounds, so vocab selection, tie "
    "order, step lengths, and every emitted piece are value-"
    "adjudicated end to end.",
    tags=("text", "llm-pipeline", "iterative"),
)
def wordpiece_segment_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    words = docs.select(
        F.explode(
            F.split(
                F.expr(
                    "translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', "
                    "'abcdefghijklmnopqrstuvwxyz')"
                ),
                "[^a-z]+",
            )
        ).alias("w")
    ).where(F.col("w") != "")
    # The distinct-word table feeds the vocab derivation, both
    # segmentation branches, and the UNK branch — materialize it
    # ONCE (vocab-sized; the semantic_dedup shared-frontier
    # pattern) instead of re-tokenizing the corpus per consumer.
    wf = materialize(
        words.groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
    )

    init, cont = wordpiece_vocab_top(wf)
    return wordpiece_segment(wf, init, cont).orderBy(
        F.col("freq").desc(), "w"
    )


def wordpiece_vocab_top(
    wf: DataFrame, n_slots: int = _WP_V
) -> tuple[dict[int, list[str]], dict[int, list[str]]]:
    """Corpus-derived subword vocab: the top ``n_slots`` length-2..4
    substrings of the distinct-word table by occurrence-weighted
    frequency, split into initial vs '##'-continuation forms.
    Returns ({len: [subs]}, {len: [subs]}) for (initial, cont) from
    a bounded <= n_slots-row driver collect (the broadcast-centroids
    pattern). ``wf`` must have columns (w, freq)."""
    pos = wf.select(
        "w", "freq",
        F.explode(F.sequence(F.lit(1), F.length("w"))).alias("p"),
    )
    subs = None
    for s in (2, 3, 4):
        part = pos.where(
            F.col("p") + (s - 1) <= F.length("w")
        ).select(
            (F.col("p") > 1).alias("is_cont"),
            F.col("w").substr(F.col("p"), F.lit(s)).alias("sub"),
            "freq",
        )
        subs = part if subs is None else subs.unionByName(part)
    top = (
        subs.groupBy("is_cont", "sub")
        .agg(F.sum("freq").alias("w8"))
        .orderBy(F.col("w8").desc(), "is_cont", "sub")
        .limit(n_slots)
        .select("is_cont", "sub")
        .collect()
    )
    init: dict[int, list[str]] = {2: [], 3: [], 4: []}
    cont: dict[int, list[str]] = {2: [], 3: [], 4: []}
    for r in top:
        (cont if r.is_cont else init)[len(r.sub)].append(r.sub)
    return init, cont


def wordpiece_segment(
    wf: DataFrame,
    init: dict[int, list[str]],
    cont: dict[int, list[str]],
    max_wlen: int = _WP_MAX_WLEN,
) -> DataFrame:
    """Greedy longest-match-first WordPiece segmentation of the
    distinct-word table against literal vocab sets (single chars
    always match implicitly, so segmentation never dead-ends).
    ``max_wlen`` statically bounds the match loop; longer words emit
    one [UNK]. Returns (w, freq, n_tokens, wp_tokens).

    The rounds are emitted as ONE generated SQL statement (the same
    CTE chain the oracle runs, vocab as literal IN-lists): chaining
    16 DataFrame.select calls re-analyzes the growing plan per round
    (quadratic driver cost, ~1.9 s per call at any data size); the
    single spark.sql goes through analysis once. Semantics are
    identical — the flat CASE tries the longest subword first, like
    the ascending-wrap WHEN chain it replaces."""

    def _inlist(cand: str, vals: list[str]) -> str:
        if not vals:
            return "FALSE"
        lits = ", ".join("'" + v.replace("'", "''") + "'" for v in vals)
        return f"{cand} IN ({lits})"

    def _hit(n: int) -> str:
        cand = f"substring(w, pos, {n})"
        return (
            f"length({cand}) = {n} AND (CASE WHEN pos > 1 "
            f"THEN {_inlist(cand, cont[n])} "
            f"ELSE {_inlist(cand, init[n])} END)"
        )

    step = (
        f"CASE WHEN {_hit(4)} THEN 4 "
        f"WHEN {_hit(3)} THEN 3 "
        f"WHEN {_hit(2)} THEN 2 ELSE 1 END"
    )
    rounds = []
    for r in range(1, max_wlen + 1):
        rounds.append(f""",
    seg{r} AS (
        SELECT w, freq,
               CASE WHEN active THEN pos + step ELSE pos END AS pos,
               CASE WHEN active THEN
                   (CASE WHEN toks = '' THEN '' ELSE toks || ' ' END)
                   || (CASE WHEN pos > 1 THEN '##' ELSE '' END)
                   || substring(w, pos, step)
               ELSE toks END AS toks
        FROM (SELECT w, freq, pos, toks, pos <= length(w) AS active,
                     {step} AS step
              FROM seg{r - 1})
    )""")
    sql = f"""
    WITH seg0 AS (
        SELECT w, freq, 1 AS pos, '' AS toks
        FROM {{wf}} WHERE length(w) <= {max_wlen}
    ){''.join(rounds)}
    SELECT w, freq,
           CAST(size(split(toks, ' ')) AS BIGINT) AS n_tokens,
           toks AS wp_tokens
    FROM seg{max_wlen}
    UNION ALL
    SELECT w, freq, CAST(1 AS BIGINT) AS n_tokens,
           '[UNK]' AS wp_tokens
    FROM {{wf}} WHERE length(w) > {max_wlen}
    """
    return wf.sparkSession.sql(sql, wf=wf)


# ---------------------------------------------------------------------------
# Tokenizer evaluation + SentencePiece seed vocabulary — the two
# steps that bracket subword training in a real pipeline: candidate
# generation BEFORE (unigram seed vocab, Kudo 2018 §3.2's "frequent
# substrings" initialization) and fertility measurement AFTER
# (tokens/word per corpus slice — the standard multilingual
# tokenizer-equity metric).


@register(
    "tokenizer_fertility_by_source",
    oracle="WITH " + _bpe_round_ctes(3) + """,
    wn AS (
        SELECT w,
               CAST(length(w) AS BIGINT) AS n_chars_w,
               CAST(len(string_split(sym, ' ')) AS BIGINT) AS n_tok
        FROM s3
    )
    SELECT d.source,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(wn.n_tok) AS BIGINT) AS n_tokens,
           CAST(sum(wn.n_chars_w) AS BIGINT) AS n_chars,
           round(CAST(sum(wn.n_tok) AS DOUBLE) / count(*), 6)
               AS fertility,
           round(CAST(sum(wn.n_chars_w) AS DOUBLE) / sum(wn.n_tok), 6)
               AS chars_per_token
    FROM wd JOIN wn USING (w)
    JOIN documents d USING (doc_id)
    GROUP BY d.source
    ORDER BY d.source
    """,
    doc="Tokenizer FERTILITY profile per corpus source: after "
    "segmenting with the 3 learned BPE merges (the shared, cached "
    "_bpe_learn loop — same merge table as bpe_learn_merges / "
    "bpe_segment_corpus, so the three queries can never fork), "
    "report tokens-per-word and chars-per-token per source — the "
    "standard tokenizer-equity metric (a source whose fertility is "
    "2x the corpus mean pays 2x the sequence length for the same "
    "text; this table is what drives vocab rebalancing decisions). "
    "Segmentation stays vocab-collapsed (distinct words only) and "
    "the corpus joins back by word equi-key; the per-source fold is "
    "integer sums with two final rounded divisions. The oracle "
    "replays learning AND application from the same CTE generator.",
    tags=("text", "llm-pipeline", "aggregate"),
)
def tokenizer_fertility_by_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    _, segmented = _bpe_learn(spark, sf_dir, rounds=3)
    wn = segmented.select(
        "w",
        F.length("w").cast("long").alias("n_chars_w"),
        F.size(F.split("sym", " ")).cast("long").alias("n_tok"),
    )
    docs = t(spark, sf_dir, "documents")
    doc_words = docs.select(
        "doc_id", "source", F.explode(F.split("text", " ")).alias("w")
    ).filter(F.length("w") > 0)
    return (
        doc_words.join(wn, "w")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum("n_tok").cast("bigint").alias("n_tokens"),
            F.sum("n_chars_w").cast("bigint").alias("n_chars"),
        )
        .select(
            "source",
            "n_words",
            "n_tokens",
            "n_chars",
            F.round(
                F.col("n_tokens").cast("double") / F.col("n_words"), 6
            ).alias("fertility"),
            F.round(
                F.col("n_chars").cast("double") / F.col("n_tokens"), 6
            ).alias("chars_per_token"),
        )
        .orderBy("source")
    )


_SEED_MIN_LEN, _SEED_MAX_LEN, _SEED_TOP = 2, 5, 30


@register(
    "unigram_seed_vocab",
    oracle=f"""
    WITH wf AS (
        SELECT w, CAST(count(*) AS BIGINT) AS freq
        FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        WHERE length(w) > 0
        GROUP BY w
    ),
    pieces AS (
        SELECT substring(w, p, L) AS piece, freq
        FROM wf,
             LATERAL (SELECT unnest(generate_series(
                 {_SEED_MIN_LEN}, {_SEED_MAX_LEN})) AS L) gl,
             LATERAL (SELECT unnest(generate_series(
                 1, length(w) - L + 1)) AS p) gp
        WHERE length(w) >= L
    )
    SELECT piece,
           CAST(sum(freq) AS BIGINT) AS occurrences,
           CAST(length(piece) * sum(freq) AS BIGINT) AS score
    FROM pieces
    GROUP BY piece
    ORDER BY score DESC, piece
    LIMIT {_SEED_TOP}
    """,
    doc="SentencePiece-style SEED VOCABULARY for unigram-LM "
    "training (Kudo 2018 §3.2: initialize with the most frequent "
    "substrings, scored by frequency x length): every substring of "
    "length 2..5 of every DISTINCT word is counted with the word's "
    "corpus frequency, and the top 30 by score (freq-weighted "
    "coverage in characters) are emitted. The substring explosion "
    "runs over the vocab-collapsed word table — corpus occurrences "
    "arrive as integer weights, so the explosion is vocab-sized, "
    "not corpus-sized (the same collapse that makes the BPE learner "
    "feasible at 100 TB). One shuffle on the piece key; top-k is a "
    "partial+final TakeOrdered, never a global sort of all pieces. "
    "All-integer, deterministic tiebreak (score desc, piece asc).",
    tags=("text", "llm-pipeline", "aggregate"),
)
def unigram_seed_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    wf = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
    )
    pieces = wf.select(
        F.explode(
            F.expr(
                # NB: Spark's sequence(1, 0) is the DESCENDING [1, 0],
                # not empty — words shorter than L must hit the CASE
                # arm, or they'd emit spurious truncated pieces.
                f"flatten(transform(sequence({_SEED_MIN_LEN}, {_SEED_MAX_LEN}),"
                " L -> case when length(w) >= L then transform("
                "   sequence(1, length(w) - L + 1),"
                "   p -> substring(w, p, L)) else array() end))"
            )
        ).alias("piece"),
        "freq",
    )
    return (
        pieces.groupBy("piece")
        .agg(F.sum("freq").cast("bigint").alias("occurrences"))
        .select(
            "piece",
            "occurrences",
            (F.length("piece") * F.col("occurrences"))
            .cast("bigint")
            .alias("score"),
        )
        .orderBy(F.col("score").desc(), "piece")
        .limit(_SEED_TOP)
    )


@register(
    "kneser_ney_bigram",
    oracle="""
    WITH wd AS (
        SELECT doc_id, CAST(pos AS BIGINT) AS pos,
               string_split(text, ' ')[pos] AS w
        FROM documents,
             LATERAL (SELECT unnest(generate_series(
                 1, len(string_split(text, ' ')))) AS pos) g
        WHERE text IS NOT NULL
    ),
    pairs AS (
        SELECT a.w AS w1, b.w AS w2
        FROM wd a JOIN wd b
          ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        WHERE length(a.w) > 0 AND length(b.w) > 0
    ),
    c12 AS (
        SELECT w1, w2, CAST(count(*) AS BIGINT) AS c
        FROM pairs GROUP BY w1, w2
    ),
    lft AS (
        SELECT w1, CAST(sum(c) AS BIGINT) AS c1,
               CAST(count(*) AS BIGINT) AS nf
        FROM c12 GROUP BY w1
    ),
    rgt AS (
        SELECT w2, CAST(count(*) AS BIGINT) AS nb FROM c12 GROUP BY w2
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS b FROM c12)
    SELECT w1, w2, c AS pair_count,
           round(CAST(greatest(4 * c - 3, 0) * b + 3 * nf * nb AS DOUBLE)
                 / (4 * c1 * b), 6) AS p_kn
    FROM c12 JOIN lft USING (w1) JOIN rgt USING (w2), tot
    ORDER BY pair_count DESC, w1, w2
    LIMIT 20
    """,
    doc="Interpolated Kneser-Ney bigram probabilities (Kneser & Ney "
    "1995; Chen & Goodman 1999 eq. 4.25) with discount d = 3/4: "
    "P(w2|w1) = max(c12 - d, 0)/c1 + (d*N1+(w1.)/c1) * "
    "(N1+(.w2)/B). With d on the quarter grid every term is exact "
    "integer arithmetic over a single common denominator 4*c1*B — "
    "numerator max(4*c12-3,0)*B + 3*N1+(w1.)*N1+(.w2) — so both "
    "engines perform ONE identical float division per row "
    "(int64-exact while 4*c1*B < 2^63; beyond that the same "
    "expression rides DECIMAL(38), documented not needed below "
    "~1e17 token-type product). c1 is the bigram-context count "
    "(sum of c12 over w2), the convention under which interpolated "
    "KN sums to exactly 1 per context — property-tested with "
    "Fractions (tests/test_governance_property.py). Plan: one "
    "doc-partitioned lead window for pair extraction, three "
    "vocab-sized hash aggs, a 1-row broadcast for B; the oracle "
    "derives pairs with an independent positional SELF-JOIN, so "
    "agreement also checks the window against the join. Top-20 by "
    "frequency, deterministic tiebreak.",
    tags=("text", "llm-pipeline", "aggregate"),
)
def kneser_ney_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r11 optimization: pair extraction via the shared zero-shuffle
    # bigram_rows atom (token array materialized once per doc, pairs
    # as consecutive elements) instead of the posexplode + lead()
    # window, whose Exchange(doc_id) + Sort shipped every token row
    # of the corpus before the first aggregation. Pair multiset is
    # identical: lead() pairs are exactly (toks[i], toks[i+1]) with a
    # trailing NULL w2 that the filter dropped, and bigram_rows emits
    # the same i+1-bounded pairs with no NULL to drop; the length>0
    # filters are unchanged. The downstream vocab-sized aggs already
    # do map-side partials, so the only corpus-wide exchange left
    # carries partial (w1,w2) count rows.
    from kittispark.operators.text import bigram_rows

    docs = t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    pairs = bigram_rows(docs).filter(
        (F.length("w1") > 0) & (F.length("w2") > 0)
    )
    c12 = pairs.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    lft = c12.groupBy("w1").agg(
        F.sum("c").cast("bigint").alias("c1"),
        F.count(F.lit(1)).cast("bigint").alias("nf"),
    )
    rgt = c12.groupBy("w2").agg(
        F.count(F.lit(1)).cast("bigint").alias("nb")
    )
    tot = c12.agg(F.count(F.lit(1)).cast("bigint").alias("b"))
    num = (
        F.greatest(4 * F.col("c") - 3, F.lit(0)) * F.col("b")
        + 3 * F.col("nf") * F.col("nb")
    )
    return (
        c12.join(lft, "w1")
        .join(rgt, "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            F.col("c").alias("pair_count"),
            F.round(
                num.cast("double") / (4 * F.col("c1") * F.col("b")), 6
            ).alias("p_kn"),
        )
        .orderBy(F.col("pair_count").desc(), "w1", "w2")
        .limit(20)
    )
