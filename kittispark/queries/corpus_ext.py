"""Extended corpus operators: global paragraph-level dedup with
document rebuild, positional inverted-index phrase search, blocked
edit-distance vocabulary pairing, and content-defined chunking.

These fill the remaining corpus-curation gaps a pretraining pipeline
runs between doc-level dedup (queries/dedup.py) and tokenization
(queries/corpus_lm.py): RefinedWeb-style removal of paragraphs
duplicated ACROSS documents, phrase-level retrieval over positional
postings, spell-norm candidate pairs, and CDC (content-defined
chunking — the LBFS/restic boundary trick that keeps chunk
boundaries stable under insertions, so shifted bytes don't defeat
chunk-hash dedup).

Reference parity: none of this exists in the reference
(kitti_utils.py is NumPy geometry); SURVEY.md §6 mandates the
LLM-pipeline extension as first-class surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kittispark.operators.dedup import portable_hash64
from kittispark.queries._util import t
from kittispark.registry import register

_PARA_TOKENS = 16  # tokens per "paragraph" chunk (corpus has no \n\n)
_CDC_WIN = 8  # rolling-hash window (chars)
_CDC_MOD = 64  # boundary divisor → expected chunk ~64 chars


@register(
    "paragraph_global_dedup",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS tk FROM documents
    ),
    ch AS (
        SELECT doc_id, CAST(u AS INT) AS c,
               array_to_string(
                   tk[CAST(u * {_PARA_TOKENS} + 1 AS INT)
                      :CAST((u + 1) * {_PARA_TOKENS} AS INT)], ' ')
                   AS chunk_text
        FROM (SELECT doc_id, tk,
                     unnest(range(0, CAST(ceil(len(tk) / {_PARA_TOKENS}.0)
                                          AS BIGINT))) AS u
              FROM toks) s
    ),
    occ AS (
        SELECT doc_id, c, chunk_text,
               row_number() OVER (PARTITION BY chunk_text
                                  ORDER BY doc_id, c) AS rk
        FROM ch
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(sum(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           md5(coalesce(string_agg(CASE WHEN rk = 1 THEN chunk_text END,
                                   ' ' ORDER BY c), '')) AS rebuilt_md5
    FROM occ GROUP BY doc_id
    """,
    doc="RefinedWeb-style global paragraph dedup: documents split "
    "into 16-token 'paragraph' chunks (the corpus is newline-free), "
    "every chunk deduplicated ACROSS the whole corpus keeping only "
    "its first occurrence in (doc_id, position) order, and each "
    "document rebuilt from its surviving chunks — adjudicated by the "
    "md5 of the rebuilt text, so the oracle certifies the exact "
    "reconstruction, not just counts. Complements intra_doc_chunk_"
    "dedup (within-doc) and cross_corpus_exact_dedup (doc-level). "
    "Shape at 100 TB: one shuffle keyed on chunk_text for the "
    "first-occurrence window (chunk keys, not doc keys — skew-free "
    "unless a chunk is pathologically viral), one doc_id-keyed "
    "rebuild agg; no all-pairs anything.",
    tags=("dedup", "documents"),
)
def paragraph_global_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("tk")
    )
    ch = docs.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"sequence(0, cast(ceil(size(tk) / {_PARA_TOKENS}.0) as int) - 1)"
            )
        ).alias("_p", "u"),
        F.col("tk"),
    ).select(
        "doc_id",
        F.col("u").cast("int").alias("c"),
        F.array_join(
            F.slice(
                F.col("tk"),
                F.col("u") * _PARA_TOKENS + 1,
                F.lit(_PARA_TOKENS),
            ),
            " ",
        ).alias("chunk_text"),
    )
    rk = F.row_number().over(
        Window.partitionBy("chunk_text").orderBy("doc_id", "c")
    )
    occ = ch.withColumn("rk", rk)
    kept_struct = F.when(
        F.col("rk") == 1, F.struct(F.col("c"), F.col("chunk_text"))
    )
    return occ.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum(F.when(F.col("rk") == 1, 1).otherwise(0)).alias("n_kept"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(kept_struct)),
                    lambda x: x["chunk_text"],
                ),
                " ",
            )
        ).alias("rebuilt_md5"),
    )


@register(
    "phrase_search_postings",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS tk FROM documents
    ),
    pos AS (
        SELECT doc_id, CAST(u AS INT) AS pos, tk[CAST(u AS INT)] AS tok
        FROM (SELECT doc_id, tk, unnest(range(1, len(tk) + 1)) AS u
              FROM toks) s
    )
    SELECT p1.doc_id,
           CAST(count(*) AS BIGINT) AS n_matches,
           CAST(min(p1.pos) AS INT) AS first_pos
    FROM pos p1 JOIN pos p2
      ON p1.doc_id = p2.doc_id AND p2.pos = p1.pos + 1
    WHERE p1.tok = 'batch' AND p2.tok = 'batch'
    GROUP BY p1.doc_id
    """,
    doc="Phrase search over a positional inverted index: token "
    "postings (term, doc_id, position) are built once, and the "
    "2-token phrase 'batch batch' resolves as an equi-join of the "
    "two terms' posting lists on (doc_id, adjacent positions) — the "
    "classic positional-index phrase plan (Manning IR ch.2), not a "
    "regex scan. Shape at 100 TB: postings partition by term, so "
    "the phrase join only ever shuffles the two terms' lists "
    "(filter-pushdown prunes the rest), then a doc_id-keyed count.",
    tags=("text", "search"),
)
def phrase_search_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    pos = (
        t(spark, sf_dir, "documents")
        .select("doc_id", F.posexplode(F.split("text", " ")).alias("p0", "tok"))
        .select("doc_id", (F.col("p0") + 1).cast("int").alias("pos"), "tok")
    )
    p1 = pos.where(F.col("tok") == "batch").select("doc_id", "pos")
    p2 = pos.where(F.col("tok") == "batch").select(
        "doc_id", (F.col("pos") - 1).alias("pos")
    )
    return (
        p1.join(p2, ["doc_id", "pos"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_matches"),
            F.min("pos").cast("int").alias("first_pos"),
        )
    )


@register(
    "vocab_edit_distance_pairs",
    oracle="""
    WITH v AS (
        SELECT DISTINCT tok
        FROM (SELECT unnest(string_split(text, ' ')) AS tok
              FROM documents) s
        WHERE regexp_matches(tok, '^[!-~]+$')
    )
    SELECT a.tok AS tok_a, b.tok AS tok_b,
           CAST(levenshtein(a.tok, b.tok) AS INT) AS dist
    FROM v a JOIN v b ON a.tok < b.tok
    WHERE levenshtein(a.tok, b.tok) <= 2
    """,
    doc="Blocked fuzzy vocabulary pairing (the record-linkage / "
    "spell-norm primitive): all distinct-token pairs within "
    "Levenshtein distance 2, found WITHOUT an all-pairs scan — the "
    "left side explodes each token into its 5 admissible lengths "
    "(|len(a)-len(b)| <= d is a necessary condition for lev <= d), "
    "the join is an equi-join on (candidate_length), and the exact "
    "distance filters the survivors. Vocabulary is restricted to "
    "printable-ASCII tokens — the one domain where levenshtein's "
    "edit unit is engine-independent. The oracle cross-joins (its "
    "vocab is tiny); the Spark plan is the one that scales — blocks "
    "shrink the candidate set from |V|^2 to sum of length-bucket "
    "products, and a first-char sub-block can be layered on when "
    "d=1. JVM-side levenshtein, no Python.",
    tags=("text", "dedup"),
)
def vocab_edit_distance_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fuzzy pairing is defined over printable-ASCII tokens only:
    # levenshtein's edit unit for non-ASCII text is engine-specific
    # (DuckDB counts UTF-8 bytes for Latin accents but not for CJK;
    # the JVM counts code points) — inside ASCII every engine agrees
    vocab = (
        t(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("tok"))
        .where(F.col("tok").rlike("^[!-~]+$"))
        .distinct()
    )
    left = vocab.select(
        F.col("tok").alias("tok_a"),
        F.explode(
            F.sequence(
                F.length("tok") - 2, F.length("tok") + 2
            )
        ).alias("blk"),
    ).where(F.col("blk") >= 1)
    right = vocab.select(
        F.col("tok").alias("tok_b"), F.length("tok").alias("blk")
    )
    return (
        left.join(right, "blk")
        .where(F.col("tok_a") < F.col("tok_b"))
        .select(
            "tok_a",
            "tok_b",
            F.levenshtein("tok_a", "tok_b").cast("int").alias("dist"),
        )
        .where(F.col("dist") <= 2)
    )


@register(
    "cdc_chunk_stats",
    oracle=f"""
    WITH cand AS (
        SELECT doc_id, CAST(u AS INT) AS pos,
               CAST(('0x' || substring(
                   md5(substring(text, CAST(u AS INT), {_CDC_WIN})), 1, 15))
                   AS UBIGINT) % {_CDC_MOD} AS hmod
        FROM (SELECT doc_id, text,
                     unnest(range(1, greatest(length(text) - {_CDC_WIN - 1},
                                              0) + 1)) AS u
              FROM documents) s
    ),
    cuts AS (
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_cuts,
               md5(string_agg(CAST(pos AS VARCHAR), ',' ORDER BY pos))
                   AS cuts_md5
        FROM cand WHERE hmod = 0 GROUP BY doc_id
    )
    SELECT d.doc_id,
           coalesce(c.n_cuts, 0) AS n_cuts,
           coalesce(c.n_cuts, 0) + 1 AS n_chunks,
           coalesce(c.cuts_md5, md5('')) AS cuts_md5
    FROM documents d LEFT JOIN cuts c USING (doc_id)
    """,
    doc="Content-defined chunking (the LBFS / rsync / restic "
    "boundary rule): a cut lands wherever the rolling hash of the "
    "8-char window at that position is 0 mod 64 — so boundaries "
    "depend only on LOCAL content and survive insertions that would "
    "shift every fixed-size chunk boundary. The portable md5-derived "
    "hash (operators/dedup.py:portable_hash64) makes every cut "
    "position engine-reproducible; the md5 over the ordered cut "
    "list adjudicates the exact boundary set, not just counts. "
    "Shape at 100 TB: position explode is map-side (positions never "
    "leave their doc's partition), the only shuffle is the "
    "doc_id-keyed cut aggregation; expected chunk size is the "
    "divisor (64 chars), tunable per corpus.",
    tags=("dedup", "storage", "documents"),
)
def cdc_chunk_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    cand = docs.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"CASE WHEN length(text) >= {_CDC_WIN} "
                f"THEN sequence(1, length(text) - {_CDC_WIN - 1}) "
                f"ELSE array() END"
            )
        ).alias("_p", "pos"),
        F.col("text"),
    ).select(
        "doc_id",
        F.col("pos").cast("int").alias("pos"),
        (
            portable_hash64(
                F.expr(f"substring(text, pos, {_CDC_WIN})")
            )
            % _CDC_MOD
        ).alias("hmod"),
    )
    cuts = (
        cand.where(F.col("hmod") == 0)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_cuts"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.sort_array(F.collect_list("pos")),
                        lambda x: x.cast("string"),
                    ),
                    ",",
                )
            ).alias("cuts_md5"),
        )
    )
    return docs.select("doc_id").join(cuts, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_cuts", F.lit(0)).alias("n_cuts"),
        (F.coalesce("n_cuts", F.lit(0)) + 1).alias("n_chunks"),
        F.coalesce("cuts_md5", F.md5(F.lit(""))).alias("cuts_md5"),
    )
