"""Dedup queries over the documents table. Exact + n-gram Jaccard
carry SQL oracles; MinHash-LSH and SimHash use engine hashing and so
get rows-only checks (flagged by the missing oracle entry).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kittispark.registry import register
from kittispark.queries._util import t
from kittispark.operators.dedup import (
    connected_components,
    exact_dedup,
    minhash_lsh_candidates,
    minhash_signature,
    ngram_jaccard_pairs,
    simhash_near_dup_candidates,
)


@register(
    "dedup_exact",
    oracle="""
    SELECT min(doc_id) AS keep_id,
           count(*) AS n_copies,
           CAST(length(text) AS INT) AS text_len
    FROM documents GROUP BY text
    """,
    doc="Exact dedup: hash-groupBy on document text, min-id survivor "
    "per group (at 100 TB: group by sha2 digest so the shuffle key "
    "is 32 bytes).",
    tags=("dedup",),
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return exact_dedup(docs).select(
        "keep_id", "n_copies", F.length("text").alias("text_len")
    )


@register(
    "dedup_exact_survivors",
    oracle="""
    SELECT doc_id, lang, source FROM documents d
    WHERE doc_id = (SELECT min(doc_id) FROM documents d2 WHERE d2.text = d.text)
    """,
    doc="Survivor selection after exact dedup — keep-first-by-id, "
    "implemented as a window-free groupBy + semi-join back (no "
    "row_number over the full corpus).",
    tags=("dedup",),
)
def dedup_exact_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    keep = docs.groupBy("text").agg(F.min("doc_id").alias("doc_id"))
    return docs.join(keep, ["text", "doc_id"], "left_semi").select(
        "doc_id", "lang", "source"
    )


@register(
    "ngram_jaccard_pairs",
    oracle="""
    WITH sh AS (
        SELECT DISTINCT doc_id,
               unnest(list_transform(
                   generate_series(1, greatest(len(toks) - 2, 0)),
                   i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]
               )) AS shingle
        FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    ),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           round(CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) >= 0.5
    """,
    doc="Exact 3-gram Jaccard near-dup pairs via inverted-index "
    "self-join on shingles (the verify stage after LSH candidates; "
    "output-bounded because only shingle-sharing pairs meet).",
    tags=("dedup",),
)
def ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(docs, threshold=0.5)


@register(
    "dedup_cluster_assign",
    oracle="""
    WITH RECURSIVE sh AS (
        SELECT DISTINCT doc_id,
               unnest(list_transform(
                   generate_series(1, greatest(len(toks) - 2, 0)),
                   i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]
               )) AS shingle
        FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    ),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    pairs AS (
        SELECT doc_a, doc_b FROM inter
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) >= 0.5
    ),
    edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
              UNION ALL SELECT doc_b, doc_a FROM pairs),
    reach(node, comp) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.dst, r.comp FROM reach r JOIN edges e ON e.src = r.node
    )
    SELECT node AS doc_id, min(comp) AS cluster_id FROM reach GROUP BY node
    """,
    doc="Duplicate-CLUSTER resolution — the stage after candidate "
    "generation that every dedup pipeline needs: 3-gram-Jaccard "
    "near-dup pairs become edges, connected components assign each "
    "document its cluster (min reachable id), singletons keep their "
    "own id. Spark side is iterative min-label propagation "
    "(operators.dedup.connected_components: join + min-agg per round, "
    "localCheckpoint lineage truncation, sum-of-labels convergence "
    "witness); the oracle computes true transitive closure with a "
    "recursive CTE, so hash-match proves the fixpoint is exact.",
    tags=("dedup", "iterative"),
)
def dedup_cluster_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    edges = ngram_jaccard_pairs(docs, threshold=0.5).select("doc_a", "doc_b")
    comps = connected_components(edges, src="doc_a", dst="doc_b")
    return docs.select(F.col("doc_id").cast("long").alias("doc_id")).join(
        comps, F.col("doc_id") == F.col("node"), "left"
    ).select(
        "doc_id",
        F.coalesce(F.col("comp"), F.col("doc_id")).alias("cluster_id"),
    )


@register(
    "minhash_lsh_candidates",
    oracle=None,  # engine hashing (xxhash64) — rows-only check
    doc="MinHash(16)+LSH(8 bands) near-dup candidate pairs — "
    "output-bounded band-bucket join, no O(n^2) compare. Rows-only "
    "check (engine hash); Jaccard-verified in tests against "
    "ngram_jaccard_pairs.",
    tags=("dedup",),
)
def minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return minhash_lsh_candidates(docs)


@register(
    "minhash_signatures",
    oracle=None,
    doc="MinHash signature matrix (doc_id -> array<long>[16]) — the "
    "sketch that makes near-dedup shuffle fixed-width at 100 TB.",
    tags=("dedup",),
)
def minhash_sigs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return minhash_signature(docs).select(
        "doc_id", F.element_at("signature", 1).alias("sig0"), F.size("signature").alias("k")
    )


@register(
    "simhash_candidates",
    oracle=None,
    doc="SimHash(64-bit, FNV-1a tokens, numpy kernel via mapInPandas) "
    "with 16-bit band blocking for candidate pairs — the Arrow "
    "pandas-UDF hosting slot (SURVEY §2.8).",
    tags=("dedup", "udf"),
)
def simhash_cands(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return simhash_near_dup_candidates(docs)


@register(
    "dedup_digest",
    oracle="""
    SELECT sha256(text) AS digest,
           min(doc_id) AS keep_id,
           count(*) AS n_copies
    FROM documents GROUP BY sha256(text)
    """,
    doc="Exact dedup grouped on a sha-256 digest instead of the text "
    "itself — the 100 TB form of dedup_exact: the shuffle key is 32 "
    "fixed bytes per row, not the document body.",
    tags=("dedup",),
)
def dedup_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return docs.groupBy(F.sha2("text", 256).alias("digest")).agg(
        F.min("doc_id").alias("keep_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )
