"""Multimodal-column queries: the documents table's text re-encoded
as a binary payload column exercises the real plumbing (binary type,
JVM-side metadata, Arrow batch boundary); decode itself is a marked
stub (kittispark.operators.multimodal.decode_stub).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kittispark.registry import register
from kittispark.queries._util import t
from kittispark.operators.multimodal import extract_features, pack_media


@register(
    "binary_metadata",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(octet_length(encode(text)) AS INT) AS n_bytes,
           sha256(text) AS digest
    FROM documents
    """,
    doc="Binary payload metadata computed JVM-side (octet_length + "
    "sha2) — a metadata-only query never touches payload bytes at "
    "scale (parquet column pruning).",
    tags=("multimodal",),
)
def binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    media = pack_media(
        docs.select("doc_id", F.encode("text", "UTF-8").alias("payload")),
        "doc_id",
        "payload",
        "text",
    )
    return media.select("media_id", "n_bytes", "digest")


@register(
    "media_feature_extract",
    oracle=None,  # stubbed decoder — rows-only check
    doc="mapInPandas feature extraction over binary payloads (Arrow "
    "batches in, typed features out). Decoder is a deterministic "
    "stub; the batch contract, schema, and partitioning are the real "
    "100 TB machinery.",
    tags=("multimodal", "udf"),
)
def media_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    media = pack_media(
        docs.select("doc_id", F.encode("text", "UTF-8").alias("payload")),
        "doc_id",
        "payload",
        "text",
    )
    feats = extract_features(media)
    return feats.select(
        "media_id",
        F.element_at("feature", 1).alias("f0"),
        F.element_at("feature", 2).alias("f1"),
        "width",
        "height",
    )


@register(
    "media_frame_sample",
    oracle="""
    WITH m AS (
        SELECT doc_id AS media_id, octet_length(encode(text)) AS n
        FROM documents WHERE doc_id < 500
    ),
    p AS (SELECT media_id, n, greatest(1, n // 4) AS step FROM m)
    SELECT media_id,
           CAST(o / (step * 2) AS INT) AS frame_idx,
           CAST(least(step, n - o) AS INT) AS n_frame_bytes
    FROM p, LATERAL (SELECT unnest(generate_series(0, n - 1, step * 2)) AS o) g
    WHERE o / (step * 2) < 4
    """,
    doc="Frame sampling as a 1->N generator over binary payloads "
    "(every-2nd slice, max 4 frames per item) — the video-frame-"
    "sample shape; the oracle reproduces the slice arithmetic with "
    "generate_series, so the Python batch kernel's fan-out is value-"
    "checked, not just row-counted.",
    tags=("multimodal", "udf"),
)
def media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kittispark.operators.multimodal import sample_frames

    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    media = pack_media(
        docs.select("doc_id", F.encode("text", "UTF-8").alias("payload")),
        "doc_id",
        "payload",
        "video",
    )
    return sample_frames(media).select(
        "media_id",
        "frame_idx",
        F.octet_length("frame_bytes").alias("n_frame_bytes"),
    )
