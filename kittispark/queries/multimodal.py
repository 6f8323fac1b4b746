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
