"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata (north-star per BASELINE.json).

The Spark-side machinery — schema, Arrow batch shape, partitioning,
UDF signatures — is real and tested; the actual media decoding is
stubbed (`decode_stub`) because codec libraries are not in this
container. Swapping in a real decoder changes one function body, not
the pipeline.

Design for 100 TB of media:
- payloads live in a `binary` column next to typed metadata, so
  metadata predicates prune row-groups without touching bytes
  (parquet column projection never reads the blob for a
  metadata-only query);
- decode/feature steps run in `mapInPandas` (Arrow batches of
  bytes -> numpy), sized by `spark.sql.files.maxPartitionBytes` so a
  batch of blobs fits executor memory;
- frame-sampling/resize emit one row per frame via the iterator
  contract (1 -> N), the same UDTF shape as the KITTI .bin decode
  (SURVEY §2.8).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("digest", T.StringType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.DoubleType()), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
    ]
)


def pack_media(df: DataFrame, id_col: str, payload_col: str, media_type: str) -> DataFrame:
    """Normalize any (id, binary) pair into the media schema with
    metadata computed JVM-side (no Python touch of the bytes)."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(media_type).alias("media_type"),
        F.col(payload_col).alias("payload"),
        F.octet_length(payload_col).alias("n_bytes"),
        F.sha2(F.col(payload_col), 256).alias("digest"),
    )


def decode_stub(payload: bytes) -> dict:
    """Placeholder for a real image/audio decoder (PIL/soundfile not
    installed in this container). Deterministic fake so the pipeline
    is testable end-to-end: derives a fixed 4-dim feature and fake
    dims from the bytes. Replace body with a real decode to go live."""
    if payload is None:
        raise NotImplementedError("real decode requires codec libs; payload missing")
    n = len(payload)
    head = sum(payload[:16]) if n else 0
    return {
        "feature": [float(n), float(head), float(payload[0] if n else 0), float(n % 251)],
        "width": (head % 64) + 1,
        "height": (n % 64) + 1,
    }


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction: Arrow batches in, typed feature
    rows out. The batch loop is the real contract a decoder plugs
    into; `decode_stub` is the marked stub."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_stub(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "feature": [f["feature"] for f in feats],
                    "width": [f["width"] for f in feats],
                    "height": [f["height"] for f in feats],
                }
            )

    return media.select("media_id", "payload").mapInPandas(kernel, FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every_nth: int = 2, max_frames: int = 4) -> DataFrame:
    """Frame sampling as a 1->N UDTF shape: each video row yields
    sampled frame rows (frame index + a byte-slice standing in for
    the decoded frame). Same explode contract as the KITTI .bin
    decode (SURVEY §2.8)."""

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("frame_bytes", T.BinaryType(), True),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, blobs = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                payload = payload or b""
                step = max(1, len(payload) // max(1, max_frames))
                for fi, off in enumerate(range(0, len(payload), step * every_nth)):
                    if fi >= max_frames:
                        break
                    ids.append(mid)
                    idxs.append(fi)
                    blobs.append(bytes(payload[off : off + step]))
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_bytes": blobs}
            )

    return media.select("media_id", "payload").mapInPandas(kernel, schema)
