"""Sinks (SURVEY.md §2.1 S5-S6).

Parquet partitioned by frame is the canonical sink at scale
(columnar, prunable, splittable). Byte-level KITTI `.bin` emission is
kept as an exporter for drop-in compatibility with the reference's
output directories (data_pipeline.py:81, .gitignore:1-2) — an
applyInPandas-per-frame kernel, i.e. the foreachPartition-style sink
UDF slot of SURVEY §2.8.
"""

from __future__ import annotations

import os

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def write_frames(points: DataFrame, out_dir: str, mode: str = "overwrite") -> None:
    """Canonical sink: parquet partitioned by frame_id. A reader of a
    single frame prunes to one partition; full scans stay splittable."""
    points.write.mode(mode).partitionBy("frame_id").parquet(out_dir)


_WRITE_RESULT = T.StructType(
    [
        T.StructField("frame_id", T.StringType()),
        T.StructField("n_points", T.LongType()),
    ]
)


def write_kitti_bins(
    points: DataFrame, out_dir: str, dtype: str = "<f4"
) -> DataFrame:
    """Exporter: one little-endian `.bin` per frame, same basename
    contract as the reference sink (data_pipeline.py:81).

    Default float32 restores the KITTI on-disk dtype (SURVEY §7.4
    float policy: double compute, float32 at the .bin boundary).
    Note the reference itself writes float64 here — its array is
    promoted by the calibration matmul and never cast back; pass
    dtype='<f8' for bug-compatible bytes.

    Runs as groupBy(frame).applyInPandas: each frame's rows land in
    one kernel call which writes the file and returns the row count —
    so the returned DataFrame doubles as the per-frame count stats
    input (A6) without a second pass. Executors must share a
    filesystem with `out_dir` (local/NFS/FUSE); on object storage use
    write_frames instead."""

    def emit(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        frame = pdf["frame_id"].iloc[0]
        arr = pdf[["x", "y", "z", "intensity"]].to_numpy(dtype="f8")
        os.makedirs(out_dir, exist_ok=True)
        arr.astype(dtype).tofile(os.path.join(out_dir, f"{frame}.bin"))
        return pd.DataFrame({"frame_id": [frame], "n_points": [len(pdf)]})

    return (
        points.select("frame_id", "x", "y", "z", "intensity")
        .groupBy("frame_id")
        .applyInPandas(emit, _WRITE_RESULT)
    )


def points_to_parquet(points: DataFrame, out_dir: str) -> None:
    """One-time .bin -> parquet pre-conversion (SURVEY §2.1 S2
    long-term path): after this, every query gets pushdown + pruning
    on the columnar layout for free."""
    write_frames(points.select("frame_id", "x", "y", "z", "intensity"), out_dir)


def summary_sink(df: DataFrame) -> list[dict]:
    """S6 report sink: collect a (tiny) summary DataFrame to plain
    dicts — the structured replacement for the reference's prints
    (data_pipeline.py:50-63). Caller guarantees df is an aggregate."""
    return [row.asDict() for row in df.collect()]


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    path: str,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed external table: the co-located-join layout. Two tables
    bucketed (and sorted) the same way on their join key are joined
    with ZERO shuffle — each bucket pair merges directly; at 100 TB
    this removes the dominant cost of repeated fact-to-fact joins.
    Bucket count is a layout contract: pick once per subject area
    (e.g. 1024 at cluster scale) so all participants align."""
    w = df.write.mode(mode).option("path", path).bucketBy(n_buckets, *bucket_cols)
    w = w.sortBy(*(sort_cols or bucket_cols))
    w.format("parquet").saveAsTable(table)


def write_frames_observed(
    points: DataFrame, out_dir: str, mode: str = "overwrite"
) -> dict:
    """One-pass write-plus-metrics (SURVEY §3 E2): the reference
    writes cut-out frames AND folds count stats in the same loop
    (data_pipeline.py:77-84); the Spark equivalent attaches an
    Observation to the write so metrics ride the write job itself —
    no second scan of the data. Returns the observed metrics dict.

    Observation aggregates must be shuffle-free (they fold on the
    task path), so cardinality uses the HLL sketch; exact per-frame
    stats, when needed, read the (columnar, pruned) output instead.
    """
    from pyspark.sql import Observation

    obs = Observation("write_stats")
    observed = points.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.approx_count_distinct("frame_id").alias("n_frames_approx"),
        F.min("z").alias("min_z"),
        F.max("z").alias("max_z"),
    )
    observed.write.mode(mode).partitionBy("frame_id").parquet(out_dir)
    return obs.get
