"""Python Data Source (Spark 4 API) for KITTI point-cloud `.bin` files.

`kittispark.sources.kitti.read_points` decodes via binaryFile +
mapInPandas — fine, but the file *content* still rides through a JVM
row before reaching Python. This DataSource is the idiomatic long-term
form flagged in SURVEY.md §2.1 S2: the engine-native scan

    spark.dataSource.register(KittiPointsDataSource)
    spark.read.format("kitti_points").load(velodyne_dir)

decodes `np.frombuffer(content, '<f4').reshape(-1, 4)` semantics
(reference data_utils.py:11-14) directly where the bytes are read and
hands Spark Arrow RecordBatches — zero row-at-a-time work.

Scale design:
- Planning lists the directory once on the driver (cheap metadata op;
  same listing S1 does at data_utils.py:4-8) and packs files into
  `files_per_partition` groups, so task count stays bounded as the
  frame count grows (~7,481 frames for real KITTI → ~59 tasks at the
  default 128, not 7,481).
- Each partition streams one RecordBatch per file: peak memory is one
  frame (~2 MB for 120k points), independent of partition size.
- frame_id comes from the file name, keeping the explicit join key of
  the keyed redesign (SURVEY §7.4) rather than positional alignment.
"""

from __future__ import annotations

import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

POINTS_DDL = "frame_id string, x double, y double, z double, intensity double"


class _FileGroup(InputPartition):
    def __init__(self, paths: Sequence[str]):
        self.paths = list(paths)


class KittiPointsReader(DataSourceReader):
    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("kitti_points requires a load(path) directory")
        self._dir = path
        self._files_per_partition = int(options.get("files_per_partition", "128"))

    def partitions(self) -> Sequence[InputPartition]:
        files = sorted(
            os.path.join(self._dir, f)
            for f in os.listdir(self._dir)
            if f.endswith(".bin")
        )
        if not files:
            raise FileNotFoundError(f"no .bin files under {self._dir}")
        step = self._files_per_partition
        return [_FileGroup(files[i : i + step]) for i in range(0, len(files), step)]

    def read(self, partition: _FileGroup) -> Iterator:
        # Executor-side: decode each file into ONE Arrow RecordBatch.
        # float32 -> float64 widening matches the engine's compute-in-
        # double policy (SURVEY §7.4); intensity passes through.
        import numpy as np
        import pyarrow as pa

        for path in partition.paths:
            frame_id = os.path.basename(path).rsplit(".", 1)[0]
            with open(path, "rb") as f:
                raw = f.read()
            if len(raw) % 16:
                raise ValueError(
                    f"corrupt .bin file {path}: {len(raw)} bytes is not a "
                    "multiple of 16 (4 x float32 per point)"
                )
            arr = np.frombuffer(raw, dtype="<f4").reshape(-1, 4)
            arr64 = arr.astype("f8")
            n = arr64.shape[0]
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array([frame_id] * n, type=pa.string()),
                    pa.array(arr64[:, 0]),
                    pa.array(arr64[:, 1]),
                    pa.array(arr64[:, 2]),
                    pa.array(arr64[:, 3]),
                ],
                names=["frame_id", "x", "y", "z", "intensity"],
            )


class _BinCommit(WriterCommitMessage):
    def __init__(self, frames: Sequence[str], suffix: str):
        self.frames = list(frames)
        self.suffix = suffix


class KittiPointsWriter(DataSourceWriter):
    """Write half of `format("kitti_points")`: one little-endian
    `.bin` per frame_id (same basename contract as the reference
    sink, data_pipeline.py:81), with a REAL two-phase commit: tasks
    write `<frame>.bin.tmp-<task-token>` files and only commit()
    renames them to their final names — a failed job (or a task that
    dies mid-write) never leaves byte-valid final files behind.

    Contract: the input must be partitioned by frame_id
    (`df.repartition("frame_id")`) so each frame's rows reach ONE
    task — a frame split across tasks would mean a torn file, which
    commit() detects (frames are reported per task and cross-task
    duplicates abort the job BEFORE any rename publishes a file).
    Executors must share a filesystem with the target directory;
    on object storage use sinks.write_frames (parquet) instead.

    dtype option: '<f4' (default, KITTI on-disk) or '<f8'
    (bug-compatible with the reference's promoted float64 bytes).
    mode("overwrite") clears pre-existing `.bin` (and stale tmp)
    files from the directory at planning time, matching Spark's
    delete-then-write overwrite semantics.
    """

    def __init__(self, options: dict, overwrite: bool):
        path = options.get("path")
        if not path:
            raise ValueError("kitti_points requires a save(path) directory")
        self._dir = path
        self._dtype = options.get("dtype", "<f4")
        if overwrite and os.path.isdir(path):
            for f in os.listdir(path):
                if f.endswith(".bin") or ".bin.tmp-" in f:
                    try:
                        os.remove(os.path.join(path, f))
                    except OSError:
                        pass

    def write(self, iterator) -> "_BinCommit":
        import numpy as np
        import uuid

        os.makedirs(self._dir, exist_ok=True)
        suffix = uuid.uuid4().hex[:12]
        buf: dict[str, list] = {}
        for row in iterator:
            buf.setdefault(row["frame_id"], []).append(
                (row["x"], row["y"], row["z"], row["intensity"])
            )
        for frame, pts in buf.items():
            arr = np.asarray(pts, dtype="f8")
            arr.astype(self._dtype).tofile(
                os.path.join(self._dir, f"{frame}.bin.tmp-{suffix}")
            )
        return _BinCommit(sorted(buf), suffix)

    def commit(self, messages) -> None:
        # Phase 1: validate the whole job before publishing anything.
        seen: set[str] = set()
        for m in messages:
            if m is None:  # pyspark contract: failed tasks report None
                continue
            for frame in m.frames:
                if frame in seen:
                    raise RuntimeError(
                        f"frame {frame!r} was written by more than one task — "
                        "repartition the input by frame_id before writing"
                    )
                seen.add(frame)
        # Phase 2: atomically publish via rename (same filesystem).
        for m in messages:
            if m is None:
                continue
            for frame in m.frames:
                os.replace(
                    os.path.join(self._dir, f"{frame}.bin.tmp-{m.suffix}"),
                    os.path.join(self._dir, f"{frame}.bin"),
                )

    def abort(self, messages) -> None:
        # best-effort: drop the tmp files of tasks that completed;
        # failed tasks report None (their strays are cleaned by the
        # next overwrite)
        for m in messages:
            if m is None:
                continue
            for frame in m.frames:
                try:
                    os.remove(
                        os.path.join(self._dir, f"{frame}.bin.tmp-{m.suffix}")
                    )
                except OSError:
                    pass


class KittiPointsDataSource(DataSource):
    """`format("kitti_points")` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "kitti_points"

    def schema(self) -> str:
        return POINTS_DDL

    def reader(self, schema) -> KittiPointsReader:
        return KittiPointsReader(self.options)

    def writer(self, schema, overwrite: bool) -> KittiPointsWriter:
        return KittiPointsWriter(self.options, overwrite)


def register(spark) -> None:
    """Idempotent registration of the engine's custom sources."""
    spark.dataSource.register(KittiPointsDataSource)
