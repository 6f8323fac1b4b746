"""The kitti_points Python Data Source must agree exactly with the
binaryFile+mapInPandas reader (same decode semantics, different
transport) and with the raw NumPy bytes on disk."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from kittispark.sources.datasource import register
from kittispark.sources.kitti import read_points
from tests.kitti_fixture import make_fixture


@pytest.fixture(scope="module")
def kitti_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti_ds")
    frames = make_fixture(str(root), n_frames=5, seed=77)
    return str(root), frames


def _sorted_rows(df):
    return [
        tuple(r)
        for r in df.orderBy("frame_id", "x", "y", "z", "intensity").collect()
    ]


def test_datasource_matches_mapinpandas_reader(spark, kitti_dir):
    root, _ = kitti_dir
    register(spark)
    via_ds = spark.read.format("kitti_points").load(f"{root}/velodyne")
    via_map = read_points(spark, f"{root}/velodyne")
    # nullability metadata differs (DDL-declared schemas are nullable);
    # names and types must agree exactly
    assert [(f.name, f.dataType) for f in via_ds.schema] == [
        (f.name, f.dataType) for f in via_map.schema
    ]
    assert _sorted_rows(via_ds) == _sorted_rows(via_map)


def test_datasource_matches_numpy_golden(spark, kitti_dir):
    root, frames = kitti_dir
    register(spark)
    df = spark.read.format("kitti_points").load(f"{root}/velodyne")
    got_counts = {
        r["frame_id"]: r["n"]
        for r in df.groupBy("frame_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got_counts == {fid: fr["points"].shape[0] for fid, fr in frames.items()}
    # value-exact on one frame: float32 widened to float64
    fid = sorted(frames)[0]
    want = frames[fid]["points"].astype("f8")
    got = np.array(
        df.filter(F.col("frame_id") == fid)
        .select("x", "y", "z", "intensity")
        .collect()
    )
    assert np.array_equal(
        got[np.lexsort(got.T[::-1])], want[np.lexsort(want.T[::-1])]
    )


def test_partition_grouping_bounds_tasks(spark, kitti_dir):
    root, frames = kitti_dir
    register(spark)
    df = (
        spark.read.format("kitti_points")
        .option("files_per_partition", "2")
        .load(f"{root}/velodyne")
    )
    # 5 files / 2 per group -> 3 tasks
    assert df.rdd.getNumPartitions() == 3
    assert df.count() == sum(fr["points"].shape[0] for fr in frames.values())


def test_datasource_writer_roundtrip(spark, kitti_dir, tmp_path):
    # write half of the v2 source: save one .bin per frame via
    # df.write.format("kitti_points"), re-read with the reader, and
    # demand bit-identical float32 payloads
    root, _ = kitti_dir
    out = str(tmp_path / "bins_out")
    df = spark.read.format("kitti_points").load(f"{root}/velodyne")
    (
        df.repartition("frame_id")
        .write.format("kitti_points")
        .mode("overwrite")
        .save(out)
    )
    back = spark.read.format("kitti_points").load(out)
    from pyspark.sql import functions as F

    a = df.groupBy("frame_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round("x", 4)).alias("sx"),
        F.sum(F.round("intensity", 4)).alias("si"),
    )
    b = back.groupBy("frame_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round("x", 4)).alias("sx"),
        F.sum(F.round("intensity", 4)).alias("si"),
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    # files really are one-per-frame with the basename contract
    import os

    frames = {r.frame_id for r in df.select("frame_id").distinct().collect()}
    assert {f[:-4] for f in os.listdir(out) if f.endswith(".bin")} == frames


def test_datasource_writer_float64_option_bytes(spark, kitti_dir, tmp_path):
    # dtype='<f8' writes the reference's promoted float64 bytes:
    # exact doubles survive the roundtrip (no f4 quantization)
    root, _ = kitti_dir
    out = str(tmp_path / "bins_f8")
    df = spark.read.format("kitti_points").load(f"{root}/velodyne")
    (
        df.repartition("frame_id")
        .write.format("kitti_points")
        .option("dtype", "<f8")
        .mode("overwrite")
        .save(out)
    )
    import numpy as np
    import os

    one = sorted(os.listdir(out))[0]
    arr = np.fromfile(os.path.join(out, one), dtype="<f8").reshape(-1, 4)
    frame = one[:-4]
    want = (
        df.filter(df.frame_id == frame)
        .orderBy("x", "y", "z", "intensity")
        .collect()
    )
    got = sorted(map(tuple, arr.tolist()))
    assert got == sorted((r.x, r.y, r.z, r.intensity) for r in want)


def test_truncated_bin_raises_clear_error(spark, tmp_path):
    # a torn file (non-multiple-of-16 bytes) must fail loudly with the
    # offending path, not a cryptic numpy reshape error
    import numpy as np

    d = tmp_path / "velodyne_bad"
    d.mkdir()
    good = np.arange(16, dtype="<f4")
    good.tofile(d / "000000.bin")
    (d / "000001.bin").write_bytes(good.tobytes()[:-3])
    register(spark)
    with pytest.raises(Exception, match="corrupt .bin"):
        spark.read.format("kitti_points").load(str(d)).count()


def test_datasource_writer_overwrite_clears_stale_frames(spark, kitti_dir, tmp_path):
    # mode("overwrite") must remove frames from prior writes that the
    # new dataframe no longer contains — not append-by-filename
    root, _ = kitti_dir
    out = str(tmp_path / "bins_ow")
    df = spark.read.format("kitti_points").load(f"{root}/velodyne")
    frames = sorted(r.frame_id for r in df.select("frame_id").distinct().collect())
    df.repartition("frame_id").write.format("kitti_points").mode(
        "overwrite"
    ).save(out)
    keep = frames[0]
    (
        df.filter(df.frame_id == keep)
        .repartition("frame_id")
        .write.format("kitti_points")
        .mode("overwrite")
        .save(out)
    )
    import os

    left = sorted(f[:-4] for f in os.listdir(out) if f.endswith(".bin"))
    assert left == [keep]
    # no tmp droppings survive a successful commit
    assert not [f for f in os.listdir(out) if ".bin.tmp-" in f]
