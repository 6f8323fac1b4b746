"""Physical storage operators (operators/storage.py) against REAL
Spark writes — the half of the storage surface a SQL oracle cannot
adjudicate (file sizes live in the filesystem, not the data). The
registered twins (queries/storage_ops.py) cover the planning algebra
under the driver's DuckDB gate; these pin the _metadata physics:

- file_manifest agrees byte-for-byte with os.stat over every part
  file, and row counts with the table.
- compaction_bins over the real manifest partitions the file set
  (every file in exactly one group) with group payloads within one
  max-file of the target.
- file_zonemaps: a range-clustered write yields non-overlapping
  per-file zones (a one-day predicate prunes all but <= 2 files);
  the hash-scattered write of the SAME rows prunes nothing.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _part_sizes(root: str) -> dict[str, int]:
    return {
        f: os.path.getsize(os.path.join(root, f))
        for f in os.listdir(root)
        if f.endswith(".parquet")
    }


def test_file_manifest_matches_os_stat(spark, tmp_path_factory):
    from kittispark.operators.storage import file_manifest
    from kittispark.sources.tables import load_table

    root = str(tmp_path_factory.mktemp("manifest") / "docs")
    docs = load_table(spark, SF, "documents")
    docs.repartition(8, "doc_id").write.parquet(root)

    m = {r["file"]: (r["bytes"], r["n_rows"]) for r in file_manifest(spark, root).collect()}
    sizes = _part_sizes(root)
    assert set(m) == set(sizes)
    for f, sz in sizes.items():
        assert m[f][0] == sz, f"{f}: manifest={m[f][0]} os={sz}"
    assert sum(n for _, n in m.values()) == docs.count()


def test_compaction_bins_partition_real_files(spark, tmp_path_factory):
    from kittispark.operators.storage import compaction_bins, file_manifest

    root = str(tmp_path_factory.mktemp("compact") / "docs")
    from kittispark.sources.tables import load_table

    docs = load_table(spark, SF, "documents")
    docs.repartition(16, "doc_id").write.parquet(root)

    manifest = file_manifest(spark, root)
    rows = compaction_bins(manifest, "bytes", "file", n_groups=4).collect()
    # every file appears exactly once, groups are 0..3
    assert sorted(r["file"] for r in rows) == sorted(
        r["file"] for r in manifest.collect()
    )
    groups = {r["compaction_group"] for r in rows}
    assert groups <= set(range(4)) and 0 in groups and max(groups) == 3
    # each group's payload is within one max-file of the even target
    total = sum(r["bytes"] for r in rows)
    max_file = max(r["bytes"] for r in rows)
    per = {}
    for r in rows:
        per[r["compaction_group"]] = per.get(r["compaction_group"], 0) + r["bytes"]
    for g, b in per.items():
        assert b <= total / 4 + max_file, (g, b, total / 4, max_file)

    # target_bytes form: same invariants, data-driven group count
    rows_t = compaction_bins(
        manifest, "bytes", "file", target_bytes=max(total // 3, 1)
    ).collect()
    assert sorted(r["file"] for r in rows_t) == sorted(r["file"] for r in rows)

    # exactly-one-of contract
    try:
        compaction_bins(manifest, "bytes", "file")
    except ValueError:
        pass
    else:  # pragma: no cover
        raise AssertionError("expected ValueError for missing sizing arg")


def test_file_zonemaps_clustered_vs_scattered(spark, tmp_path_factory):
    from kittispark.operators.storage import file_zonemaps
    from kittispark.sources.tables import load_table

    ev = load_table(spark, SF, "events").select(
        "event_id", F.to_date("ts").alias("d")
    )
    base = tmp_path_factory.mktemp("zones")

    clustered = str(base / "clustered")
    ev.repartitionByRange(8, "d").sortWithinPartitions("d").write.parquet(
        clustered
    )
    scattered = str(base / "scattered")
    ev.repartition(8, "event_id").write.parquet(scattered)

    probe = "2024-01-15"
    zc = file_zonemaps(spark, clustered, "d").collect()
    zs = file_zonemaps(spark, scattered, "d").collect()
    assert sum(r["n_rows"] for r in zc) == ev.count()

    def hits(zones):
        return [
            r
            for r in zones
            if str(r["key_min"]) <= probe and str(r["key_max"]) >= probe
        ]

    # clustered zones: the probe day falls in at most 2 files (range
    # boundaries may split one day), i.e. >= 6 of 8 prunable
    assert len(hits(zc)) <= 2, [
        (r["file"], r["key_min"], r["key_max"]) for r in zc
    ]
    # scattered zones all span the probe day: nothing prunable
    assert len(hits(zs)) == len(zs)
