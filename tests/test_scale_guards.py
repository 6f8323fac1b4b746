"""Round-9 scale plumbing: the parquet-footer row statistic
(`_util.table_rows`) that drives size-aware broadcast gates, and the
single-JVM heap guard for the engine-execution tiers
(VERDICT r8 #5)."""

from __future__ import annotations

import os

import pytest

from kittispark.queries._util import table_rows
from kittispark.sources import tables as tb


def test_table_rows_reads_footer_only():
    # sf0.01 lineitem is 60k rows; the helper must agree with the
    # actual count without any Spark job
    assert table_rows("/root/testdata/sf0.01", "lineitem") == 60_000
    assert table_rows("/root/testdata/sf0.01", "nation") == 25


def test_table_rows_missing_table_degrades_to_large_sentinel():
    # any metadata error must push callers to the shuffle path,
    # never a forced broadcast
    assert table_rows("/nonexistent", "lineitem") >= 1 << 60


def test_table_rows_nested_partitioned_layout(tmp_path):
    # ADVICE r9: partitioned layouts nest part files under key=value
    # subdirectories — the footer sum must walk recursively
    import shutil

    d = tmp_path / "nation.parquet"
    (d / "n_key=0").mkdir(parents=True)
    (d / "n_key=1").mkdir()
    shutil.copy(
        "/root/testdata/sf0.01/nation.parquet", d / "n_key=0" / "part-0.parquet"
    )
    shutil.copy(
        "/root/testdata/sf0.01/nation.parquet", d / "n_key=1" / "part-1.parquet"
    )
    assert table_rows(str(tmp_path), "nation") == 50


def test_table_rows_empty_directory_is_sentinel_not_zero(tmp_path):
    # ADVICE r9: an empty/partless dir returning 0 would FORCE a
    # broadcast of an arbitrarily large table — the exact inverse of
    # the degrade-to-shuffle fail-safe. Must return the sentinel.
    (tmp_path / "lineitem.parquet").mkdir()
    assert table_rows(str(tmp_path), "lineitem") >= 1 << 60


def test_parse_mem():
    assert tb._parse_mem("8g") == 8 << 30
    assert tb._parse_mem("48G") == 48 << 30
    assert tb._parse_mem("512m") == 512 << 20
    assert tb._parse_mem("1t") == 1 << 40
    assert tb._parse_mem("1073741824") == 1 << 30
    # ADVICE r9: Spark-legal long suffixes must not raise (a swallowed
    # ValueError silently fail-opens the heap guard)
    assert tb._parse_mem("16gb") == 16 << 30
    assert tb._parse_mem("48GB") == 48 << 30
    assert tb._parse_mem("512mb") == 512 << 20
    assert tb._parse_mem("2kb") == 2 << 10
    # ADVICE r10: the full JavaUtils suffix table — bare-bytes 'b' and
    # petabyte 'p'/'pb' spellings are Spark-legal too
    assert tb._parse_mem("1024b") == 1024
    assert tb._parse_mem("1p") == 1 << 50
    assert tb._parse_mem("1pb") == 1 << 50
    assert tb._parse_mem("1.5g") == int(1.5 * (1 << 30))
    with pytest.raises(ValueError):
        tb._parse_mem("16 gigs")


def test_heap_guard_quiet_at_test_scale(spark):
    # the guard must never fire below the 100M-row threshold — the
    # bench, the driver gate, and the 50x tier all stay untouched
    tb._heap_guard_checked.discard("/root/testdata/sf0.1/lineitem")
    assert tb.load_table(spark, "/root/testdata/sf0.1", "lineitem").count() > 0


def test_heap_guard_message_names_the_knob(spark, tmp_path, monkeypatch):
    # simulate a 250x-sized fact under a small heap: the guard must
    # raise an ACTIONABLE error naming KITTISPARK_DRIVER_MEM, not let
    # Spark die in an opaque mid-stage OOM
    monkeypatch.delenv("KITTISPARK_SMALL_HEAP_OK", raising=False)
    monkeypatch.setattr(tb, "_HEAP_GUARD_ROWS", 50_000)
    tb._heap_guard_checked.clear()
    try:
        with pytest.raises(RuntimeError, match="KITTISPARK_DRIVER_MEM=48g"):
            tb.load_table(spark, "/root/testdata/sf0.01", "lineitem")
        # the override env proceeds
        monkeypatch.setenv("KITTISPARK_SMALL_HEAP_OK", "1")
        tb._heap_guard_checked.clear()
        assert (
            tb.load_table(spark, "/root/testdata/sf0.01", "lineitem").count()
            == 60_000
        )
    finally:
        tb._heap_guard_checked.clear()


def test_heap_guard_checks_once_per_table(spark, monkeypatch):
    # the footer peek must not run on every load_table call
    calls = []
    real = table_rows

    def spy(sf_dir, name):
        calls.append(name)
        return real(sf_dir, name)

    import kittispark.queries._util as util

    monkeypatch.setattr(util, "table_rows", spy)
    tb._heap_guard_checked.clear()
    for _ in range(3):
        tb.load_table(spark, "/root/testdata/sf0.01", "orders")
    assert len(calls) == 1
