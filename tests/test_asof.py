"""Hand-built as-of join semantics: ties match (<=), missing history
gives null, tolerance voids stale matches, payload carries forward."""

from __future__ import annotations

from pyspark.sql import functions as F

from kittispark.operators.asof import asof_join


def _mk(spark):
    left = spark.createDataFrame(
        [(1, 10.0, "a"), (1, 20.0, "b"), (1, 35.0, "c"), (2, 5.0, "d"), (3, 9.0, "e")],
        "k int, ts double, tag string",
    )
    right = spark.createDataFrame(
        [(1, 10.0, 100.0), (1, 30.0, 300.0), (2, 6.0, 600.0)],
        "k int, ts double, v double",
    )
    return left, right


def test_asof_basic_and_ties(spark):
    left, right = _mk(spark)
    out = {
        r["tag"]: r["v"]
        for r in asof_join(left, right, on="k", ts="ts", payload=["v"]).collect()
    }
    assert out == {
        "a": 100.0,  # exact tie matches (<=)
        "b": 100.0,  # carries forward past unmatched gap
        "c": 300.0,  # newest at-or-before wins
        "d": None,   # right row is later than left -> no match
        "e": None,   # key with no right rows at all
    }


def test_asof_tolerance(spark):
    left, right = _mk(spark)
    out = {
        r["tag"]: r["v"]
        for r in asof_join(
            left, right, on="k", ts="ts", payload=["v"], tolerance=F.lit(5.0)
        ).collect()
    }
    # b: last right at ts=10 is 10 units stale -> voided by tolerance=5
    assert out == {"a": 100.0, "b": None, "c": 300.0, "d": None, "e": None}


def test_asof_preserves_left_rowcount(spark):
    left, right = _mk(spark)
    assert asof_join(left, right, on="k", ts="ts", payload=["v"]).count() == left.count()


def test_asof_serves_matched_rows_null_not_stale_value(spark):
    # DuckDB ASOF semantics: the MATCHED row's payload is served even
    # when it is NULL — a per-column ignorenulls carry would skip it
    # and resurrect an older row's value (and could mix columns from
    # different right rows)
    import datetime as _dt

    def ts(s):
        return _dt.datetime(2024, 1, 1) + _dt.timedelta(seconds=s)

    left = spark.createDataFrame([(1, ts(3))], "k long, ts timestamp")
    right = spark.createDataFrame(
        [(1, ts(1), 5.0, "a"), (1, ts(2), None, "b")],
        "k long, ts timestamp, v double, tag string",
    )
    row = asof_join(left, right, on="k", ts="ts", payload=["v", "tag"]).collect()[0]
    assert row.v is None       # matched ts=2 row's NULL, not stale 5.0
    assert row.tag == "b"      # both payload columns from the SAME row


def test_asof_rejects_payload_name_collision(spark):
    import datetime as _dt
    import pytest as _pytest

    t0 = _dt.datetime(2024, 1, 1)
    left = spark.createDataFrame([(1, t0, 9.0)], "k long, ts timestamp, v double")
    right = spark.createDataFrame([(1, t0, 1.0)], "k long, ts timestamp, v double")
    with _pytest.raises(ValueError, match="collide"):
        asof_join(left, right, on="k", ts="ts", payload=["v"])
