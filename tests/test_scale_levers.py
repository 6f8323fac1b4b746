"""The two plan-level scale levers the engine documents for 100 TB
joins, proven on real plans:

1. salting — a hot key is split across n_salts shuffle partitions and
   the join result is unchanged;
2. bucketing — two tables bucketed+sorted on the join key merge with
   ZERO shuffle exchanges.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from kittispark.operators.skew import salted_join
from kittispark.sinks import write_bucketed
from kittispark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


# ----------------------------------------------------------------- salting


@pytest.fixture(scope="module")
def skewed(spark):
    # 90% of fat rows share one key — the shape that stalls a plain
    # shuffle join on a single straggler task.
    fat = spark.range(10_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(42)).otherwise(F.col("id") % 100)
        .cast("long").alias("k"),
        F.col("id").alias("row_id"),
    )
    slim = spark.range(100).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("dim")
    )
    return fat, slim


def test_salted_join_matches_plain_inner(spark, skewed):
    fat, slim = skewed
    plain = fat.join(slim, "k").select("row_id", "dim")
    salted = salted_join(fat, slim, on="k", salt_from="row_id").select("row_id", "dim")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_join_matches_plain_left(spark, skewed):
    fat, slim = skewed
    plain = fat.join(slim, "k", "left").select("row_id", "dim")
    salted = salted_join(fat, slim, on="k", how="left", salt_from="row_id").select(
        "row_id", "dim"
    )
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salt_actually_splits_hot_key(spark, skewed):
    fat, _ = skewed
    n = 8
    salts = (
        fat.filter(F.col("k") == 42)
        .select(F.pmod(F.xxhash64("row_id"), F.lit(n)).alias("s"))
        .distinct()
        .count()
    )
    assert salts == n, "hot key must spread across all salt partitions"


def test_salted_join_rejects_ambiguous_columns(spark, skewed):
    fat, _ = skewed
    slim_clash = spark.range(10).select(
        F.col("id").alias("k"), F.col("id").alias("row_id")
    )
    with pytest.raises(ValueError, match="ambiguous"):
        salted_join(fat, slim_clash, on="k")


# ---------------------------------------------------------------- bucketing


def test_bucketed_join_zero_shuffle(spark, tmp_path_factory):
    import contextlib
    import io
    import re

    root = tmp_path_factory.mktemp("buckets")
    lineitem = load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    orders = load_table(spark, SF, "orders").select("o_orderkey", "o_custkey")
    write_bucketed(
        lineitem, "bt_lineitem", ["l_orderkey"], 8, str(root / "lineitem")
    )
    write_bucketed(orders, "bt_orders", ["o_orderkey"], 8, str(root / "orders"))

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("bt_lineitem").join(
            spark.table("bt_orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        shuffles = len(re.findall(r"^\(\d+\) Exchange\b", plan, re.MULTILINE))
        assert "SortMergeJoin" in plan
        assert shuffles == 0, f"bucketed join must not shuffle:\n{plan}"
        # and it still returns the right rows
        expected = lineitem.join(
            orders, F.col("l_orderkey") == F.col("o_orderkey")
        ).count()
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bt_lineitem")
        spark.sql("DROP TABLE IF EXISTS bt_orders")


# ---------------------------------------------------------- partition pruning


def test_partitioned_write_prunes_on_read(spark, tmp_path_factory):
    import contextlib
    import io

    root = str(tmp_path_factory.mktemp("parts") / "events_by_type")
    events = load_table(spark, SF, "events")
    events.write.partitionBy("event_type").parquet(root)

    df = spark.read.parquet(root).filter(F.col("event_type") == "click")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    # the filter becomes a partition filter at the file index — no
    # data file of another partition is ever opened
    assert "PartitionFilters" in plan
    assert "event_type" in plan.split("PartitionFilters", 1)[1].split("]", 1)[0]
    want = events.filter(F.col("event_type") == "click").count()
    assert df.count() == want


# ------------------------------------------------------------ AQE skew split


def test_aqe_splits_skewed_join_partition(spark):
    # Thresholds lowered so test-sized data triggers the optimization;
    # at cluster scale the defaults (256MB) do the same job. The final
    # adaptive plan must carry the skew=true marker on the join and a
    # skewed AQEShuffleRead — proof the hot key's partition was split.
    prev = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")

        fat = spark.range(200_000).select(
            F.when(F.col("id") % 10 < 9, F.lit(42))
            .otherwise(F.col("id") % 100)
            .alias("k"),
            F.col("id").alias("row_id"),
        )
        slim = spark.range(1_000).select(
            (F.col("id") % 100).alias("k"), F.col("id").alias("sid")
        )
        agg = fat.join(slim, "k").groupBy().count()
        n = agg.collect()[0][0]
        assert n == 2_000_000  # 180k hot x 10 + 20k x 10
        final = (
            agg._jdf.queryExecution()
            .executedPlan()
            .toString()
            .split("== Initial Plan ==")[0]
        )
        assert "skew=true" in final
        assert "skewed" in final  # AQEShuffleRead ... skewed
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
