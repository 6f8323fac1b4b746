"""q21 250x A/B (VERDICT r10 #7): window form vs alternatives.

The r10 250x audit kept the collect_set-window form (50-90 s) after
the aggregate-then-semi-join prototype lost (104/63 s). Item 7 asks
for one more lever. Two candidates measured here against the
registered form:

  B. salted window: the verdict's literal suggestion — split each
     order's lines over a salt, partial collect_sets per
     (order, salt), then a second set-union window per order. NOTE
     l_orderkey is NOT skewed (<= 17 lines/order), so this attacks
     sort volume only via the smaller second pass.
  C. count-distinct agg + rejoin on the PINNED joined fact: n_supp =
     count(distinct supp) and n_late = count(distinct late supp) per
     order are plain partial-aggregatable aggs (no sort, no
     collect_set state); the fact is localCheckpointed once so the
     agg and the detail rejoin cannot replay the join (the failure
     mode that sank the r9 two-pass form).

All three must return identical rows (checked via exceptAll both
ways at the run SF).

Usage:
    KITTISPARK_DRIVER_MEM=48g python scripts/q21_ab.py [SF_DIR] [ITERS]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from kittispark.session import get_spark  # noqa: E402


def _joined(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kittispark.queries._util import t

    orders = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    is_late = (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    return li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).select(
        "l_orderkey", "l_suppkey", is_late.alias("__late")
    )


def _finish(spark: SparkSession, sf_dir: str, flagged: DataFrame) -> DataFrame:
    from kittispark.queries._util import t

    supp = t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        flagged.filter(
            (F.col("__n_supp") > 1)
            & (F.col("__n_late") == 1)
            & F.col("__late")
        )
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


def variant_a_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kittispark.queries.tpch_suite import q21_waiting_suppliers

    return q21_waiting_suppliers(spark, sf_dir)


def variant_b_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    j = _joined(spark, sf_dir).withColumn(
        "__salt", F.pmod(F.col("l_suppkey"), F.lit(8))
    )
    w1 = Window.partitionBy("l_orderkey", "__salt")
    partial = j.select(
        "l_orderkey",
        "l_suppkey",
        "__late",
        F.collect_set("l_suppkey").over(w1).alias("__ps"),
        F.collect_set(
            F.when(F.col("__late"), F.col("l_suppkey"))
        ).over(w1).alias("__pl"),
    )
    w2 = Window.partitionBy("l_orderkey")
    flagged = partial.select(
        "l_suppkey",
        "__late",
        F.size(
            F.array_distinct(F.flatten(F.collect_set("__ps").over(w2)))
        ).alias("__n_supp"),
        F.size(
            F.array_distinct(F.flatten(F.collect_set("__pl").over(w2)))
        ).alias("__n_late"),
    )
    return _finish(spark, sf_dir, flagged)


def variant_c_agg_rejoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    j = _joined(spark, sf_dir).localCheckpoint()
    per_order = j.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("__n_supp"),
        F.countDistinct(
            F.when(F.col("__late"), F.col("l_suppkey"))
        ).alias("__n_late"),
    )
    flagged = j.join(per_order, "l_orderkey")
    return _finish(spark, sf_dir, flagged)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf25synth"
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(
        "q21-ab", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    variants = {
        "A_window(current)": variant_a_window,
        "B_salted_window": variant_b_salted,
        "C_agg_rejoin_pinned": variant_c_agg_rejoin,
    }
    ref = variant_a_window(spark, sf_dir).localCheckpoint()
    for label, fn in variants.items():
        walls = []
        for _ in range(iters):
            t0 = time.perf_counter()
            n = fn(spark, sf_dir).count()
            walls.append(time.perf_counter() - t0)
        if label != "A_window(current)":
            out = fn(spark, sf_dir)
            same = (
                out.exceptAll(ref).count() == 0
                and ref.exceptAll(out).count() == 0
            )
        else:
            same = True
        print(
            f"Q21_AB {label}: rows={n} median={statistics.median(walls):.1f}s"
            f" walls={[round(w, 1) for w in walls]} identical={same}",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
