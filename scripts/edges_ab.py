"""A/B for the co-occurrence edge build shared by the graph family.

A: current — distinct (orderkey, partkey) incidence, self-join on
   orderkey with partkey<partkey, groupBy(u, v) weight agg.
   3 data-sized shuffles (distinct, join exchange, weight agg).
D: collect_set — ONE shuffle: groupBy(orderkey).agg(sort_array(
   collect_set(partkey))), per-order pair enumeration as a codegen
   array comprehension (flatten/transform), then the same (u, v)
   weight agg. 2 data-sized shuffles, and the first carries the
   deduped per-order sets (partial-aggregated map-side).

Checks (u, v, w) sets identical via exceptAll both ways, then times
interleaved end-to-end graph_label_propagation for both shapes.

Usage: python scripts/edges_ab.py [SF_DIR] [ITERS]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from kittispark.queries._util import t  # noqa: E402
from kittispark.session import get_spark  # noqa: E402


def edges_a(spark, sf_dir):
    from kittispark.queries.graph import _edges

    return _edges(spark, sf_dir)


def edges_d(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    sets = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("ps")
    )
    # per-order (u, v) pairs with u < v: for element i, pair with every
    # later element — pure codegen array ops, fan-out bounded by the
    # order's line count
    pairs = sets.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("ps"),
                    lambda x, i: F.transform(
                        F.slice(
                            F.col("ps"), i + 2, F.size(F.col("ps")) - i - 1
                        ),
                        lambda y: F.struct(x.alias("u"), y.alias("v")),
                    ),
                )
            )
        ).alias("p")
    ).select(F.col("p.u").alias("u"), F.col("p.v").alias("v"))
    return pairs.groupBy("u", "v").agg(
        F.count(F.lit(1)).cast("bigint").alias("w")
    )


def glp_shape(labels):
    return (
        labels.groupBy(F.col("lbl").cast("bigint").alias("community"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("size"))
        .orderBy(F.col("size").desc(), "community")
        .limit(20)
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark("edges-ab")

    ea = edges_a(spark, sf_dir)
    ed = edges_d(spark, sf_dir)
    same = ea.exceptAll(ed).count() == 0 and ed.exceptAll(ea).count() == 0
    print(f"IDENTICAL edges: {same}", flush=True)
    if not same:
        return 1

    from kittispark.queries.graph import label_propagation

    def run_a():
        glp_shape(label_propagation(edges_a(spark, sf_dir).select("u", "v"), 2)).count()

    def run_d():
        glp_shape(label_propagation(edges_d(spark, sf_dir).select("u", "v"), 2)).count()

    # edge-build-only timings as well (count() on the weighted edges)
    def eb_a():
        edges_a(spark, sf_dir).count()

    def eb_d():
        edges_d(spark, sf_dir).count()

    arms = {"A_glp": run_a, "D_glp": run_d, "A_edges": eb_a, "D_edges": eb_d}
    for fn in arms.values():
        fn()  # warm
    walls = {k: [] for k in arms}
    for _ in range(iters):
        for name, fn in arms.items():
            t0 = time.perf_counter()
            fn()
            walls[name].append(time.perf_counter() - t0)
    for name, runs in walls.items():
        runs = sorted(runs)
        print(
            f"WALL {name}: med={runs[len(runs) // 2]:.2f}s "
            f"runs={[round(r, 2) for r in runs]}",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
