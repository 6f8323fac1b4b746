"""A/B/C comparison for graph_label_propagation round shapes.

A: current registered form (distinct incidence + dedup agg edges,
   per-round join+agg+left-join).
B: raw pairs (no incidence distinct, no (u,v) dedup agg) feeding the
   current per-round shape — min-label is duplicate-insensitive.
C: raw pairs + self-loop rounds: sym carries (node, node) rows, so
   each round is ONE join + ONE min agg (the self-loop delivers the
   node's own label; no keep-own left join / least / coalesce).

Each variant's full query output (top-20 communities) is checked
value-identical to A via exceptAll both ways. Interleaved timing —
ITER alternating passes — so box drift hits all arms equally.

Usage: python scripts/glp_ab.py [SF_DIR] [ITERS]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from kittispark.operators.util import materialize  # noqa: E402
from kittispark.queries._util import t  # noqa: E402
from kittispark.session import get_spark  # noqa: E402


def out_shape(labels):
    return (
        labels.groupBy(F.col("lbl").cast("bigint").alias("community"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("size"))
        .orderBy(F.col("size").desc(), "community")
        .limit(20)
    )


def variant_a(spark, sf_dir):
    from kittispark.queries.graph import _edges, label_propagation

    return out_shape(label_propagation(_edges(spark, sf_dir).select("u", "v"), 2))


def _raw_pairs(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    return a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")),
    ).select(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))


def variant_b(spark, sf_dir):
    from kittispark.queries.graph import label_propagation

    return out_shape(label_propagation(_raw_pairs(spark, sf_dir), 2))


def variant_c(spark, sf_dir, rounds=2):
    # raw pairs + union-self round shape (the connected_components
    # round): msgs = sym join labels-on-y, then labels UNION msgs ->
    # one min agg. No per-round keep-own left join.
    edges = _raw_pairs(spark, sf_dir)
    sym = materialize(
        edges.select(F.col("u").alias("x"), F.col("v").alias("y")).unionAll(
            edges.select(F.col("v").alias("x"), F.col("u").alias("y"))
        )
    )
    labels = sym.select(F.col("x").alias("node")).distinct().select(
        "node", F.col("node").alias("lbl")
    )
    for _ in range(rounds):
        msgs = sym.join(
            labels.select(F.col("node").alias("y"), F.col("lbl")), "y"
        ).select(F.col("x").alias("node"), "lbl")
        labels = (
            labels.unionByName(msgs)
            .groupBy("node")
            .agg(F.min("lbl").alias("lbl"))
        )
    return out_shape(labels)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark("glp-ab")
    variants = {"A_current": variant_a, "B_rawpairs": variant_b, "C_selfloop": variant_c}

    ref = variant_a(spark, sf_dir)
    for name, fn in list(variants.items())[1:]:
        out = fn(spark, sf_dir)
        same = ref.exceptAll(out).count() == 0 and out.exceptAll(ref).count() == 0
        print(f"IDENTICAL {name}: {same}", flush=True)
        if not same:
            return 1

    walls: dict[str, list[float]] = {k: [] for k in variants}
    for fn in variants.values():  # untimed warm pass
        fn(spark, sf_dir).count()
    for _ in range(iters):
        for name, fn in variants.items():
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            walls[name].append(time.perf_counter() - t0)
    for name, runs in walls.items():
        runs = sorted(runs)
        med = runs[len(runs) // 2]
        print(
            f"WALL {name}: med={med:.2f}s runs={[round(r, 2) for r in runs]}",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
