"""Per-stage wall decomposition of graph_label_propagation.

The 250x engine tier read graph_label_propagation at 173 s warm. The
plan has three cost centers: the (order, part) incidence distinct,
the per-order pair enumeration + (u, v) dedup agg, and the two
min-label rounds over the symmetrized edge list. Min-label is
DUPLICATE-INSENSITIVE (min over a multiset), so the two dedup
shuffles are value-irrelevant for THIS query — this script measures
whether they are also the cost, before any rewrite.

Usage:
    python scripts/glp_stage_decompose.py [SF_DIR]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from kittispark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf25synth"
    from kittispark.queries._util import t
    from kittispark.queries.graph import _edges, label_propagation

    spark = get_spark("glp-stage-decompose")

    def timed(label, thunk):
        t0 = time.perf_counter()
        out = thunk()
        print(f"STAGE {label}: {time.perf_counter() - t0:.1f}s", flush=True)
        return out

    lp = (
        t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    timed("incidence distinct", lambda: lp.count())
    edges = _edges(spark, sf_dir).select("u", "v")
    timed("edge build (distinct + pairs + dedup agg)", lambda: edges.count())
    edges_m = edges.localCheckpoint()
    labels = label_propagation(edges_m, rounds=2)
    out = (
        labels.groupBy(F.col("lbl").cast("bigint").alias("community"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("size"))
        .orderBy(F.col("size").desc(), "community")
        .limit(20)
    )
    timed("2 rounds + community agg (edges pinned)", lambda: out.count())

    # duplicate-insensitive variant: raw incidence (no distinct), raw
    # pairs (no dedup agg) — min-label over the multiset is
    # value-identical
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    raw_pairs = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")),
    ).select(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
    labels2 = label_propagation(raw_pairs, rounds=2)
    out2 = (
        labels2.groupBy(F.col("lbl").cast("bigint").alias("community"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("size"))
        .orderBy(F.col("size").desc(), "community")
        .limit(20)
    )
    timed("VARIANT raw-pairs end-to-end (no dedup shuffles)",
          lambda: out2.count())
    same = (
        out.exceptAll(out2).count() == 0 and out2.exceptAll(out).count() == 0
    )
    print(f"VARIANT value-identical: {same}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
