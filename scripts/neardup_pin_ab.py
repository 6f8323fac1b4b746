"""Interleaved A/B: near_dup_pipeline_survivors with the distinct
shingle table PINNED (materialize) vs UNPINNED (the r11 form), same
session. The 250x one-shot walls were too variance-swamped to
adjudicate ([115, 438] pinned vs [227, 243] unpinned — shared-JVM GC
state, the r10 finding); this is the clean instrument.

Usage: KITTISPARK_DRIVER_MEM=... python scripts/neardup_pin_ab.py SF_DIR ROUNDS
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from kittispark.operators.util import materialize, release, release_pins  # noqa: E402
from kittispark.queries._util import t  # noqa: E402
from kittispark.session import get_spark  # noqa: E402


def pipeline(spark: SparkSession, sf_dir: str, pinned: bool) -> DataFrame:
    from kittispark.operators.dedup import (
        connected_components,
        minhash_lsh_candidates,
        shingle_rows,
    )

    docs = t(spark, sf_dir, "documents")
    cands = minhash_lsh_candidates(docs)
    ds = shingle_rows(docs).distinct()
    if pinned:
        ds = materialize(ds)
    sizes = ds.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    sh_a = ds.select(F.col("doc_id").alias("doc_a"), "sh")
    sh_b = ds.select(F.col("doc_id").alias("doc_b"), "sh")
    inter = (
        cands.join(sh_a, "doc_a")
        .join(sh_b, ["doc_b", "sh"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    jac = F.col("n_inter").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("n_inter")
    )
    verified = (
        inter.join(sa, "doc_a").join(sb, "doc_b")
        .filter(jac >= 0.5).select("doc_a", "doc_b")
    )
    comps = connected_components(verified, src="doc_a", dst="doc_b")
    if pinned:
        release(ds)
    return (
        docs.select(F.col("doc_id").cast("long").alias("doc_id"))
        .join(comps, F.col("doc_id") == F.col("node"), "left")
        .select(
            "doc_id",
            F.coalesce(F.col("comp"), F.col("doc_id")).alias("cluster_id"),
        )
        .withColumn("survivor", F.col("cluster_id") == F.col("doc_id"))
    )


def main() -> None:
    sf_dir, rounds = sys.argv[1], int(sys.argv[2])
    spark = get_spark(
        "neardup-pin-ab",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    pipeline(spark, sf_dir, True).count()  # warm
    release_pins()
    res: dict[bool, list[float]] = {True: [], False: []}
    for _ in range(rounds):
        for pinned in (True, False):
            t0 = time.perf_counter()
            pipeline(spark, sf_dir, pinned).count()
            res[pinned].append(time.perf_counter() - t0)
            release_pins()
    for pinned, runs in res.items():
        print(
            f"PIN_AB pinned={pinned}: med={statistics.median(runs):.1f}s"
            f" runs={[round(r, 1) for r in runs]}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
