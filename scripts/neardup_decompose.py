"""Stage decomposition of near_dup_pipeline_survivors at an engine
tier: times each prefix of the pipeline (each prefix recomputes its
ancestors, so deltas are marginal stage costs).

Usage: KITTISPARK_DRIVER_MEM=48g python scripts/neardup_decompose.py [SF_DIR]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from kittispark.operators.util import release_pins  # noqa: E402
from kittispark.queries._util import t  # noqa: E402
from kittispark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf25synth"
    spark = get_spark(
        "neardup-decompose",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    from kittispark.operators.dedup import shingle_rows
    from kittispark.queries.dedup import minhash_lsh_candidates

    docs = t(spark, sf_dir, "documents")

    def tm(label, df):
        t0 = time.perf_counter()
        n = df.count()
        print(f"STAGE {label}: rows={n} wall={time.perf_counter()-t0:.1f}s",
              flush=True)
        release_pins()

    tm("cands (LSH candidates)", minhash_lsh_candidates(docs))
    ds = shingle_rows(docs).distinct()
    tm("ds (distinct shingles)", ds)
    sizes = ds.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    tm("sizes", sizes)
    cands = minhash_lsh_candidates(docs)
    sh_a = ds.select(F.col("doc_id").alias("doc_a"), "sh")
    sh_b = ds.select(F.col("doc_id").alias("doc_b"), "sh")
    inter = (
        cands.join(sh_a, "doc_a")
        .join(sh_b, ["doc_b", "sh"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    tm("inter (cands + verify join)", inter)
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    jac = F.col("n_inter").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("n_inter")
    )
    verified = (
        inter.join(sa, "doc_a").join(sb, "doc_b")
        .filter(jac >= 0.5).select("doc_a", "doc_b")
    )
    tm("verified", verified)
    from kittispark.queries.dedup import near_dup_pipeline_survivors as full
    tm("FULL pipeline", full(spark, sf_dir))
    spark.stop()


if __name__ == "__main__":
    main()
