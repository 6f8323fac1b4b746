"""Interleaved timing A/B for shingle_rows forms (window vs current)
on minhash_signature and minhash_lsh_candidates, fresh session, noop
sink, alternating W/G each round so host drift cancels.

Usage: python scripts/shingle_time.py [rounds] [sf_dir]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from kittispark.operators.text import tokens_col
from kittispark.session import get_spark


def shingle_rows_window(df, text_col="text", id_col="doc_id", n=3):
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens_col(text_col)).alias("pos", "tok"),
    )
    w = W.partitionBy("doc_id").orderBy("pos")
    parts = [F.col("tok")] + [F.lead("tok", i).over(w) for i in range(1, n)]
    return (
        toks.select("doc_id", *[p.alias(f"__t{i}") for i, p in enumerate(parts)])
        .filter(F.col(f"__t{n-1}").isNotNull())
        .select(
            "doc_id",
            F.concat_ws(" ", *[F.col(f"__t{i}") for i in range(n)]).alias("sh"),
        )
    )


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    import kittispark.operators.dedup as D
    from kittispark.queries._util import t

    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="shingle-time")
    docs = t(spark, sf, "documents")
    current = D.shingle_rows

    def with_form(fn, builder):
        D.shingle_rows = fn
        try:
            return builder()
        finally:
            D.shingle_rows = current

    targets = {
        "signature": lambda: D.minhash_signature(docs),
        "candidates": lambda: D.minhash_lsh_candidates(docs),
    }
    # warmup both forms once
    for fn in (shingle_rows_window, current):
        noop(with_form(fn, targets["candidates"]))

    for tname, builder in targets.items():
        walls = {"window": [], "generate": []}
        for _ in range(rounds):
            for label, fn in (("window", shingle_rows_window), ("generate", current)):
                spark.sparkContext.setJobDescription(f"{tname}:{label}")
                df = with_form(fn, builder)
                t0 = time.monotonic()
                noop(df)
                walls[label].append(time.monotonic() - t0)
        for label in ("window", "generate"):
            ws = walls[label]
            print(
                f"TIMING {tname}[{label}]: med={statistics.median(ws):.3f}s "
                f"min={min(ws):.3f} walls={[round(x, 2) for x in ws]}",
                flush=True,
            )


if __name__ == "__main__":
    main()
