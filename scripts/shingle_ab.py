"""A/B + value-identity check for the shingle_rows rewrite
(window-lead form vs zero-shuffle double-Generate form).

Proves the (doc_id, sh) MULTISET is identical at the given sf dirs
(exceptAll both ways on a count-grouped form, so duplicate
multiplicity is compared too), for n in {2, 3, 5} — the widths the
repo uses (curation bigrams, default 3-gram, llm_pipeline 5-gram) —
then times minhash_lsh_candidates end-to-end under both forms.

Usage: python scripts/shingle_ab.py [sf_dir ...]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from kittispark.operators.text import tokens_col
from kittispark.session import get_spark


def shingle_rows_window(df, text_col="text", id_col="doc_id", n=3):
    """The r2-r10 form, verbatim (posexplode -> window lead)."""
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


def grouped(df: DataFrame) -> DataFrame:
    return df.groupBy("doc_id", "sh").agg(F.count(F.lit(1)).alias("m"))


def noop(df: DataFrame) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    from kittispark.operators.dedup import minhash_lsh_candidates, shingle_rows
    from kittispark.queries._util import t

    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
    spark = get_spark(app_name="shingle-ab")
    rc = 0
    for sf in sf_dirs:
        docs = t(spark, sf, "documents")
        for n in (2, 3, 5):
            a = grouped(shingle_rows_window(docs, n=n))
            b = grouped(shingle_rows(docs, n=n))
            d1 = a.exceptAll(b).count()
            d2 = b.exceptAll(a).count()
            ok = d1 == 0 and d2 == 0
            rc |= 0 if ok else 1
            print(f"IDENTITY sf={sf} n={n}: "
                  f"{'MATCH' if ok else f'DIVERGE a-b={d1} b-a={d2}'}",
                  flush=True)
    # timing A/B on the last sf dir: candidates end-to-end
    sf = sf_dirs[-1]
    docs = t(spark, sf, "documents")
    for label, fn in (("window", shingle_rows_window), ("generate", None)):
        walls = []
        for _ in range(5):
            t0 = time.monotonic()
            if fn is None:
                noop(minhash_lsh_candidates(docs))
            else:
                # inline the candidate pipeline over the window form
                import kittispark.operators.dedup as D

                orig = D.shingle_rows
                D.shingle_rows = fn  # type: ignore[assignment]
                try:
                    noop(minhash_lsh_candidates(docs))
                finally:
                    D.shingle_rows = orig
            walls.append(time.monotonic() - t0)
        print(f"TIMING minhash_lsh_candidates[{label}] sf={sf}: "
              f"med={statistics.median(walls):.2f}s walls="
              f"{[round(x, 2) for x in walls]}", flush=True)
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
