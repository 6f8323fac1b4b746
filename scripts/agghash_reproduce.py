"""Engine-side 50x agghash reproduction against the BANKED census
hashes (no DuckDB side): re-run the Spark plan at the census fixture
and require (rows, hash[, hash2]) to reproduce AGGHASH_CENSUS_50X.json
bit-for-bit. The cheap scale-tier certification for a rewrite already
proven tree-equal at small SFs.

Usage: python scripts/agghash_reproduce.py SF_DIR name1,name2,...
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from kittispark import registry  # noqa: E402
from kittispark.operators.util import release_pins  # noqa: E402
from kittispark.session import get_spark  # noqa: E402
from tests.oracle_harness import _FS, _canon_spark  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def engine_agghash(df) -> tuple[int, int | None, int | None]:
    fields = {f.name: f.dataType for f in df.schema.fields}
    order = sorted(fields)
    s_row = f" , '{_FS}', ".join(_canon_spark(c, fields[c]) for c in order)
    r = (
        df.select(F.expr(f"md5(concat({s_row}))").alias("__h"))
        .select(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.expr("cast(conv(substr(__h, 1, 15), 16, 10) as bigint)").cast(
                    "decimal(38,0)"
                )
            ).alias("h"),
            F.sum(
                F.expr("cast(conv(substr(__h, 17, 15), 16, 10) as bigint)").cast(
                    "decimal(38,0)"
                )
            ).alias("h2"),
        )
        .collect()[0]
    )
    return int(r.n), None if r.h is None else int(r.h), (
        None if r.h2 is None else int(r.h2)
    )


def main() -> int:
    sf_dir = sys.argv[1]
    names = [n for n in sys.argv[2].split(",") if n]
    banked = {
        r["name"]: r
        for r in json.load(open(os.path.join(REPO, "AGGHASH_CENSUS_50X.json")))[
            "queries"
        ]
    }
    spark = get_spark("agghash-reproduce")
    qs = registry.queries()
    bad = 0
    for name in names:
        b = banked.get(name)
        if b is None or b.get("status") != "match" or b.get("fixture"):
            print(f"SKIP {name}: no plain banked 50x hash", flush=True)
            continue
        n, h, h2 = engine_agghash(qs[name](spark, sf_dir))
        release_pins()
        ok = n == b["rows"] and str(h) == str(b["hash"]) and (
            "hash2" not in b or str(h2) == str(b["hash2"])
        )
        bad += 0 if ok else 1
        print(
            f"{'REPRODUCED' if ok else 'DIVERGED'} {name}: rows={n} hash={h}"
            + ("" if ok else f" banked rows={b['rows']} hash={b['hash']}"),
            flush=True,
        )
    spark.stop()
    print(f"AGGHASH_REPRODUCE_DONE {bad} divergence(s)")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
