"""Standalone per-query wall timing: median of N iterations in one
session, bench.py methodology (untimed pre-run, release_pins between
runs), but for an arbitrary query list at an arbitrary SF dir — the
optimization-round A/B instrument.

Usage:
    python scripts/time_queries.py SF_DIR ITERS name1,name2,...
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kittispark import registry  # noqa: E402
from kittispark.operators.util import release_pins  # noqa: E402
from kittispark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1]
    iters = int(sys.argv[2])
    names = [n for n in sys.argv[3].split(",") if n]
    spark = get_spark("time-queries")
    qs = registry.queries()
    import bench

    for name in names:
        fn = qs[name]
        reset = bench.RESETS.get(name)
        if reset:
            reset()
        fn(spark, sf_dir).count()
        release_pins()
        runs = []
        for _ in range(iters):
            if reset:
                reset()
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            runs.append(time.perf_counter() - t0)
            release_pins()
        print(
            f"TIME {name}: med={statistics.median(runs):.3f}s "
            f"min={min(runs):.3f}s runs={[round(r, 2) for r in runs]}",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
