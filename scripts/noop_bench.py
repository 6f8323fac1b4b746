"""One-shot noop-sink timing of every bench.HEADLINE query — the
guide §1.4 cross-check of the bench's count() action. count() lets
the optimizer prune columns and whole subtrees; for queries whose
expensive work lives only in pruned expressions (reassembled text,
md5 digests, collect_list aggs) the bench under-times the real cost.
This instrument quantifies that gap per query; bench.py itself keeps
the count() action so the round-over-round comparison series stays
apples-to-apples (the gap table lives in OPTIMIZATION_r12.md).

Usage: python scripts/noop_bench.py [SF_DIR] [ITERS]
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


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    import bench

    spark = get_spark(
        "noop-bench", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    qs = registry.queries()
    out = {}
    for name in bench.HEADLINE:
        fn = qs[name]
        reset = bench.RESETS.get(name)
        if reset:
            reset()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        release_pins()
        runs = []
        for _ in range(iters):
            if reset:
                reset()
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
            release_pins()
        out[name] = round(statistics.median(runs), 3)
        print(f"NOOP {name}: {out[name]}s", flush=True)
    print("NOOP_TOTAL", round(sum(out.values()), 3))
    spark.stop()


if __name__ == "__main__":
    main()
