"""Split driver-side planning cost from execution for the vector
fast path A/B: forces analysis+optimization+physical planning via
queryExecution().executedPlan(), then times the count separately.

Usage: python scripts/vec_plan_cost.py SF_DIR ROUNDS name1,...
"""

from __future__ import annotations

import statistics
import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kittispark import registry  # noqa: E402
from kittispark.operators.util import release_pins  # noqa: E402
from kittispark.session import get_spark  # noqa: E402
from scripts.vec_fastpath_ab import set_variant  # noqa: E402

def main() -> None:
    sf_dir, rounds = sys.argv[1], int(sys.argv[2])
    names = [n for n in sys.argv[3].split(",") if n]
    spark = get_spark("vec-plan-cost")
    qs = registry.queries()
    for name in names:
        qs[name](spark, sf_dir).count()
        release_pins()
    res: dict[tuple, list] = {}
    for _ in range(rounds):
        for which in ("fast", "fold"):
            set_variant(which)
            for name in names:
                t0 = time.perf_counter()
                df = qs[name](spark, sf_dir)
                t1 = time.perf_counter()
                df._jdf.queryExecution().executedPlan()
                t2 = time.perf_counter()
                df.count()
                t3 = time.perf_counter()
                release_pins()
                res.setdefault((name, which), []).append(
                    (t1 - t0, t2 - t1, t3 - t2)
                )
    for (name, which), rows in res.items():
        build = statistics.median(r[0] for r in rows)
        plan = statistics.median(r[1] for r in rows)
        ex = statistics.median(r[2] for r in rows)
        print(
            f"SPLIT {name} {which}: build={build:.3f}s plan={plan:.3f}s exec={ex:.3f}s",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
