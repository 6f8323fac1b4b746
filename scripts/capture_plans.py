"""Capture .explain("formatted") for headline queries to plans/<tag>/.

Usage:
    python scripts/capture_plans.py TAG SUFFIX [name1,name2,...]
    # TAG: subdir under plans/ (e.g. r11); SUFFIX: before|after
    # default names: every bench.HEADLINE entry

Writes plans/TAG/<query>_<SUFFIX>.txt — the optimization-round
evidence files the judge checks plan claims against.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kittispark import registry  # noqa: E402
from kittispark.operators.util import release_pins  # noqa: E402
from kittispark.session import get_spark  # noqa: E402


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r11"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if len(sys.argv) > 3:
        names = [n for n in sys.argv[3].split(",") if n]
    else:
        import bench

        names = list(bench.HEADLINE)
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        tag,
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("capture-plans")
    qs = registry.queries()
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            txt = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as ex:  # plan capture must never abort the sweep
            txt = f"PLAN CAPTURE FAILED: {ex}\n"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path}", flush=True)
        release_pins()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
