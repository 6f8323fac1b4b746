"""Self-resuming aggregate-hash census at an engine-scale fixture.

Runs compare_agghash (tests/oracle_harness.py) for every name in a
list file, appending one JSON line per query to a log. Re-invoking
skips names already logged, so the census can be driven in bounded
time slices (CI step budgets, driver turn budgets) until it prints
CENSUS_DONE. This is the r9 extension of the 50x tier: with the
collect() bound gone, EVERY oracle-backed query can hold a VALUE
verdict at 50x, not just the bounded-output ones (VERDICT r8 #3).

Usage:
    python scripts/agghash_census.py NAMES_FILE LOG_FILE [SF_DIR] [BUDGET_S]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kittispark import registry  # noqa: E402
from kittispark.operators.util import release_pins  # noqa: E402
from kittispark.session import get_spark  # noqa: E402
from tests.oracle_harness import compare_agghash  # noqa: E402


def main() -> int:
    names_file = sys.argv[1]
    log_file = sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/tmp/sf5synth"
    budget = float(sys.argv[4]) if len(sys.argv) > 4 else 450.0

    names = [n for n in open(names_file).read().split() if n]
    done: set[str] = set()
    started: set[str] = set()
    if os.path.exists(log_file):
        for line in open(log_file):
            try:
                row = json.loads(line)
            except Exception:
                continue
            if row.get("status") == "started":
                started.add(row["name"])
            else:
                done.add(row["name"])
    # a name with a started marker but no terminal line was killed by
    # the slice timeout mid-query (in practice: a quadratic oracle at
    # this fixture size) — record the skip so resume never loops on it
    for n in sorted(started - done):
        with open(log_file, "a") as f:
            f.write(json.dumps({"name": n, "status": "timeout_skip"}) + "\n")
        done.add(n)
        print(f"TIMEOUT_SKIP {n} (killed mid-query in a previous slice)", flush=True)
    todo = [n for n in names if n not in done]
    if not todo:
        print("CENSUS_DONE", flush=True)
        return 0

    spark = get_spark(
        "agghash-census", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    specs = registry.all_specs()
    start = time.perf_counter()
    log = open(log_file, "a")
    for name in todo:
        if time.perf_counter() - start > budget:
            print(f"BUDGET_PAUSE {len(done)}/{len(names)}", flush=True)
            return 0
        spec = specs.get(name)
        if spec is None or not spec.oracle:
            row = {"name": name, "status": "no_oracle"}
        else:
            log.write(json.dumps({"name": name, "status": "started"}) + "\n")
            log.flush()
            t0 = time.perf_counter()
            try:
                out = compare_agghash(spec.fn(spark, sf_dir), spec.oracle, sf_dir, name)
                row = {
                    "name": name,
                    "status": "match",
                    "rows": out["rows"],
                    "hash": str(out["hash"]),
                    "wall_s": round(time.perf_counter() - t0, 1),
                }
            except Exception as ex:
                row = {
                    "name": name,
                    "status": "fail",
                    "error": str(ex)[:300],
                    "wall_s": round(time.perf_counter() - t0, 1),
                }
            finally:
                release_pins()
        log.write(json.dumps(row) + "\n")
        log.flush()
        done.add(name)
        print(f"{row['status'].upper()} {name} {row.get('wall_s', '')}", flush=True)
    print("CENSUS_DONE", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
