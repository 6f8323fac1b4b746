"""Multi-SF oracle certification sweep.

Runs every oracle-backed registered query against its DuckDB twin at
one or more sf dirs and reports divergences. This is the tool that
surfaced the five scale-revealed divergences documented in
SCALING.md ("Multi-SF correctness sweep") — value-level bugs that
are invisible at the driver's sf0.01 gate and only trigger on
larger data (rounding midpoints, id-range collisions, statistical
gate failures).

Usage:
    python scripts/oracle_sweep.py [sf_dir ...]
    # default: /root/testdata/sf0.1
    # the synthetic sf1 comes from:
    #   python scripts/gen_scale_synth.py /root/testdata/sf0.1 /tmp/sf1synth 10

Exit code 0 iff every oracle matches. Rows-only queries are skipped
(they are covered by their oracle-backed companion gates).
"""

from __future__ import annotations

import sys
import time

from kittispark import registry
from kittispark.session import get_spark
from tests.oracle_harness import compare


def sweep(sf_dirs: list[str]) -> int:
    spark = get_spark(app_name="oracle-sweep")
    specs = registry.all_specs()
    fails: list[tuple[str, str, str]] = []
    for sf in sf_dirs:
        for name, s in specs.items():
            if not s.oracle:
                continue
            t0 = time.perf_counter()
            try:
                compare(s.fn(spark, sf), s.oracle, sf, name)
                print(f"MATCH {name} @{sf} {time.perf_counter() - t0:.1f}s", flush=True)
            except Exception as ex:  # report and continue — a sweep is a census
                fails.append((name, sf, str(ex)[:300]))
                print(f"FAIL {name} @{sf}: {str(ex)[:300]}", flush=True)
    print(f"SWEEP_DONE {len(fails)} failures across {len(sf_dirs)} sf dir(s)")
    for name, sf, msg in fails:
        print(f"  {name} @{sf}: {msg}")
    return 1 if fails else 0


if __name__ == "__main__":
    dirs = sys.argv[1:] or ["/root/testdata/sf0.1"]
    raise SystemExit(sweep(dirs))
