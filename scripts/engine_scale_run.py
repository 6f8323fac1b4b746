"""Standalone per-query engine runs at an engine-scale fixture.

The 250x tier's suite-order totals swing 360-530 s from shared-JVM GC
state (SCALING.md r10), so the judged metric is STANDALONE per-query
cost: each named query runs in its OWN subprocess (fresh JVM, fresh
page-cache-warm second iteration), eliminating cross-query heap
history. Prints one JSON line per query and appends to a log so a
killed run resumes.

Usage:
    KITTISPARK_DRIVER_MEM=48g python scripts/engine_scale_run.py \
        NAMES_FILE LOG_FILE [SF_DIR] [ITERS]

Per query the subprocess reports: cold wall (first .count(), includes
plan compile + fixture build), warm wall (median of ITERS-1 further
counts — steady state), and the output row count.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

_CHILD = r"""
import json, statistics, sys, time
sys.path.insert(0, {repo!r})
from kittispark import registry
from kittispark.operators.util import release_pins
from kittispark.session import get_spark

name, sf_dir, iters = {name!r}, {sf_dir!r}, {iters}
spark = get_spark("engine-scale-" + name,
                  extra_conf={{"spark.ui.showConsoleProgress": "false"}})
spec = registry.all_specs()[name]
t0 = time.perf_counter()
rows = spec.fn(spark, sf_dir).count()
cold = time.perf_counter() - t0
release_pins()
warms = []
for _ in range(max(0, iters - 1)):
    t0 = time.perf_counter()
    spec.fn(spark, sf_dir).count()
    warms.append(time.perf_counter() - t0)
    release_pins()
out = {{"name": name, "rows": rows, "cold_s": round(cold, 1),
        "warm_s": round(statistics.median(warms), 1) if warms else None}}
print("ENGINE_SCALE_RESULT " + json.dumps(out), flush=True)
"""


def main() -> int:
    names_file, log_file = sys.argv[1], sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/tmp/sf25synth"
    iters = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    names = [n for n in open(names_file).read().split() if n]
    done = set()
    if os.path.exists(log_file):
        for line in open(log_file):
            try:
                done.add(json.loads(line)["name"])
            except Exception:
                continue
    for name in names:
        if name in done:
            continue
        child = _CHILD.format(repo=repo, name=name, sf_dir=sf_dir, iters=iters)
        print(f"RUN {name}", flush=True)
        proc = subprocess.run(
            [sys.executable, "-c", child], capture_output=True, text=True,
            env=os.environ,
        )
        row = None
        for line in proc.stdout.splitlines():
            if line.startswith("ENGINE_SCALE_RESULT "):
                row = json.loads(line[len("ENGINE_SCALE_RESULT "):])
        if row is None:
            text = proc.stderr or proc.stdout or ""
            # surface the ROOT exception lines, not the retry tail
            causes = [
                ln for ln in text.splitlines()
                if "Error" in ln or "Exception" in ln or "Caused by" in ln
            ]
            row = {
                "name": name,
                "status": "fail",
                "rc": proc.returncode,
                "causes": causes[:8],
                "err": text[-1500:],
            }
        with open(log_file, "a") as f:
            f.write(json.dumps(row) + "\n")
        print(json.dumps(row), flush=True)
    print("ENGINE_SCALE_DONE", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
