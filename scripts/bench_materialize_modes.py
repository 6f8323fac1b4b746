"""Price the cluster-safe materialization mode under the bench clock
(VERDICT r7 #6).

The three-mode policy (operators/util.py) is value-certified in all
modes (tests/test_materialize_modes.py + oracle runs), but only the
local_checkpoint default was ever BENCHED. This script times the
heaviest iterative compositions — the queries whose per-round
frontier pinning is exactly what the mode changes — under
local_checkpoint and persist_disk on the same session config, and
prints the per-query ratio. Expectation: < 2x (persist_disk adds a
DISK_ONLY write + an extra count() action per round; with release()
now dropping dead rounds, the working set stays one frontier).

Usage:
    python scripts/bench_materialize_modes.py [sf_dir] [iters]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kittispark import get_spark  # noqa: E402
from kittispark import registry as reg  # noqa: E402
from kittispark.operators.util import release_pins  # noqa: E402

# The iterative heavy tail: every query here drives materialize() in
# a loop (connected components, PageRank, BPE, k-means, k-center) or
# through a shared-frontier composition.
ITERATIVE = [
    "graph_label_propagation",
    "pagerank_nation_flow",
    "near_dup_pipeline_survivors",  # LSH -> verify -> CC -> survivors
    "bpe_learn_merges",
    "kmeans_two_iterations",
    "farthest_point_coreset",
]


def _reset_bpe() -> None:
    from kittispark.queries import corpus_lm

    corpus_lm._BPE_CACHE.clear()


def time_mode(spark, qs, sf_dir: str, mode: str, iters: int):
    spark.conf.set("kittispark.materialize.mode", mode)
    out = {}
    for name in ITERATIVE:
        fn = qs[name]
        _reset_bpe()
        fn(spark, sf_dir).count()  # untimed pre-run (plan compile)
        release_pins()  # drain one-shot persist_disk pins (ADVICE r8)
        runs = []
        for _ in range(iters):
            _reset_bpe()
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            runs.append(time.perf_counter() - t0)
            release_pins()
        out[name] = round(statistics.median(runs), 3)
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(
        "kittispark-matbench",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    qs = reg.queries()
    base = time_mode(spark, qs, sf_dir, "local_checkpoint", iters)
    disk = time_mode(spark, qs, sf_dir, "persist_disk", iters)
    spark.conf.unset("kittispark.materialize.mode")
    spark.stop()
    report = {
        name: {
            "local_checkpoint_s": base[name],
            "persist_disk_s": disk[name],
            "ratio": round(disk[name] / base[name], 2) if base[name] else None,
        }
        for name in ITERATIVE
    }
    print(json.dumps({"sf_dir": sf_dir, "iters": iters, "modes": report},
                     indent=1))


if __name__ == "__main__":
    main()
