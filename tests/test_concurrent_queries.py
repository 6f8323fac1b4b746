"""Concurrent-job safety: Spark supports many jobs on one session
(threaded dashboards, multi-tenant notebooks, the driver's own gate
loop), so registry queries must not corrupt each other through
shared module state (the BPE cache, IVF index memo, shipped-package
set) or nondeterministic plan interactions.

Four queries spanning the risky classes — iterative with a
module-level cache (bpe_learn_merges), iterative with driver-side
round state (farthest_point_coreset), shuffle-heavy banded join
(minhash_lsh_candidates), and a plain agg (q1) — run serially for a
baseline, then all at once from a thread pool; normalized rows must
be identical.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

from kittispark import registry
from tests.oracle_harness import _norm_rows

SF = "/root/testdata/sf0.001"

NAMES = [
    "q1_pricing_summary",
    "minhash_lsh_candidates",
    "bpe_learn_merges",
    "farthest_point_coreset",
]


def test_concurrent_queries_match_serial(spark):
    qs = registry.queries()

    def snap(name: str):
        df = qs[name](spark, SF)
        return _norm_rows(df.columns, [tuple(r) for r in df.collect()])

    serial = {n: snap(n) for n in NAMES}
    # clear the BPE cache so the concurrent pass re-learns (otherwise
    # it would just replay the memoized frame — not a concurrency test)
    from kittispark.queries import corpus_lm

    corpus_lm._BPE_CACHE.clear()
    with ThreadPoolExecutor(max_workers=len(NAMES)) as ex:
        concurrent = dict(zip(NAMES, ex.map(snap, NAMES)))
    for n in NAMES:
        assert serial[n] == concurrent[n], f"concurrent run diverged: {n}"
