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
        [--retry-skips]

A name killed mid-query gets ONE free retry on the next resume before
being converted to timeout_skip (a transient kill should not become a
permanent census exclusion); --retry-skips re-queues names already
recorded as timeout_skip.
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

# Deterministic blocked-slice overrides (VERDICT r10 #3): for a query
# whose FULL oracle is structurally beyond DuckDB at this tier, the
# census audits a deterministic id-slice instead of excluding the name
# outright. The ENGINE side still executes its real full plan at the
# census SF — only its OUTPUT is filtered to the slice — while the
# oracle derives the same slice independently (so the pair set is not
# taken from the engine). A slice verdict is recorded as
# status="match" with a "slice" note, never silently.
#
# cosine_near_dup: the full oracle is an all-pairs cosine audit
# (~5e9 64-dim dot products in DuckDB at 50x — the last r10 census
# exclusion). The slice audits every pair with at least one endpoint
# in S = {vec_id % 97 = 13} (~1/97 of ids, ~2% of pairs): DuckDB
# computes |S| x |corpus| ~ 1e8 dots with precomputed norms — linear
# in the corpus, tractable — and the dot product / norm product are
# argument-order bit-symmetric, so the both-endpoints-in-S duplicates
# dedup exactly via DISTINCT.
CENSUS_SLICES: dict[str, dict] = {
    "cosine_near_dup": {
        "engine_filter": "(id_a % 97 = 13) OR (id_b % 97 = 13)",
        "oracle": """
        WITH s AS (
            SELECT vec_id, embedding::DOUBLE[] AS v,
                   sqrt(list_dot_product(embedding::DOUBLE[],
                                         embedding::DOUBLE[])) AS nrm
            FROM embeddings WHERE vec_id % 97 = 13
        ), allv AS (
            SELECT vec_id, embedding::DOUBLE[] AS v,
                   sqrt(list_dot_product(embedding::DOUBLE[],
                                         embedding::DOUBLE[])) AS nrm
            FROM embeddings
        ), pairs AS (
            SELECT least(a.vec_id, b.vec_id) AS id_a,
                   greatest(a.vec_id, b.vec_id) AS id_b,
                   list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS sim_raw
            FROM s a JOIN allv b ON a.vec_id <> b.vec_id
        )
        SELECT DISTINCT id_a, id_b, round(sim_raw, 4) AS sim
        FROM pairs WHERE sim_raw >= 0.45
        """,
        "note": "slice: pairs with an endpoint in {vec_id % 97 = 13}; "
        "engine runs the FULL block-pair GEMM, output filtered",
    },
}


def main() -> int:
    retry_skips = "--retry-skips" in sys.argv
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    names_file = argv[0]
    log_file = argv[1]
    sf_dir = argv[2] if len(argv) > 2 else "/tmp/sf5synth"
    budget = float(argv[3]) if len(argv) > 3 else 450.0
    names = [n for n in open(names_file).read().split() if n]
    done: set[str] = set()
    start_counts: dict[str, int] = {}
    if os.path.exists(log_file):
        for line in open(log_file):
            try:
                row = json.loads(line)
            except Exception:
                continue
            if row.get("status") == "started":
                start_counts[row["name"]] = start_counts.get(row["name"], 0) + 1
            else:
                done.add(row["name"])
    if retry_skips:
        # re-queue previously recorded timeout_skips (their start
        # counters were consumed when the skip was written)
        requeued = set()
        for line in open(log_file) if os.path.exists(log_file) else []:
            try:
                row = json.loads(line)
            except Exception:
                continue
            if row.get("status") == "timeout_skip":
                requeued.add(row["name"])
        done -= requeued
        for n in requeued:
            start_counts.pop(n, None)
        if requeued:
            print(f"RETRY_SKIPS re-queued {len(requeued)} names", flush=True)
    # A name with started markers but no terminal line was killed
    # mid-query in a previous slice. One kill can be transient (box
    # OOM, Ctrl-C, unrelated crash) — only convert to timeout_skip
    # after 2 started-without-terminal occurrences, so every name
    # gets one free retry before becoming a census exclusion.
    for n in sorted(set(start_counts) - done):
        if start_counts[n] >= 2:
            with open(log_file, "a") as f:
                f.write(json.dumps({"name": n, "status": "timeout_skip"}) + "\n")
            done.add(n)
            print(
                f"TIMEOUT_SKIP {n} (killed mid-query in {start_counts[n]} "
                "previous slices)",
                flush=True,
            )
        else:
            print(f"RETRY {n} (1 prior kill; retrying once)", flush=True)
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
                sl = CENSUS_SLICES.get(name)
                df = spec.fn(spark, sf_dir)
                oracle = spec.oracle
                if sl is not None:
                    df = df.filter(sl["engine_filter"])
                    oracle = sl["oracle"]
                out = compare_agghash(df, oracle, sf_dir, name)
                row = {
                    "name": name,
                    "status": "match",
                    "rows": out["rows"],
                    "hash": str(out["hash"]),
                    "hash2": str(out["hash2"]),
                    "wall_s": round(time.perf_counter() - t0, 1),
                }
                if sl is not None:
                    row["slice"] = sl["note"]
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
