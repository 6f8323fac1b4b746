"""Per-stage wall decomposition of the pq_rerank_topk pipeline.

The 250x engine tier read pq_rerank_topk at 480 s warm — linear in
m*n_codes*n by design, so the question is WHERE the constant lives:
codebook build, encode (the m-fold explode + broadcast join + argmin
agg), the ADC serve scan, or the exact re-rank. Runs each stage
cumulatively at a given fixture and prints per-stage walls, so the
rewrite targets the measured hot stage instead of a guess.

Usage:
    python scripts/pq_stage_decompose.py [SF_DIR] [M] [N_CODES] [SUB_DIM]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kittispark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf5synth"
    m = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    n_codes = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    sub_dim = int(sys.argv[4]) if len(sys.argv) > 4 else 4

    from kittispark.operators.similarity import (
        exact_rerank,
        pq_adc_serve,
        pq_codebooks,
        pq_encode,
    )
    from kittispark.queries._util import t

    spark = get_spark("pq-stage-decompose")
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.orderBy("vec_id").limit(25)

    def timed(label, thunk):
        t0 = time.perf_counter()
        out = thunk()
        print(f"STAGE {label}: {time.perf_counter() - t0:.1f}s", flush=True)
        return out

    cb = pq_codebooks(emb, m, n_codes)
    timed("codebooks", lambda: cb.count())
    codes = pq_encode(emb, cb, m=m, sub_dim=sub_dim)
    timed("encode", lambda: codes.count())
    codes_m = codes.localCheckpoint()
    cb_m = cb.localCheckpoint()
    sl = pq_adc_serve(
        codes_m, cb_m, queries, k=100, m=m, sub_dim=sub_dim
    ).select("query_id", "neighbor_id")
    timed("adc_serve(k=100, codes pinned)", lambda: sl.count())
    sl_m = sl.localCheckpoint()
    rr = exact_rerank(sl_m, emb, queries, k=5)
    timed("exact_rerank(shortlist pinned)", lambda: rr.count())
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
