"""Float-identity policy gate (VERDICT r7 #4).

The driver's correctness hash compares exact double bits between the
Spark query and the DuckDB oracle. Bits agree across engines only
when every output double is (a) integral, (b) on a decimal grid —
rounded on emission or short-decimal-exact arithmetic — or (c) raw
but derived exclusively from IEEE-pinned operations (+-*/, min/max
selection, sqrt) on identical inputs. The one structurally unsafe
class is RAW + LIBM: unrounded transcendental output, because JVM
Math and C libm are each allowed ulp-level error and genuinely
diverge on some arguments (the r7 wireframe red was the signed-zero
cousin of this class).

scripts/float_identity_audit.py classifies every oracle-backed
query; this test pins the audit result so a new query can't slip an
unrounded transcendental past the local gate. The known-raw
allowlist documents WHY each raw column is nevertheless
deterministic; additions must justify themselves here.
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

from functools import lru_cache

from scripts.float_identity_audit import audit as _audit  # noqa: E402

SF = "/root/testdata/sf0.001"


@lru_cache(maxsize=1)
def audit(sf):
    return _audit(sf)

# raw-mantissa output columns proven IEEE-deterministic by
# construction (no libm, no reduction-order sensitivity):
#   stream_stream_interval_join.gap_s   — single subtraction/division
#       of two identical timestamps; one IEEE op, no reduction.
#   snapshot_diff.new_price             — parquet double pass-through
#       (selection only, no arithmetic).
#   embedding_quantize_int8.vmin/vmax   — min/max SELECTION over raw
#       embedding doubles; comparison picks an existing bit pattern,
#       never synthesizes one.
KNOWN_RAW_OK = {
    "stream_stream_interval_join": {"gap_s"},
    "snapshot_diff": {"new_price"},
    "embedding_quantize_int8": {"vmin", "vmax"},
}


def test_no_unrounded_libm_reaches_the_hash():
    rows = audit(SF)
    errors = [r for r in rows if "error" in r]
    assert not errors, f"audit errors: {errors[:3]}"
    red = [r for r in rows if r.get("risk") == "RED"]
    assert not red, (
        "queries ship unrounded libm-derived doubles (round on "
        f"emission on BOTH sides): {[r['query'] for r in red]}"
    )


def test_raw_columns_are_in_the_justified_allowlist():
    rows = audit(SF)
    for r in rows:
        if r.get("class") != "raw":
            continue
        raw_cols = {c for c, k in r["float_cols"].items() if k == "raw"}
        allowed = KNOWN_RAW_OK.get(r["query"], set())
        assert raw_cols <= allowed, (
            f"{r['query']}: raw double columns {sorted(raw_cols - allowed)} "
            "are not in the justified allowlist — either round on "
            "emission (both sides) or document why the bits are "
            "IEEE-deterministic in KNOWN_RAW_OK"
        )
