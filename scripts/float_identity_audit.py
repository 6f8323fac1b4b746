"""Float-identity audit: classify every oracle-backed query's float
outputs so no query silently relies on bit-identical libm between the
JVM and DuckDB (VERDICT r7 #4).

The driver's correctness gate hashes exact double bits. Two engines
agree on those bits only when every output double is one of:

  integral     — whole numbers (counts, keys, integer-scaled micros):
                 exact in both engines by construction.
  scaled       — value survives round-trip through round(v, 9):
                 the query rounded (or percentage/ratio arithmetic on
                 dyadic inputs) to a decimal grid; both engines round
                 the SAME double, so bits agree IF the pre-round
                 double already agreed (sub-ulp libm drift under the
                 grid spacing is absorbed by the round; the residual
                 risk is a value landing exactly on a rounding
                 midpoint of the grid, which the multi-SF sweeps
                 probe).
  raw          — arbitrary mantissas reach the output unrounded: bits
                 agree only if every arithmetic step is IEEE-identical
                 in both engines. Safe for +-*/ chains on identical
                 inputs (IEEE semantics are deterministic); NOT safe
                 if a libm transcendental feeds the value, or if an
                 aggregation's reduction order differs.

For each query the audit reports the class of every double column
(from the ORACLE's sf0.01 output — same values Spark must produce)
plus whether libm transcendentals (sin/cos/tan/exp/log/pow/sqrt/
atan2...) appear in the Spark source or oracle SQL. The red
combination is raw + libm: transcendental bits flowing to the hash
unrounded. Exit 1 if any query lands there.

Usage:
    python scripts/float_identity_audit.py [sf_dir] [--json out.json]
"""

from __future__ import annotations

import inspect
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kittispark import registry  # noqa: E402
from tests.oracle_harness import run_oracle  # noqa: E402

# transcendentals whose bit-level results are NOT pinned by IEEE 754
# and genuinely differ between JVM Math and C libm on some arguments.
# sqrt is excluded: IEEE 754 requires correctly-rounded sqrt, so both
# engines agree by spec. Word-boundary regex so e.g. "cost" or
# "explode" don't hit.
_LIBM = re.compile(
    r"\b(sin|cos|tan|asin|acos|atan|atan2|sinh|cosh|tanh|exp|expm1|"
    r"log|log2|log10|log1p|ln|pow|power|cbrt)\b",
    re.IGNORECASE,
)


def _libm_hits(spec) -> set[str]:
    hits = set()
    try:
        src = inspect.getsource(spec.fn)
    except (OSError, TypeError):
        src = ""
    for text in (src, spec.oracle or ""):
        for m in _LIBM.finditer(text):
            hits.add(m.group(1).lower())
    return hits


def _classify(values: list[float]) -> str:
    """Most permissive class that covers every value in the column."""
    cls = "integral"
    for v in values:
        if v != v or v in (float("inf"), float("-inf")):
            continue  # NaN/inf normalize via the harness, not bits
        if v == int(v):
            continue
        # survives a 9-decimal round-trip -> the mantissa is already
        # on a decimal grid (the query rounded, or the arithmetic is
        # short-decimal exact)
        if v == round(v, 9):
            cls = max(cls, "scaled", key=("integral", "scaled", "raw").index)
        else:
            return "raw"
    return cls


def audit(sf_dir: str):
    rows = []
    for name, spec in registry.all_specs().items():
        if not spec.oracle:
            continue
        libm = _libm_hits(spec)
        try:
            cols, data = run_oracle(spec.oracle, sf_dir)
        except Exception as e:  # pragma: no cover - surfaced in report
            rows.append({"query": name, "error": str(e)[:200],
                         "libm": sorted(libm)})
            continue
        col_cls: dict[str, str] = {}
        for i, c in enumerate(cols):
            vals = [r[i] for r in data if isinstance(r[i], float)]
            if vals:
                col_cls[c] = _classify(vals)
        worst = "integral"
        order = ("integral", "scaled", "raw")
        for c in col_cls.values():
            worst = max(worst, c, key=order.index)
        rows.append({
            "query": name,
            "float_cols": col_cls,
            "class": worst if col_cls else "no-floats",
            "libm": sorted(libm),
            "risk": "RED" if (worst == "raw" and libm) else "ok",
        })
    return rows


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    rows = audit(sf_dir)
    out = None
    if "--json" in sys.argv:
        out = sys.argv[sys.argv.index("--json") + 1]
    red = [r for r in rows if r.get("risk") == "RED"]
    by_cls: dict[str, int] = {}
    for r in rows:
        by_cls[r.get("class", "error")] = by_cls.get(r.get("class", "error"), 0) + 1
    print(f"audited {len(rows)} oracle-backed queries at {sf_dir}")
    print("class histogram:", json.dumps(by_cls, sort_keys=True))
    for r in rows:
        if r.get("class") == "raw":
            flag = " LIBM->RED" if r["libm"] else ""
            raw_cols = [c for c, k in r["float_cols"].items() if k == "raw"]
            print(f"  raw: {r['query']} cols={raw_cols} libm={r['libm']}{flag}")
        if "error" in r:
            print(f"  ERROR {r['query']}: {r['error']}")
    if out:
        with open(out, "w") as f:
            json.dump(rows, f, indent=1, sort_keys=True)
        print("wrote", out)
    if red:
        print(f"RED: {len(red)} queries ship unrounded libm-derived doubles")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
