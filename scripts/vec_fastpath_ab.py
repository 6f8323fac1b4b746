"""A/B the r11 guarded static-chain vector fast path against the
pure HOF-fold form, interleaved in one session (r12 item: the quiet
32c bench of the final tree reads the vector family 2-6x over r10's
numbers while untouched TPC-H rows reproduce r10 exactly — decide
whether that is host regime or a real fast-path regression).

The fold form is restored by monkeypatching every module-level
binding of dot/norm/fold_d2 (queries from-import them, so the
operator module AND the query modules are patched). Queries are
DataFrame factories — each timed run rebuilds the plan, so the patch
takes effect per iteration.

Usage:
    python scripts/vec_fastpath_ab.py SF_DIR ROUNDS name1,name2,...
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import kittispark.operators.similarity as sim  # noqa: E402
from kittispark import registry  # noqa: E402
from kittispark.operators.util import release_pins  # noqa: E402
from kittispark.session import get_spark  # noqa: E402

FAST = {"dot": sim.dot, "norm": sim.norm, "fold_d2": sim.fold_d2}


def _fold_dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _fold_norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def _fold_d2(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


FOLD = {"dot": _fold_dot, "norm": _fold_norm, "fold_d2": _fold_d2}


def set_variant(which: str) -> None:
    repl = FAST if which == "fast" else FOLD
    for mod_name, mod in list(sys.modules.items()):
        if not mod_name.startswith("kittispark") or mod is None:
            continue
        for attr in ("dot", "norm", "fold_d2"):
            cur = getattr(mod, attr, None)
            if cur is not None and (cur in FAST.values() or cur in FOLD.values()):
                setattr(mod, attr, repl[attr])


def main() -> None:
    sf_dir = sys.argv[1]
    rounds = int(sys.argv[2])
    names = [n for n in sys.argv[3].split(",") if n]
    spark = get_spark("vec-fastpath-ab")
    qs = registry.queries()

    for name in names:
        qs[name](spark, sf_dir).count()  # warm (fast variant)
        release_pins()
    results: dict[tuple[str, str], list[float]] = {}
    for r in range(rounds):
        for which in ("fast", "fold"):
            set_variant(which)
            for name in names:
                t0 = time.perf_counter()
                qs[name](spark, sf_dir).count()
                dt = time.perf_counter() - t0
                release_pins()
                results.setdefault((name, which), []).append(dt)
    set_variant("fast")
    for name in names:
        fa = results[(name, "fast")]
        fo = results[(name, "fold")]
        print(
            f"AB {name}: fast med={statistics.median(fa):.3f}s {sorted(round(x,2) for x in fa)}"
            f" | fold med={statistics.median(fo):.3f}s {sorted(round(x,2) for x in fo)}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
