"""Multi-SF oracle certification sweep.

Runs every oracle-backed registered query against its DuckDB twin at
one or more sf dirs and reports divergences. This is the tool that
surfaced the five scale-revealed divergences documented in
SCALING.md ("Multi-SF correctness sweep") — value-level bugs that
are invisible at the driver's sf0.01 gate and only trigger on
larger data (rounding midpoints, id-range collisions, statistical
gate failures).

Usage:
    python scripts/oracle_sweep.py [--kitti-scale] [sf_dir ...]
    # default: /root/testdata/sf0.1
    # the synthetic sf1 comes from:
    #   python scripts/gen_scale_synth.py /root/testdata/sf0.1 /tmp/sf1synth 10

--kitti-scale additionally runs the 7 KITTI file-path roundtrips at
10x fixtures (1600 docs / 32 frames — 10x the label lines per file,
10x the .bin bytes, 4x the files) against parameterized oracles, so
the byte-level parsers/writers get the same scale treatment as the
relational oracles (VERDICT r3 #7). Requires an sf dir with >= 1600
documents rows (sf0.1 or larger).

Exit code 0 iff every oracle matches. Rows-only queries are skipped
(they are covered by their oracle-backed companion gates).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kittispark import registry  # noqa: E402
from kittispark.operators.util import release_pins
from kittispark.session import get_spark
from tests.oracle_harness import compare, compare_agghash


def sweep(
    sf_dirs: list[str],
    kitti_scale: bool = False,
    only: set[str] | None = None,
    agghash: bool = False,
) -> int:
    """agghash=True swaps the collect()-bound strict compare for the
    engine-side aggregate-hash adjudication (compare_agghash): both
    engines reduce to ONE (count, 60-bit-hash-sum) row, so per-row-
    output queries get VALUE verdicts at engine scale (50x tier) where
    the row-collect harness would dominate wall (VERDICT r8 #3)."""
    spark = get_spark(app_name="oracle-sweep")
    specs = registry.all_specs()
    cmp_fn = compare_agghash if agghash else compare
    tag_mode = "AGGHASH " if agghash else ""
    if only:
        missing = only - set(specs)
        if missing:
            raise SystemExit(f"--only names not registered: {sorted(missing)}")
    fails: list[tuple[str, str, str]] = []
    for sf in sf_dirs:
        for name, s in specs.items():
            if not s.oracle:
                continue
            if only and name not in only:
                continue
            t0 = time.perf_counter()
            try:
                out = cmp_fn(s.fn(spark, sf), s.oracle, sf, name)
                extra = f" {out}" if agghash else ""
                print(
                    f"{tag_mode}MATCH {name} @{sf} "
                    f"{time.perf_counter() - t0:.1f}s{extra}",
                    flush=True,
                )
            except Exception as ex:  # report and continue — a sweep is a census
                fails.append((name, sf, str(ex)[:300]))
                print(f"FAIL {name} @{sf}: {str(ex)[:300]}", flush=True)
            finally:
                release_pins()  # drain one-shot persist_disk pins (ADVICE r8)
        if kitti_scale:
            from kittispark.queries.kitti_files import KITTI_SCALE_CHECKS

            n_docs, n_frames = 1600, 32
            for name, (df_fn, sql_fn) in KITTI_SCALE_CHECKS.items():
                tag = f"{name}@{n_docs}x{n_frames}"
                t0 = time.perf_counter()
                try:
                    compare(
                        df_fn(spark, sf, n_docs, n_frames),
                        sql_fn(n_docs, n_frames),
                        sf,
                        tag,
                    )
                    print(
                        f"MATCH {tag} @{sf} {time.perf_counter() - t0:.1f}s",
                        flush=True,
                    )
                except Exception as ex:
                    fails.append((tag, sf, str(ex)[:300]))
                    print(f"FAIL {tag} @{sf}: {str(ex)[:300]}", flush=True)
    print(f"SWEEP_DONE {len(fails)} failures across {len(sf_dirs)} sf dir(s)")
    for name, sf, msg in fails:
        print(f"  {name} @{sf}: {msg}")
    return 1 if fails else 0


def materialize_fixture(kind: str, base: str = "/root/testdata/sf0.01") -> str:
    """Regenerate one of the round-5 depth fixtures on demand and
    return its directory, so the whole depth suite reproduces with
    `python scripts/oracle_sweep.py --fixture adversarial` etc.

    kinds: adversarial (NULLs/skew/ties/zero-norm/unicode zoo, from
    gen_adversarial), empty (every table, exact schema, zero rows),
    dup (every document 5x: 3 exact clones + 1 near-dup), neg
    (events shifted to straddle 1970 — negative epochs).
    """
    import shutil

    import duckdb

    dst = f"/tmp/ks-fixture-{kind}"
    shutil.rmtree(dst, ignore_errors=True)
    if kind == "adversarial":
        from scripts.gen_adversarial import generate

        generate(base, dst)
        return dst
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    tables = (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split()
    if kind == "empty":
        for t in tables:
            con.execute(
                f"COPY (SELECT * FROM read_parquet('{base}/{t}.parquet') "
                f"WHERE false) TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
            )
    elif kind == "dup":
        for t in tables:
            if t == "documents":
                continue
            shutil.copyfile(f"{base}/{t}.parquet", f"{dst}/{t}.parquet")
        con.execute(
            f"""
            COPY (
              WITH base AS (SELECT * FROM read_parquet('{base}/documents.parquet')),
              mx AS (SELECT max(doc_id) + 1 AS off FROM base)
              SELECT doc_id, text, lang, source, n_chars FROM base
              UNION ALL
              SELECT b.doc_id + m.off * c.r, b.text, b.lang, b.source, b.n_chars
              FROM base b, mx m, (SELECT unnest([1, 2, 3]) AS r) c
              UNION ALL
              SELECT b.doc_id + m.off * 4, b.text || ' neardupmarker',
                     b.lang, b.source,
                     CAST(length(b.text || ' neardupmarker') AS BIGINT)
              FROM base b, mx m
            ) TO '{dst}/documents.parquet' (FORMAT PARQUET)
            """
        )
    elif kind == "neg":
        for t in tables:
            if t == "events":
                continue
            shutil.copyfile(f"{base}/{t}.parquet", f"{dst}/{t}.parquet")
        con.execute(
            f"""
            COPY (
              SELECT event_id,
                     CAST(ts - (SELECT min(ts) FROM
                                read_parquet('{base}/events.parquet'))
                        - INTERVAL 15 DAY + TIMESTAMP '1970-01-01'
                        AS TIMESTAMP) AS ts,
                     user_id, event_type, value, props
              FROM read_parquet('{base}/events.parquet')
            ) TO '{dst}/events.parquet' (FORMAT PARQUET)
            """
        )
    else:
        raise SystemExit(f"unknown --fixture kind: {kind}")
    con.close()
    return dst


if __name__ == "__main__":
    args = sys.argv[1:]
    known = {"--kitti-scale", "--fixture", "--agghash"}
    unknown = [
        a
        for a in args
        if a.startswith("--")
        and a not in known
        and not a.startswith("--fixture=")
        and not a.startswith("--only=")
    ]
    if unknown:
        raise SystemExit(
            f"unknown flag(s) {unknown}; usage: oracle_sweep.py "
            "[--kitti-scale] [--fixture KIND ...] "
            "[--only=name1,name2] [sf_dir ...]"
        )
    only: set[str] = set()
    for a in args:
        if a.startswith("--only="):
            only |= {n for n in a.split("=", 1)[1].split(",") if n}
    args = [a for a in args if not a.startswith("--only=")]
    ks = "--kitti-scale" in args
    ah = "--agghash" in args
    fixtures = [
        a.split("=", 1)[1] for a in args if a.startswith("--fixture=")
    ]
    # Every bare `--fixture KIND` pair, not just the first (ADVICE r5:
    # args.index found only the first flag, silently dropping repeats;
    # a trailing bare --fixture crashed with IndexError, not usage).
    for i, a in enumerate(args):
        if a == "--fixture":
            if i + 1 >= len(args) or args[i + 1].startswith("--"):
                raise SystemExit(
                    "--fixture requires a KIND argument; usage: "
                    "oracle_sweep.py [--kitti-scale] [--fixture KIND ...] "
                    "[sf_dir ...]"
                )
            fixtures.append(args[i + 1])
    dirs = [
        a
        for i, a in enumerate(args)
        if not a.startswith("--")
        and not (i > 0 and args[i - 1] == "--fixture")
    ]
    dirs += [materialize_fixture(k) for k in fixtures]
    if not dirs:
        dirs = ["/root/testdata/sf0.1"]
    raise SystemExit(
        sweep(dirs, kitti_scale=ks, only=only or None, agghash=ah)
    )
