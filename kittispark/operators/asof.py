"""As-of (most-recent-at-or-before) join — an operator Spark's join
syntax lacks, composed from existing DataFrame ops per the engine's
custom-operator policy (composition first, Pandas UDF only if
semantics demand it; SURVEY.md §7.1).

Semantics: for each left row, attach the payload of the latest right
row with the same key and right.ts <= left.ts (DuckDB `ASOF JOIN`
semantics, which is also the oracle used to check it).

Physical shape — why union+window instead of a range join:
a non-equi join `l.key = r.key AND r.ts <= l.ts` explodes to all
qualifying pairs before a per-left-row argmax prunes them: O(|L|·|R|)
intermediate within each key in the worst case. Instead, both sides
are unioned and sorted once per key, and `last(value, ignorenulls)`
over an unbounded-preceding window carries each right payload forward
onto the left rows that follow it. Cost: ONE shuffle on the key (the
same shuffle any keyed join pays) + a per-key sort — linear in
|L|+|R|, no pair explosion, AQE-skew-splittable. At 100 TB both
inputs arrive partitioned by key and the window sort is the only
per-partition work.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    ts: str = "ts",
    payload: Sequence[str] = (),
    tolerance: Column | None = None,
) -> DataFrame:
    """Left as-of join: all left columns + each right `payload` column
    as of the latest right row at-or-before the left row's `ts`.

    Right rows sort before left rows at equal timestamps, so an exact
    tie matches (<=, DuckDB ASOF semantics). Right side should be
    unique per (key, ts); pre-aggregate it if not. `tolerance`
    (a Column interval/double matching the ts type's arithmetic)
    optionally voids matches older than `ts - tolerance`.

    All payload columns are carried as ONE struct per right row, so a
    matched row whose payload value is genuinely NULL serves that
    NULL (not a stale older row's value), and multiple payload
    columns always come from the SAME right row — exactly DuckDB's
    ASOF behavior. (A per-column last(ignorenulls) carry would skip
    null payloads and could mix columns from different rows.)
    """
    keys = [on] if isinstance(on, str) else list(on)
    payload = list(payload)
    if not payload:
        raise ValueError("payload columns required")
    clash = set(payload) & set(left.columns)
    if clash:
        raise ValueError(
            f"payload columns {sorted(clash)} collide with left-side "
            "columns — rename one side before the as-of join (duplicate "
            "output names fail only at first downstream reference)"
        )

    from pyspark.sql import types as T

    p_type = T.StructType(
        [T.StructField(c, right.schema[c].dataType, True) for c in payload]
    )
    l_tag = left.select(
        *keys,
        F.col(ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(p_type).alias("__p"),
        F.struct(*left.columns).alias("__row"),
    )
    # DuckDB ASOF semantics for NULL timestamps: a right row with no
    # time can never be "at or before" anything (the comparison is
    # NULL) — drop it. A LEFT row with NULL ts is kept and serves a
    # NULL payload: it sorts NULLS FIRST below, ahead of every right
    # row, so the carry-forward finds nothing.
    r_tag = right.filter(F.col(ts).isNotNull()).select(
        *keys,
        F.col(ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(*[F.col(c) for c in payload]).cast(p_type).alias("__p"),
        F.lit(None).cast(l_tag.schema["__row"].dataType).alias("__row"),
    )

    w = (
        W.partitionBy(*keys)
        # explicit NULLS FIRST (Spark's ASC default, pinned against
        # refactors): NULL-ts LEFT rows must precede every right row
        .orderBy(F.asc_nulls_first("__ts"), F.asc("__side"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = l_tag.unionByName(r_tag).select(
        "__side",
        "__row",
        "__ts",
        F.last("__p", ignorenulls=True).over(w).alias("__c"),
        *(
            [F.last(F.when(F.col("__side") == 0, F.col("__ts")), ignorenulls=True)
             .over(w).alias("__match_ts")]
            if tolerance is not None
            else []
        ),
    )
    out_payload = [
        (
            F.when(
                F.col("__ts") - F.col("__match_ts") <= tolerance,
                F.col("__c")[c],
            )
            if tolerance is not None
            else F.col("__c")[c]
        ).alias(c)
        for c in payload
    ]
    return (
        carried.filter(F.col("__side") == 1)
        .select(F.col("__row.*"), *out_payload)
    )


def resample_ffill(
    df: DataFrame,
    on: str | Sequence[str],
    ts: str,
    value: str,
    step_s: int,
) -> DataFrame:
    """Per-key regular time grid with forward-filled values: resample
    irregular observations to `step_s`-second buckets, carrying the
    last observation at-or-before each grid point.

    Composition, not a new kernel: (1) per-key min/max bounds (one
    aggregation), (2) grid = explode(sequence(lo, hi, step)) — grid
    size is (span/step) per key, generated where the key lives, no
    driver loop, (3) asof_join(grid, observations). Inherits the
    as-of join's single-shuffle linear cost; the grid explode is
    narrow. Observations must be unique per (key, second) —
    pre-aggregate if not.

    Grid-span convention (deliberate, mirrored by the DuckDB oracle):
    the grid runs from the floor-aligned first observation to the
    LAST ALIGNED POINT <= max(ts) — observations after that point are
    not represented by any grid row (the newest value appears only
    once the next aligned tick would). Callers needing the tail
    should ceil-align hi themselves (floor(hi/step)*step + step).
    """
    if step_s <= 0:
        raise ValueError(f"step_s must be a positive number of seconds, got {step_s}")
    keys = [on] if isinstance(on, str) else list(on)
    secs = F.col(ts).cast("long")
    obs = df.select(*keys, secs.alias("grid_ts"), F.col(value))
    bounds = df.groupBy(*keys).agg(
        (F.floor(F.min(secs) / step_s) * step_s).cast("long").alias("lo"),
        F.max(secs).alias("hi"),
    )
    grid = bounds.select(
        *keys,
        F.explode(
            F.sequence(F.col("lo"), F.col("hi"), F.lit(int(step_s)))
        ).alias("grid_ts"),
    )
    return asof_join(grid, obs, on=keys, ts="grid_ts", payload=[value])
