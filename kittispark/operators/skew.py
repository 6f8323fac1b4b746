"""Skew-resilient equi-join via key salting.

AQE's skew-join splitting (enabled in kittispark.session.get_spark)
handles most skew at runtime by splitting oversized partitions, but it
only helps sort-merge joins after materialization. Salting is the
plan-level lever when one side has HEAVY HITTERS — a handful of keys
holding a large share of rows (nulls, default ids, celebrity
entities): the fat side's rows are spread across `n_salts`
sub-partitions of each key, and the slim side is replicated once per
salt, so no single task ever owns a whole hot key.

Cost model: slim side grows ×n_salts (keep it the dimension/lookup
side); fat side gets a uniformly distributed extra key at zero extra
rows. Choose n_salts ≈ (rows of hottest key) / (rows a task should
hold). Salt is derived deterministically from a uniformly distributed
column when available (`salt_from`), else from a per-row random draw
that never affects the join result — only placement.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fat: DataFrame,
    slim: DataFrame,
    on: str | Sequence[str],
    how: str = "inner",
    n_salts: int = 8,
    salt_from: str | None = None,
) -> DataFrame:
    """Equi-join `fat ⋈ slim` on `on`, salted so each hot key in `fat`
    is split across `n_salts` shuffle partitions.

    `salt_from`: a fat-side column whose values are well-distributed
    within a key (an id, a timestamp) — salting hashes it so runs are
    deterministic. Without one, a uniform random salt is used (still
    correct: the salt only routes rows).

    Only fat-side-preserving join types are allowed: the slim side is
    replicated once per salt before the join, so 'right'/'full_outer'
    would emit each unmatched slim row n_salts times."""
    allowed = {"inner", "left", "left_outer", "left_semi", "left_anti"}
    if how not in allowed:
        raise ValueError(
            f"salted_join supports how in {sorted(allowed)} (got {how!r}): "
            "the slim side is replicated per salt, so right/full outer "
            "joins would duplicate unmatched slim-side rows"
        )
    keys = [on] if isinstance(on, str) else list(on)
    overlap = set(fat.columns) & set(slim.columns) - set(keys)
    if overlap:
        raise ValueError(f"ambiguous non-key columns on both sides: {sorted(overlap)}")

    # The fallback salt hashes ALL fat columns instead of rand():
    # rand(seed) is deterministic only w.r.t. partition index and row
    # order, so a partial stage recompute after a fetch failure can
    # re-salt the same row differently — rows drop from one reducer
    # and duplicate in another (the SPARK-23207 repartition-by-rand
    # hazard). Hashing row content is recompute-stable; fully
    # identical duplicate rows share a salt (correctness-neutral,
    # only a residual-skew cost) — pass salt_from for a better spread
    # key when one exists.
    salt = (
        F.pmod(F.xxhash64(salt_from), F.lit(n_salts))
        if salt_from is not None
        else F.pmod(F.xxhash64(*[F.col(c) for c in fat.columns]), F.lit(n_salts))
    )
    fat_s = fat.withColumn("__salt", salt.cast("int"))
    slim_s = slim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = fat_s.join(slim_s, [*keys, "__salt"], how)
    return out.drop("__salt")
