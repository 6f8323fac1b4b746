"""Local mirror of the driver's DuckDB-oracle comparison: run a
registered Spark query and its oracle SQL side by side, compare row
count, column names, and order-insensitive values. Used by tests so
the driver's correctness gate (CORRECTNESS_r{N}.json) is rehearsed on
every pytest run.
"""

from __future__ import annotations

import math
import os
from decimal import Decimal

import duckdb

from kittispark.sources.tables import TABLES


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        # partial fixture dirs (edge-input tests write only the tables
        # they need) register only what exists — DuckDB validates the
        # file at CREATE VIEW time, not first query
        if not os.path.exists(f"{sf_dir}/{t}.parquet"):
            continue
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    con.close()
    return cols, rows


def _norm_cell(v):
    if isinstance(v, bool):
        return v
    if isinstance(v, Decimal):
        # DuckDB hands back DECIMAL where its round()/literal
        # arithmetic stays exact while the Spark side is DOUBLE; the
        # driver's r7 verdicts show its hash coerces these equal
        # (plane_mesh_vertices, media_feature_extract were green), so
        # compare in double space. Both engines' decimals here are
        # sub-2^53-scaled, so the conversion is exact.
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # Driver-faithful bit identity: the driver's value hash
        # distinguishes -0.0 from +0.0 and sees sub-1e-9 drift, so
        # the local rehearsal must too (the old round(v + 0.0, 9)
        # collapse is exactly why the r7 wireframe signed-zero red
        # was invisible locally — VERDICT r7 #2). repr() round-trips
        # doubles exactly and renders the zero sign.
        return repr(v)
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm_cell(x)) for k, x in v.items()))
    return v


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    # repr-key sort: total order even with None/mixed-type cells
    return sorted(
        (tuple(_norm_cell(r[i]) for i in order) for r in rows), key=repr
    )


# ---------------------------------------------------------------------------
# Aggregate-hash comparison (VERDICT r8 #3): value adjudication past
# the collect() bound. compare() above collect()s both sides
# row-at-a-time into Python — at >1M output rows the harness
# dominates wall. compare_agghash() instead computes an
# ORDER-INSENSITIVE aggregate hash ENGINE-SIDE on both engines —
# per row: md5 over a canonical field encoding, folded to a 60-bit
# int, SUMmed in 38-digit decimal space — and collects exactly ONE
# row per side. The multiset of rows matches iff (count, hashsum)
# match (modulo md5 collisions / sum forgery — adjudication-grade).
#
# Cross-engine canonical encoding per Spark output type:
# - double/float/decimal (top level): the EXACT IEEE-754 bit pattern,
#   extracted engine-side by a vectorized numpy view('int64') UDF on
#   both engines (Arrow pandas_udf in Spark, Arrow UDF in DuckDB) —
#   bit-faithful by construction: signed zero, subnormals, and
#   full-precision pass-through doubles all distinguish. (String
#   formatting cannot do this portably: Java pads the shortest
#   round-trip repr while C rounds the exact expansion, and the two
#   fork on doubles needing >15 significant digits — exactly the raw
#   parquet pass-through columns of per-row families.) NaN normalized
#   by guard before the bits (payloads may differ); NULL guarded by
#   sentinel (a float64 batch cannot carry NULL distinctly).
# - double inside arrays: printf('%.15e') on both engines (a Python
#   UDF is not callable inside a Spark higher-order-function lambda).
#   Exact for every double whose shortest repr needs <= 15
#   significant digits — guaranteed for COMPUTED emissions by the
#   float-identity audit (round(x, k<=9)+0.0 grid values;
#   scripts/float_identity_audit.py); signed zero stays visible.
# - integrals: cast to string (identical rendering); DuckDB side
#   first cast to BIGINT so HUGEINT/INT32 widths render alike.
# - decimal: cast through DOUBLE then %.15e — same coercion the
#   strict compare() applies (_norm_cell).
# - string: length-prefixed (no delimiter ambiguity); bool/date:
#   cast to string (identical rendering both engines).
# - array<primitive>: size-prefixed element-joined canonicals
#   (elements NULL-sentineled before the join so neither engine's
#   join can drop them).
# Unsupported types (timestamp, map, struct) raise — per house rule
# those never reach hashed outputs raw.

# \x01-framed null sentinel (NUL itself terminates a C string
# literal inside DuckDB's parser); \x1f/\x1e unit/record separators
# as field/element delimiters. Strings are length-prefixed, so no
# document text can forge a frame collision.
_NULL = "\x01N\x01"
_FS = "\x1f"
_ES = "\x1e"


def _canon_spark(col: str, dt, in_array: bool = False) -> str:
    from pyspark.sql import types as T

    q = f"`{col}`"
    if isinstance(dt, (T.DoubleType, T.FloatType, T.DecimalType)):
        d = f"cast({q} as double)"
        if in_array:
            return (
                f"CASE WHEN {q} IS NULL THEN '{_NULL}' "
                f"WHEN isnan({d}) THEN 'NaN' "
                f"WHEN {d} = double('Infinity') THEN 'Inf' "
                f"WHEN {d} = double('-Infinity') THEN '-Inf' "
                f"ELSE format_string('%.15e', {d}) END"
            )
        return (
            f"CASE WHEN {q} IS NULL THEN '{_NULL}' "
            f"WHEN isnan({d}) THEN 'NaN' "
            f"ELSE cast(__ks_dbits({d}) as string) END"
        )
    if isinstance(
        dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType, T.BooleanType, T.DateType)
    ):
        return f"coalesce(cast({q} as string), '{_NULL}')"
    if isinstance(dt, T.StringType):
        return (
            f"CASE WHEN {q} IS NULL THEN '{_NULL}' "
            f"ELSE concat(cast(length({q}) as string), ':', {q}) END"
        )
    if isinstance(dt, T.ArrayType):
        inner = _canon_spark("__e", dt.elementType, in_array=True).replace(
            "`__e`", "_e"
        )
        return (
            f"CASE WHEN {q} IS NULL THEN '{_NULL}' "
            f"ELSE concat(cast(size({q}) as string), '[', "
            f"array_join(transform({q}, _e -> {inner}), '{_ES}'), ']') END"
        )
    raise ValueError(f"compare_agghash: unsupported output type {dt} for {col!r}")


def _canon_duck(col: str, dt, in_array: bool = False) -> str:
    from pyspark.sql import types as T

    q = f'"{col}"'
    if isinstance(dt, (T.DoubleType, T.FloatType, T.DecimalType)):
        d = f"CAST({q} AS DOUBLE)"
        if in_array:
            return (
                f"CASE WHEN {q} IS NULL THEN '{_NULL}' "
                f"WHEN isnan({d}) THEN 'NaN' "
                f"WHEN isinf({d}) AND {d} > 0 THEN 'Inf' "
                f"WHEN isinf({d}) THEN '-Inf' "
                f"ELSE printf('%.15e', {d}) END"
            )
        return (
            f"CASE WHEN {q} IS NULL THEN '{_NULL}' "
            f"WHEN isnan({d}) THEN 'NaN' "
            f"ELSE CAST(ks_dbits({d}) AS VARCHAR) END"
        )
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return f"coalesce(CAST(CAST({q} AS BIGINT) AS VARCHAR), '{_NULL}')"
    if isinstance(dt, (T.BooleanType, T.DateType)):
        return f"coalesce(CAST({q} AS VARCHAR), '{_NULL}')"
    if isinstance(dt, T.StringType):
        return (
            f"CASE WHEN {q} IS NULL THEN '{_NULL}' "
            f"ELSE concat(CAST(length({q}) AS VARCHAR), ':', {q}) END"
        )
    if isinstance(dt, T.ArrayType):
        inner = _canon_duck("__e", dt.elementType, in_array=True).replace(
            '"__e"', "_e"
        )
        return (
            f"CASE WHEN {q} IS NULL THEN '{_NULL}' "
            f"ELSE concat(CAST(len({q}) AS VARCHAR), '[', "
            f"array_to_string(list_transform({q}, _e -> {inner}), '{_ES}'), ']') END"
        )
    raise ValueError(f"compare_agghash: unsupported output type {dt} for {col!r}")


def _register_dbits_spark(spark) -> None:
    import pandas as pd  # noqa: F401  (pandas_udf resolves hints lazily)
    from pyspark.sql.functions import pandas_udf

    def _bits(s):
        import pandas as _pd

        return _pd.Series(s.to_numpy(dtype="float64").view("int64"))

    spark.udf.register("__ks_dbits", pandas_udf(_bits, "long"))


def _register_dbits_duck(con) -> None:
    import numpy as np
    import pyarrow as pa

    def _bits(arr):
        a = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
        npa = a.to_numpy(zero_copy_only=False)
        return pa.array(np.asarray(npa, dtype="float64").view("int64"), type=pa.int64())

    con.create_function(
        "ks_dbits", _bits, [duckdb.typing.DOUBLE], duckdb.typing.BIGINT, type="arrow"
    )


def compare_agghash(spark_df, sql: str, sf_dir: str, name: str = "?") -> dict:
    """Adjudicate a per-row-output query at engine scale: one
    (count, 60-bit-hash-sum) row collected per engine instead of the
    full result set. Returns {"rows": n, "hash": h} for reporting."""
    from pyspark.sql import functions as F

    fields = {f.name: f.dataType for f in spark_df.schema.fields}
    order = sorted(fields)
    _register_dbits_spark(spark_df.sparkSession)

    s_row = f" , '{_FS}', ".join(_canon_spark(c, fields[c]) for c in order)
    s_hash = f"cast(conv(substr(md5(concat({s_row})), 1, 15), 16, 10) as bigint)"
    s = spark_df.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.expr(s_hash).cast("decimal(38,0)")).alias("h"),
    ).collect()[0]

    con = duckdb.connect()
    _register_dbits_duck(con)
    for t in TABLES:
        if not os.path.exists(f"{sf_dir}/{t}.parquet"):
            continue
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    d_cols = [d[0] for d in con.execute(f"DESCRIBE ({sql})").fetchall()]
    assert sorted(d_cols) == order, (
        f"{name}: column mismatch spark={order} duckdb={sorted(d_cols)}"
    )
    d_row = f" , '{_FS}', ".join(_canon_duck(c, fields[c]) for c in order)
    d_hash = (
        f"CAST(CAST(concat('0x', substr(md5(concat({d_row})), 1, 15)) AS BIGINT)"
        f" AS HUGEINT)"
    )
    d = con.execute(
        f"SELECT COUNT(*) AS n, SUM({d_hash}) AS h FROM ({sql}) __t"
    ).fetchone()
    con.close()

    assert s.n == d[0], f"{name}: row count spark={s.n} duckdb={d[0]}"
    s_h = None if s.h is None else int(s.h)
    d_h = None if d[1] is None else int(d[1])
    assert s_h == d_h, f"{name}: aggregate hash spark={s_h} duckdb={d_h}"
    return {"rows": int(s.n), "hash": s_h}


def compare(spark_df, sql: str, sf_dir: str, name: str = "?") -> None:
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    d_cols, d_rows = run_oracle(sql, sf_dir)
    assert sorted(s_cols) == sorted(d_cols), (
        f"{name}: column mismatch spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    sn, dn = _norm_rows(s_cols, s_rows), _norm_rows(d_cols, d_rows)
    for i, (a, b) in enumerate(zip(sn, dn)):
        assert a == b, f"{name}: row {i} differs\n  spark={a}\n  duck ={b}"
