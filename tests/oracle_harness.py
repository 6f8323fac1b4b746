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
