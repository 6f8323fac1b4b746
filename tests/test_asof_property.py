"""Property test: asof_join vs pandas merge_asof (an independent,
widely-trusted as-of implementation) on randomized inputs — keys,
float timestamps, exact-tie collisions, empty sides."""

from __future__ import annotations

import math

import pandas as pd
from hypothesis import HealthCheck, given, settings, strategies as st

from kittispark.operators.asof import asof_join

_ts = st.integers(min_value=0, max_value=50)
_key = st.integers(min_value=1, max_value=3)

left_rows = st.lists(st.tuples(_key, _ts), min_size=0, max_size=12)
right_rows = st.lists(
    st.tuples(_key, _ts, st.integers(min_value=0, max_value=999)),
    min_size=0,
    max_size=12,
    unique_by=lambda r: (r[0], r[1]),  # asof contract: right unique per (key, ts)
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(left=left_rows, right=right_rows)
def test_asof_matches_pandas_merge_asof(spark, left, right):
    ldf = spark.createDataFrame(
        [(k, float(ts), i) for i, (k, ts) in enumerate(left)],
        "k int, ts double, lid int",
    )
    rdf = spark.createDataFrame(
        [(k, float(ts), float(v)) for k, ts, v in right], "k int, ts double, v double"
    )
    got = {
        r["lid"]: r["v"]
        for r in asof_join(ldf, rdf, on="k", ts="ts", payload=["v"]).collect()
    }

    lp = (
        pd.DataFrame(
            [(k, float(ts), i) for i, (k, ts) in enumerate(left)],
            columns=["k", "ts", "lid"],
        )
        .astype({"k": "int64", "ts": "float64", "lid": "int64"})
        .sort_values("ts", kind="stable")
    )
    rp = (
        pd.DataFrame(
            [(k, float(ts), float(v)) for k, ts, v in right],
            columns=["k", "ts", "v"],
        )
        .astype({"k": "int64", "ts": "float64", "v": "float64"})
        .sort_values("ts", kind="stable")
    )
    want_df = pd.merge_asof(
        lp, rp, on="ts", by="k", direction="backward", allow_exact_matches=True
    )
    want = {
        int(r.lid): (None if math.isnan(r.v) else r.v) for r in want_df.itertuples()
    }
    assert got == want


# NULL-timestamp contract (adversarial-sweep fix): right rows with no
# time never match; left rows with no time are kept and served a NULL
# payload. The model runs merge_asof over the timed subsets only.
left_rows_null = st.lists(
    st.tuples(_key, st.one_of(st.none(), _ts)), min_size=0, max_size=12
)
right_rows_null = st.lists(
    st.tuples(_key, st.one_of(st.none(), _ts), st.integers(0, 999)),
    min_size=0,
    max_size=12,
    unique_by=lambda r: (r[0], r[1]),
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(left=left_rows_null, right=right_rows_null)
def test_asof_null_ts_semantics(spark, left, right):
    ldf = spark.createDataFrame(
        [(k, None if ts is None else float(ts), i) for i, (k, ts) in enumerate(left)],
        "k int, ts double, lid int",
    )
    rdf = spark.createDataFrame(
        [(k, None if ts is None else float(ts), float(v)) for k, ts, v in right],
        "k int, ts double, v double",
    )
    got = {
        r["lid"]: r["v"]
        for r in asof_join(ldf, rdf, on="k", ts="ts", payload=["v"]).collect()
    }

    lp = (
        pd.DataFrame(
            [(k, float(ts), i) for i, (k, ts) in enumerate(left) if ts is not None],
            columns=["k", "ts", "lid"],
        )
        .astype({"k": "int64", "ts": "float64", "lid": "int64"})
        .sort_values("ts", kind="stable")
    )
    rp = (
        pd.DataFrame(
            [(k, float(ts), float(v)) for k, ts, v in right if ts is not None],
            columns=["k", "ts", "v"],
        )
        .astype({"k": "int64", "ts": "float64", "v": "float64"})
        .sort_values("ts", kind="stable")
    )
    want_df = pd.merge_asof(
        lp, rp, on="ts", by="k", direction="backward", allow_exact_matches=True
    )
    want = {
        int(r.lid): (None if math.isnan(r.v) else r.v) for r in want_df.itertuples()
    }
    # un-timed left rows: present in the output, payload NULL
    for i, (k, ts) in enumerate(left):
        if ts is None:
            want[i] = None
    assert got == want
