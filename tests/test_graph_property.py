"""Property tests for the round-6 algorithmic operators against
brute-force Python models on randomized inputs: degree-oriented
triangle counting, bounded-round min-label propagation, the 2-D
skyline, and the sweep-line interval union.

Each operator's DuckDB oracle already adjudicates it on the fixture
tables; these tests cover the INPUT SHAPES the fixtures can't reach
(dense cliques, stars, duplicate points, fully-nested intervals,
disconnected singletons) with an independent model — the same
brute-vs-composed pattern as test_asof_property /
test_weighted_median_property."""

from __future__ import annotations

import itertools

from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F

_edges_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=8),
        st.integers(min_value=0, max_value=8),
    ).map(lambda t: (min(t), max(t)))
    .filter(lambda t: t[0] != t[1]),
    min_size=0,
    max_size=20,
).map(lambda es: sorted(set(es)))

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _edges_df(spark, es):
    return spark.createDataFrame(
        [(u, v) for u, v in es] or [(0, 1)], "u long, v long"
    ).where(F.lit(bool(es)))


@settings(**_SETTINGS)
@given(es=_edges_strategy)
def test_triangle_count_matches_bruteforce(spark, es):
    from kittispark.queries.graph import triangle_count

    nodes = sorted({n for e in es for n in e})
    eset = set(es)
    brute = sum(
        1
        for a, b, c in itertools.combinations(nodes, 3)
        if (a, b) in eset and (a, c) in eset and (b, c) in eset
    )
    got = triangle_count(_edges_df(spark, es)).collect()[0]["n_triangles"]
    assert got == brute


@settings(**_SETTINGS)
@given(es=_edges_strategy, rounds=st.integers(min_value=1, max_value=3))
def test_label_propagation_matches_model(spark, es, rounds):
    from kittispark.queries.graph import label_propagation

    nodes = sorted({n for e in es for n in e})
    nbrs = {n: set() for n in nodes}
    for u, v in es:
        nbrs[u].add(v)
        nbrs[v].add(u)
    lbl = {n: n for n in nodes}
    for _ in range(rounds):
        lbl = {
            n: min([lbl[n], *[lbl[m] for m in nbrs[n]]]) for n in nodes
        }
    got = {
        r["node"]: r["lbl"]
        for r in label_propagation(_edges_df(spark, es), rounds).collect()
    }
    assert got == lbl


_points = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=6),   # maximize
        st.integers(min_value=0, max_value=6),   # minimize
    ),
    min_size=0,
    max_size=18,
)


@settings(**_SETTINGS)
@given(pts=_points)
def test_skyline_matches_brute_dominance(spark, pts):
    from kittispark.queries.analytics_ext import skyline_2d

    def dominated(r):
        return any(
            s[0] >= r[0] and s[1] <= r[1] and (s[0] > r[0] or s[1] < r[1])
            for s in pts
        )

    brute = sorted(p for p in pts if not dominated(p))
    df = spark.createDataFrame(
        [(i, p, d) for i, (p, d) in enumerate(pts)] or [(0, 0, 0)],
        "rid long, mx long, mn long",
    ).where(F.lit(bool(pts)))
    got = sorted(
        (r["mx"], r["mn"]) for r in skyline_2d(df, "mx", "mn").collect()
    )
    assert got == brute


_intervals = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=30),  # start
        st.integers(min_value=1, max_value=8),   # length
    ),
    min_size=1,
    max_size=16,
)


@settings(**_SETTINGS)
@given(iv=_intervals)
def test_interval_union_matches_brute(spark, iv):
    """The sweep-line grouping inside interval_sweep_coverage,
    replayed on arbitrary intervals for one key: total covered
    length must equal the brute union of integer ranges."""
    from pyspark.sql import Window as W

    covered = set()
    for s, ln in iv:
        covered.update(range(s, s + ln))
    brute = len(covered)

    df = spark.createDataFrame(
        [(1, i, s, s + ln) for i, (s, ln) in enumerate(iv)],
        "user_id long, event_id long, s long, e long",
    )
    w_prev = (
        W.partitionBy("user_id")
        .orderBy("s", "e", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    flagged = df.select(
        "user_id",
        "s",
        "e",
        F.when(
            F.col("s")
            > F.coalesce(F.max("e").over(w_prev), F.lit(-(2**63)).cast("long")),
            1,
        )
        .otherwise(0)
        .alias("brk"),
        "event_id",
    )
    w_run = (
        W.partitionBy("user_id")
        .orderBy("s", "e", "event_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    grp = flagged.select(
        "user_id", "s", "e", F.sum("brk").over(w_run).alias("g")
    )
    got = (
        grp.groupBy("user_id", "g")
        .agg((F.max("e") - F.min("s")).alias("len"))
        .agg(F.sum("len").alias("cov"))
        .collect()[0]["cov"]
    )
    assert got == brute
