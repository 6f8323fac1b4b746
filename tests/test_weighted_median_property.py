"""Property test: operators.analytics.weighted_median vs a
brute-force Python lower-weighted-median on randomized (group, value,
weight) sets — integral weights, duplicate values, single-row groups,
weight-1 degenerate (= plain lower median)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from kittispark.operators.analytics import weighted_median

_rows = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),    # group
        st.integers(min_value=-50, max_value=50),  # value
        st.integers(min_value=1, max_value=9),     # weight
    ),
    min_size=1,
    max_size=24,
)


def _brute(rows):
    out = {}
    for g in {r[0] for r in rows}:
        grp = sorted((v, w) for _, v, w in [r for r in rows if r[0] == g])
        tot = sum(w for _, w in grp)
        cum = 0
        for v, w in grp:
            cum += w
            if 2 * cum >= tot:
                out[g] = v
                break
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_rows)
def test_weighted_median_matches_bruteforce(spark, rows):
    df = spark.createDataFrame(
        [(g, v, w, i) for i, (g, v, w) in enumerate(rows)],
        "g int, v int, w int, tid int",
    )
    got = {
        r["g"]: r["wm"]
        for r in weighted_median(df, "g", "v", "w", "tid", out_col="wm").collect()
    }
    assert got == _brute(rows)


def test_weight_one_reduces_to_lower_median(spark):
    df = spark.createDataFrame(
        [(1, v, 1, i) for i, v in enumerate([5, 1, 9, 3, 7, 2])],
        "g int, v int, w int, tid int",
    )
    got = weighted_median(df, "g", "v", "w", "tid", out_col="wm").collect()
    # sorted: 1 2 3 5 7 9 — lower median (2*cum>=6 at cum=3) is 3
    assert got[0]["wm"] == 3


def test_shard_manifest_deal_is_balanced(spark):
    """Round-robin by size rank: shard doc-counts differ by <= 1 and
    every rank 1..n is covered exactly once across shards."""
    from kittispark.queries.llm_pipeline import corpus_shard_manifest

    rows = corpus_shard_manifest(spark, "/root/testdata/sf0.001").collect()
    counts = [r["n_docs"] for r in rows]
    assert max(counts) - min(counts) <= 1
    n = sum(counts)
    assert {r["shard_id"] for r in rows} == set(range(16))
    assert min(r["first_rank"] for r in rows) == 1
    assert max(r["last_rank"] for r in rows) == n
