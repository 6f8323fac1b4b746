"""Randomized property tests for the composed operators: placement
transforms (salting) must never change results; resampling must obey
grid arithmetic and forward-fill semantics."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F

from kittispark.operators.asof import resample_ffill
from kittispark.operators.skew import salted_join

rows = st.lists(
    st.tuples(st.integers(1, 4), st.integers(0, 99)), min_size=0, max_size=25
)
dim = st.lists(
    st.tuples(st.integers(1, 6), st.integers(0, 9)),
    min_size=0,
    max_size=8,
    unique_by=lambda r: r[0],
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(fat=rows, slim=dim)
def test_salted_join_always_equals_plain_join(spark, fat, slim):
    fdf = spark.createDataFrame(
        [(k, v) for k, v in fat] or [(None, None)], "k int, v int"
    ).filter(F.col("k").isNotNull())
    sdf = spark.createDataFrame(
        [(k, d) for k, d in slim] or [(None, None)], "k int, d int"
    ).filter(F.col("k").isNotNull())
    for how in ("inner", "left"):
        plain = sorted(
            map(tuple, fdf.join(sdf, "k", how).select("v", "d").collect()),
            key=repr,
        )
        salted = sorted(
            map(
                tuple,
                salted_join(fdf, sdf, on="k", how=how, n_salts=4, salt_from="v")
                .select("v", "d")
                .collect(),
            ),
            key=repr,
        )
        assert salted == plain, how


def test_salted_join_rejects_slim_preserving_how(spark):
    fdf = spark.createDataFrame([(1, 1)], "k int, v int")
    sdf = spark.createDataFrame([(1, 2)], "k int, d int")
    for how in ("right", "full_outer", "full"):
        with pytest.raises(ValueError, match="salted_join supports"):
            salted_join(fdf, sdf, on="k", how=how)


obs = st.lists(
    st.tuples(st.integers(1, 3), st.integers(0, 1000)),
    min_size=1,
    max_size=15,
    unique_by=lambda r: (r[0], r[1]),
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(points=obs)
def test_resample_ffill_grid_and_fill_properties(spark, points):
    step = 60
    df = spark.createDataFrame(
        [(k, float(ts), float(k * 1000 + ts)) for k, ts in points],
        "k int, ts double, v double",
    )
    out = resample_ffill(df, on="k", ts="ts", value="v", step_s=step).collect()
    by_key: dict[int, list] = {}
    for r in out:
        by_key.setdefault(r["k"], []).append(r)
    per_key_pts: dict[int, list[int]] = {}
    for k, ts in points:
        per_key_pts.setdefault(k, []).append(ts)
    assert set(by_key) == set(per_key_pts)
    for k, rs in by_key.items():
        lo = (min(per_key_pts[k]) // step) * step
        hi = max(per_key_pts[k])
        want_n = (hi - lo) // step + 1
        assert len(rs) == want_n, (k, len(rs), want_n)
        # grid is exactly the arithmetic sequence
        got_ts = sorted(r["grid_ts"] for r in rs)
        assert got_ts == [lo + i * step for i in range(int(want_n))]
        # forward fill: value at each grid point is the observation
        # with the greatest ts <= grid point (None before the first)
        for r in rs:
            past = [ts for ts in per_key_pts[k] if ts <= r["grid_ts"]]
            if not past:
                assert r["v"] is None
            else:
                assert r["v"] == float(k * 1000 + max(past))


def test_pack_sequences_bucket_invariance(spark):
    """The bucketed two-pass cumsum must equal the sequential layout
    for ANY bucket width — the distributed-equals-sequential property
    the 100 TB path relies on."""
    from kittispark.operators.text import pack_sequences
    from tests.conftest import SF_SMOKE
    from kittispark.sources.tables import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    base = sorted(
        tuple(r) for r in pack_sequences(docs, budget=256, bucket_width=64).collect()
    )
    for width in (1, 7, 500):
        alt = sorted(
            tuple(r)
            for r in pack_sequences(docs, budget=256, bucket_width=width).collect()
        )
        assert alt == base, f"packing differs at bucket_width={width}"


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(n=st.integers(1, 400), k=st.integers(1, 20))
def test_ntile_formula_property(spark, n, k):
    # the closed-form tile must equal the engine's ntile for every
    # (n, k), including n < k and every remainder class
    from pyspark.sql import Window as W
    from kittispark.operators.analytics import ntile_from_rank

    df = spark.range(1, n + 1).select(F.col("id").alias("rank"))
    bad = (
        df.select(
            ntile_from_rank(F.col("rank"), F.lit(n), k).alias("f"),
            F.ntile(k).over(W.orderBy("rank")).alias("g"),
        )
        .filter(F.col("f") != F.col("g"))
        .count()
    )
    assert bad == 0


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    weights=st.lists(st.integers(1, 500), min_size=1, max_size=40),
    k=st.integers(1, 15),
)
def test_pps_sample_total_picks_property(spark, weights, k):
    # picks always total exactly k, every picked weight >= 1, and a
    # deterministic re-run selects the identical sample
    from kittispark.operators.analytics import pps_systematic_sample

    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(weights)], ["id", "wt"]
    )
    out = pps_systematic_sample(df, "id", "wt", k=k, bucket_size=7)
    rows = sorted((r.id, r.picks) for r in out.collect())
    assert sum(p for _, p in rows) == k
    rows2 = sorted(
        (r.id, r.picks)
        for r in pps_systematic_sample(df, "id", "wt", k=k, bucket_size=3).collect()
    )
    # bucket size is an execution detail, never a semantic one
    assert rows == rows2


# ---------------------------------------------------------------------------
# ExactSubstr span detection / removal vs a brute-force Python model
# ---------------------------------------------------------------------------

# small alphabet + short docs force heavy window collisions, hitting
# the overlap/adjacency merge paths hard
_span_docs = st.lists(
    st.lists(st.sampled_from("ab"), min_size=0, max_size=12).map(" ".join),
    min_size=1,
    max_size=6,
)


def _model_spans(texts, n):
    """Brute-force: mark every n-window whose token content occurs
    >= 2 times anywhere, union intervals per doc."""
    from collections import Counter

    occ = Counter()
    toks = [t.split(" ") for t in texts]
    for tk in toks:
        for i in range(len(tk) - n + 1):
            occ[tuple(tk[i : i + n])] += 1
    out = {}
    for doc_id, tk in enumerate(toks):
        marked = set()
        for i in range(len(tk) - n + 1):
            if occ[tuple(tk[i : i + n])] >= 2:
                marked.update(range(i, i + n))
        if not marked:
            continue
        spans = 0
        prev = None
        for p in sorted(marked):
            if prev is None or p > prev + 1:
                spans += 1
            prev = p
        out[doc_id] = (spans, len(marked))
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=_span_docs)
def test_duplicated_spans_match_bruteforce_model(spark, texts):
    from kittispark.operators.dedup import (
        duplicated_token_spans,
        remove_duplicated_spans,
    )

    n = 3
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_dup_spans"], r["dup_tokens"])
        for r in duplicated_token_spans(df, n=n).collect()
    }
    assert got == _model_spans(texts, n)
    # removal consistency: cut size equals the span stats, and the
    # rebuilt text is the model's kept tokens in order
    cleaned = {
        r["doc_id"]: (r["n_tokens_before"], r["n_tokens_after"], r["clean_text"])
        for r in remove_duplicated_spans(df, n=n).collect()
    }
    model = _model_spans(texts, n)
    for doc_id, text in enumerate(texts):
        before, after, _ = cleaned[doc_id]
        assert before == len(text.split(" "))
        assert before - after == model.get(doc_id, (0, 0))[1]


def test_d2_static_bit_equals_hof_fold(spark):
    """d2_static's codegen expansion must be BIT-identical to the
    interpreted fold_d2 on the same arrays — the claim that let the
    PQ hot paths switch compute form without re-deriving any oracle.
    Random doubles incl. negatives/zeros/denormal-ish magnitudes."""
    import random

    from pyspark.sql import functions as F

    from kittispark.operators.similarity import d2_static, fold_d2

    rng = random.Random(20260815)
    rows = []
    for i in range(64):
        n = rng.choice([4, 16])
        a = [rng.uniform(-2, 2) * (10 ** rng.randint(-8, 2)) for _ in range(n)]
        b = [rng.uniform(-2, 2) * (10 ** rng.randint(-8, 2)) for _ in range(n)]
        rows.append((i, n, a, b))
    df = spark.createDataFrame(
        rows, "rid int, n int, a array<double>, b array<double>"
    )
    for n in (4, 16):
        sub = df.where(F.col("n") == n)
        out = sub.select(
            fold_d2(F.col("a"), F.col("b")).alias("hof"),
            d2_static(F.col("a"), F.col("b"), n).alias("cg"),
        ).collect()
        assert out, "fixture must cover both widths"
        for r in out:
            # bitwise identity, not approximate equality
            import struct

            assert struct.pack("<d", r["hof"]) == struct.pack("<d", r["cg"])


def test_ntile_from_rank_matches_sql_ntile_exhaustive(spark):
    """Closed-form ntile(k) from (rank, n) vs the engine's own NTILE
    window, exhaustively for every (n, k) in [0..40] x [1..7] — the
    shared operator behind curriculum_phase_mix and the decile
    family must agree with SQL semantics at every boundary
    (n < k, n == k, remainders 0..k-1)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    from kittispark.operators.analytics import ntile_from_rank

    rows = spark.range(1, 41).select(F.col("id").alias("r"))
    for k in range(1, 8):
        for n in (0, 1, k - 1, k, k + 1, 2 * k + 3, 37, 40):
            if n < 1:
                continue
            df = rows.filter(F.col("r") <= n)
            got = df.select(
                "r", ntile_from_rank(F.col("r"), F.lit(n), k).alias("t")
            )
            want = df.select(
                "r", F.ntile(k).over(W.orderBy("r")).alias("t")
            )
            diff = got.exceptAll(want).count() + want.exceptAll(got).count()
            assert diff == 0, f"ntile mismatch at n={n}, k={k}"
