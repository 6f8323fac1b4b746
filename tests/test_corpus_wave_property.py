"""Property tests for the round-6 continuation cores against
brute-force Python models on randomized inputs: greedy WordPiece
segmentation, the Heaps-law growth curve's two-level prefix sums,
pairwise vocabulary Jaccard, and exact centroid-outlier ranking.

The DuckDB oracles already adjudicate these on the fixture tables;
these tests reach the shapes the fixtures can't (words built from a
3-letter alphabet so multi-char vocab hits constantly, single-doc
and gap-doc corpora, all-identical vectors, one-vector labels) with
an independent model — the same brute-vs-composed pattern as
test_graph_property."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_word = st.text(alphabet="abc", min_size=1, max_size=20)


def _wp_brute(w: str, init: set[str], cont: set[str], max_wlen: int):
    """Independent greedy longest-match model."""
    if len(w) > max_wlen:
        return 1, "[UNK]"
    toks, p = [], 0
    while p < len(w):
        step = 1
        for n in (4, 3, 2):
            c = w[p : p + n]
            if len(c) == n and (c in (cont if p else init)):
                step = n
                break
        toks.append(("##" if p else "") + w[p : p + step])
        p += step
    return len(toks), " ".join(toks)


@settings(**_SETTINGS)
@given(
    words=st.lists(_word, min_size=1, max_size=8, unique=True),
    vocab=st.lists(
        st.tuples(st.booleans(), st.text(alphabet="abc", min_size=2, max_size=4)),
        max_size=12,
    ),
)
def test_wordpiece_greedy_matches_bruteforce(spark, words, vocab):
    from kittispark.queries.corpus_lm import wordpiece_segment

    init = {2: [], 3: [], 4: []}
    cont = {2: [], 3: [], 4: []}
    iset, cset = set(), set()
    for is_cont, sub in set(vocab):
        (cont if is_cont else init)[len(sub)].append(sub)
        (cset if is_cont else iset).add(sub)
    wf = spark.createDataFrame(
        [(w, i + 1) for i, w in enumerate(words)], "w string, freq long"
    )
    got = {
        r["w"]: (r["n_tokens"], r["wp_tokens"])
        for r in wordpiece_segment(wf, init, cont, max_wlen=16).collect()
    }
    want = {w: _wp_brute(w, iset, cset, 16) for w in words}
    assert got == want


@settings(**_SETTINGS)
@given(
    occs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3000),  # doc_id with gaps
            st.sampled_from("abcdefgh"),  # term pool
        ),
        min_size=1,
        max_size=40,
    )
)
def test_vocab_growth_matches_bruteforce(spark, occs):
    from kittispark.queries.corpus_analytics import vocab_growth_curve

    tokens = spark.createDataFrame(occs, "doc_id long, term string")
    got = [tuple(r) for r in vocab_growth_curve(tokens).collect()]

    seen: set[str] = set()
    want, cum_t, cum_v = [], 0, 0
    by_doc: dict[int, list[str]] = {}
    for d, term in occs:
        by_doc.setdefault(d, []).append(term)
    for d in sorted(by_doc):
        terms = by_doc[d]
        new = {x for x in terms if x not in seen}
        seen |= new
        cum_t += len(terms)
        cum_v += len(new)
        want.append((d, len(terms), len(new), cum_t, cum_v))
    assert got == want


@settings(**_SETTINGS)
@given(
    vocab=st.lists(
        st.tuples(
            st.sampled_from(["s1", "s2", "s3", "s4"]),
            st.sampled_from("abcdefgh"),
        ),
        min_size=0,
        max_size=30,
    ).map(lambda xs: sorted(set(xs)))
)
def test_vocab_jaccard_matches_bruteforce(spark, vocab):
    from pyspark.sql import functions as F

    from kittispark.queries.corpus_analytics import vocab_jaccard_pairs

    df = spark.createDataFrame(
        vocab or [("x", "y")], "source string, term string"
    ).where(F.lit(bool(vocab)))
    got = {
        (r.source_a, r.source_b): (
            r.vocab_a,
            r.vocab_b,
            r.n_common,
            r.jaccard,
        )
        for r in vocab_jaccard_pairs(df).collect()
    }

    sets: dict[str, set[str]] = {}
    for s, term in vocab:
        sets.setdefault(s, set()).add(term)
    want = {}
    srcs = sorted(sets)
    for i, a in enumerate(srcs):
        for b in srcs[i + 1 :]:
            inter = len(sets[a] & sets[b])
            if inter == 0:
                continue  # absent by inner-join contract
            union = len(sets[a] | sets[b])
            want[(a, b)] = (
                len(sets[a]),
                len(sets[b]),
                inter,
                round(inter / union, 4),
            )
    assert got == want


@settings(**_SETTINGS)
@given(
    vecs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=1),  # label
            st.lists(
                st.integers(min_value=-1000, max_value=1000).map(
                    lambda v: v / 512.0  # exact in binary -> micro-exact
                ),
                min_size=3,
                max_size=3,
            ),
        ),
        min_size=1,
        max_size=12,
    )
)
def test_centroid_outlier_rank_matches_bruteforce(spark, vecs):
    from pyspark.sql import types as T

    from kittispark.queries.similarity import centroid_outlier_topk

    rows = [(i, lab, [float(x) for x in v]) for i, (lab, v) in enumerate(vecs)]
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("label", T.IntegerType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )
    got = [
        (r.label, r.vec_id, r.rk)
        for r in centroid_outlier_topk(
            spark.createDataFrame(rows, schema), k=3
        ).collect()
    ]

    # exact model in integer micros via Fractions (values chosen
    # representable so float->micro rounding is unambiguous)
    by_label: dict[int, list[tuple[int, list[int]]]] = {}
    for i, lab, v in rows:
        by_label.setdefault(lab, []).append(
            (i, [round(x * 1_000_000) for x in v])
        )
    want = []
    for lab in sorted(by_label):
        pts = by_label[lab]
        n = len(pts)
        sums = [sum(p[1][d] for p in pts) for d in range(3)]
        scored = sorted(
            (
                (
                    -sum(
                        (n * xm[d] - sums[d]) ** 2 for d in range(3)
                    ),
                    vid,
                )
                for vid, xm in pts
            ),
        )
        for rk, (_, vid) in enumerate(scored[:3], start=1):
            want.append((lab, vid, rk))
    assert got == want


@settings(**_SETTINGS)
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["a", "b", None]),  # group (NULL is a group)
            st.integers(min_value=-50, max_value=50),  # value
        ),
        min_size=1,
        max_size=30,
    )
)
def test_grouped_rank_matches_sorted_model(spark, rows):
    from pyspark.sql import functions as F

    from kittispark.operators.analytics import grouped_rank

    df = spark.createDataFrame(
        [(g, v, i) for i, (g, v) in enumerate(rows)],
        "g string, v long, id long",
    )
    got = {
        (r.g, r.id): (r["rank"], r.n_group)
        for r in grouped_rank(
            df, ["g"], F.col("v"), F.col("id")
        ).collect()
    }
    by_g: dict[object, list[tuple[int, int]]] = {}
    for i, (g, v) in enumerate(rows):
        by_g.setdefault(g, []).append((v, i))
    want = {}
    for g, items in by_g.items():
        for rk, (_, i) in enumerate(sorted(items), start=1):
            want[(g, i)] = (rk, len(items))
    assert got == want


def _r6(x: float) -> float:
    """HALF_UP round to 6 places on the shortest decimal repr — the
    Spark/DuckDB convention (Python's built-in round is half-even
    and forks on exact .5 grid midpoints like 5e-07)."""
    import decimal

    return float(
        decimal.Decimal(repr(x)).quantize(
            decimal.Decimal("1e-6"), rounding=decimal.ROUND_HALF_UP
        )
    )


def _trim_model(vals: list[int]):
    n = len(vals)
    k = n // 10
    s = sorted(vals)
    mid = s[k : n - k]
    lo, hi = s[k], s[n - k - 1]
    return (
        n,
        k,
        _r6(sum(s) / n / 1e6),
        _r6(sum(mid) / (n - 2 * k) / 1e6),
        _r6((sum(mid) + k * lo + k * hi) / n / 1e6),
    )


@settings(**_SETTINGS)
@given(
    vals=st.lists(
        st.integers(min_value=-(10**9), max_value=10**9),
        min_size=1,
        max_size=40,
    )
)
def test_trimmed_winsorized_matches_sorted_model(spark, vals, tmp_path_factory):
    """Drive the registered query through a synthetic events table:
    one event_type, values chosen as exact micro-multiples so the
    float->micro scaling is unambiguous."""
    import duckdb

    from kittispark import registry

    d = tmp_path_factory.mktemp("trimfix")
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE ev AS SELECT "
        "CAST(i AS BIGINT) AS event_id, "
        "TIMESTAMP '2024-01-01' + INTERVAL (i) SECOND AS ts, "
        "CAST(1 AS BIGINT) AS user_id, "
        "'click' AS event_type, "
        "CAST(v AS DOUBLE) / 1e6 AS value, "
        "'{}' AS props "
        "FROM (SELECT unnest(range(len($vals))) AS i, "
        "unnest($vals) AS v)",
        {"vals": [float(v) for v in vals]},
    )
    con.execute(f"COPY ev TO '{d}/events.parquet' (FORMAT PARQUET)")
    con.close()
    spec = registry.all_specs()["trimmed_winsorized_value"]
    row = spec.fn(spark, str(d)).collect()
    assert len(row) == 1
    r = row[0]
    n, k, mean, tmean, wmean = _trim_model(vals)
    assert (r.n, r.k_trim) == (n, k)
    assert r.mean == mean
    assert r.trimmed_mean == tmean
    assert r.winsor_mean == wmean
