"""Property tests for the governance/tokenizer wave against
brute-force Python models: the 12-bit blockwise average-hash (every
legal image geometry, adversarial flat/striped planes) and the NTILE
closed form used by curriculum_phase_mix (every (N, k=4) shape,
including N < k, N % 4 != 0, and the single-row corpus).

The DuckDB oracles already adjudicate both on the fixture tables;
these cover input shapes the fixtures can't reach, with an
independent model — the brute-vs-composed pattern of
test_graph_property."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from kittispark.queries.multimodal import ahash_12bit


def _brute_ahash(pixels: np.ndarray) -> int:
    """Independent model: per-cell membership by explicit loops,
    threshold via exact Fraction comparison of means."""
    from fractions import Fraction

    h, w, _ = pixels.shape
    cells: dict[int, list[int]] = {i: [] for i in range(12)}
    for y in range(h):
        for x in range(w):
            lum = int(pixels[y, x, 0]) + int(pixels[y, x, 1]) + int(
                pixels[y, x, 2]
            )
            cell = (y * 3 // h) * 4 + (x * 4 // w)
            cells[cell].append(lum)
    allv = [v for vs in cells.values() for v in vs]
    mean_all = Fraction(sum(allv), len(allv))
    out = 0
    for c, vs in cells.items():
        if vs and Fraction(sum(vs), len(vs)) > mean_all:
            out |= 1 << c
    return out


@given(
    w=st.integers(min_value=4, max_value=8),
    h=st.integers(min_value=3, max_value=6),
    data=st.data(),
)
@settings(max_examples=50, deadline=None)
def test_ahash_matches_brute_model(w, h, data):
    n = w * h * 3
    flat = data.draw(
        st.lists(
            st.integers(min_value=0, max_value=255), min_size=n, max_size=n
        )
    )
    pixels = np.array(flat, dtype="uint8").reshape(h, w, 3)
    assert ahash_12bit(pixels) == _brute_ahash(pixels)


def test_ahash_flat_plane_has_no_bits():
    """A constant image: no cell mean strictly exceeds the global
    mean, so the hash is exactly 0 (the strict > contract)."""
    for v in (0, 128, 255):
        pixels = np.full((4, 5, 3), v, dtype="uint8")
        assert ahash_12bit(pixels) == 0


def _ntile_model(n: int, k: int = 4) -> list[int]:
    """SQL-standard NTILE: the first n % k buckets take
    ceil(n / k) rows, the rest floor(n / k) — larger buckets first."""
    q, rem = divmod(n, k)
    out = []
    for b in range(1, k + 1):
        out.extend([b] * (q + 1 if b <= rem else q))
    return out


def _closed_form(r: int, n: int) -> int:
    """The expression curriculum_phase_mix evaluates per row."""
    q, rem = divmod(n, 4)
    cutoff = rem * (q + 1)
    if r <= cutoff:
        return (r - 1) // (q + 1) + 1
    return rem + (r - cutoff - 1) // max(q, 1) + 1


@given(n=st.integers(min_value=1, max_value=200))
@settings(max_examples=60, deadline=None)
def test_ntile_closed_form_matches_model(n):
    model = _ntile_model(n)
    got = [_closed_form(r, n) for r in range(1, n + 1)]
    assert got == model


def _kn_brute(pairs: list[tuple[str, str]]):
    """Textbook interpolated Kneser-Ney (d = 3/4) with exact
    Fractions — independent of the integer-lattice form the query
    evaluates."""
    from collections import Counter, defaultdict
    from fractions import Fraction

    c12 = Counter(pairs)
    c1 = defaultdict(int)
    nf = defaultdict(int)
    nb = defaultdict(int)
    for (w1, w2), c in c12.items():
        c1[w1] += c
        nf[w1] += 1
        nb[w2] += 1
    B = len(c12)
    d = Fraction(3, 4)

    def p(w1, w2):
        disc = max(Fraction(c12[(w1, w2)]) - d, Fraction(0)) / c1[w1]
        lam = d * nf[w1] / c1[w1]
        pcont = Fraction(nb[w2], B)
        return disc + lam * pcont

    return c12, c1, nf, nb, B, p


@given(
    st.lists(
        st.tuples(
            st.sampled_from("abcde"), st.sampled_from("abcde")
        ),
        min_size=1,
        max_size=60,
    )
)
@settings(max_examples=40, deadline=None)
def test_kneser_ney_integer_lattice_matches_textbook_and_sums_to_one(pairs):
    from fractions import Fraction

    c12, c1, nf, nb, B, p = _kn_brute(pairs)
    # 1) the query's single-denominator integer form equals the
    #    textbook Fraction form exactly, for every observed bigram
    for (w1, w2), c in c12.items():
        num = max(4 * c - 3, 0) * B + 3 * nf[w1] * nb[w2]
        den = 4 * c1[w1] * B
        assert Fraction(num, den) == p(w1, w2), (w1, w2)
    # 2) interpolated KN is a proper distribution: for every context,
    #    summing over the WHOLE continuation vocab gives exactly 1
    vocab = set(nb)
    for w1 in c1:
        total = sum(p(w1, w2) for w2 in vocab)
        assert total == 1, (w1, total)


def test_delta_sign_fingerprint_matches_brute():
    """Exhaustive over the synth lattice (all 29 streams) plus random
    int16 streams: bit k must equal the strict comparison
    s[k+1] > s[k], and amplitude scaling must not change the hash
    (the invariance the operator claims)."""
    import numpy as np

    from kittispark.queries.multimodal import (
        _AFP_BITS,
        delta_sign_fingerprint,
    )

    def brute(s):
        out = 0
        for k in range(_AFP_BITS):
            if int(s[k + 1]) > int(s[k]):
                out |= 1 << k
        return out

    for aid in range(29):
        i = np.arange(50 + aid % 13, dtype="int64")
        s = (((aid * 31 + i * 7) % 201) - 100) * 50
        assert delta_sign_fingerprint(s) == brute(s)
        # amplitude invariance: positive scaling preserves every bit
        assert delta_sign_fingerprint(s * 3) == delta_sign_fingerprint(s)
    rng = np.random.default_rng(7)
    for _ in range(20):
        s = rng.integers(-32768, 32767, size=64, dtype="int64")
        assert delta_sign_fingerprint(s) == brute(s)


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-100, max_value=100),
            st.integers(min_value=-100, max_value=100),
        ),
        min_size=1,
        max_size=25,
        unique=True,
    )
)
@settings(max_examples=30, deadline=None)
def test_kcenter_greedy_matches_brute_model(points):
    """The coreset query's selection rule (seed = lowest id, then
    argmax of min-distance with lower-id tiebreak) against a brute
    Python model on random integer point sets — covers duplicate
    points, collinear sets, and k > n."""
    k = 6
    ids = list(range(len(points)))

    def d2(a, b):
        return (points[a][0] - points[b][0]) ** 2 + (
            points[a][1] - points[b][1]
        ) ** 2

    sel = [0]
    order = [(1, 0, None)]
    for r in range(2, k + 1):
        cands = [i for i in ids if i not in sel]
        if not cands:
            break
        best = max(cands, key=lambda i: (min(d2(i, s) for s in sel), -i))
        order.append((r, best, min(d2(best, s) for s in sel)))
        sel.append(best)
    # independent re-derivation with explicit sorting
    sel2 = [0]
    for r in range(2, k + 1):
        cands = sorted(
            ((min(d2(i, s) for s in sel2), i) for i in ids if i not in sel2),
            key=lambda t: (-t[0], t[1]),
        )
        if not cands:
            break
        sel2.append(cands[0][1])
    assert [v for _, v, _ in order] == sel2
