"""Operator-level contract tests for the round-5 extension wave:
binary sign packing / Hamming search, Z-order keys, and the
content-defined-chunking stability property the oracle can't
express (boundary survival under prefix insertion)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kittispark.operators.binaryvec import hamming_topk, sign_pack
from kittispark.operators.storage import zorder_key


def _pack_py(vec, word_bits=32):
    words = []
    for w in range((len(vec) + word_bits - 1) // word_bits):
        acc = 0
        for i, x in enumerate(vec[w * word_bits : (w + 1) * word_bits]):
            if x > 0:
                acc |= 1 << i
        words.append(acc)
    return words


def test_sign_pack_matches_python_model(spark):
    import random

    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(64)]) for i in range(20)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    got = {
        r.vec_id: (r.w0, r.w1)
        for r in sign_pack(df, dim=64).collect()
    }
    for vec_id, vec in rows:
        assert got[vec_id] == tuple(_pack_py(vec)), vec_id


def test_hamming_topk_matches_brute_force(spark):
    import random

    rng = random.Random(11)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(64)]) for i in range(40)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    packed = sign_pack(df, dim=64)
    got = hamming_topk(
        packed, packed.where(F.col("vec_id") < 3), n_words=2, k=4
    ).collect()

    py = {i: _pack_py(v) for i, v in rows}
    for q in range(3):
        expect = sorted(
            (
                (
                    bin(py[q][0] ^ py[c][0]).count("1")
                    + bin(py[q][1] ^ py[c][1]).count("1"),
                    c,
                )
                for c in py
                if c != q
            )
        )[:4]
        mine = sorted(
            (r.hamming, r.neighbor_id, r.rk)
            for r in got
            if r.query_id == q
        )
        assert [(h, c) for h, c, _ in mine] == expect
        assert [rk for _, _, rk in mine] == [1, 2, 3, 4]


def test_zorder_key_interleaves_bits(spark):
    df = spark.createDataFrame(
        [(x, y) for x in range(8) for y in range(8)], ["x", "y"]
    )
    got = {
        (r.x, r.y): r.z
        for r in df.select(
            "x", "y", zorder_key(F.col("x"), F.col("y"), 3).alias("z")
        ).collect()
    }

    def morton(x, y):
        z = 0
        for i in range(3):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    assert got == {(x, y): morton(x, y) for x in range(8) for y in range(8)}
    # all 64 cells distinct → it's a bijection on the 8x8 grid
    assert len(set(got.values())) == 64


def test_zorder_clusters_both_dims(spark):
    # every aligned 2x2 tile maps to one contiguous z-range of 4 —
    # the locality property that makes z-range bucketing prune on
    # either predicate column
    df = spark.createDataFrame(
        [(x, y) for x in range(8) for y in range(8)], ["x", "y"]
    )
    rows = df.select(
        "x", "y", zorder_key(F.col("x"), F.col("y"), 3).alias("z")
    ).collect()
    by_cell = {(r.x, r.y): r.z for r in rows}
    for tx in range(4):
        for ty in range(4):
            zs = sorted(
                by_cell[(2 * tx + dx, 2 * ty + dy)]
                for dx in (0, 1)
                for dy in (0, 1)
            )
            assert zs == list(range(zs[0], zs[0] + 4)), (tx, ty)


def _cdc_cuts(spark, texts):
    """Cut positions per doc via the registered operator's algebra."""
    from kittispark.operators.dedup import portable_hash64

    df = spark.createDataFrame(
        list(enumerate(texts)), ["doc_id", "text"]
    )
    cand = df.select(
        "doc_id",
        F.posexplode(
            F.expr(
                "CASE WHEN length(text) >= 8 "
                "THEN sequence(1, length(text) - 7) ELSE array() END"
            )
        ).alias("_p", "pos"),
        "text",
    ).select(
        "doc_id",
        "pos",
        (portable_hash64(F.expr("substring(text, pos, 8)")) % 64).alias(
            "hmod"
        ),
    )
    out: dict[int, list[int]] = {i: [] for i in range(len(texts))}
    for r in cand.where(F.col("hmod") == 0).collect():
        out[r.doc_id].append(r.pos)
    return {k: sorted(v) for k, v in out.items()}


def test_cdc_boundaries_survive_prefix_insertion(spark):
    # The defining CDC property: prepending bytes shifts every cut
    # by the insertion length but the SAME content boundaries
    # survive (unlike fixed-size chunking, where every boundary
    # moves to different content).
    base = (
        "the quick brown fox jumps over the lazy dog again and again "
        * 20
    )
    ins = "XYZ"
    cuts = _cdc_cuts(spark, [base, ins + base])
    shifted = [p + len(ins) for p in cuts[0]]
    # every original boundary beyond the 8-char window around the
    # insertion point reappears, shifted
    surviving = [p for p in shifted if p > len(ins) + 8]
    assert surviving and set(surviving) <= set(cuts[1])


def test_paragraph_dedup_rebuilds_duplicate_free_corpus(spark):
    # with no cross-doc duplicate chunks, every doc survives intact:
    # rebuilt_md5 == md5(original text)
    import hashlib

    from kittispark.queries.corpus_ext import paragraph_global_dedup

    texts = {
        r.doc_id: r.text
        for r in spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        )
        .limit(50)
        .collect()
    }
    out = {
        r.doc_id: (r.n_chunks, r.n_kept, r.rebuilt_md5)
        for r in paragraph_global_dedup(
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    intact = [
        d
        for d, txt in texts.items()
        if out[d][0] == out[d][1]
    ]
    assert intact, "expected at least one fully-surviving doc"
    for d in intact:
        assert (
            out[d][2] == hashlib.md5(texts[d].encode()).hexdigest()
        ), d
