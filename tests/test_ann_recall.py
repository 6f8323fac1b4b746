"""ANN quality: the approximate variants must recover a meaningful
fraction of the exact brute-force top-k — otherwise bucketing "works"
only by discarding the answer."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from kittispark.operators.similarity import ann_ivf_topk, ann_lsh_topk, cosine_topk
from kittispark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF, "embeddings").cache()


def _pairs(df):
    return {(r["query_id"], r["neighbor_id"]) for r in df.collect()}


@pytest.fixture(scope="module")
def exact(emb):
    return _pairs(cosine_topk(emb, emb.filter(F.col("vec_id") < 5), k=5))


def test_ivf_recall(emb, exact):
    got = _pairs(ann_ivf_topk(emb, emb.filter(F.col("vec_id") < 5), k=5))
    recall = len(got & exact) / len(exact)
    assert recall >= 0.5, f"IVF recall {recall:.2f} below floor"


def test_lsh_recall(emb, exact):
    got = _pairs(ann_lsh_topk(emb, emb.filter(F.col("vec_id") < 5), dim=64, k=5))
    recall = len(got & exact) / len(exact)
    assert recall >= 0.3, f"LSH recall {recall:.2f} below floor"


def test_ivf_returns_k_per_query(emb):
    out = ann_ivf_topk(emb, emb.filter(F.col("vec_id") < 5), k=5)
    per_q = {r["query_id"]: r["n"] for r in
             out.groupBy("query_id").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(per_q) == {0, 1, 2, 3, 4}
    assert all(n == 5 for n in per_q.values())
