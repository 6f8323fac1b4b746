"""Repeated-application invariance (VERDICT r4 #8): operators that
claim idempotent / recompute-equivalent maintenance semantics must
hold them under N >= 3 sequential applications, not just the single
step the registered gates exercise.

- ivf_append_index: N sequential batch appends == one union append
  == full in-memory assignment against the same base-trained
  centroids (served results row-identical).
- merge_user_state: folding per-batch aggregates over any N-way
  split and any batch ORDER equals the one-shot batch aggregate
  (the property that makes foreachBatch MERGE batch-boundary- and
  retry-order-invariant).
"""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_ivf_append_n_sequential_equals_union_and_full(spark, tmp_path_factory):
    from kittispark.operators.similarity import (
        ann_ivf_topk_indexed,
        ivf_append_index,
        ivf_write_index,
    )
    from kittispark.sources.tables import load_table

    emb = load_table(spark, SF, "embeddings")
    base = emb.filter(F.pmod("vec_id", F.lit(5)) == 4)  # 20% base
    batches = [
        emb.filter(F.pmod("vec_id", F.lit(5)) == i) for i in range(4)
    ]
    queries = emb.filter(F.col("vec_id") < 5)

    # index A: three-plus sequential appends (N = 4)
    idx_seq = str(tmp_path_factory.mktemp("ivfrep") / "seq")
    ivf_write_index(base, idx_seq)
    for b in batches:
        ivf_append_index(spark, idx_seq, b)

    # index B: identical base build (training is deterministic:
    # lowest-id donors + GEMM assignment), ONE union append
    idx_one = str(tmp_path_factory.mktemp("ivfrep") / "one")
    ivf_write_index(base, idx_one)
    union = batches[0]
    for b in batches[1:]:
        union = union.unionByName(b)
    ivf_append_index(spark, idx_one, union)

    served_seq = ann_ivf_topk_indexed(spark, idx_seq, queries, k=5, nprobe=2)
    served_one = ann_ivf_topk_indexed(spark, idx_one, queries, k=5, nprobe=2)
    assert _rows(served_seq) == _rows(served_one)

    # and both equal serving an index built over the FULL corpus with
    # the SAME base-trained centroids (write base index, append all =
    # what idx_one already is) — so also against in-memory assignment
    import numpy as np

    from kittispark.operators.similarity import (
        _assign_nearest,
        _assigned_corpus,
        _score_bucketed_topk,
        as_double,
        norm,
    )

    cent_rows = spark.read.parquet(f"{idx_seq}/centroids").orderBy("cid").collect()
    cents = np.array([r["centroid"] for r in cent_rows], dtype="float64")
    norm_c = cents / np.linalg.norm(cents, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast(norm_c)
    c = _assigned_corpus(emb, cents, "embedding", "vec_id", bc=bc).withColumn(
        "cn", norm(F.col("cv"))
    )
    q = (
        _assign_nearest(queries, cents, "embedding", "__c", nprobe=2, bc=bc)
        .select(
            F.col("vec_id").alias("query_id"),
            as_double("embedding").alias("qv"),
            F.explode("__c").alias("cid"),
        )
        .withColumn("qn", norm(F.col("qv")))
    )
    assert _rows(served_seq) == _rows(_score_bucketed_topk(c, q, 5))

    # appends are append-mode file adds: every batch's rows are in
    # the corpus exactly once
    n_idx = spark.read.parquet(f"{idx_seq}/corpus").count()
    assert n_idx == emb.count()


def test_merge_fold_equals_batch_agg_for_n_splits_and_any_order(spark):
    from kittispark.queries.streaming import merge_user_state, user_event_agg
    from kittispark.sources.tables import load_table

    ev = load_table(spark, SF, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    expected = _rows(user_event_agg(ev))

    for n, order in ((3, None), (5, "reversed")):
        parts = [ev.filter(F.pmod("event_id", F.lit(n)) == i) for i in range(n)]
        if order == "reversed":
            parts = parts[::-1]
        state = user_event_agg(parts[0])
        for p in parts[1:]:
            state = merge_user_state(state, user_event_agg(p))
        assert _rows(state) == expected, f"n={n} order={order}"

    # re-merging an EMPTY batch is the identity (a retried trigger
    # that read no new files must not perturb the silver state)
    empty = user_event_agg(ev.filter(F.lit(False)))
    state = merge_user_state(user_event_agg(ev), empty)
    assert _rows(state) == expected
