"""Sketch aggregates must land within documented error bounds."""

from __future__ import annotations

from pyspark.sql import functions as F

from kittispark.sources.tables import load_table

SF = "/root/testdata/sf0.01"


def test_approx_count_distinct_within_3pct(spark):
    orders = load_table(spark, SF, "orders")
    approx = orders.agg(F.approx_count_distinct("o_custkey", rsd=0.01)).collect()[0][0]
    exact = orders.select("o_custkey").distinct().count()
    assert abs(approx - exact) / exact < 0.03, (approx, exact)


def test_percentile_approx_close_to_exact(spark):
    events = load_table(spark, SF, "events")
    both = events.groupBy("user_id").agg(
        F.percentile("value", 0.5).alias("exact"),
        F.percentile_approx("value", 0.5, 10000).alias("approx"),
    )
    rows = both.collect()
    # approx returns a true sample value near the median; with ~100
    # obs per user the rank error at accuracy 10000 is tiny — allow a
    # small absolute band scaled by the value range (0..500).
    bad = [r for r in rows if abs(r["approx"] - r["exact"]) > 25.0]
    assert not bad, bad[:5]


def test_cms_never_undercounts(spark):
    # CMS point estimates are one-sided: est >= exact for EVERY token
    from kittispark.registry import all_specs
    from pyspark.sql import functions as F

    df = all_specs()["cms_heavy_hitters"].fn(spark, "/root/testdata/sf0.001")
    rows = df.collect()
    assert len(rows) == 20
    assert all(r.overest >= 0 for r in rows)
    assert all(r.est_cnt >= r.exact_cnt for r in rows)


def test_cms_unseen_token_estimates_zero_or_collision(spark):
    # a token never inserted must estimate 0 unless ALL its buckets
    # collide with real tokens — never silently vanish from output
    from pyspark.sql import functions as F
    from kittispark.operators.text import cms_estimate, cms_token_sketch

    toks = spark.createDataFrame([("a",), ("a",), ("b",)], ["tok"])
    sketch = cms_token_sketch(toks, "tok", depth=4, width=512)
    cand = spark.createDataFrame(
        [("a",), ("zzz_never_inserted",)], ["tok"]
    )
    rows = {r.tok: r.est_cnt for r in cms_estimate(cand, sketch).collect()}
    assert set(rows) == {"a", "zzz_never_inserted"}
    assert rows["a"] >= 2
    assert rows["zzz_never_inserted"] >= 0  # present, with a 0-or-collision estimate
