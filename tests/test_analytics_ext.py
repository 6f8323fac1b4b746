"""Invariant tests for the extended analytics family — properties the
oracle hash can't see (they hold in both engines even when both are
wrong the same way)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kittispark import registry
from tests.conftest import SF_SMOKE

SPECS = registry.all_specs()


@pytest.fixture(scope="module")
def run(spark):
    def _run(name):
        return SPECS[name].fn(spark, SF_SMOKE)

    return _run


def test_gapfill_spine_is_contiguous_per_user(run):
    df = run("timeseries_gapfill")
    # every user's day sequence has no holes: row count == span days
    spans = (
        df.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (
                F.datediff(F.max("day"), F.min("day")) + 1
            ).alias("span_days"),
        )
        .filter(F.col("n") != F.col("span_days"))
    )
    assert spans.count() == 0
    # filled_value is never null (first spine day is always observed)
    assert df.filter(F.col("filled_value").isNull()).count() == 0
    # gap rows exist at sf0.001 (users are not active every day)
    assert df.filter("is_gap").count() > 0


def test_gapfill_observed_days_keep_their_value(run, spark):
    df = run("timeseries_gapfill")
    from kittispark.queries._util import t

    ev = t(spark, SF_SMOKE, "events").filter(F.col("user_id") < 20)
    daily = ev.groupBy(
        "user_id", F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day")
    ).agg(
        (
            F.sum(F.round(F.col("value") * 100, 0).cast("long")).cast("double")
            / 100
        ).alias("expect")
    )
    bad = (
        df.filter(~F.col("is_gap"))
        .join(daily, ["user_id", "day"])
        .filter(F.col("filled_value") != F.col("expect"))
    )
    assert bad.count() == 0


def test_rrf_exactly_topk_per_query_and_bounded_scores(run):
    df = run("rank_fusion_rrf")
    counts = df.groupBy("query_id").agg(F.count(F.lit(1)).alias("n"))
    assert counts.filter(F.col("n") != 10).count() == 0
    # rrf score is in (0, 2/61] up to the round(6) emission: best
    # possible is rank 1 in both lists
    assert (
        df.filter(
            (F.col("rrf_score") <= 0) | (F.col("rrf_score") > 2.0 / 61 + 1e-6)
        ).count()
        == 0
    )


def test_intra_doc_dedup_idempotent_and_order_preserving(run, spark):
    df = run("intra_doc_chunk_dedup").cache()
    # kept never exceeds total, and clean_text word count == 8*full
    # chunks + tail remainder (no words invented or dropped twice)
    assert df.filter(F.col("n_kept") > F.col("n_chunks")).count() == 0
    # a doc with no repeated chunks round-trips verbatim
    from kittispark.queries._util import t

    docs = t(spark, SF_SMOKE, "documents").select("doc_id", "text")
    verbatim = (
        df.filter(F.col("n_kept") == F.col("n_chunks"))
        .join(docs, "doc_id")
        .filter(F.col("clean_text") != F.col("text"))
    )
    assert verbatim.count() == 0
    df.unpersist()


def test_pagerank_mass_is_conserved(run):
    df = run("pagerank_nation_flow")
    assert df.count() == 25
    # damped PR over a graph with no dangling mass sums to ~1.0
    for colname in ("pr_iter1", "pr_iter2"):
        total = df.agg(F.sum(colname)).first()[0]
        assert abs(total - 1.0) < 1e-3, (colname, total)


def test_systematic_sample_hits_target_size(run):
    df = run("systematic_weighted_sample").cache()
    # total picks == k exactly (intervals partition [0, total))
    assert df.agg(F.sum("picks")).first()[0] == 50
    assert df.filter(F.col("picks") < 1).count() == 0
    df.unpersist()


# ---- operator-level edge inputs (constructed, not fixture-bound) ----


def test_gapfill_single_day_key(spark):
    from kittispark.operators.analytics import gapfill_daily

    df = spark.createDataFrame(
        [(1, "2024-03-05 10:00:00", 2.5), (1, "2024-03-05 11:00:00", 1.5)],
        ["k", "ts", "v"],
    ).select("k", F.col("ts").cast("timestamp").alias("ts"), "v")
    rows = gapfill_daily(df, "k", "ts", "v").collect()
    assert len(rows) == 1
    assert rows[0].day == "2024-03-05"
    assert rows[0].filled_value == 4.0
    assert rows[0].is_gap is False


def test_gapfill_fills_interior_gap_with_last_value(spark):
    from kittispark.operators.analytics import gapfill_daily

    df = spark.createDataFrame(
        [(7, "2024-01-01 00:00:00", 3.0), (7, "2024-01-04 00:00:00", 9.0)],
        ["k", "ts", "v"],
    ).select("k", F.col("ts").cast("timestamp").alias("ts"), "v")
    out = {r.day: (r.filled_value, r.is_gap) for r in gapfill_daily(df, "k", "ts", "v").collect()}
    assert out == {
        "2024-01-01": (3.0, False),
        "2024-01-02": (3.0, True),
        "2024-01-03": (3.0, True),
        "2024-01-04": (9.0, False),
    }


def test_dedup_chunks_short_doc_verbatim(spark):
    from kittispark.operators.analytics import dedup_chunks

    df = spark.createDataFrame([(1, "just five words right here")], ["doc_id", "text"])
    r = dedup_chunks(df).collect()[0]
    assert r.clean_text == "just five words right here"
    assert (r.n_chunks, r.n_kept) == (1, 1)


def test_dedup_chunks_removes_exact_repeat_keeps_order(spark):
    from kittispark.operators.analytics import dedup_chunks

    rep = "a b c d e f g h"
    text = f"{rep} x1 x2 x3 x4 x5 x6 x7 x8 {rep} tail"
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    r = dedup_chunks(df).collect()[0]
    assert r.clean_text == f"{rep} x1 x2 x3 x4 x5 x6 x7 x8 tail"
    assert (r.n_chunks, r.n_kept) == (4, 3)


def test_pps_sample_heavy_item_earns_multiple_picks(spark):
    from kittispark.operators.analytics import pps_systematic_sample

    # one item holds 60% of the mass -> with k=5 it must take >= 2 picks
    df = spark.createDataFrame(
        [(1, 10), (2, 60), (3, 10), (4, 10), (5, 10)], ["id", "wt"]
    )
    out = pps_systematic_sample(df, "id", "wt", k=5, bucket_size=2)
    rows = {r.id: r.picks for r in out.collect()}
    assert sum(rows.values()) == 5
    assert rows[2] >= 2


def test_pagerank_uniform_on_symmetric_cycle(spark):
    from kittispark.operators.analytics import pagerank

    # a directed 4-cycle is weight-symmetric: PR stays uniform at 1/4
    edges = spark.createDataFrame(
        [(0, 1, 1), (1, 2, 1), (2, 3, 1), (3, 0, 1)], ["src", "dst", "w"]
    )
    nodes = spark.createDataFrame([(i,) for i in range(4)], ["node"])
    rows = pagerank(edges, nodes, iters=3).collect()
    for r in rows:
        assert abs(r.pr - 0.25) < 1e-12


def test_pagerank_sink_node_accumulates(spark):
    from kittispark.operators.analytics import pagerank

    # 0 and 1 both point at 2; 2 points at 0. Node 2 must outrank both.
    edges = spark.createDataFrame(
        [(0, 2, 1), (1, 2, 1), (2, 0, 1)], ["src", "dst", "w"]
    )
    nodes = spark.createDataFrame([(0,), (1,), (2,)], ["node"])
    pr = {r.node: r.pr for r in pagerank(edges, nodes, iters=5).collect()}
    assert pr[2] > pr[0] > pr[1]
    # node 1 has no in-edges: exactly the teleport base
    assert abs(pr[1] - 0.15 / 3) < 1e-12


def test_global_rank_equals_window_row_number(spark):
    from pyspark.sql import Window as W2
    from kittispark.operators.analytics import global_rank

    df = spark.range(0, 997).select(
        F.col("id"), (F.xxhash64("id") % 100).alias("v")
    )
    got = global_rank(df, F.desc("v"), F.asc("id"), partitions=7)
    want = df.select(
        "id", F.row_number().over(W2.orderBy(F.desc("v"), F.asc("id"))).alias("xr")
    )
    diff = got.join(want, "id").filter(F.col("rank") != F.col("xr")).count()
    assert diff == 0


@pytest.mark.parametrize("n,k", [(7, 10), (100, 10), (103, 10), (9, 3), (1, 10)])
def test_ntile_formula_matches_native(spark, n, k):
    from pyspark.sql import Window as W2
    from kittispark.operators.analytics import ntile_from_rank

    df = spark.range(1, n + 1).select(F.col("id").alias("rank"))
    out = df.select(
        "rank",
        ntile_from_rank(F.col("rank"), F.lit(n), k).alias("formula"),
        F.ntile(k).over(W2.orderBy("rank")).alias("native"),
    )
    assert out.filter(F.col("formula") != F.col("native")).count() == 0


def test_decile_plan_has_no_global_data_window(spark):
    # the decile query must range-repartition and rank per partition,
    # never sort all user rows in one window partition
    import io, contextlib
    from kittispark import registry

    qs = registry.queries()
    spark.catalog.clearCache()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        qs["decile_spend_profile"](spark, SF_SMOKE).explain("formatted")
    plan = buf.getvalue()
    # global_rank now localCheckpoints its pid-stamped table (the AQE
    # pid-remap fix), so the visible plan TRUNCATES at the checkpoint:
    # the rangepartitioning exchange ran before the materialization
    # and shows as a Scan ExistingRDD. Accept either form; the real
    # invariant stays: no global ntile window over per-user rows.
    low = plan.lower()
    assert "rangepartitioning" in low or "existingrdd" in low, plan
    assert "ntile" not in low
