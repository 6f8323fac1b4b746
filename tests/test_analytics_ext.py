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
