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
