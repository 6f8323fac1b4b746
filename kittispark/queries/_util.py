"""Shared helpers for registered queries.

Oracle-parity rules (driver hash-compares Spark vs DuckDB):
- alias every computed column identically on both sides;
- round float *aggregates* (sum/avg/percentile/products) on both
  sides — raw pass-through doubles are bit-identical and need none;
- never emit raw timestamps — cast to epoch seconds or format to a
  string identically on both sides;
- cast DuckDB's wider integer results (HUGEINT sums, BIGINT year())
  down to the Spark result type in the SQL twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kittispark.sources.tables import load_table


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)
