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

import os

from pyspark.sql import DataFrame, SparkSession

from kittispark.sources.tables import load_table


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def table_rows(sf_dir: str, name: str) -> int:
    """Row count of a source table from parquet FOOTER metadata only
    (no data read, no Spark job) — the sizeInBytes-style statistic a
    query builder needs to choose a join strategy for a DERIVED
    subtree, which Catalyst cannot estimate without CBO stats (a
    filtered/joined side has unknown cardinality at plan time, so the
    planner falls back to sort-merge and only AQE can fix it after
    the shuffle already ran). Supports a single .parquet file or a
    directory of part files. Returns a large sentinel on any metadata
    error so callers degrade to the shuffle path, never the reverse."""
    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, f"{name}.parquet")
    try:
        if os.path.isdir(path):
            # Walk recursively: partitioned layouts nest part files in
            # key=value subdirectories. An empty/partless directory
            # must return the sentinel, NOT 0 — a 0 would force-
            # broadcast an arbitrarily large table, the exact inverse
            # of the degrade-to-shuffle fail-safe.
            parts = [
                os.path.join(root, f)
                for root, _dirs, files in os.walk(path)
                for f in files
                if f.endswith(".parquet")
            ]
            if not parts:
                return 1 << 62
            return sum(
                pq.ParquetFile(p).metadata.num_rows for p in parts
            )
        return pq.ParquetFile(path).metadata.num_rows
    except Exception:
        return 1 << 62
