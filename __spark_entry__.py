"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over ``kittispark.registry``: every implemented operator
from SURVEY.md §2 (plus the north-star dedup/similarity/text/
multimodal extensions) registers a named query with, where
SQL-expressible, a DuckDB oracle twin. The driver runs ``entry`` as a
smoke check, then each ``queries()[name]`` at sf=0.01 against
``oracle_sql()[name]``.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from kittispark import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing-summary shape) on sf0.001."""
    return registry.queries()["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    return registry.oracle_sql()
