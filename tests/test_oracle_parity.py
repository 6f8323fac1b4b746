"""Driver-gate rehearsal: every registered query with an oracle twin
must match DuckDB exactly (columns, row count, order-insensitive
values) at sf0.001; rows-only queries must at least run and return a
stable schema. The driver repeats this at sf0.01.
"""

from __future__ import annotations

import pytest

from kittispark import registry
from tests.conftest import SF_SMOKE
from tests.oracle_harness import compare

SPECS = registry.all_specs()
WITH_ORACLE = sorted(n for n, s in SPECS.items() if s.oracle)
ROWS_ONLY = sorted(n for n, s in SPECS.items() if not s.oracle)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_parity(spark, name):
    spec = SPECS[name]
    df = spec.fn(spark, SF_SMOKE)
    compare(df, spec.oracle, SF_SMOKE, name)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, name):
    spec = SPECS[name]
    df = spec.fn(spark, SF_SMOKE)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
