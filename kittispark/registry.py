"""Named query registry.

Every operator the engine claims (SURVEY.md §2 + the LLM-data-pipeline
extensions) is registered here as a ``QuerySpec``: a callable
``(spark, sf_dir) -> DataFrame`` plus, where ANSI-SQL-expressible, the
equivalent DuckDB oracle SQL. ``__spark_entry__.queries()`` /
``oracle_sql()`` are thin views over this registry — the driver's
correctness gate runs both sides and hash-compares.

Column-name discipline: the driver sorts columns by name before
hashing, so every computed column is aliased identically in the Spark
code and the SQL. Float aggregates are rounded identically on both
sides so value hashes are stable across engines.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, "QuerySpec"] = {}

# Modules that register queries on import (kept explicit so a broken
# optional module can't silently drop half the surface).
_QUERY_MODULES = (
    "kittispark.queries.relational",
    "kittispark.queries.windows",
    "kittispark.queries.events",
    "kittispark.queries.text",
    "kittispark.queries.dedup",
    "kittispark.queries.similarity",
    "kittispark.queries.kitti",
    "kittispark.queries.multimodal",
    "kittispark.queries.streaming",
)


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None = None  # DuckDB SQL twin; None → rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


def register(
    name: str, oracle: str | None = None, doc: str = "", tags: tuple[str, ...] = ()
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(name, fn, oracle, doc or (fn.__doc__ or ""), tags)
        return fn

    return deco


def _load_all() -> None:
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)


def all_specs() -> dict[str, QuerySpec]:
    _load_all()
    return dict(_REGISTRY)


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in all_specs().items() if spec.oracle is not None
    }
