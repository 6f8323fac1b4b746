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

import functools
import importlib
import os
import tempfile
import zipfile
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


_SHIPPED: set[str] = set()


def ensure_package_shipped(spark: SparkSession) -> None:
    """Ship the kittispark package to executor Python workers
    (sc.addPyFile — the programmatic form of `spark-submit
    --py-files`). Python kernels are pickled with references to this
    module, so workers must be able to import it no matter what the
    driver's cwd/PYTHONPATH is. Zipped once per process, added once
    per SparkContext."""
    sc = spark.sparkContext
    app = sc.applicationId
    if app in _SHIPPED:
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zip_path = os.path.join(
        tempfile.gettempdir(), f"kittispark-pyfiles-{os.getpid()}.zip"
    )
    if not os.path.exists(zip_path):
        with zipfile.ZipFile(zip_path, "w") as zf:
            for root, _, files in os.walk(pkg_dir):
                for fname in files:
                    if fname.endswith(".py"):
                        full = os.path.join(root, fname)
                        rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                        zf.write(full, rel)
    sc.addPyFile(zip_path)
    _SHIPPED.add(app)


def _shipping(fn: QueryFn) -> QueryFn:
    @functools.wraps(fn)
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        ensure_package_shipped(spark)
        return fn(spark, sf_dir)

    return run


def queries() -> dict[str, QueryFn]:
    return {name: _shipping(spec.fn) for name, spec in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in all_specs().items() if spec.oracle is not None
    }
