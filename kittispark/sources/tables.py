"""Readers for the driver's synthetic relational tables.

One parquet file per table under an ``sf_dir`` (see TESTDATA.md).
Plain ``spark.read.parquet`` so Catalyst gets full pushdown/pruning;
at 100 TB these would be partitioned/bucketed table roots and the same
call sites still apply (predicate → partition pruning for free).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any realistic scale
# (region=5, nation=25 rows; these are bounded by the real world, not
# by the scale factor).
BROADCAST_TABLES = frozenset({"region", "nation"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        return _load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet has carried two physical layouts for ``ts``
    across driver generations: TIMESTAMP(NANOS) (which Spark's
    parquet reader rejects unless nanos are read as long) and plain
    TIMESTAMP(MICROS). Branch on the type actually read so both
    work. For the nanos layout, convert with integer division
    (`div`, not `/`: the nanos epoch ~2^60 would lose precision
    through a double); truncation to micros matches what DuckDB does
    with the same file, so oracle comparisons agree."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    from pyspark.sql import functions as F

    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        # timestamp_ntz layout: cast to session-tz TIMESTAMP (UTC per
        # session.py) so downstream plans and collected values are
        # identical to the nanos path.
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> tuple[DataFrame, ...]:
    return tuple(load_table(spark, sf_dir, n) for n in (names or TABLES))
