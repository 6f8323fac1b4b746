"""Physical-layout operators: file manifests, per-file zone maps,
and compaction planning over Spark's hidden ``_metadata`` file
column.

These are the table-maintenance primitives a 100 TB lakehouse runs
nightly: list what files a table really has, know each file's
min/max on the clustering key (the zone map that makes data skipping
work), and plan small-file compaction. The manifest is METADATA-
scale — one row per file, not per data row — but at 100 TB that is
still 10^5–10^7 rows, so nothing here funnels it through a driver
collect or a single-partition window: ordering/prefix sums go
through operators.analytics.global_rank / global_cumsum.

The registered twin queries (queries/storage_ops.py) run the same
planning algebra over a DATA-DERIVED manifest so a DuckDB oracle can
value-adjudicate the logic; these physical forms are pin-tested
against real Spark writes in tests/test_storage_ops.py (file sizes
are not SQL-derivable, so byte-level physics is a pytest contract,
not an oracle one).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def _basename(col: Column) -> Column:
    return F.regexp_extract(col, r"([^/]+)$", 1)


def file_manifest(spark: SparkSession, root: str) -> DataFrame:
    """(file, bytes, n_rows) — one row per physical parquet file
    under ``root``, from the hidden ``_metadata`` struct the parquet
    source attaches (file path/size come from the driver-side file
    index; row counts from a count agg grouped by file). The scan
    reads ZERO data columns — column pruning leaves only the
    constant-per-file metadata struct — so the manifest costs a
    footer-weight pass regardless of table width."""
    df = spark.read.parquet(root).select(
        F.col("_metadata.file_path").alias("__p"),
        F.col("_metadata.file_size").alias("bytes"),
    )
    return (
        df.groupBy(_basename(F.col("__p")).alias("file"), "bytes")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


def file_zonemaps(
    spark: SparkSession, root: str, key_col: str
) -> DataFrame:
    """(file, key_min, key_max, n_rows) — the per-file min/max zone
    map on ``key_col``. A write clustered on the key (repartition-
    by-range + sortWithinPartitions) yields non-overlapping zones, so
    a point/range predicate prunes all but O(1) files; a hash-
    scattered write yields full-span zones and prunes nothing. This
    recomputes the stats from data (one key column scanned); parquet
    footers carry the same min/max, so production skipping is free —
    the operator exists to AUDIT how prunable a layout actually is."""
    df = spark.read.parquet(root).select(
        _basename(F.col("_metadata.file_path")).alias("file"),
        F.col(key_col).alias("__k"),
    )
    return df.groupBy("file").agg(
        F.min("__k").alias("key_min"),
        F.max("__k").alias("key_max"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def compaction_bins(
    manifest: DataFrame,
    bytes_col: str = "bytes",
    order_col: str = "file",
    target_bytes: int | None = None,
    n_groups: int | None = None,
) -> DataFrame:
    """Assign every manifest row a ``compaction_group`` by binning
    the EXCLUSIVE running total of bytes: a file lands in the group
    its start offset falls in, so every group's payload is within
    one max-file of the target — the standard greedy first-fit-by-
    cumulative-size compaction planner (what Delta OPTIMIZE /
    Iceberg rewrite_data_files do per partition). Exactly one of
    ``target_bytes`` / ``n_groups``; with ``n_groups`` the target is
    total/n (computed via a 1-row broadcast, never a collect). The
    running total is global_cumsum — range-repartition + two-level
    prefix sum, no single-partition window over the manifest."""
    from kittispark.operators.analytics import global_cumsum

    if (target_bytes is None) == (n_groups is None):
        raise ValueError("exactly one of target_bytes / n_groups")
    cum = global_cumsum(
        manifest, bytes_col, F.col(order_col).asc(), out_col="__cum"
    )
    if n_groups is not None:
        tot = manifest.agg(F.sum(bytes_col).alias("__tot"))
        cum = cum.crossJoin(F.broadcast(tot))
        grp = F.floor(F.col("__cum") * n_groups / F.col("__tot"))
        # a zero-byte tail row would index group n: clamp into range
        grp = F.least(grp, F.lit(n_groups - 1))
        out = cum.withColumn("compaction_group", grp.cast("int")).drop("__tot")
    else:
        out = cum.withColumn(
            "compaction_group",
            F.floor(F.col("__cum") / F.lit(target_bytes)).cast("int"),
        )
    return out.drop("__cum")


def zorder_key(x: Column, y: Column, bits: int = 3) -> Column:
    """Morton (Z-order) interleave of two ``bits``-bit bucket ids
    into one 2*bits-bit clustering key: bit i of x lands at position
    2i, bit i of y at 2i+1. Pure integer expression (whole-stage
    codegen); the standard multi-dimensional clustering key behind
    Delta OPTIMIZE ZORDER BY / Iceberg sort orders — range-
    partitioning by z keeps BOTH dimensions locally clustered, so
    zone maps prune on either predicate column."""
    z: Column = F.lit(0)
    for i in range(bits):
        z = z + F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
        z = z + F.shiftleft(
            F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1
        )
    return z
