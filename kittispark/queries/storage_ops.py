"""Storage-layout planning queries: compaction binning and zone-map
skip auditing.

Each runs the SAME planning algebra as the physical operators in
operators/storage.py (file_manifest / file_zonemaps / compaction_bins
over Spark's hidden ``_metadata`` column) but over a DATA-DERIVED
manifest, so a DuckDB oracle can value-adjudicate every group
assignment and prunability verdict. The physical file-level forms —
whose byte sizes no SQL twin can recompute — are contract-tested
against real Spark writes in tests/test_storage_ops.py; together the
pair covers both halves: the physics (pytest) and the planning logic
(driver oracle gate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kittispark.registry import register
from kittispark.queries._util import t

# Compaction plan shape: 64 input shards dealt by doc_id, packed
# into 8 output groups by cumulative size.
_N_SHARDS, _N_GROUPS = 64, 8


@register(
    "compaction_bin_plan",
    oracle=f"""
    WITH m AS (
        SELECT CAST(doc_id % {_N_SHARDS} AS BIGINT) AS shard,
               CAST(sum(n_chars) AS BIGINT) AS bytes
        FROM documents GROUP BY 1
    ),
    c AS (
        SELECT shard, bytes,
               coalesce(sum(bytes) OVER (
                   ORDER BY shard
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS cum,
               sum(bytes) OVER () AS tot
        FROM m
    )
    SELECT CAST(least(floor(cum * {_N_GROUPS}.0 / tot),
                      {_N_GROUPS - 1}) AS INT) AS compaction_group,
           CAST(count(*) AS BIGINT) AS n_shards,
           CAST(sum(bytes) AS BIGINT) AS group_bytes,
           CAST(min(shard) AS BIGINT) AS first_shard,
           CAST(max(shard) AS BIGINT) AS last_shard
    FROM c GROUP BY 1
    """,
    doc="Small-file compaction planning (the Delta OPTIMIZE / "
    "Iceberg rewrite_data_files shape): a 64-shard manifest (shard = "
    "doc_id % 64, payload = its documents' byte mass) is packed into "
    "8 compaction groups by binning each shard's EXCLUSIVE running "
    "byte total — greedy first-fit-by-cumulative-size, every group "
    "within one max-shard of total/8. The running total is "
    "operators.analytics.global_cumsum (range-repartition + "
    "two-level prefix sum — the manifest is metadata-scale, but at "
    "100 TB that is still millions of files, so no single-partition "
    "window); the total enters as a 1-row broadcast, never a "
    "collect. operators/storage.py:compaction_bins applies the "
    "identical binning to REAL file manifests from the _metadata "
    "column (pytest-pinned; physical sizes are not SQL-derivable).",
    tags=("storage", "plan"),
)
def compaction_bin_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kittispark.operators.storage import compaction_bins

    manifest = (
        t(spark, sf_dir, "documents")
        .groupBy((F.col("doc_id") % _N_SHARDS).alias("shard"))
        .agg(F.sum("n_chars").alias("bytes"))
    )
    binned = compaction_bins(
        manifest, "bytes", "shard", n_groups=_N_GROUPS
    )
    return binned.groupBy("compaction_group").agg(
        F.count(F.lit(1)).alias("n_shards"),
        F.sum("bytes").alias("group_bytes"),
        F.min("shard").alias("first_shard"),
        F.max("shard").alias("last_shard"),
    )


@register(
    "zonemap_skip_audit",
    oracle="""
    WITH e AS (
        SELECT event_id, CAST(ts AS DATE) AS d FROM events
    ),
    span AS (
        SELECT min(d) AS d0, max(d) AS d1 FROM e
    ),
    b AS (
        SELECT 'clustered' AS layout,
               CAST(floor(date_diff('day', d0, d) * 8.0
                          / (date_diff('day', d0, d1) + 1)) AS INT) AS bucket,
               d
        FROM e, span
        UNION ALL
        SELECT 'hash' AS layout,
               CAST(event_id % 8 AS INT) AS bucket,
               d
        FROM e
    ),
    z AS (
        SELECT layout, bucket,
               CAST(count(*) AS BIGINT) AS n_rows,
               strftime(min(d), '%Y-%m-%d') AS min_day,
               strftime(max(d), '%Y-%m-%d') AS max_day
        FROM b GROUP BY layout, bucket
    )
    SELECT layout, bucket, n_rows, min_day, max_day,
           CAST(CASE WHEN max_day < '2024-01-15' OR min_day > '2024-01-15'
                THEN 1 ELSE 0 END AS INT) AS prunable
    FROM z
    """,
    doc="Zone-map prunability audit — the quantified version of 'why "
    "cluster your data': the SAME events land in 8 buckets two ways "
    "(range-clustered on event day vs hash-scattered on event_id), "
    "each bucket's min/max-day zone map is computed, and every "
    "bucket is marked prunable or not for a one-day predicate. "
    "Clustered layout: 7 of 8 buckets prunable (non-overlapping "
    "zones); hash layout: 0 of 8 (every zone spans the full month) — "
    "the exact arithmetic a lakehouse optimizer does with parquet "
    "footer stats before deciding what to scan. One shuffle per "
    "layout (bucket agg); the date span enters as a 1-row broadcast. "
    "operators/storage.py:file_zonemaps computes the identical audit "
    "from REAL per-file _metadata over clustered vs scattered "
    "physical writes (pytest-pinned).",
    tags=("storage", "plan", "events"),
)
def zonemap_skip_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events").select(
        "event_id", F.to_date("ts").alias("d")
    )
    span = e.agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
    clustered = e.crossJoin(F.broadcast(span)).select(
        F.lit("clustered").alias("layout"),
        F.floor(
            F.datediff(F.col("d"), F.col("d0"))
            * 8
            / (F.datediff(F.col("d1"), F.col("d0")) + 1)
        )
        .cast("int")
        .alias("bucket"),
        "d",
    )
    hashed = e.select(
        F.lit("hash").alias("layout"),
        (F.col("event_id") % 8).cast("int").alias("bucket"),
        "d",
    )
    z = (
        clustered.unionByName(hashed)
        .groupBy("layout", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.date_format(F.min("d"), "yyyy-MM-dd").alias("min_day"),
            F.date_format(F.max("d"), "yyyy-MM-dd").alias("max_day"),
        )
    )
    return z.select(
        "layout",
        "bucket",
        "n_rows",
        "min_day",
        "max_day",
        # a zone whose stats are NULL (un-timestamped rows) can never
        # be pruned: when() falls through to 0 exactly like the
        # oracle's CASE, where a bare boolean cast would emit NULL
        F.when(
            (F.col("max_day") < "2024-01-15")
            | (F.col("min_day") > "2024-01-15"),
            1,
        )
        .otherwise(0)
        .cast("int")
        .alias("prunable"),
    )


_ZBITS = 3
# DuckDB twin of operators.storage.zorder_key: explicit bit algebra.
_Z_SQL = " + ".join(
    f"(((x >> {i}) & 1) << {2 * i}) + (((y >> {i}) & 1) << {2 * i + 1})"
    for i in range(_ZBITS)
)


@register(
    "zorder_layout_audit",
    oracle=f"""
    WITH e AS (
        SELECT CAST(user_id % 8 AS BIGINT) AS x,
               CAST(floor(date_diff('day', d0, CAST(ts AS DATE)) * 8.0
                          / (date_diff('day', d0, d1) + 1)) AS BIGINT) AS y
        FROM events,
             (SELECT min(CAST(ts AS DATE)) AS d0,
                     max(CAST(ts AS DATE)) AS d1 FROM events) span
    ),
    b AS (
        SELECT 'zorder' AS layout,
               CAST(({_Z_SQL}) // 8 AS INT) AS bucket, x, y
        FROM e
        UNION ALL
        SELECT 'rowmajor' AS layout,
               CAST((x * 8 + y) // 8 AS INT) AS bucket, x, y
        FROM e
    ),
    z AS (
        SELECT layout, bucket,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(min(x) AS BIGINT) AS min_x,
               CAST(max(x) AS BIGINT) AS max_x,
               CAST(min(y) AS BIGINT) AS min_y,
               CAST(max(y) AS BIGINT) AS max_y
        FROM b GROUP BY layout, bucket
    )
    SELECT layout, bucket, n_rows, min_x, max_x, min_y, max_y,
           CAST(CASE WHEN min_y > 3 OR max_y < 2 THEN 1 ELSE 0 END AS INT)
               AS prunable
    FROM z
    """,
    doc="Z-order vs row-major layout audit — the quantified case for "
    "multi-dimensional clustering: the SAME events land in 8 range "
    "buckets two ways (by Morton-interleaved z-key over the (user "
    "bucket, day bucket) 8x8 grid vs by row-major x*8+y, i.e. "
    "clustered on x alone), per-bucket zone maps over BOTH columns "
    "are computed, and every bucket is marked prunable for the "
    "y-only predicate `y BETWEEN 2 AND 3`. Row-major prunes 0 of 8 "
    "(every x-stripe spans all y); z-order prunes 6 of 8 (only the "
    "two buckets whose z-range carries y-bit patterns 01x survive) "
    "— exactly why Delta OPTIMIZE ZORDER BY exists. The z-key is "
    "operators/storage.py:zorder_key (pure integer bit algebra, "
    "whole-stage codegen); one shuffle per layout for the bucket "
    "agg; the date span enters as a 1-row broadcast.",
    tags=("storage", "plan", "events"),
)
def zorder_layout_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kittispark.operators.storage import zorder_key

    ev = t(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("d")
    )
    span = ev.agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
    e = ev.crossJoin(F.broadcast(span)).select(
        (F.col("user_id") % 8).cast("long").alias("x"),
        F.floor(
            F.datediff(F.col("d"), F.col("d0"))
            * 8
            / (F.datediff(F.col("d1"), F.col("d0")) + 1)
        )
        .cast("long")
        .alias("y"),
    )
    zed = e.select(
        F.lit("zorder").alias("layout"),
        F.floor(zorder_key(F.col("x"), F.col("y"), _ZBITS) / 8)
        .cast("int")
        .alias("bucket"),
        "x",
        "y",
    )
    rowm = e.select(
        F.lit("rowmajor").alias("layout"),
        F.floor((F.col("x") * 8 + F.col("y")) / 8).cast("int").alias("bucket"),
        "x",
        "y",
    )
    z = (
        zed.unionByName(rowm)
        .groupBy("layout", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("x").alias("min_x"),
            F.max("x").alias("max_x"),
            F.min("y").alias("min_y"),
            F.max("y").alias("max_y"),
        )
    )
    return z.select(
        "layout",
        "bucket",
        "n_rows",
        "min_x",
        "max_x",
        "min_y",
        "max_y",
        # NULL stats (rows whose coordinates derive from NULL inputs)
        # -> not prunable, matching the oracle's CASE fall-through
        F.when((F.col("min_y") > 3) | (F.col("max_y") < 2), 1)
        .otherwise(0)
        .cast("int")
        .alias("prunable"),
    )
