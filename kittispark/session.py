"""SparkSession builder tuned for this engine.

Local mode is the test bed; the config is written so the same code is
correct on a 1000-executor cluster: AQE on (runtime join-strategy
switch, skew-join splitting, partition coalescing), shuffle
partitions sized to the parallelism at hand, Arrow enabled for the
pandas-UDF paths, UTC session timezone so results are comparable with
the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "kittispark",
    cpus: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    On a real cluster ``master`` comes from spark-submit; locally we
    default to ``local[$SPARK_GRAFT_CPUS]``. Shuffle partitions default
    to the core count — the right size for local runs; at cluster scale
    AQE coalesces the (intentionally generous) initial number down.
    """
    cpus = str(cpus or os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle = str(shuffle_partitions or cpus)
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", shuffle)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("KITTISPARK_DRIVER_MEM", "8g"))
    )
    if "SPARK_MASTER" not in os.environ:
        builder = builder.master(f"local[{cpus}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    # getOrCreate returns an existing session without re-applying
    # builder configs; force runtime-settable extras so callers get
    # what they asked for either way.
    for k, v in (extra_conf or {}).items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # static conf on a reused session — builder path set it
    spark.sparkContext.setLogLevel("WARN")
    return spark
