"""Structured-Streaming queries exposed through the registry.

Each entry materializes a canonical parquet *landing directory* (what
a production pipeline's ingest layer would write), reads it back with
``readStream`` split across several micro-batches (``maxFilesPerTrigger``
— so stateful operators are exercised ACROSS batch boundaries, not
just within one), runs the kittispark.streaming operator, and drains
the backlog with an ``availableNow`` trigger into a memory sink.

Because event time and keys fully determine the results, the drained
output is deterministic and — for the windowed aggregations and the
exactly-once intake — equal to its batch twin, so the same DuckDB
oracle SQL checks the *streaming* execution path end-to-end. The
stateful ``applyInPandasWithState`` operator emits one update row per
key per micro-batch; its registry entry reduces to the final row per
key, which again matches a batch aggregate (rows-only fallback is not
needed, but the reduction is done Spark-side so the oracle stays pure
SQL).

Scale notes: the landing-dir pattern is exactly how this runs on a
real cluster (files land, watermark bounds state, availableNow backfills
then the same query object runs continuously). The memory sink is
test-only; swap ``.format("parquet")`` + checkpoint for production.
"""

from __future__ import annotations

import atexit
import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kittispark.registry import register
from kittispark.sources.tables import load_table
from kittispark import streaming as S

# One canonical landing dir per sf_dir per process; building it is a
# single narrow write of the (already canonical-typed) events table.
_LANDING: dict[str, str] = {}
_N_LANDING_FILES = 4


def events_landing_dir(spark: SparkSession, sf_dir: str) -> str:
    path = _LANDING.get(sf_dir)
    if path is None or not os.path.isdir(path):
        root = tempfile.mkdtemp(prefix="kittispark-landing-")
        path = os.path.join(root, "events")
        (
            load_table(spark, sf_dir, "events")
            .repartition(_N_LANDING_FILES)
            .write.mode("overwrite")
            .parquet(path)
        )
        _LANDING[sf_dir] = path
    return path


def _drain(result: DataFrame, output_mode: str) -> DataFrame:
    name = f"ks_stream_{uuid.uuid4().hex[:12]}"
    return S.run_available_now(result, name, output_mode=output_mode)


def _stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    return S.read_events_stream(
        spark, events_landing_dir(spark, sf_dir), max_files_per_trigger=1
    )


@register(
    "stream_tumbling_counts",
    oracle="""
    SELECT CAST(floor(epoch(ts) / 600) * 600 AS BIGINT) AS bucket_start,
           event_type,
           count(*) AS n,
           round(sum(value), 2) AS sum_value
    FROM events
    WHERE ts IS NOT NULL
    GROUP BY 1, 2
    """,
    doc="Tumbling event-time windows executed by Structured Streaming "
    "(readStream → window+watermark → availableNow drain); same oracle "
    "as the batch twin tumbling_window_counts, proving the streaming "
    "path computes identical results across micro-batch boundaries.",
    tags=("streaming",),
)
def stream_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _drain(S.tumbling_counts(_stream(spark, sf_dir), watermark=None), "complete")


@register(
    "stream_sliding_avg",
    oracle="""
    WITH buckets AS (
        SELECT CAST(floor(epoch(ts) / 300) * 300 AS BIGINT) AS slide0, value
        FROM events
        WHERE ts IS NOT NULL
    ), expanded AS (
        SELECT slide0 AS bucket_start, value FROM buckets
        UNION ALL
        SELECT slide0 - 300 AS bucket_start, value FROM buckets
    )
    SELECT bucket_start,
           count(*) AS n,
           CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) * 10000
                // count(*) AS DOUBLE) / 1000000.0 AS avg_value
    FROM expanded GROUP BY 1
    """,
    doc="Sliding windows (10 min window / 5 min slide) on the streaming "
    "path: each event belongs to exactly two windows, which the oracle "
    "reproduces by a 2-way bucket expansion. The average is exact "
    "integer micros (cents * 10000 div n) converted to double at the "
    "end — float round(avg, 6) sat on a true midpoint at sf0.1 where "
    "the engines' rounding disagrees by one ulp.",
    tags=("streaming",),
)
def stream_sliding_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _drain(S.sliding_value_avg(_stream(spark, sf_dir), watermark=None), "complete")


@register(
    "stream_session_counts",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL THEN 1
                    WHEN epoch(ts) - epoch(lag(ts) OVER w) > 1800.0 THEN 1
                    ELSE 0 END AS new_session
        FROM events
        WHERE ts IS NOT NULL
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), numbered AS (
        SELECT user_id, ts,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS session_no
        FROM flagged
    )
    SELECT user_id,
           CAST(floor(epoch(min(ts))) AS BIGINT) AS session_start,
           CAST(floor(epoch(max(ts))) AS BIGINT) + 1800 AS session_end,
           count(*) AS n_events
    FROM numbered GROUP BY user_id, session_no
    """,
    doc="session_window(ts, '30 minutes') on the streaming path "
    "(events without a timestamp belong to no session — "
    "session_window drops them by construction, the oracle filters "
    "identically); the "
    "oracle rebuilds merged sessions via lag + cumulative flags "
    "(session_end = last event + gap, Spark's session-window semantics).",
    tags=("streaming",),
)
def stream_session_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _drain(S.session_counts(_stream(spark, sf_dir), watermark=None), "complete")


@register(
    "stream_dedup_exactonce",
    oracle="""
    SELECT event_id, event_type, round(value, 6) AS value
    FROM events
    """,
    doc="Streaming stateful dropDuplicates on event_id: exactly-once "
    "intake across micro-batches (watermark=None backfill form of "
    "dropDuplicatesWithinWatermark). Source ids are unique, so the deduped stream "
    "equals the input relation — deterministic and oracle-checkable.",
    tags=("streaming",),
)
def stream_dedup_exactonce(spark: SparkSession, sf_dir: str) -> DataFrame:
    deduped = S.dedup_stream(_stream(spark, sf_dir), watermark=None)
    out = deduped.select(
        "event_id", "event_type", F.round("value", 6).alias("value")
    )
    return _drain(out, "append")


@register(
    "stream_running_user_stats",
    oracle="""
    SELECT user_id,
           count(*) AS n_events,
           round(sum(value), 6) AS sum_value
    FROM events GROUP BY user_id
    """,
    doc="Custom stateful operator (applyInPandasWithState) maintaining "
    "running per-user totals across micro-batches; the final update per "
    "key equals the batch aggregate, checked by the oracle.",
    tags=("streaming",),
)
def stream_running_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    updates = _drain(S.running_user_stats(_stream(spark, sf_dir)), "update")
    # One update row per key per micro-batch; n_events is strictly
    # increasing, so the struct-max picks the final state per key
    # (sum_value alone is not monotone — values may be negative).
    final = F.max(F.struct("n_events", "sum_value")).alias("f")
    return updates.groupBy("user_id").agg(final).select(
        "user_id",
        F.col("f.n_events").alias("n_events"),
        F.round(F.col("f.sum_value"), 6).alias("sum_value"),
    )


@register(
    "stream_stream_interval_join",
    oracle="""
    SELECT p.event_id AS purchase_id,
           c.event_id AS click_id,
           p.user_id,
           epoch(p.ts) - epoch(c.ts) AS gap_s,
           round(p.value, 6) AS purchase_value
    FROM events p JOIN events c
      ON p.user_id = c.user_id
     AND p.event_type = 'purchase' AND c.event_type = 'click'
     AND c.ts <= p.ts
     AND c.ts >= p.ts - INTERVAL 1800 SECONDS
    """,
    doc="Stream-stream interval join executed by Structured Streaming "
    "(both sides watermarked, event-time-bounded state): purchases "
    "paired with same-user clicks in the preceding 30 minutes; "
    "append-mode drain equals the batch interval join the oracle runs.",
    tags=("streaming", "join"),
)
def stream_stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = _stream(spark, sf_dir)
    # watermark=None: the backfill's landing files are not time-ordered
    # (see module docstring); production keeps the default 2h watermark.
    return _drain(S.purchases_after_clicks(stream, watermark=None), "append")


_ORDERED_LANDING: dict[str, str] = {}


def events_landing_dir_ordered(spark: SparkSession, sf_dir: str) -> str:
    """Landing dir whose files batch in strict event-time order, plus
    a final SENTINEL file: one far-future event per user. The
    sentinel batch closes every real session (gap rule), so the
    tracker's emissions are exactly the batch sessionization —
    value-checkable by the oracle.

    ONE range-partitioned scan materializes the time-ordered files
    (partition i of repartitionByRange holds the i-th ascending time
    range, with the partition index in the output file name) —
    replacing the former 4 sequential filtered passes with
    coalesce(1) single-task writes. The sentinel's max-ts scalar
    rides the plan via a 1-row cross join instead of a driver
    collect; its coalesce(1) is a ~|users|-row dim write, not a data
    path. The file stream source orders batches by modification
    time, so the mtimes are stamped explicitly ascending (range
    files in partition order, sentinel last) rather than relying on
    write latency."""
    path = _ORDERED_LANDING.get(sf_dir)
    if path is not None and os.path.isdir(path):
        return path
    events = load_table(spark, sf_dir, "events")
    root = tempfile.mkdtemp(prefix="kittispark-landing-ordered-")
    path = os.path.join(root, "events")
    secs = events.withColumn("__s", F.col("ts").cast("double"))
    (
        secs.repartitionByRange(_N_LANDING_FILES, "__s")
        .drop("__s")
        .write.mode("overwrite")
        .parquet(path)
    )
    range_files = sorted(f for f in os.listdir(path) if f.startswith("part-"))
    mx = secs.agg(F.floor(F.max("__s")).alias("mx"))
    (
        events.select("user_id")
        .distinct()
        .crossJoin(mx)
        .select(
            F.lit(-1).alias("event_id"),
            F.timestamp_seconds(F.col("mx") + 7 * 86400).alias("ts"),
            "user_id",
            F.lit("__sentinel").alias("event_type"),
            F.lit(0.0).alias("value"),
            F.lit("{}").alias("props"),
        )
        .coalesce(1)
        .write.mode("append")
        .parquet(path)
    )
    sentinel_files = sorted(
        f
        for f in os.listdir(path)
        if f.startswith("part-") and f not in set(range_files)
    )
    base = os.path.getmtime(path)
    for k, fname in enumerate(range_files + sentinel_files):
        stamp = base + 10.0 * (k + 1)
        os.utime(os.path.join(path, fname), (stamp, stamp))
    _ORDERED_LANDING[sf_dir] = path
    return path


@register(
    "stream_session_tracker",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL THEN 1
                    WHEN epoch(ts) - epoch(lag(ts) OVER w) > 1800.0 THEN 1
                    ELSE 0 END AS new_session
        FROM events
        WHERE ts IS NOT NULL
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), numbered AS (
        SELECT user_id, ts,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS session_no
        FROM flagged
    )
    SELECT user_id,
           CAST(floor(epoch(min(ts))) AS BIGINT) AS session_start,
           CAST(floor(epoch(max(ts))) AS BIGINT) AS session_last,
           count(*) AS n_events
    FROM numbered GROUP BY user_id, session_no
    """,
    doc="Custom stateful sessionizer (applyInPandasWithState + event-"
    "time timeouts) run across 5 micro-batches; a sentinel batch of "
    "far-future per-user events closes every real session, so the "
    "emitted rows equal batch sessionization exactly — the custom "
    "stateful operator is VALUE-checked by the oracle, not just "
    "row-counted.",
    tags=("streaming", "stateful"),
)
def stream_session_tracker(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = S.read_events_stream(
        spark, events_landing_dir_ordered(spark, sf_dir), max_files_per_trigger=1
    )
    return _drain(S.session_tracker(stream, watermark="30 minutes"), "append")


@register(
    "stream_static_enrich",
    oracle="""
    SELECT coalesce(c.c_mktsegment, 'unknown') AS mktsegment,
           e.event_type,
           count(*) AS n,
           CAST(sum(CAST(round(e.value * 100, 0) AS BIGINT)) AS DOUBLE)
               / 100 AS sum_value
    FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1, 2
    """,
    doc="Stream-static enrichment join (the lookup-dimension pattern "
    "every ingest pipeline has): the event stream left-joins a "
    "broadcast customer snapshot per micro-batch — the stream side "
    "never shuffles for the join, unmatched events survive as "
    "'unknown' — then rolls up per (segment, type). Drained "
    "available-now across 4 micro-batch files; the oracle is the "
    "batch twin, so the streaming join path itself is "
    "value-adjudicated.",
    tags=("streaming",),
)
def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    dim = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    res = S.enrich_counts(_stream(spark, sf_dir), dim, watermark=None)
    return _drain(res, "complete")


@register(
    "stream_jsonl_ingest",
    oracle="""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(sum(length(text)) AS BIGINT) AS total_len
    FROM documents GROUP BY lang
    """,
    doc="Streaming ingestion of the JSONL corpus format — the "
    "production shape of continuous corpus intake: the JSONL export "
    "(the same per-process fixture jsonl_corpus_roundtrip "
    "adjudicates) is consumed by Structured Streaming's JSON file "
    "source with an EXPLICIT schema, one file per micro-batch "
    "(maxFilesPerTrigger=1), into a per-language running rollup "
    "drained with availableNow in complete mode. At scale this is "
    "exactly how a crawler's landing directory becomes queryable "
    "tables — files arrive, micro-batches fold them into the "
    "aggregate, no batch re-scan of the backlog. The oracle "
    "recomputes the rollup from the parquet table, proving the "
    "streaming JSON parse and cross-micro-batch aggregation lose "
    "nothing.",
    tags=("streaming", "llm-pipeline", "source"),
)
def stream_jsonl_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T

    from kittispark.queries.llm_pipeline import _jsonl_path

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(_jsonl_path(spark, sf_dir))
    )
    rollup = stream.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.sum(F.length("text")).alias("total_len"),
    )
    return _drain(rollup, "complete")


# --------------------------------------------------------------------------
# Checkpointed resume: the exactly-once file-source contract across
# restarts, adjudicated through a durable parquet sink.
# --------------------------------------------------------------------------

_CKPT_SINK: dict[str, str] = {}
_CKPT_ROOTS: list[str] = []


def _cleanup_ckpt_roots() -> None:
    import shutil

    for root in _CKPT_ROOTS:
        shutil.rmtree(root, ignore_errors=True)


atexit.register(_cleanup_ckpt_roots)


def _checkpointed_sink_dir(spark: SparkSession, sf_dir: str) -> str:
    """Build (once per process+sf_dir) a parquet sink produced by TWO
    availableNow runs against the SAME checkpoint: run 1 drains the
    first half of the landing files; more files land; run 2 resumes
    from the checkpoint and processes ONLY the new files. The sink
    then holds every event exactly once iff the file-source offset
    log and sink commit log do their job — which the registered
    query's oracle (a full recompute over all events) adjudicates:
    any reprocessing doubles counts, any loss drops them, either
    breaks the hash."""
    import os
    import tempfile

    cached = _CKPT_SINK.get(sf_dir)
    if cached is not None and os.path.isdir(cached):
        return cached

    root = tempfile.mkdtemp(prefix="kittispark-ckpt-")
    _CKPT_ROOTS.append(root)
    landing = os.path.join(root, "landing")
    sink = os.path.join(root, "sink")
    ckpt = os.path.join(root, "ckpt")

    ev = load_table(spark, sf_dir, "events")
    first = ev.filter(F.col("event_id") % 2 == 0)
    second = ev.filter(F.col("event_id") % 2 != 0)
    first.repartition(2).write.mode("overwrite").parquet(landing)

    def drain_once() -> None:
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(landing)
        )
        q = (
            stream.select("event_id", "ts", "user_id", "event_type", "value")
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain_once()  # run 1: first half
    second.repartition(2).write.mode("append").parquet(landing)
    drain_once()  # run 2: resumes from ckpt, must see ONLY the new files

    _CKPT_SINK[sf_dir] = sink
    return sink


@register(
    "stream_checkpoint_resume",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT event_id) AS BIGINT) AS n_distinct,
           CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS DOUBLE)
               / 100 AS total_value
    FROM events GROUP BY event_type
    """,
    doc="Exactly-once RESUME across streaming restarts — the property "
    "every production deployment stands on and the one a single "
    "availableNow drain never exercises: a parquet sink is filled by "
    "two separate runs against the same checkpointLocation (half the "
    "landing files, then a restart after more files land), and the "
    "registered query aggregates the SINK. The oracle recomputes "
    "from the raw events table, so reprocessed files (doubled "
    "counts), lost files, or a torn sink commit all break the hash; "
    "n_distinct == n_events doubles as an in-row duplicate witness. "
    "At 100 TB this is the file-source offset log + sink commit "
    "protocol that lets a crawler-intake job die and resume without "
    "reprocessing the backlog.",
    tags=("streaming", "cdc"),
)
def stream_checkpoint_resume(spark: SparkSession, sf_dir: str) -> DataFrame:
    sink = _checkpointed_sink_dir(spark, sf_dir)
    return (
        spark.read.parquet(sink)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct("event_id").alias("n_distinct"),
            (
                F.sum(F.round(F.col("value") * 100, 0).cast("long")).cast("double")
                / 100
            ).alias("total_value"),
        )
    )


_MERGE_SILVER: dict[str, str] = {}
_MERGE_ROOTS: list[str] = []


def _cleanup_merge_roots() -> None:
    import shutil

    for root in _MERGE_ROOTS:
        shutil.rmtree(root, ignore_errors=True)


atexit.register(_cleanup_merge_roots)


def user_event_agg(df: DataFrame) -> DataFrame:
    """Per-user silver-state aggregation: running event count plus the
    latest event as an ordered (ts, event_id, ...) struct max. Shared
    by the foreachBatch MERGE below and its property tests — the
    batch-split invariance (fold of merges == one-shot agg) only
    holds if both sides use this exact shape."""
    return df.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max(F.struct("ts", "event_id", "event_type", "value")).alias("last"),
    )


def merge_user_state(cur: DataFrame, bagg: DataFrame) -> DataFrame:
    """One MERGE step: full-outer combine of the current silver state
    with a batch aggregate — counts add, 'last' is the struct max
    (greatest() skips NULL, so an unmatched side passes the other
    side's struct through). Associative and commutative in the batch
    dimension, which is what makes the streaming fold equal a batch
    recompute regardless of how micro-batches split or arrive
    (property-tested for N>=3 splits and shuffled batch order)."""
    return (
        cur.select(
            F.col("user_id"),
            F.col("n_events").alias("__an"),
            F.col("last").alias("__al"),
        )
        .join(
            bagg.select(
                F.col("user_id"),
                F.col("n_events").alias("__bn"),
                F.col("last").alias("__bl"),
            ),
            "user_id",
            "full_outer",
        )
        .select(
            "user_id",
            (
                F.coalesce(F.col("__an"), F.lit(0))
                + F.coalesce(F.col("__bn"), F.lit(0))
            ).alias("n_events"),
            F.greatest(F.col("__al"), F.col("__bl")).alias("last"),
        )
    )


def _merged_silver_dir(spark: SparkSession, sf_dir: str) -> str:
    """Build (once per process+sf_dir) a keyed 'silver' table
    maintained by a foreachBatch MERGE over the streaming event
    intake — the bronze->silver pattern of every lakehouse pipeline:
    each micro-batch is aggregated per user (count + latest-by-
    (ts, event_id) struct max) and full-outer merged into the
    previous silver version; versions are immutable parquet dirs, so
    a reader never observes a half-written table (the poor-man's
    atomic commit a table format would provide). maxFilesPerTrigger=1
    over 2 landing files forces >= 2 real merge rounds, so the
    accumulation path (old.n + batch.n, greatest(last)) is genuinely
    exercised — a single-batch drain would reduce MERGE to a copy."""
    cached = _MERGE_SILVER.get(sf_dir)
    if cached is not None and os.path.isdir(cached):
        return cached

    root = tempfile.mkdtemp(prefix="kittispark-mergesilver-")
    _MERGE_ROOTS.append(root)
    landing = os.path.join(root, "landing")
    ckpt = os.path.join(root, "ckpt")

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    ev.repartition(2).write.mode("overwrite").parquet(landing)

    state = {"ver": 0}

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        # Idempotent MERGE: the target version is keyed by the
        # batch_id Spark hands us, and a committed version is never
        # rebuilt — if a micro-batch is RETRIED after its merge wrote
        # but before the offset committed, re-running would read a
        # silver that already contains the batch and double-count it.
        target = os.path.join(root, f"v{batch_id + 1}")
        if os.path.exists(os.path.join(target, "_SUCCESS")):
            state["ver"] = max(state["ver"], batch_id + 1)
            return
        bagg = user_event_agg(batch_df)
        if batch_id == 0:
            merged = bagg
        else:
            cur = spark.read.parquet(os.path.join(root, f"v{batch_id}"))
            merged = merge_user_state(cur, bagg)
        merged.write.mode("overwrite").parquet(target)
        state["ver"] = batch_id + 1

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing)
    )
    q = (
        stream.writeStream.foreachBatch(merge)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if state["ver"] < 2:
        raise RuntimeError(
            f"merge fixture expected >= 2 micro-batches, got {state['ver']}"
        )
    final = os.path.join(root, f"v{state['ver']}")
    _MERGE_SILVER[sf_dir] = final
    return final


@register(
    "stream_merge_upsert",
    oracle="""
    WITH latest AS (
        SELECT user_id, ts, event_type, value FROM events
        QUALIFY row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, event_id DESC) = 1
    ),
    cnt AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS n_events
        FROM events GROUP BY user_id
    )
    SELECT c.user_id, c.n_events,
           CAST(floor(epoch(l.ts)) AS BIGINT) AS last_ts,
           l.event_type AS last_event_type,
           round(l.value, 2) AS last_value
    FROM cnt c JOIN latest l USING (user_id)
    """,
    doc="Streaming MERGE upsert (foreachBatch) — the bronze->silver "
    "maintenance job of a lakehouse pipeline: the event intake "
    "stream is drained in >= 2 micro-batches, each full-outer-merged "
    "into an immutable-versioned per-user silver table (running "
    "count + latest-by-(ts, event_id) state; greatest() on the "
    "ordered struct makes 'latest' batch-boundary-invariant). The "
    "registered query reads the FINAL silver version; the oracle "
    "recomputes per-user count and argmax from raw events, so a "
    "dropped batch, double merge, or wrong merge arithmetic all "
    "break the hash. At 100 TB the same shape runs with a table "
    "format supplying the atomic version swap and the merge becomes "
    "MERGE INTO; the per-batch cost stays proportional to the BATCH "
    "(bagg) plus one keyed join against the silver table.",
    tags=("streaming", "cdc"),
)
def stream_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    silver = _merged_silver_dir(spark, sf_dir)
    return spark.read.parquet(silver).select(
        "user_id",
        "n_events",
        F.col("last.ts").cast("long").alias("last_ts"),
        F.col("last.event_type").alias("last_event_type"),
        F.round(F.col("last.value"), 2).alias("last_value"),
    )
