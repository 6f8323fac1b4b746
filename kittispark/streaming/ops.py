"""Structured Streaming facade (SURVEY.md §2.7, §7.3 item 6).

The reference is pure batch over a static directory (SURVEY §0); its
per-frame loop (data_pipeline.py:18-43) is the shape of a micro-batch
stream, so the facade treats "a directory where event files land" as
the streaming source and re-expresses the engine's event-time
operators over `readStream`:

- tumbling / sliding windows  → `F.window` + `withWatermark`
- session windows             → `F.session_window` + `withWatermark`
- exactly-once-per-key intake → `dropDuplicatesWithinWatermark`
- custom stateful operator    → `applyInPandasWithState`

Every transform here is written against a *DataFrame*, streaming or
batch — the same call works in both modes, which is how the tests
prove semantics: run the streaming plan with an `availableNow`
trigger and assert it equals the batch twin (the DuckDB-checkable
versions in kittispark.queries.events).

Scale notes: watermarks bound state, so a 1000-executor job's state
store stays O(open windows × keys), not O(history). Sliding windows
multiply state by window/slide — keep that ratio small at 100 TB.
The stateful kernel keys by user_id: state is partitioned by the
shuffle on the grouping key and each executor holds only its keys.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql.streaming.state import GroupState

# Micro-batch landing schema: `ts` is already a micros timestamp (the
# nanos-parquet quirk is a property of the driver's static fixture,
# handled once in sources.tables.load_table; a streaming landing zone
# is written by this engine and lands in canonical types).
EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(
    spark: SparkSession, landing_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over a parquet landing directory.

    `maxFilesPerTrigger` bounds micro-batch size (and, in tests,
    forces multiple micro-batches so stateful operators are exercised
    across batch boundaries, not just within one)."""
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(landing_dir)


# --------------------------------------------------------------------------
# Windowed aggregations (work on streaming and batch DataFrames alike)
# --------------------------------------------------------------------------


def _with_watermark(events: DataFrame, watermark: str | None) -> DataFrame:
    if watermark is None or not events.isStreaming:
        return events
    return events.withWatermark("ts", watermark)


def tumbling_counts(
    events: DataFrame, window: str = "10 minutes", watermark: str | None = "30 minutes"
) -> DataFrame:
    """Tumbling event-time window counts — the streaming-proper form
    of queries.events.tumbling_window_counts. With a watermark, late
    rows are dropped and window state is reclaimed (the production
    append-mode setup); watermark=None keeps every row, for
    complete-mode drains over out-of-event-time-order backfills."""
    src = _with_watermark(events, watermark)
    return (
        src.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.col("w.start").cast("long").alias("bucket_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def enrich_counts(
    events: DataFrame, dim: DataFrame, watermark: str | None = None
) -> DataFrame:
    """Stream-static enrichment: join the event stream against a
    broadcast dimension snapshot (the lookup-table pattern — user
    profile, experiment assignment, geo map), then roll up per
    (segment, event_type). The static side is planned once per
    micro-batch and broadcast, so the stream never shuffles for the
    join; unmatched events keep flowing with segment='unknown'
    (left join — enrichment must not drop traffic)."""
    src = _with_watermark(events, watermark)
    joined = src.join(
        F.broadcast(dim), src["user_id"] == dim["c_custkey"], "left"
    )
    # exact integer cents sum (the money-aggregate convention: float
    # round(sum, 2) drifts one ulp across engines at large magnitudes)
    cents = F.round(F.col("value") * 100, 0).cast("long")
    return (
        joined.groupBy(
            F.coalesce("c_mktsegment", F.lit("unknown")).alias("mktsegment"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(cents).cast("double") / 100).alias("sum_value"),
        )
    )


def sliding_value_avg(
    events: DataFrame,
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str | None = "30 minutes",
) -> DataFrame:
    """Sliding event-time window average: each row lands in
    window/slide overlapping windows; state size scales with that
    ratio (2× here).

    The average is computed in EXACT integer arithmetic (2-decimal
    values -> integer cents -> integer micros div count) and only
    converted to double at the end: `round(avg(double), 6)` sat on a
    true rounding midpoint at sf0.1 (avg of 32 cent-values is a
    multiple of 0.0003125) where Spark and DuckDB round() disagree by
    one ulp — the integer form is bit-identical in both engines."""
    src = _with_watermark(events, watermark)
    cents = F.round(F.col("value") * 100, 0).cast("long")
    return (
        src.groupBy(F.window("ts", window, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum(cents).alias("__sum_cents"))
        .select(
            F.col("w.start").cast("long").alias("bucket_start"),
            "n",
            # Spark `div` and DuckDB `//` BOTH truncate toward zero
            # (probed: -10000 div 3 == -10000 // 3 == -3333), so the
            # integer division agrees for negative sums too
            (
                F.expr("(__sum_cents * 10000) div n").cast("double") / 1000000.0
            ).alias("avg_value"),
        )
    )


def session_counts(
    events: DataFrame, gap: str = "30 minutes", watermark: str | None = "30 minutes"
) -> DataFrame:
    """Per-user session windows with an inactivity gap — the
    streaming-native form of queries.events.sessionization (which
    proves the same semantics to the DuckDB oracle via lag +
    cumulative flags). Unlike plain window aggregation, the session
    operator drops watermark-late input even in complete mode, so a
    backfill whose files are not event-time-ordered must either pass
    watermark=None or land files in time order."""
    src = _with_watermark(events, watermark)
    return (
        src.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").cast("long").alias("session_start"),
            F.col("w.end").cast("long").alias("session_end"),
            "n_events",
        )
    )


def dedup_stream(events: DataFrame, watermark: str | None = "30 minutes") -> DataFrame:
    """Exactly-once-per-event_id intake. With a watermark, duplicates
    arriving within the horizon are dropped AND watermark-late input
    is discarded, with id-state reclaimed as time advances — the
    bounded-state production setup. watermark=None switches to plain
    streaming dropDuplicates: nothing is ever discarded as late, at
    the cost of unbounded id-state — correct for bounded backfills
    whose files are not event-time-ordered."""
    if not events.isStreaming:
        return events.dropDuplicates(["event_id"])
    if watermark is None:
        return events.dropDuplicates(["event_id"])
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


# --------------------------------------------------------------------------
# Custom stateful operator: applyInPandasWithState
# --------------------------------------------------------------------------

_USER_STATS_OUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)
_USER_STATS_STATE = T.StructType(
    [T.StructField("n", T.LongType()), T.StructField("s", T.DoubleType())]
)


def running_user_stats(events: DataFrame) -> DataFrame:
    """Running per-user (count, sum) maintained across micro-batches
    via applyInPandasWithState — the custom-stateful-operator slot
    (SURVEY §2.8: where an exotic aggregate would live if built-ins
    couldn't express it). Emits the updated running totals for every
    user seen in each micro-batch; state is two scalars per user."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: "GroupState"
    ) -> Iterator[pd.DataFrame]:
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].sum())
        state.update((n, s))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_value": [round(s, 6)]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=_USER_STATS_OUT,
        stateStructType=_USER_STATS_STATE,
        outputMode="update",
        timeoutConf="NoTimeout",
    )


# --------------------------------------------------------------------------
# Runner
# --------------------------------------------------------------------------


def run_available_now(
    result: DataFrame, name: str, output_mode: str = "complete"
) -> DataFrame:
    """Drain the stream's currently-available input into an in-memory
    table and return it as a batch DataFrame. `availableNow` processes
    the backlog (respecting maxFilesPerTrigger batching) then stops —
    the bounded-test face of an always-on deployment; a production
    sink would be `.format("parquet").option("checkpointLocation", …)`
    with the same plan object."""
    q = (
        result.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return result.sparkSession.table(name)


def purchases_after_clicks(
    events: DataFrame,
    clicks_src: DataFrame | None = None,
    max_gap_s: int = 1800,
    watermark: str | None = "2 hours",
) -> DataFrame:
    """Stream-stream interval join: each purchase paired with every
    click by the same user in the preceding `max_gap_s` seconds.

    In streaming mode both sides carry watermarks and the join
    condition bounds event-time distance, so the state store can
    expire rows once the watermark passes their join horizon — the
    canonical bounded-state stream-stream join. Works identically on
    batch DataFrames (no watermark, plain non-equi join), which is
    what the DuckDB oracle checks.

    Scale: state per side is (watermark horizon x arrival rate) rows
    hash-partitioned by user_id; the time-bound predicate is what
    keeps that finite — never run an unbounded stream-stream join.
    `clicks_src` (role-named; see clicks_without_purchase) supplies
    the click side when the two event streams are distinct.
    """
    other = events if clicks_src is None else clicks_src
    clicks = other.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        F.col("event_id").alias("click_id"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("purchase_value"),
    )
    if clicks.isStreaming and watermark is not None:
        clicks = clicks.withWatermark("c_ts", watermark)
    if purchases.isStreaming and watermark is not None:
        purchases = purchases.withWatermark("p_ts", watermark)
    joined = purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {max_gap_s} SECONDS")),
    )
    return joined.select(
        "purchase_id",
        "click_id",
        F.col("p_user").alias("user_id"),
        (F.col("p_ts").cast("double") - F.col("c_ts").cast("double"))
        .alias("gap_s"),
        F.round("purchase_value", 6).alias("purchase_value"),
    )




def clicks_without_purchase(
    events: DataFrame,
    purchases_src: DataFrame | None = None,
    max_gap_s: int = 1800,
    watermark: str | None = "2 hours",
) -> DataFrame:
    """LEFT-OUTER stream-stream interval join: every click, paired
    with same-user purchases in the FOLLOWING ``max_gap_s`` seconds,
    or null-padded if none arrive — the conversion/abandonment view
    (``purchases_after_clicks`` is the inner twin).

    Outer stream-stream joins have a completeness caveat the inner
    form does not: a null-padded (unconverted) row can only emit once
    the watermark passes the click's join horizon (c_ts + gap +
    delay), because until then a matching purchase could still
    arrive. Under availableNow, Spark's no-data final batches advance
    the watermark to max(event_ts) - delay, so clicks younger than
    horizon-at-end remain withheld in state — streaming output is a
    PREFIX of the batch twin, equal on every click older than the
    final watermark horizon. The equivalence test pins exactly that
    contract.

    Scale: identical bounded-state shape to the inner join — state
    per side is (horizon x rate) rows hash-partitioned by user.

    NOTE the role-named second parameter: here the secondary stream
    supplies PURCHASES (clicks are the preserved left side), while in
    purchases_after_clicks the secondary `clicks_src` supplies
    CLICKS — positional migration between the twins would silently
    swap roles, so both params are named for what they carry.
    """
    other = events if purchases_src is None else purchases_src
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        F.col("event_id").alias("click_id"),
    )
    purchases = other.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    if clicks.isStreaming and watermark is not None:
        clicks = clicks.withWatermark("c_ts", watermark)
    if purchases.isStreaming and watermark is not None:
        purchases = purchases.withWatermark("p_ts", watermark)
    joined = clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr(f"INTERVAL {max_gap_s} SECONDS")),
        "left_outer",
    )
    return joined.select(
        "click_id",
        F.col("c_user").alias("user_id"),
        F.col("c_ts").alias("click_ts"),
        "purchase_id",
        F.col("purchase_id").isNotNull().alias("converted"),
    )


_SESSION_OUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.LongType()),
        T.StructField("session_last", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)
_SESSION_STATE = T.StructType(
    [
        T.StructField("start", T.LongType()),
        T.StructField("last", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)


def session_tracker(events: DataFrame, gap_s: int = 1800, watermark: str = "2 hours"
                    ) -> DataFrame:
    """Custom stateful sessionizer with EVENT-TIME TIMEOUTS — the
    applyInPandasWithState pattern built-in session_window can't
    express (per-session payloads, eager emission, custom close
    rules). Each user's open session lives in the state store; a
    session is emitted when a gap closes it within a batch, or when
    the WATERMARK passes its deadline (state.hasTimedOut) — so
    abandoned sessions flush without waiting for that user's next
    event, and state is strictly bounded by open sessions.

    Emits (user_id, session_start epoch-s, last event epoch-s, count).
    The stream's final open session per user stays in state (an
    always-on job emits it when its timeout fires). Input should be
    roughly event-time-ordered across micro-batches (landing files
    range-partitioned by ts); the watermark absorbs in-batch disorder.

    PRECONDITION — non-negative event times: Spark initializes the
    event-time watermark at 0 ms, so every pre-1970 timestamp is
    born "late" and silently dropped by the state store (measured:
    a corpus straddling the epoch lost exactly its pre-1970
    sessions). Pre-1970 event times are sentinel/corrupt values in
    any real stream — route them to a dead-letter path before a
    watermarked stateful operator. The batch twin and the
    watermark=None session_window path handle them fine.
    """

    # Gap detection runs on FULL-resolution nanosecond ticks; floors
    # to whole seconds happen only at emission. (Truncating first
    # merged sessions whose true gap was in (gap_s, gap_s+1) — the
    # exact-sessionization oracle splits those, observed as 59
    # missing sessions in 663k at sf1synth.)
    gap_ns = gap_s * 1_000_000_000

    def _emit(key, start_ns, last_ns, n):
        return (key, start_ns // 1_000_000_000, last_ns // 1_000_000_000, n)

    def track(key: tuple, pdfs: Iterator[pd.DataFrame], state: "GroupState") -> Iterator[pd.DataFrame]:
        out = []
        if state.hasTimedOut:
            start, last, n = state.get
            out.append(_emit(key[0], start, last, n))
            state.remove()
            yield pd.DataFrame(
                out, columns=["user_id", "session_start", "session_last", "n_events"]
            )
            return
        ts = []
        for pdf in pdfs:
            ts.extend(
                int(v) for v in pdf["ts"].astype("datetime64[ns]").astype("int64")
            )
        ts.sort()
        start, last, n = state.get if state.exists else (None, None, 0)
        for t in ts:
            if start is None:
                start, last, n = t, t, 1
            elif t - last > gap_ns:
                out.append(_emit(key[0], start, last, n))
                start, last, n = t, t, 1
            else:
                # merge WITHOUT regressing the bounds: a within-
                # watermark late event from a later micro-batch can
                # have t < last (or even t < start) — overwriting
                # last with it would shrink session_last and pull the
                # timeout deadline backwards, splitting sessions the
                # batch twin merges. (An already-EMITTED earlier
                # session can't be retroactively extended — the
                # standard append-mode limitation; time-ordered
                # landing avoids it entirely.)
                last = max(last, t)
                start = min(start, t)
                n += 1
        # CEILING to ms: flooring would let the deadline land up to
        # 999 us early, closing a session an in-watermark extending
        # event could still legitimately join (split vs the oracle)
        deadline_ms = -((-(last + gap_ns)) // 1_000_000)
        wm = state.getCurrentWatermarkMs()
        # At deadline == wm, an accepted extender needs ts_ms >= wm
        # AND ts <= last+gap, i.e. ts == last+gap exactly — only
        # possible when last+gap is ms-aligned (the ceil to ms was
        # strict otherwise). When no extender can exist, emit inline:
        # parking the session behind a wm+1 timeout would silently
        # DROP it if the watermark never advances again (e.g. the
        # available-now drain ends at exactly this wm).
        aligned = (last + gap_ns) % 1_000_000 == 0
        if deadline_ms < wm or (deadline_ms == wm and not aligned):
            # passed: any future accepted event has ts_ms >= wm, and
            # (unless aligned at equality) that means ts > last+gap —
            # it cannot extend this session, so close it here (a
            # timeout timestamp may not be set at/behind the watermark)
            out.append(_emit(key[0], start, last, n))
            state.remove()
        else:
            state.update((start, last, n))
            # watermark passing last+gap closes the open session;
            # when deadline == wm AND ms-aligned, a ts == last+gap
            # extender may still legitimately arrive — keep the
            # session open one extra wm tick for it
            state.setTimeoutTimestamp(max(deadline_ms, wm + 1))
        yield pd.DataFrame(
            out, columns=["user_id", "session_start", "session_last", "n_events"]
        )

    # NULL event time belongs to no session (the built-in
    # session_window drops such rows by construction; without this a
    # NaT becomes INT64_MIN ticks and poisons gap/watermark math
    # batch-order-dependently)
    events = events.filter(F.col("ts").isNotNull())
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return src.groupBy("user_id").applyInPandasWithState(
        track,
        outputStructType=_SESSION_OUT,
        stateStructType=_SESSION_STATE,
        outputMode="append",
        timeoutConf="EventTimeTimeout",
    )
