from kittispark.streaming.ops import (
    EVENTS_SCHEMA,
    clicks_without_purchase,
    dedup_stream,
    enrich_counts,
    purchases_after_clicks,
    read_events_stream,
    run_available_now,
    running_user_stats,
    session_counts,
    session_tracker,
    sliding_value_avg,
    tumbling_counts,
)

__all__ = [
    "EVENTS_SCHEMA",
    "clicks_without_purchase",
    "dedup_stream",
    "enrich_counts",
    "purchases_after_clicks",
    "read_events_stream",
    "run_available_now",
    "running_user_stats",
    "session_counts",
    "session_tracker",
    "sliding_value_avg",
    "tumbling_counts",
]
