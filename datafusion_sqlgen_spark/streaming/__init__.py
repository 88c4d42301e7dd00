from datafusion_sqlgen_spark.streaming.ops import (
    EVENTS_SCHEMA,
    click_purchase_attribution_stream,
    hourly_rollup_stream,
    read_events_stream,
    session_window_stream,
    sliding_window_stream,
    stream_dedup,
    stream_static_enrich,
    stream_to_memory,
    tumbling_window_stream,
    user_running_totals_stream,
)

__all__ = [
    "EVENTS_SCHEMA",
    "read_events_stream",
    "tumbling_window_stream",
    "sliding_window_stream",
    "session_window_stream",
    "stream_dedup",
    "hourly_rollup_stream",
    "user_running_totals_stream",
    "stream_static_enrich",
    "click_purchase_attribution_stream",
    "stream_to_memory",
]
