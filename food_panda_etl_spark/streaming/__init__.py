"""Structured Streaming surface (SURVEY.md §2.9).

The reference is batch — its per-page loop with jittered rate limiting
(``/root/reference/src/main.rs:136-143``) is the micro-batch analog. Every
transformation here is written against a plain DataFrame so the SAME
function body serves batch (DuckDB-oracled via the batch queries) and
streaming (``readStream`` → ``writeStream``): Spark's unified API is the
point, the operators don't fork.
"""

from food_panda_etl_spark.streaming.ops import (
    interval_join,
    running_user_totals,
    session_counts,
    sliding_counts,
    streaming_dedup,
    tumbling_counts,
)
from food_panda_etl_spark.streaming.runner import (
    EVENTS_STREAM_SCHEMA,
    read_events_stream,
    run_available_now,
)

__all__ = [
    "EVENTS_STREAM_SCHEMA",
    "interval_join",
    "read_events_stream",
    "run_available_now",
    "running_user_totals",
    "session_counts",
    "sliding_counts",
    "streaming_dedup",
    "tumbling_counts",
]
