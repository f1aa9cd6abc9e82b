"""Streaming-capable operators: event-time windows, watermarked dedup, and
a custom stateful operator.

All functions accept either a batch or a streaming DataFrame. Watermarks
are applied only when the input ``isStreaming`` (a watermark on a batch DF
is a no-op anyway, but keeping the plan identical makes the batch oracle
checks exact mirrors of the streaming plans).

Scale posture: event-time windows + watermark bound state size — state
store holds only windows newer than (max event time − watermark), and
``session_window`` merges incrementally per key. The stateful operator
keys by ``user_id`` so state shards across executors with the shuffle.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)


def _maybe_watermark(df: DataFrame, ts_col: str, watermark: str | None) -> DataFrame:
    if watermark is not None and df.isStreaming:
        return df.withWatermark(ts_col, watermark)
    return df


def tumbling_counts(
    df: DataFrame,
    ts_col: str = "ts",
    duration: str = "1 hour",
    *,
    keys: Iterable[str] = (),
    watermark: str | None = "10 minutes",
) -> DataFrame:
    """Tumbling event-time window counts + value sum (batch twin:
    queries/windows.py::q_tumbling_window — identical window() expr)."""
    df = _maybe_watermark(df, ts_col, watermark)
    win = F.window(F.col(ts_col), duration)
    return df.groupBy(win.alias("w"), *keys).agg(
        F.count("*").alias("cnt"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
    )


def sliding_counts(
    df: DataFrame,
    ts_col: str = "ts",
    duration: str = "1 hour",
    slide: str = "15 minutes",
    *,
    watermark: str | None = "10 minutes",
) -> DataFrame:
    """Sliding (hopping) window — each event lands in duration/slide
    overlapping windows (batch twin: q_sliding_window)."""
    df = _maybe_watermark(df, ts_col, watermark)
    win = F.window(F.col(ts_col), duration, slide)
    return df.groupBy(win.alias("w")).agg(
        F.count("*").alias("cnt"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
    )


def session_counts(
    df: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    *,
    key: str = "user_id",
    watermark: str | None = "10 minutes",
) -> DataFrame:
    """Gap-based session windows per key: a session closes when no event
    arrives within ``gap`` (batch twin: q_session_window; oracle is the
    gaps-and-islands SQL)."""
    df = _maybe_watermark(df, ts_col, watermark)
    win = F.session_window(F.col(ts_col), gap)
    return df.groupBy(win.alias("w"), key).agg(
        F.count("*").alias("cnt"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
    )


def streaming_dedup(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    *,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Exactly-once-per-key within the watermark horizon. Streaming uses
    ``dropDuplicatesWithinWatermark`` so state is evicted as the watermark
    advances (unbounded dedup state is the classic 100 TB streaming
    failure); batch falls back to plain dropDuplicates (same result set —
    batch has no lateness)."""
    if df.isStreaming:
        return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)
    return df.dropDuplicates(keys)


#: Output schema of :func:`running_user_totals`.
RUNNING_TOTALS_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("n_events", LongType(), False),
        StructField("total_value", DoubleType(), True),
    ]
)

_STATE_SCHEMA = "n_events BIGINT, total_value DOUBLE"


def _running_totals_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-user cumulative (count, sum(value)) across micro-batches — the
    custom-stateful-operator shape (applyInPandasWithState): state is a
    single tuple per key, updated per batch, emitted as one row."""
    (user_id,) = key
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].fillna(0.0).sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "total_value": [total]}
    )


def running_user_totals(df: DataFrame) -> DataFrame:
    """Custom stateful aggregate over a stream: per-user running totals.

    Streaming-only (``applyInPandasWithState`` requires a streaming DF);
    the batch equivalent is a plain groupBy — the streaming value is that
    totals update per micro-batch without reprocessing history.
    """
    return (
        df.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _running_totals_fn,
            outputStructType=RUNNING_TOTALS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    within: str = "30 minutes",
    *,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Stream-stream inner join: right-side events within ``within`` AFTER
    the left event, per key. Both sides carry watermarks and the join
    condition carries both time bounds — that pair is what lets Spark
    evict join state (left rows older than watermark+within can never
    match again). Unbounded stream-stream joins are the other classic
    state explosion; never ship one without the time bound."""
    l_ = left.select(
        F.col(key).alias("l_key"),
        F.col(ts_col).alias("l_ts"),
        F.col("event_id").alias("l_id"),
    )
    r_ = right.select(
        F.col(key).alias("r_key"),
        F.col(ts_col).alias("r_ts"),
        F.col("event_id").alias("r_id"),
    )
    if left.isStreaming:
        l_ = l_.withWatermark("l_ts", watermark)
    if right.isStreaming:
        r_ = r_.withWatermark("r_ts", watermark)
    cond = (
        (F.col("l_key") == F.col("r_key"))
        & (F.col("r_ts") >= F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {within}"))
    )
    return l_.join(r_, cond, "inner").select("l_key", "l_id", "r_id", "l_ts", "r_ts")


def enrich_stream(
    stream: DataFrame,
    dim: DataFrame,
    key: str = "user_id",
    dim_cols: tuple[str, ...] = ("segment",),
    how: str = "left",
) -> DataFrame:
    """Stream-static enrichment join — the single most common streaming
    pattern: attach slowly-changing dimension attributes to every event.
    The static side is re-resolved per micro-batch (Spark re-plans the
    batch side each trigger, so a refreshed dimension VIEW is picked up
    without restarting the query), needs no watermark, and holds NO join
    state — unlike stream-stream joins there is nothing to evict; the
    dimension simply broadcasts into each micro-batch when it fits (the
    same AQE sizing rules as batch). Left join keeps events whose key
    has no dimension row yet — dropping them (inner) silently loses
    late-registered entities, the classic enrichment bug. Works
    identically on a batch frame, which is what the stream==batch test
    asserts."""
    d = dim.select(F.col(key), *[F.col(c) for c in dim_cols])
    return stream.join(d, on=key, how=how)
