"""Batch sessionization — assign gap-based session ids to an event
stream (the batch analog of `streaming/ops.py`'s session windows, and
the warehouse staple behind funnel/retention-style analytics when the
question is "per VISIT", not "per user": a new session starts whenever
a user's inter-event gap exceeds the timeout).

Shape: ONE window pass per user (lag + a running sum of gap-break
flags) — the partition is the user key, so window width is bounded by
per-user event counts, never the corpus (the q_topk_per_group
reasoning; a single-partition global window never appears). Output is
deterministic under any partitioning because the per-user order is a
TOTAL order: ties on ts break on the event id column.

Session ids are per-user ordinals from 1, so (user, session_id)
is a stable key for downstream per-session aggregation — fully
SQL-replayable as the identical lag + SUM-over-flags window chain
(declared-query slated for the r8 window)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    event_col: str = "event_id",
    gap_minutes: int = 30,
) -> DataFrame:
    """All input columns plus ``session_id`` (bigint, per-user ordinal
    from 1). A session breaks when the gap since the user's previous
    event EXCEEDS ``gap_minutes`` (strictly — an event landing exactly
    on the boundary stays in the session, matching Spark's
    session_window semantics where the window extends gap past the
    last event). Events are ordered by (ts, event_col) per user — a
    total order, so ids are partitioning-invariant."""
    if gap_minutes != int(gap_minutes) or int(gap_minutes) <= 0:
        # int() would silently truncate a fractional gap (0.5 -> 0
        # microseconds: every event its own session, no error)
        raise ValueError(
            f"gap_minutes must be a positive integer, got {gap_minutes!r}"
        )
    w = Window.partitionBy(user_col).orderBy(ts_col, event_col)
    prev = F.lag(F.col(ts_col)).over(w)
    gap_us = F.lit(int(gap_minutes) * 60 * 1000000)
    brk = (
        F.when(prev.isNull(), F.lit(1))
        .when(
            F.unix_micros(F.col(ts_col).cast("timestamp"))
            - F.unix_micros(prev.cast("timestamp"))
            > gap_us,
            F.lit(1),
        )
        .otherwise(F.lit(0))
    )
    return df.withColumn(
        "session_id",
        F.sum(brk).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).cast("bigint"),
    )
