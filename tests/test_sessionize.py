"""Batch sessionization invariants: equivalence with an independent
Python reference under random streams and partitionings, boundary
semantics (exactly-gap stays, gap+1µs breaks), and agreement with
Spark's own session_window on session COUNTS (the two definitions
align for point events)."""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F


def _python_sessionize(rows, gap_minutes):
    """rows: (user, ts_datetime, event_id); returns {event_id: sid}."""
    out = {}
    by_user: dict = {}
    for u, ts, e in rows:
        by_user.setdefault(u, []).append((ts, e))
    gap = timedelta(minutes=gap_minutes)
    for u, evs in by_user.items():
        evs.sort()
        sid, prev = 0, None
        for ts, e in evs:
            if prev is None or ts - prev > gap:
                sid += 1
            out[e] = sid
            prev = ts
    return out


SET = settings(max_examples=5, deadline=None,
               suppress_health_check=[HealthCheck.function_scoped_fixture])


@SET
@given(
    seed=st.integers(min_value=0, max_value=10_000),
    parts=st.integers(min_value=1, max_value=5),
)
def test_sessionize_matches_reference(spark, seed, parts):
    import random

    from food_panda_etl_spark.operators.sessionize import sessionize

    rng = random.Random(seed)
    base = datetime(2024, 1, 1)
    rows = [
        (rng.randrange(3), base + timedelta(minutes=rng.randrange(0, 600)), e)
        for e in range(40)
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long"
    ).repartition(parts)
    got = {
        r["event_id"]: r["session_id"]
        for r in sessionize(df, gap_minutes=30).collect()
    }
    assert got == _python_sessionize(rows, 30)


def test_sessionize_boundary_semantics(spark):
    """An event exactly gap after the previous stays in-session; one
    microsecond past breaks."""
    from food_panda_etl_spark.operators.sessionize import sessionize

    rows = [
        (1, "2024-01-01 10:00:00.000000", 1),
        (1, "2024-01-01 10:30:00.000000", 2),  # exactly 30m: stays
        (1, "2024-01-01 11:00:00.000001", 3),  # 30m + 1µs: breaks
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts_s string, event_id long"
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"), "event_id")
    got = {
        r["event_id"]: r["session_id"]
        for r in sessionize(df, gap_minutes=30).collect()
    }
    assert got == {1: 1, 2: 1, 3: 2}


def test_sessionize_agrees_with_spark_session_window(spark, sf_dir):
    """Per-user session COUNTS must equal Spark's own session_window
    aggregation on the real events table (point events: both define a
    break as gap strictly exceeded)."""
    from food_panda_etl_spark.operators.sessionize import sessionize
    from food_panda_etl_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"), "event_id"
    )
    ours = (
        sessionize(ev, gap_minutes=30)
        .groupBy("user_id")
        .agg(F.max("session_id").alias("n_sessions"))
    )
    theirs = (
        ev.groupBy(
            F.session_window("ts", "30 minutes").alias("sw"), "user_id"
        )
        .count()
        .groupBy("user_id")
        .agg(F.count("*").alias("n_sessions"))
    )
    a = {r["user_id"]: r["n_sessions"] for r in ours.collect()}
    b = {r["user_id"]: r["n_sessions"] for r in theirs.collect()}
    assert a == b


def test_sessionize_rejects_fractional_or_nonpositive_gap(spark):
    import pytest

    from food_panda_etl_spark.operators.sessionize import sessionize

    df = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", 1)], "user_id long, ts_s string, event_id long"
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"), "event_id")
    with pytest.raises(ValueError, match="positive integer"):
        sessionize(df, gap_minutes=0.5)
    with pytest.raises(ValueError, match="positive integer"):
        sessionize(df, gap_minutes=0)
