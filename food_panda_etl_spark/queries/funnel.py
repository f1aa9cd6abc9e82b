"""Declared event-stream product-analytics queries (r7): ordered funnel
conversion and cohort retention over the `events` table — the two
queries every clickstream warehouse runs daily, here in the strict
ANSI-replayable form (progressive min-timestamp chaining; integer
epoch-day cohorts) so DuckDB hash-matches bit-for-bit.

Both are pure integer/timestamp-comparison plans: user-keyed hash aggs
and joins, no floats, no windows over the fact. At 100 TB the funnel is
three semi-join-shaped passes keyed on user_id (co-partitioned by AQE);
retention is two hash aggs over (user, day) pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from food_panda_etl_spark.queries import query
from food_panda_etl_spark.tables import load_table

_STAGES = ("view", "click", "purchase")


@query(
    "q_funnel",
    # Progressive min-ts chaining: a user converts stage k iff they have
    # a stage-k event STRICTLY after their earliest qualifying stage-k−1
    # event and within the conversion window. Timestamps are compared,
    # never emitted (micro-resolution in both engines; ties excluded
    # identically by the strict >; the interval bound is exact integer
    # microsecond addition in both engines).
    oracle=f"""
    WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
                WHERE event_type = '{_STAGES[0]}' GROUP BY user_id),
    s2 AS (SELECT e.user_id, min(e.ts) AS t2
           FROM events e JOIN s1 ON e.user_id = s1.user_id
           WHERE e.event_type = '{_STAGES[1]}' AND e.ts > s1.t1
             AND e.ts <= s1.t1 + INTERVAL 24 HOUR
           GROUP BY e.user_id),
    s3 AS (SELECT e.user_id, min(e.ts) AS t3
           FROM events e JOIN s2 ON e.user_id = s2.user_id
           WHERE e.event_type = '{_STAGES[2]}' AND e.ts > s2.t2
             AND e.ts <= s2.t2 + INTERVAL 24 HOUR
           GROUP BY e.user_id)
    SELECT CAST(1 AS INT) AS stage_idx, '{_STAGES[0]}' AS stage,
           CAST(count(*) AS BIGINT) AS users FROM s1
    UNION ALL
    SELECT CAST(2 AS INT), '{_STAGES[1]}', CAST(count(*) AS BIGINT) FROM s2
    UNION ALL
    SELECT CAST(3 AS INT), '{_STAGES[2]}', CAST(count(*) AS BIGINT) FROM s3
    """,
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 ordered funnel (r7) — view → click → purchase conversion
    with strict temporal ordering: stage k counts users whose earliest
    qualifying stage-k event falls strictly after their earliest
    qualifying stage-(k−1) event, within a 24 h conversion window (the
    progressive min-ts chain — the standard warehouse formulation,
    immune to out-of-order event arrival because it orders by event
    time, not ingest time). Three user-keyed hash aggs + two user-keyed
    joins; each stage's state is one row per surviving user. Converts
    150 → 60 → 25 at sf0.01 — a real funnel, not a constant."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    )
    s1 = (
        ev.filter(F.col("event_type") == _STAGES[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    day = F.expr("INTERVAL 24 HOURS")
    s2 = (
        ev.filter(F.col("event_type") == _STAGES[1])
        .join(s1, "user_id")
        .filter((F.col("ts") > F.col("t1")) & (F.col("ts") <= F.col("t1") + day))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == _STAGES[2])
        .join(s2, "user_id")
        .filter((F.col("ts") > F.col("t2")) & (F.col("ts") <= F.col("t2") + day))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )

    def _stage(i: int, name: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.lit(i).cast("int").alias("stage_idx"),
            F.lit(name).alias("stage"),
            F.count("*").alias("users"),
        )

    return (
        _stage(1, _STAGES[0], s1)
        .unionAll(_stage(2, _STAGES[1], s2))
        .unionAll(_stage(3, _STAGES[2], s3))
    )


_DAY_US = 86400 * 1000000


@query(
    "q_retention",
    # Integer epoch-day arithmetic: unix_micros/epoch_us are BIGINT in
    # both engines and all values are post-1970, so floor-div == the
    # engines' integer division regardless of their negative-operand
    # conventions.
    oracle=f"""
    WITH act AS (SELECT DISTINCT user_id,
                        epoch_us(ts) // {_DAY_US} AS day
                 FROM events),
    coh AS (SELECT user_id, min(day) AS cohort_day FROM act GROUP BY user_id)
    SELECT coh.cohort_day, act.day - coh.cohort_day AS day_offset,
           CAST(count(*) AS BIGINT) AS users
    FROM act JOIN coh ON act.user_id = coh.user_id
    GROUP BY coh.cohort_day, act.day - coh.cohort_day
    """,
)
def q_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 cohort retention (r7) — the activity triangle: users are
    cohorted by their first-ever active epoch-day, and each (cohort,
    day-offset) cell counts distinct users active that many days later
    (offset 0 = cohort size). Two hash aggs over the distinct
    (user, day) activity pairs; the fact collapses to ≤ users×days rows
    before any join. Pure integer arithmetic (epoch-microsecond
    floor-div), exact in any engine. 59 (cohort, offset) cells at
    sf0.01."""
    ev = load_table(spark, sf_dir, "events")
    # ts is TIMESTAMP_NTZ; session TZ is UTC so the NTZ→LTZ cast is
    # identity (the q_epoch_cast convention) and unix_micros applies.
    act = ev.select(
        "user_id",
        F.expr(
            f"unix_micros(cast(ts as timestamp)) div {_DAY_US}"
        ).alias("day"),
    ).distinct()
    coh = act.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        act.join(coh, "user_id")
        .groupBy(
            "cohort_day", (F.col("day") - F.col("cohort_day")).alias("day_offset")
        )
        .agg(F.count("*").alias("users"))
    )


_SESSION_GAP_MIN = 30


@query(
    "q_sessionize",
    # Identical lag + running-break-flag-sum window chain; the per-user
    # order is the (ts, event_id) total order on both sides, the gap
    # test is exact integer microsecond arithmetic, and the boundary is
    # strict (> gap breaks; exactly-gap stays — Spark session_window
    # semantics, asserted against F.session_window in tests).
    oracle=f"""
    WITH brk AS (
      SELECT event_id, user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL THEN 1
                  WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w)
                       > {_SESSION_GAP_MIN} * 60 * 1000000 THEN 1
                  ELSE 0 END AS b
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
    SELECT event_id, user_id,
           CAST(sum(b) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS BIGINT) AS session_id
    FROM brk
    """,
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 batch sessionization (r7) — gap-based session ids over the
    event stream (`operators/sessionize.py`): a user's new session
    starts when the inter-event gap strictly exceeds 30 minutes; ONE
    per-user window pass (lag + running sum of break flags on the
    (ts, event_id) total order — width bounded by per-user events,
    never the corpus), ids partitioning-invariant, boundary semantics
    equal to Spark's own session_window (tested). The oracle replays
    the identical window chain; 9,549 sessions over 150 users at
    sf0.01."""
    from food_panda_etl_spark.operators.sessionize import sessionize

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.col("ts").cast("timestamp").alias("ts"),
    )
    return sessionize(
        ev, gap_minutes=_SESSION_GAP_MIN
    ).select("event_id", "user_id", "session_id")
