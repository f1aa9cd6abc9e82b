"""Window-function queries — SURVEY.md §2.5 (W1-W5) + the batch-checkable
tumbling window (§2.9).

Every ranking window carries a unique tie-break column: the driver's
hash-compare needs a total order wherever row identity depends on rank.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from food_panda_etl_spark.queries import query
from food_panda_etl_spark.tables import load_table


@query(
    "q_topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, CAST(rn AS INT) AS rn
    FROM (SELECT o_custkey, o_orderkey,
                 row_number() OVER (PARTITION BY o_custkey
                                    ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
          FROM orders) t
    WHERE rn <= 3
    """,
)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 — newest-k per key (ref: newest-30 reviews per vendor,
    /root/reference/src/services/api.rs:188-223). row_number + filter is
    the shuffle-once pattern; Spark pushes the k-limit into the sort within
    each partition (WindowGroupLimit)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    return (
        o.select(
            "o_custkey", "o_orderkey", F.row_number().over(w).alias("rn")
        )
        .filter(F.col("rn") <= 3)
    )


@query(
    "q_batch_number",
    oracle="""
    SELECT o_orderkey,
           CAST(ceil(CAST(row_number() OVER (ORDER BY o_orderkey) AS DOUBLE) / 48.0) AS INT) AS batch_number
    FROM orders
    """,
)
def q_batch_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2/P5 — page-batch stamping: batch = ceil(seq/48) (ref: page index
    stamped on every vendor row, /root/reference/src/services/vendor.rs:66,
    page size 48 /root/reference/src/main.rs:120). The exact global
    sequence comes from operators/order.py::global_row_number — the
    two-phase range-partition + local-rank + prefix-sum-offset scheme —
    NOT a single-partition ``row_number() OVER (ORDER BY ...)``, which
    serializes the whole table through one task at 100 TB. Same output
    (o_orderkey is unique → total order), scalable plan."""
    from food_panda_etl_spark.operators.order import batch_number, global_row_number

    o = load_table(spark, sf_dir, "orders").select("o_orderkey")
    numbered = global_row_number(o, ["o_orderkey"], out_col="__rn")
    return numbered.select(
        "o_orderkey", batch_number(F.col("__rn")).alias("batch_number")
    )


@query(
    "q_rank",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           CAST(rank()       OVER w  AS INT) AS rnk,
           CAST(dense_rank() OVER w  AS INT) AS drnk,
           CAST(ntile(4)     OVER w2 AS INT) AS quartile
    FROM customer
    WINDOW w  AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC),
           w2 AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
    """,
)
def q_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3 — ranking family. rank/dense_rank tolerate order ties (equal rank
    is deterministic); ntile needs the unique tie-break."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc())
    w2 = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w2).alias("quartile"),
    )


@query(
    "q_lag_lead",
    oracle="""
    SELECT event_id, user_id,
           epoch_ms(ts) - epoch_ms(lag(ts) OVER w) AS ms_since_prev,
           lead(event_type) OVER w AS next_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4 — analytic lag/lead: per-user inter-event gaps (sessionization
    building block)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ms = F.unix_millis(F.col("ts").cast("timestamp"))
    prev_ms = F.unix_millis(F.lag(F.col("ts").cast("timestamp")).over(w))
    return e.select(
        "event_id",
        "user_id",
        (ms - prev_ms).alias("ms_since_prev"),
        F.lead("event_type").over(w).alias("next_type"),
    )


@query(
    "q_running_sum",
    oracle="""
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(18,2)))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
    FROM events
    """,
)
def q_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W5 — cumulative frame. Decimal accumulation: exact regardless of how
    either engine associates the running aggregation."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("running_value"),
    )


@query(
    "q_tumbling_window",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           count(*) AS cnt,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1
    """,
)
def q_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 — tumbling event-time window, batch form. The identical
    window() expression runs under Structured Streaming with a watermark
    (streaming/windows.py); string-formatted start for a stable oracle."""
    e = load_table(spark, sf_dir, "events")
    win = F.window(F.col("ts"), "1 hour")
    return (
        e.groupBy(win.alias("w"))
        .agg(
            F.count("*").alias("cnt"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "cnt",
            "sum_value",
        )
    )


@query(
    "q_sliding_window",
    oracle="""
    SELECT strftime(time_bucket(INTERVAL '15 minutes', ts)
                      - k * INTERVAL '15 minutes', '%Y-%m-%d %H:%M:%S')
             AS window_start,
           count(*) AS cnt,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events, range(4) t(k)
    GROUP BY 1
    """,
)
def q_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 — sliding (hopping) window, batch form of
    streaming/ops.py::sliding_counts: every event lands in
    duration/slide = 4 overlapping windows (oracle: replicate each row
    against range(4) hop offsets)."""
    from food_panda_etl_spark.streaming.ops import sliding_counts

    e = load_table(spark, sf_dir, "events")
    return sliding_counts(e, watermark=None).select(
        F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "cnt",
        "sum_value",
    )


@query(
    "q_session_window",
    oracle="""
    WITH flags AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER win IS NULL
                    OR ts >= lag(ts) OVER win + INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW win AS (PARTITION BY user_id ORDER BY ts)
    ),
    sess AS (
      SELECT user_id, ts, value,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM flags
    )
    SELECT user_id,
           epoch_us(min(ts)) AS session_start_us,
           epoch_us(max(ts) + INTERVAL '30 minutes') AS session_end_us,
           count(*) AS cnt,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM sess
    GROUP BY user_id, sid
    """,
)
def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 — gap-based session windows, batch form of
    streaming/ops.py::session_counts. Spark's session_window merges events
    whose gap < 30 min and sets end = last_ts + gap; the oracle is the
    equivalent gaps-and-islands SQL (new session when diff >= gap)."""
    from food_panda_etl_spark.streaming.ops import session_counts

    e = load_table(spark, sf_dir, "events")
    return session_counts(e, watermark=None).select(
        "user_id",
        F.unix_micros(F.col("w.start").cast("timestamp")).alias("session_start_us"),
        F.unix_micros(F.col("w.end").cast("timestamp")).alias("session_end_us"),
        "cnt",
        "sum_value",
    )
