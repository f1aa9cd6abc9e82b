"""Join queries — SURVEY.md §2.3 (J1-J7).

The reference's "joins" are RPC lookup fan-outs per vendor code with
left-outer semantics (/root/reference/src/services/vendor.rs:47-71; the
HTTP-400 path keeps the row with null payloads :96-105). Here they are
declarative equi-joins; Catalyst/AQE pick broadcast vs shuffled-hash vs
sort-merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from food_panda_etl_spark.operators.asof import asof_join
from food_panda_etl_spark.operators.range_join import range_join
from food_panda_etl_spark.queries import query
from food_panda_etl_spark.localrel import values_df
from food_panda_etl_spark.queries.aggregates import dsum
from food_panda_etl_spark.tables import load_table


@query(
    "q_inner_join",
    oracle="""
    SELECT n_name, count(*) AS order_cnt,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_revenue
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def q_inner_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 — fact ⋈ dim ⋈ dim chain. nation (25 rows) broadcast explicitly;
    orders⋈customer left to AQE (broadcast at test SF, sort-merge on the
    shuffled key at cluster scale)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_name")
        .agg(
            F.count("*").alias("order_cnt"),
            dsum(F.col("o_totalprice")).alias("total_revenue"),
        )
    )


@query(
    "q_left_join",
    oracle="""
    SELECT c_custkey, c_name,
           count(o_orderkey) AS order_cnt,
           COALESCE(CAST(max(o_totalprice) AS DOUBLE), -1.0) AS max_price
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    """,
)
def q_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1/J3 — the reference's lookup-join semantics: every left key
    survives, missing payloads become nulls (vendor 400-path,
    /root/reference/src/services/vendor.rs:96-105), defaults via coalesce
    (:61-64). max() over doubles is order-independent — no decimal cast."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("order_cnt"),
            F.coalesce(F.max("o_totalprice"), F.lit(-1.0)).alias("max_price"),
        )
    )


@query(
    "q_semi_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
    """,
)
def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 — existence check (vendors-with-reviews analog). left_semi never
    duplicates left rows and prunes the right side to the join key."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return c.join(o, c["c_custkey"] == o["o_custkey"], "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "q_anti_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
    """,
)
def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 — negated existence (vendors-without-reviews analog)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return c.join(o, c["c_custkey"] == o["o_custkey"], "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "q_range_join",
    oracle="""
    SELECT p_brand, count(*) AS cnt,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS matched_price
    FROM part JOIN lineitem
      ON l_extendedprice >= p_retailprice * 20
     AND l_extendedprice <  p_retailprice * 20 + 1
    GROUP BY p_brand
    """,
)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6 — band join via the bucketed strategy (operators/range_join.py):
    explode the part band into price buckets, equi-join lineitem on bucket,
    residual-filter. O(|R|·band/w) replication instead of the O(|L|·|R|)
    nested loop the naive theta join would plan."""
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        "p_brand",
        (F.col("p_retailprice") * 20).alias("band_lo"),
        (F.col("p_retailprice") * 20 + 1).alias("band_hi"),
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_extendedprice")
    joined = range_join(
        li, p, left_value="l_extendedprice", right_lo="band_lo",
        right_hi="band_hi", bucket_width=2.0,
    )
    return joined.groupBy("p_brand").agg(
        F.count("*").alias("cnt"),
        dsum(F.col("l_extendedprice")).alias("matched_price"),
    )


@query(
    "q_join_1n_agg",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           count(l_orderkey) AS line_cnt,
           COALESCE(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 0.0) AS total_qty
    FROM orders LEFT JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderkey, o_orderstatus
    """,
)
def q_join_1n_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 — 1:N enrichment then per-key aggregate (vendor ⟕ reviews shape,
    /root/reference/src/services/vendor.rs:52-55)."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        o.join(li, o["o_orderkey"] == li["l_orderkey"], "left")
        .groupBy("o_orderkey", "o_orderstatus")
        .agg(
            F.count("l_orderkey").alias("line_cnt"),
            F.coalesce(dsum(F.col("l_quantity")), F.lit(0.0)).alias("total_qty"),
        )
    )


@query(
    "q_asof_join",
    oracle="""
    SELECT p.event_id, m.event_id AS prev_event_id
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type <> 'purchase') m
      ON p.user_id = m.user_id AND m.ts < p.ts
    """,
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7 — as-of join: for each purchase, the most recent earlier
    non-purchase event of the same user. Implemented with the
    union-and-window strategy (operators/asof.py) — one shuffle on the key,
    no cross product. Oracle uses DuckDB's native ASOF JOIN."""
    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    others = e.filter(F.col("event_type") != "purchase").select(
        "event_id", "user_id", "ts"
    )
    out = asof_join(
        purchases,
        others,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        right_payload=["event_id"],
        strict=True,
        tie_break="event_id",
    )
    return out.select("event_id", F.col("asof_event_id").alias("prev_event_id"))


@query(
    "q_nullsafe_join",
    oracle="""
    WITH l AS (SELECT c_custkey,
                      CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_nationkey END AS nk
               FROM customer),
         r AS (SELECT n_nationkey, n_name FROM nation
               UNION ALL SELECT NULL, 'UNASSIGNED')
    SELECT l.c_custkey, r.n_name
    FROM l JOIN r ON l.nk IS NOT DISTINCT FROM r.n_nationkey
    """,
)
def q_nullsafe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (`<=>` ≡ IS NOT DISTINCT FROM): NULL keys
    match each other instead of vanishing — the idiom for joining
    "unassigned" rows to a sentinel dimension row. Still a hash-joinable
    equi condition (EqualNullSafe), so the plan is a broadcast hash join,
    not a BNLJ."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    left = c.select(
        "c_custkey",
        F.when(F.col("c_custkey") % 7 == 0, F.lit(None).cast("long"))
        .otherwise(F.col("c_nationkey"))
        .alias("nk"),
    )
    right = n.select("n_nationkey", "n_name").unionByName(
        values_df(
            n.sparkSession, [(None, "UNASSIGNED")],
            "n_nationkey bigint, n_name string",
        )
    )
    return left.join(
        F.broadcast(right), left["nk"].eqNullSafe(right["n_nationkey"])
    ).select("c_custkey", "n_name")


@query(
    "q_interval_join",
    oracle="""
    SELECT l.user_id AS l_key,
           l.event_id AS l_id,
           r.event_id AS r_id,
           CAST(floor(epoch(l.ts)) AS BIGINT) AS l_epoch,
           CAST(floor(epoch(r.ts)) AS BIGINT) AS r_epoch
    FROM events l JOIN events r
      ON l.user_id = r.user_id
     AND r.ts >= l.ts
     AND r.ts <= l.ts + INTERVAL 30 MINUTE
    WHERE l.event_type = 'click' AND r.event_type = 'purchase'
    """,
)
def q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time interval join, DECLARED through the streaming
    operator's batch branch (`streaming/ops.py::interval_join` — the
    same function that runs watermarked under readStream, already proven
    stream==batch in tests/test_streaming.py): click→purchase
    attribution within 30 minutes per user. Driver evidence for the
    operator itself, not just its smoke tests. Plan: equi-join on
    user_id with the time bounds as codegen residuals — at 100 TB the
    shuffle is keyed, never a time-cross-product; in streaming the same
    two bounds are what let Spark evict join state."""
    from food_panda_etl_spark.streaming.ops import interval_join

    e = load_table(spark, sf_dir, "events")
    out = interval_join(
        e.filter(F.col("event_type") == "click"),
        e.filter(F.col("event_type") == "purchase"),
        within="30 minutes",
    )
    # session TZ is UTC so the NTZ→LTZ cast is identity (q_epoch_cast's
    # convention); then timestamp→long is epoch seconds
    return out.select(
        "l_key",
        "l_id",
        "r_id",
        F.col("l_ts").cast("timestamp").cast("long").alias("l_epoch"),
        F.col("r_ts").cast("timestamp").cast("long").alias("r_epoch"),
    )
