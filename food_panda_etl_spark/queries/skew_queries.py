"""Declared queries for the skew-mitigation operators (SURVEY.md §2 —
`operators/skew.py`), lifting them from local-test evidence to
driver-oracled evidence.

Both operators are SEMANTICS-PRESERVING rewrites, so their oracle is the
plain unsalted SQL: the salted plan must hash-match it exactly. The salt
values themselves come from a seeded `rand()` whose per-row draw depends
on partition layout — irrelevant here, because the output is
salt-invariant by construction (phase-2 re-aggregation / join matching
under exactly one salt), which is precisely the property being proved.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from food_panda_etl_spark.operators.skew import (
    replicated_skew_join,
    salted_count_sum,
)
from food_panda_etl_spark.queries import query
from food_panda_etl_spark.tables import load_table


@query(
    "q_skew_agg",
    oracle="""
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS cnt,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_skew_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe grouped aggregation: `salted_count_sum` spreads each
    key's partial aggregation over 16 salted reducers (phase 1), then
    re-aggregates the tiny partial frame by key alone (phase 2) —
    count/sum recombine losslessly, and the decimal-cast sum keeps the
    result bit-identical to the unsalted oracle no matter how the salt
    scattered the addends. l_returnflag has 3 values over all of
    lineitem — exactly the hot-key shape AQE cannot split for hash
    aggregation (skew-join splitting only covers joins)."""
    li = load_table(spark, sf_dir, "lineitem")
    return salted_count_sum(li, ["l_returnflag"], "l_quantity", salt=16)


@query(
    "q_skew_join",
    oracle="""
    SELECT s_nationkey,
           CAST(count(*) AS BIGINT) AS cnt,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY s_nationkey
    """,
)
def q_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe equi-join: `replicated_skew_join` salts the (big,
    skewed) lineitem side and replicates the supplier side across all 8
    salt values, so one hot supplier's rows land on 8 reducers instead
    of one; each big row still matches its supplier under exactly one
    salt, so the join output — and the downstream per-nation aggregate —
    hash-matches the plain-join oracle."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("suppkey"), "l_quantity"
    )
    sup = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("suppkey"), "s_nationkey"
    )
    joined = replicated_skew_join(li, sup, "suppkey", salt=8)
    return joined.groupBy("s_nationkey").agg(
        F.count("*").alias("cnt"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_qty"),
    )
