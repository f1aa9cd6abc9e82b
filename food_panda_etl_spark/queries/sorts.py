"""Sorts / limits / top-k — SURVEY.md §2.6 (O1, O2)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from food_panda_etl_spark.queries import query
from food_panda_etl_spark.tables import load_table


@query(
    "q_sort_multi",
    oracle="""
    SELECT o_orderkey, o_orderpriority, o_totalprice
    FROM orders
    ORDER BY o_orderpriority ASC, o_totalprice DESC, o_orderkey ASC
    LIMIT 100
    """,
)
def q_sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1 — multi-key mixed-direction sort (ref: server-side created_at
    desc ordering, /root/reference/src/services/api.rs:190-191). With the
    LIMIT, Spark plans TakeOrderedAndProject — per-partition top-100 then a
    driver-side merge of 100-row heaps, never a global sort."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_orderpriority", "o_totalprice")
        .orderBy(
            F.col("o_orderpriority").asc(),
            F.col("o_totalprice").desc(),
            F.col("o_orderkey").asc(),
        )
        .limit(100)
    )


@query(
    "q_limit_offset",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem
    ORDER BY l_orderkey, l_linenumber
    LIMIT 48 OFFSET 96
    """,
)
def q_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2 — pagination (ref: offset={page*48}&limit=48,
    /root/reference/src/services/api.rs:23-29, /root/reference/src/main.rs:
    136-137). Deep OFFSET is inherently a serial skip — fine for page
    windows, an anti-pattern for full-table paging at 100 TB (use keyset
    pagination on a sort key instead)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")
        .offset(96)
        .limit(48)
    )


@query(
    "q_topk_global",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 10
    """,
)
def q_topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2 — global top-k: TakeOrderedAndProject (partition-local heaps +
    merge), the plan that survives 100× scale-up."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(
            F.col("l_extendedprice").desc(),
            F.col("l_orderkey"),
            F.col("l_linenumber"),
        )
        .limit(10)
    )
