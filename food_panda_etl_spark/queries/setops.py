"""Set operations — SURVEY.md §2.7 (all EXT; the reference has none)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from food_panda_etl_spark.queries import query
from food_panda_etl_spark.tables import load_table


@query(
    "q_union_all",
    oracle="""
    SELECT c_custkey AS k FROM customer
    UNION ALL
    SELECT o_custkey AS k FROM orders
    """,
)
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL — bag union, no shuffle at all (plan concatenation)."""
    c = load_table(spark, sf_dir, "customer").selectExpr("c_custkey AS k")
    o = load_table(spark, sf_dir, "orders").selectExpr("o_custkey AS k")
    return c.unionByName(o)


@query(
    "q_intersect",
    oracle="""
    SELECT c_custkey AS k FROM customer
    INTERSECT
    SELECT o_custkey AS k FROM orders
    """,
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics both engines) — plans as an
    aggregate + left-semi join on the shuffled key."""
    c = load_table(spark, sf_dir, "customer").selectExpr("c_custkey AS k")
    o = load_table(spark, sf_dir, "orders").selectExpr("o_custkey AS k")
    return c.intersect(o)


@query(
    "q_except",
    oracle="""
    SELECT c_custkey AS k FROM customer
    EXCEPT
    SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'O'
    """,
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct) — aggregate + left-anti join. Subtracts only
    customers with OPEN orders: in the fixture every custkey appears in
    orders, so subtracting all orders yielded a vacuous 0-row pass; the
    status filter leaves the customers-without-open-orders set non-empty."""
    c = load_table(spark, sf_dir, "customer").selectExpr("c_custkey AS k")
    o = (
        load_table(spark, sf_dir, "orders")
        .where("o_orderstatus = 'O'")
        .selectExpr("o_custkey AS k")
    )
    return c.subtract(o)
