"""SQL-entry-point queries: the same engine driven through ``spark.sql``
instead of the DataFrame builder — exercising the parser, temp-view
catalog, and Catalyst rewrites the DataFrame API can't reach directly
(correlated-subquery decorrelation, GROUPING SETS).

The reference has no SQL layer (SURVEY.md §4.1 — straight-line imperative
Rust); these are EXT surface proving the Spark-native engine exposes one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from food_panda_etl_spark.queries import query
from food_panda_etl_spark.tables import load_table


def _views(spark: SparkSession, sf_dir: str, *tables: str) -> None:
    for t in tables:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


@query(
    "q_scalar_subquery",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders o
    WHERE o_totalprice = (SELECT max(o2.o_totalprice)
                          FROM orders o2
                          WHERE o2.o_custkey = o.o_custkey)
    """,
)
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (each customer's max-price order).
    Catalyst decorrelates this into an aggregate + join — one shuffle on
    o_custkey, no per-row re-execution (the naive nested-loop reading).
    MAX over doubles is order-independent, so the filter boundary is
    bit-exact across engines."""
    _views(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders o
        WHERE o_totalprice = (SELECT max(o2.o_totalprice)
                              FROM orders o2
                              WHERE o2.o_custkey = o.o_custkey)
        """
    )


@query(
    "q_tpch_q3",
    oracle="""
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
           CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS o_orderdate,
           o_orderpriority
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING'
      AND c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND o_orderdate < DATE '1995-03-15'
      AND l_shipdate > DATE '1995-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 (shipping priority) straight through spark.sql — the
    3-table join + agg + global top-10 benchmark shape. Revenue summed in
    decimal then cast to double (exact, engine-agnostic); l_orderkey
    tie-break makes the LIMIT deterministic."""
    _views(spark, sf_dir, "customer", "orders", "lineitem")
    return spark.sql(
        """
        SELECT l_orderkey,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
               CAST(CAST(o_orderdate AS DATE) AS STRING) AS o_orderdate,
               o_orderpriority
        FROM customer, orders, lineitem
        WHERE c_mktsegment = 'BUILDING'
          AND c_custkey = o_custkey
          AND l_orderkey = o_orderkey
          AND o_orderdate < DATE '1995-03-15'
          AND l_shipdate > DATE '1995-03-15'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, o_orderdate, l_orderkey
        LIMIT 10
        """
    )


@query(
    "q_grouping_sets",
    oracle="""
    SELECT n_name, r_name,
           CAST(GROUPING(n_name, r_name) AS BIGINT) AS gid,
           count(*) AS cnt
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY GROUPING SETS ((n_name), (r_name), ())
    """,
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (neither rollup nor cube): per-nation,
    per-region, and grand totals in ONE shuffle pass — Spark expands the
    sets with an Expand node, not three scans."""
    _views(spark, sf_dir, "nation", "region")
    return spark.sql(
        """
        SELECT n_name, r_name,
               CAST(grouping_id(n_name, r_name) AS BIGINT) AS gid,
               count(*) AS cnt
        FROM nation JOIN region ON n_regionkey = r_regionkey
        GROUP BY GROUPING SETS ((n_name), (r_name), ())
        """
    )


@query(
    "q_exists_subquery",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
      AND NOT EXISTS (SELECT 1 FROM orders o2
                      WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'F'
                        AND o2.o_totalprice < 50000)
    """,
)
def q_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS / NOT EXISTS — Catalyst decorrelates into a
    left-semi plus a left-anti join on o_custkey (two hash joins, no
    per-row subquery re-execution). The filter predicates push into the
    orders scans before either join."""
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
          AND NOT EXISTS (SELECT 1 FROM orders o2
                          WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'F'
                            AND o2.o_totalprice < 50000)
        """
    )


@query(
    "q_tpch_q5",
    oracle="""
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1996-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (local supplier volume) — the 6-table join-ORDERING
    benchmark shape: two fact-sized joins (orders⋈lineitem⋈supplier)
    against three dims (customer, nation, region) plus the
    c_nationkey = s_nationkey correlation that defeats naive left-deep
    planning. Declared through ``spark.sql`` so Catalyst + AQE own the
    join order and strategies: region/nation broadcast, the date filter
    pushes into the orders scan, and the correlation edge is applied as a
    post-join filter on already-joined narrow columns. Revenue summed in
    decimal then cast (exact, engine-agnostic); n_name tie-break pins the
    sort. Window is 1995 (not TPC-H's 1994) because the fixture's orders
    start 1995-01-01 — the 1994 window matched vacuously on 0 rows."""
    _views(
        spark, sf_dir, "customer", "orders", "lineitem", "supplier", "nation", "region"
    )
    return spark.sql(
        """
        SELECT n_name,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        FROM customer, orders, lineitem, supplier, nation, region
        WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
          AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
          AND r_name = 'ASIA'
          AND o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1996-01-01'
        GROUP BY n_name
        ORDER BY revenue DESC, n_name
        """
    )


_TPCH_Q1 = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
         AS sum_base_price,
       CAST(SUM(CAST(CAST(l_extendedprice AS DOUBLE)
                     * (1 - CAST(l_discount AS DOUBLE))
                     AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(CAST(l_extendedprice AS DOUBLE)
                     * (1 - CAST(l_discount AS DOUBLE))
                     * (1 + CAST(l_tax AS DOUBLE))
                     AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
         / CAST(count(*) AS DOUBLE) AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
         / CAST(count(*) AS DOUBLE) AS avg_price,
       CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
         / CAST(count(*) AS DOUBLE) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= DATE '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


@query("q_tpch_q1", oracle=_TPCH_Q1)
def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 (pricing summary report) — THE canonical scan-heavy
    single-table aggregation: one full lineitem pass, 8 aggregates over
    2 grouping columns. The identical SQL string is both the Spark query
    and the oracle. Determinism per the registry conventions: plain
    money sums in DECIMAL(18,2); the disc_price/charge addends are 1-2
    IEEE multiplications of identical doubles (fixed left-assoc
    parenthesization) quantized to DECIMAL(18,6) before the
    order-independent SUM; averages divide the exact decimal sums in
    double space. At 100 TB this is the pure-scan benchmark: predicate
    pushed to parquet, partial aggregation collapses to
    |flags×statuses| rows per mapper, the exchange is KB-sized."""
    _views(spark, sf_dir, "lineitem")
    return spark.sql(_TPCH_Q1)


_TPCH_Q6 = """
SELECT CAST(SUM(CAST(CAST(l_extendedprice AS DOUBLE)
                     * CAST(l_discount AS DOUBLE)
                     AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= DATE '1994-01-01' AND l_shipdate < DATE '1995-01-01'
  AND l_discount BETWEEN CAST(0.05 AS DOUBLE) AND CAST(0.07 AS DOUBLE)
  AND l_quantity < 24
"""


@query("q_tpch_q6", oracle=_TPCH_Q6)
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecasting revenue change) — the selective-scan
    benchmark: three pushed-down predicates, one decimal-quantized
    product sum, a single output row. The discount bounds are written
    CAST(0.05 AS DOUBLE) in BOTH engines because a bare 0.05 is DOUBLE
    in Spark but DECIMAL(3,2) in DuckDB — the documented literal trap —
    and a decimal-vs-double comparison can disagree at the boundary."""
    _views(spark, sf_dir, "lineitem")
    return spark.sql(_TPCH_Q6)
