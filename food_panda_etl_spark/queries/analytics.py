"""Analytics extensions: pivot/unpivot, cube grouping, discrete
percentiles, regex extraction, histogram binning — standard warehouse
operators beyond the reference's surface (EXT per SURVEY.md §2), each with
a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from food_panda_etl_spark.queries import query
from food_panda_etl_spark.tables import load_table


@query(
    "q_pivot",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) FILTER (l_linestatus = 'O') AS DOUBLE) AS O_qty,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) FILTER (l_linestatus = 'F') AS DOUBLE) AS F_qty,
           CAST(COUNT(*) FILTER (l_linestatus = 'O') AS BIGINT) AS O_cnt,
           CAST(COUNT(*) FILTER (l_linestatus = 'F') AS BIGINT) AS F_cnt
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: one column per (pivot value × aggregate). The explicit value
    list keeps the plan a single pass (no distinct-values pre-query) —
    the required form at scale."""
    li = load_table(spark, sf_dir, "lineitem")
    out = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("qty"),
            F.count(F.lit(1)).alias("cnt"),  # count("*") is rejected inside pivot
        )
    )
    return out.select(
        "l_returnflag",
        F.col("O_qty"), F.col("F_qty"),
        F.col("O_cnt").cast("long").alias("O_cnt"),
        F.col("F_cnt").cast("long").alias("F_cnt"),
    )


@query(
    "q_unpivot",
    oracle="""
    SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS val FROM part
    UNION ALL
    SELECT p_partkey, 'p_retailprice' AS metric, p_retailprice AS val FROM part
    """,
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt: wide → long. Spark's unpivot is a Generate (row
    fan-out), shuffle-free."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.col("p_size").cast("double").alias("p_size"),
        F.col("p_retailprice").cast("double").alias("p_retailprice"),
    ).unpivot("p_partkey", ["p_size", "p_retailprice"], "metric", "val")


@query(
    "q_cube",
    oracle="""
    SELECT n_name, o_orderstatus,
           CAST(GROUPING(n_name, o_orderstatus) AS BIGINT) AS gid,
           count(*) AS cnt
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY CUBE(n_name, o_orderstatus)
    """,
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.4 A7 extension — CUBE with grouping_id disambiguation (rollup is
    q_rollup). Cube expands to 2^k grouping sets in one shuffle pass."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    j = o.join(c, o.o_custkey == c.c_custkey).join(
        F.broadcast(n), c.c_nationkey == n.n_nationkey
    )
    return (
        j.cube("n_name", "o_orderstatus")
        # grouping_id() is only legal inside the cube's agg clause
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count("*").alias("cnt"),
        )
        .select("n_name", "o_orderstatus", "gid", "cnt")
    )


@query(
    "q_percentile",
    oracle="""
    SELECT c_mktsegment,
           quantile_disc(c_acctbal, 0.5) AS p50,
           quantile_disc(c_acctbal, 0.9) AS p90
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def q_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete percentiles (deterministic: selects actual data values, no
    interpolation — hash-safe unlike percentile_cont/approx)."""
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY c_acctbal)").alias("p50"),
        F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY c_acctbal)").alias("p90"),
    )


@query(
    "q_regex_extract",
    oracle="""
    SELECT doc_id,
           regexp_extract(source, '([0-9]+)', 1) AS src_num,
           CAST(regexp_matches(text, '^[a-z]') AS BOOLEAN) AS starts_lower
    FROM documents
    """,
)
def q_regex_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex scalar family: capture-group extraction + boolean match —
    JVM-side regexp, no Python."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_extract("source", r"([0-9]+)", 1).alias("src_num"),
        F.col("text").rlike(r"^[a-z]").alias("starts_lower"),
    )


@query(
    "q_histogram",
    oracle="""
    SELECT CAST(floor(o_totalprice / 50000.0) AS BIGINT) AS bucket,
           count(*) AS cnt,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM orders
    GROUP BY 1
    """,
)
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram binning: floor arithmetic → groupBy — the
    shuffle-once distribution profile (same shape the reference consumes
    as a ratings distribution, /root/reference/src/models/ratings.rs:4-20)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.withColumn(
            "bucket", F.floor(F.col("o_totalprice") / F.lit(50000.0)).cast("long")
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("cnt"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
        )
    )


@query(
    "q_vocab_topp",
    oracle="""
    WITH tf AS (
      SELECT term, count(*) AS freq
      FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents)
      WHERE term <> '' GROUP BY term
    ),
    tot AS (SELECT sum(freq) AS total FROM tf),
    ranked AS (
      SELECT term, freq,
             sum(freq) OVER (ORDER BY freq DESC, term
                             ROWS UNBOUNDED PRECEDING) AS cum
      FROM tf
    )
    SELECT term, CAST(freq AS BIGINT) AS freq, CAST(cum AS BIGINT) AS cum
    FROM ranked CROSS JOIN tot
    WHERE CAST(cum - freq AS DOUBLE) / CAST(total AS DOUBLE) < 0.9
    """,
)
def q_vocab_topp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 — top-p (nucleus) vocabulary truncation: the smallest set of
    terms covering ≥ 90% of corpus token mass — the vocab-building cut a
    tokenizer pipeline runs before assigning ids. A term is kept iff the
    mass BEFORE it (cum − freq) is still under p·total, so the term that
    crosses the threshold is included and the covered mass is ≥ p.
    Deterministic: integer frequencies, an exact integer running sum
    over the total order (freq DESC, term), and one double division of
    identical integers at the boundary — no float accumulation.

    100 TB shape: one fact-wide token hash-agg; the ranked cumsum runs
    over the VOCABULARY (orders of magnitude smaller than the corpus —
    a single-partition window over vocab is the correct plan at any
    corpus size, and if the vocabulary itself were huge the two-phase
    range-partitioned prefix sum `operators/order.py::global_running_sum`
    drops in, same as q_pack_chunks)."""
    from pyspark.sql.window import Window

    d = load_table(spark, sf_dir, "documents")
    tf = (
        d.select(F.explode(F.split("text", " ")).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("term")
        .agg(F.count("*").alias("freq"))
    )
    tot = tf.agg(F.sum("freq").alias("total"))
    w = Window.orderBy(F.col("freq").desc(), F.col("term")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ranked = tf.withColumn("cum", F.sum("freq").over(w))
    return (
        ranked.crossJoin(F.broadcast(tot))
        .filter(
            (F.col("cum") - F.col("freq")).cast("double")
            / F.col("total").cast("double")
            < 0.9
        )
        .select(
            "term",
            F.col("freq").cast("long").alias("freq"),
            F.col("cum").cast("long").alias("cum"),
        )
    )
