"""Aggregation queries — SURVEY.md §2.4 (A1-A8) plus exact dedup (§2.10).

All double-typed sums go through DECIMAL casts for order-independent,
engine-identical totals (see queries/__init__ conventions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from food_panda_etl_spark.queries import query
from food_panda_etl_spark.tables import load_table


def dsum(col, scale: int = 2):
    """Exact, order-independent sum of a double column: cast each addend to
    DECIMAL(18,scale) (unambiguous — data is scale-decimal money), sum in
    decimal space (associative), return DOUBLE. Map-side partial
    aggregation still applies; only float non-associativity is removed."""
    return F.sum(col.cast(f"decimal(18,{scale})")).cast("double")


@query(
    "q_groupby_agg",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)      AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*)      AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_groupby_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 — TPC-H Q1 shape: scan → pushed filter → hash aggregate with
    map-side partials → small result. The flagship query (SURVEY.md §7
    slice 0). Distribution aggregate analog of the reference's ratings
    shape (/root/reference/src/models/ratings.rs:4-20)."""
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity")
    price = F.col("l_extendedprice")
    disc_price = price * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    out = (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(qty).alias("sum_qty"),
            dsum(price).alias("sum_base_price"),
            F.sum(disc_price.cast("decimal(18,4)")).cast("double").alias("sum_disc_price"),
            F.sum(charge.cast("decimal(18,6)")).cast("double").alias("sum_charge"),
            F.count("*").alias("count_order"),
        )
    )
    return out.select(
        "l_returnflag",
        "l_linestatus",
        "sum_qty",
        "sum_base_price",
        "sum_disc_price",
        "sum_charge",
        (F.col("sum_qty") / F.col("count_order")).alias("avg_qty"),
        (F.col("sum_base_price") / F.col("count_order")).alias("avg_price"),
        "count_order",
    )


@query(
    "q_group_pct",
    oracle="""
    SELECT event_type, cnt,
           CAST(cnt AS DOUBLE) / CAST(SUM(cnt) OVER () AS DOUBLE) AS share
    FROM (SELECT event_type, count(*) AS cnt FROM events GROUP BY event_type)
    """,
)
def q_group_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 — per-group share of total (ref: ratings distribution count +
    percentage per score, /root/reference/src/models/ratings.rs:4-20).
    Grand total via an unpartitioned window over the (tiny) aggregated
    frame — the shuffle is |distinct event_type| rows, not the fact table."""
    e = load_table(spark, sf_dir, "events")
    counts = e.groupBy("event_type").agg(F.count("*").alias("cnt"))
    # Grand total as a broadcast 1-row aggregate instead of an
    # unpartitioned window: same result, no single-partition WindowExec
    # (keeps the "No Partition Defined" warning channel meaningful).
    total = counts.agg(F.sum("cnt").alias("__total"))
    return counts.crossJoin(F.broadcast(total)).select(
        "event_type",
        "cnt",
        (F.col("cnt").cast("double") / F.col("__total").cast("double")).alias("share"),
    )


@query(
    "q_count_distinct",
    oracle="""
    SELECT count(DISTINCT l_partkey) AS n_parts,
           count(DISTINCT l_suppkey) AS n_supps,
           count(*) AS n_rows
    FROM lineitem
    """,
)
def q_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 — multi count-distinct (expand + partial-agg under the hood)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count("*").alias("n_rows"),
    )


@query(
    "q_approx_distinct",
    oracle=None,  # approximate ≠ oracle-exact → rows-only (SURVEY §2.4 A6)
)
def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 — HLL++ approximate distinct: the 100 TB path where exact
    count-distinct's expand-shuffle is too expensive."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.approx_count_distinct("l_partkey", 0.01).alias("approx_parts"),
        F.approx_count_distinct("l_orderkey", 0.01).alias("approx_orders"),
    )


@query(
    "q_rollup",
    oracle="""
    SELECT COALESCE(r_name, 'ALL') AS region_name,
           COALESCE(n_name, 'ALL') AS nation_name,
           count(*) AS cust_cnt
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP(r_name, n_name)
    """,
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 — hierarchical rollup region→nation→grand-total. Dimension joins
    broadcast (nation=25, region=5 rows at every SF)."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    joined = c.join(
        F.broadcast(n), c["c_nationkey"] == n["n_nationkey"]
    ).join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
    out = joined.rollup("r_name", "n_name").agg(F.count("*").alias("cust_cnt"))
    return out.select(
        F.coalesce(F.col("r_name"), F.lit("ALL")).alias("region_name"),
        F.coalesce(F.col("n_name"), F.lit("ALL")).alias("nation_name"),
        "cust_cnt",
    )


@query(
    "q_dedup",
    oracle="""
    SELECT min(doc_id) AS doc_id, text, count(*) AS dup_cnt
    FROM documents GROUP BY text
    """,
)
def q_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 exact dedup — keep min-id representative per identical text.
    Deterministic alternative to dropDuplicates() (which keeps an arbitrary
    row).

    100 TB shape: the shuffle key is ``xxhash64(text)`` (8 bytes), never
    the payload — grouping by the text itself would make the exchange key
    the document body. Collisions are detected with a SECOND independent
    8-byte hash (``xxhash64(text, lit(1))`` — different input tuple ⇒
    independent function): min==max of the second hash per first-hash
    group proves every member was byte-identical up to a double collision
    (both 64-bit hashes colliding simultaneously, ~2⁻¹²⁸ per pair — below
    hardware-error rates). So the only payload that crosses the exchange
    is ``min(text)`` — needed for the output column — exactly ONCE per
    group per mapper, instead of the previous min+max pair (2× body
    bytes). The (astronomically rare) colliding first hashes are
    re-aggregated exactly by full text; that branch joins against an
    almost-always-empty hash list, which AQE's empty-relation propagation
    eliminates at runtime — so the second documents scan never actually
    runs."""
    d = load_table(spark, sf_dir, "documents")
    base = d.select(
        F.xxhash64("text").alias("__h"),
        F.xxhash64("text", F.lit(1)).alias("__h2"),
        "doc_id",
        "text",
    )
    g = base.groupBy("__h").agg(
        F.min("doc_id").alias("doc_id"),
        F.count("*").alias("dup_cnt"),
        F.min("text").alias("text"),
        F.min("__h2").alias("__h2min"),
        F.max("__h2").alias("__h2max"),
    )
    clean = g.filter(F.col("__h2min") == F.col("__h2max")).select(
        "doc_id", "text", "dup_cnt"
    )
    coll_hashes = g.filter(F.col("__h2min") != F.col("__h2max")).select("__h")
    coll = (
        base.join(F.broadcast(coll_hashes), "__h")
        .groupBy("text")
        .agg(F.min("doc_id").alias("doc_id"), F.count("*").alias("dup_cnt"))
        .select("doc_id", "text", "dup_cnt")
    )
    return clean.unionByName(coll)


@query(
    "q_incremental_dedup",
    oracle="""
    WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 0),
    batch AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id, text FROM documents
      WHERE doc_id % 10 <> 0 AND doc_id % 7 = 0
      UNION ALL
      SELECT doc_id + 2000000 AS doc_id, text FROM documents
      WHERE doc_id % 10 = 0 AND doc_id % 6 = 0
    )
    SELECT min(doc_id) AS doc_id, text, CAST(count(*) AS BIGINT) AS dup_cnt
    FROM batch b
    WHERE NOT EXISTS (SELECT 1 FROM corpus c WHERE c.text = b.text)
    GROUP BY text
    """,
)
def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 — INCREMENTAL dedup: dedup a new batch against a standing
    corpus without re-deduping the corpus (the refresh mode the CDC
    operators exist for — see `operators/diff.py` and SCALE.md's CDC
    note: "dedup only against added"). Batch rows whose text already
    exists in the corpus are dropped; survivors are deduped within the
    batch keeping the min-id representative. Deterministic injected
    duplicates (corpus docs re-id'd at +1e6, batch docs at +2e6 — the
    q_llm_prep trick) make both drop paths observable on the
    duplicate-free fixture.

    100 TB shape (the q_dedup discipline, applied twice): the corpus
    side projects to TWO 8-byte hashes before the anti join — the
    standing corpus' payload bytes never move — and the within-batch
    groupBy keys on the same hash pair, so the only payload crossing an
    exchange is min(text) once per surviving group. A false drop needs
    a simultaneous 64+64-bit double collision (~2⁻¹²⁸ per pair, below
    hardware-error rates — same standard q_dedup documents). Both joins
    are plain equi-joins; with corpus and batch bucketed on the hash
    the anti join pays zero exchanges."""
    d = load_table(spark, sf_dir, "documents")
    corpus = d.filter(F.col("doc_id") % 10 != 0)
    batch = (
        d.filter(F.col("doc_id") % 10 == 0)
        .select("doc_id", "text")
        .unionByName(
            corpus.filter(F.col("doc_id") % 7 == 0).select(
                (F.col("doc_id") + 1000000).alias("doc_id"), "text"
            )
        )
        .unionByName(
            d.filter((F.col("doc_id") % 10 == 0) & (F.col("doc_id") % 6 == 0)).select(
                (F.col("doc_id") + 2000000).alias("doc_id"), "text"
            )
        )
    )
    bh = batch.select(
        F.xxhash64("text").alias("__h"),
        F.xxhash64("text", F.lit(1)).alias("__h2"),
        "doc_id",
        "text",
    )
    # NULL-text corpus rows must not participate in the anti join:
    # xxhash64(NULL) is a concrete value, so a hash-keyed anti join
    # would treat NULL texts as equal and DROP a NULL-text batch row —
    # while the oracle's NOT EXISTS (c.text = b.text) never matches
    # NULL and keeps it. SQL comparison semantics win; duplicate-free
    # on the fixture but load-bearing the day the fixture gains NULLs.
    ch = corpus.filter(F.col("text").isNotNull()).select(
        F.xxhash64("text").alias("__h"), F.xxhash64("text", F.lit(1)).alias("__h2")
    )
    return (
        bh.join(ch, ["__h", "__h2"], "left_anti")
        .groupBy("__h", "__h2")
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.min("text").alias("text"),
            F.count("*").alias("dup_cnt"),
        )
        .select("doc_id", "text", "dup_cnt")
    )
