"""Storage-discipline queries: the partitioned-sink → partition-pruned
read-back loop (SURVEY.md §2.1 S9 exercised end-to-end).

The reference writes hive-layout parquet (``/root/reference/src/main.rs:
236-244``) but nothing ever reads it back pruned. At 100 TB the entire
point of the layout is that a dim-filtered join touches only matching
partition directories — dynamic partition pruning (DPP) — so this module
proves the posture end-to-end: write a fact table partitioned by a
derived date key, join it against a filtered dim, and let the plan show
``PartitionFilters: [... dynamicpruningexpression(...)]`` instead of a
full scan. Plan-lint asserts that in CI (tests/test_plan_quality.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from food_panda_etl_spark.operators.zorder import zorder_key, zorder_key_sql
from food_panda_etl_spark.queries import query
from food_panda_etl_spark.localrel import values_df
from food_panda_etl_spark.tables import load_table

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _dpp_path(sf_dir: str) -> str:
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    return os.path.join(_REPO_ROOT, ".tmp", f"dpp_lineitem_{tag}")


def partitioned_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem written through the S9 hive-partitioned sink, partitioned
    by ship year-month, then read back as a partitioned source. Rewritten
    idempotently per sf_dir (overwrite)."""
    path = _dpp_path(sf_dir)
    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "ship_ym", F.date_format("l_shipdate", "yyyy-MM")
    )
    li.write.mode("overwrite").partitionBy("ship_ym").parquet(path)
    return spark.read.parquet(path)


@query(
    "q_partition_prune",
    oracle="""
    SELECT strftime(l_shipdate, '%Y-%m') AS ship_ym,
           count(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    WHERE year(l_shipdate) = 1995
    GROUP BY 1
    """,
)
def q_partition_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9 round-trip + DPP: the fact side is the partitioned read-back,
    the dim side is a GENERATED month dim — ``spark.range`` → the twelve
    '1995-MM' strings — with a selective runtime predicate, and the join
    key is the partition column: the fact scan must carry a
    ``dynamicpruningexpression`` partition filter, reading 12 of ~84
    partition directories. The dim costs NOTHING at any scale (a Range
    scan, no table read) — the previous fact-derived
    ``distinct(date_format(l_shipdate))`` dim meant a full fact scan to
    build the build side, paying more than DPP saved at 100 TB (VERDICT
    r3 task 8). Oracle equivalence is STRUCTURAL, not data-dependent: the
    generated set is exactly every month string of 1995, so a fact row
    joins iff its ship_ym starts with '1995' — the
    ``year(l_shipdate) = 1995`` filter by construction. The write → read
    round-trip is the identity on rows.

    100 TB posture: this is the layout/pruning discipline that turns a
    full-corpus scan into a per-day (here per-month) touch; the same plan
    shape covers the reference's city/year/month/day layout."""
    fact = partitioned_lineitem(spark, sf_dir)
    # range(100) + filter(id < 12): the filter is the selective build-side
    # predicate the DPP rule requires (a bare Range has none); it is not
    # constant-folded, so the plan keeps the runtime-evaluable shape of a
    # real month-dim table filtered to one year.
    months = (
        spark.range(100)
        .filter(F.col("id") < 12)
        .select(
            F.concat(
                F.lit("1995-"), F.lpad((F.col("id") + 1).cast("string"), 2, "0")
            ).alias("ship_ym")
        )
    )
    joined = fact.join(months, "ship_ym")
    return (
        joined.groupBy("ship_ym")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_qty"),
        )
    )


@query(
    "q_train_split",
    oracle="""
    WITH tagged AS (
      SELECT o_orderkey,
             ((o_orderkey % 1000) * 761) % 1000 AS bucket
      FROM orders
    )
    SELECT CASE WHEN bucket < 800 THEN 'train'
                WHEN bucket < 900 THEN 'val'
                ELSE 'test' END AS split,
           count(*) AS n,
           min(o_orderkey) AS min_key,
           max(o_orderkey) AS max_key
    FROM tagged GROUP BY 1
    """,
)
def q_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split — the data-mixing primitive
    every training pipeline needs. Assignment is multiplicative hashing
    (Knuth: key · 2654435761 mod 1000), computed OVERFLOW-FREE via modular
    arithmetic: (k·c) mod 1000 ≡ ((k mod 1000)·(c mod 1000)) mod 1000,
    and 2654435761 mod 1000 = 761. The naive k·c product overflows int64
    for orderkey > 3.47e9 (~SF 575), where Spark silently wraps while
    DuckDB errors — the reduced form never exceeds 999·761 and is
    mathematically identical at every key width. Pure integer arithmetic,
    so the SAME rows land in the same split in any engine, any run, any
    partitioning (unlike ``df.randomSplit``, whose assignment depends on
    partition layout). 80/10/10 thresholds on the bucket. A narrow map +
    one aggregation; at 100 TB the split column is computed in the scan
    projection and the write fans out via ``partitionBy('split')``."""
    o = load_table(spark, sf_dir, "orders")
    bucket = ((F.col("o_orderkey") % 1000) * F.lit(761)) % 1000
    tagged = o.select(
        F.when(bucket < 800, "train")
        .when(bucket < 900, "val")
        .otherwise("test")
        .alias("split"),
        "o_orderkey",
    )
    return tagged.groupBy("split").agg(
        F.count("*").alias("n"),
        F.min("o_orderkey").alias("min_key"),
        F.max("o_orderkey").alias("max_key"),
    )


@query(
    "q_stratified_sample",
    oracle="""
    WITH tagged AS (
      SELECT lang,
             CASE WHEN ((doc_id % 997) * 631) % 997
                  < (CASE WHEN lang = 'en' THEN 299 ELSE 997 END)
                  THEN 1 ELSE 0 END AS keep
      FROM documents
    )
    SELECT lang,
           count(*) AS n_total,
           CAST(SUM(keep) AS BIGINT) AS n_kept
    FROM tagged GROUP BY lang
    """,
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling — language rebalancing, the data
    mixing step every multilingual training pipeline runs (downsample the
    dominant language: en keeps ~30%, everything else 100%). Assignment
    is the same overflow-free multiplicative-hash-bucket trick as
    ``q_train_split`` with INDEPENDENT constants (mod 997, multiplier
    631), so sample membership is uncorrelated with split membership and
    identical in any engine / any partitioning — unlike
    ``DataFrame.sampleBy``, whose kept set depends on partition layout.
    A narrow map + one aggregation; at 100 TB the keep predicate sits in
    the scan projection and rows drop before any shuffle."""
    d = load_table(spark, sf_dir, "documents")
    rate_bucket = F.when(F.col("lang") == "en", 299).otherwise(997)
    keep = (
        ((F.col("doc_id") % 997) * F.lit(631)) % 997 < rate_bucket
    ).cast("int")
    return (
        d.select("lang", keep.alias("keep"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_total"),
            F.sum("keep").alias("n_kept"),
        )
    )


@query(
    "q_pack_chunks",
    oracle="""
    WITH t AS (
      SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents
    ),
    c AS (
      SELECT doc_id, n_tokens,
             SUM(n_tokens) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM t
    )
    SELECT doc_id, n_tokens,
           CAST((cum - n_tokens) // 2048 AS BIGINT) AS chunk_start,
           CAST((cum - 1) // 2048 AS BIGINT) AS chunk_end
    FROM c
    """,
)
def q_pack_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence PACKING layout — "concatenate the corpus in doc_id order
    and cut a training chunk every 2048 tokens": each document's token
    span is [prefix_sum - n_tokens, prefix_sum), so its first/last chunk
    ids are pure integer arithmetic on the global token prefix-sum. The
    prefix-sum comes from ``operators/order.py::global_running_sum`` —
    range partition + local cumsum + broadcast per-partition offsets —
    NOT a single-partition window, so the layout computation scales with
    the cluster while remaining bit-identical to the naive
    ``SUM() OVER (ORDER BY ...)`` (integer addition re-associates
    losslessly; asserted in tests). Downstream, grouping by chunk id
    materializes the actual training batches."""
    from food_panda_etl_spark.operators.order import global_running_sum

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
    )
    cum = global_running_sum(toks, ["doc_id"], "n_tokens", "cum")
    start = F.col("cum") - F.col("n_tokens")
    last = F.col("cum") - 1
    return cum.select(
        "doc_id",
        "n_tokens",
        ((start - F.pmod(start, F.lit(2048))) / 2048).cast("long").alias("chunk_start"),
        ((last - F.pmod(last, F.lit(2048))) / 2048).cast("long").alias("chunk_end"),
    )


@query(
    "q_snapshot_diff",
    oracle="""
    WITH old AS (
      SELECT o_orderkey, o_orderstatus, CAST(o_totalprice AS DOUBLE) AS o_totalprice
      FROM orders WHERE o_orderkey % 97 <> 0
    ),
    new AS (
      SELECT o_orderkey, o_orderstatus,
             CASE WHEN o_orderkey % 7 = 0
                  THEN CAST(o_totalprice AS DOUBLE) + 1.0
                  ELSE CAST(o_totalprice AS DOUBLE) END AS o_totalprice
      FROM orders WHERE o_orderkey % 89 <> 0
    )
    SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
           CASE WHEN o.o_orderkey IS NULL THEN 'added'
                WHEN n.o_orderkey IS NULL THEN 'removed'
                ELSE 'changed' END AS change_type
    FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
    WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL
       OR o.o_totalprice IS DISTINCT FROM n.o_totalprice
       OR o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
    """,
)
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-capture between two snapshot versions
    (``operators/diff.py::snapshot_diff`` — one co-partitioned full-outer
    join, null-safe column compares in codegen). The two snapshots are
    deterministic derivations of ``orders``: the old one is missing every
    97th key (→ 'added'), the new one is missing every 89th (→ 'removed')
    and bumps o_totalprice on every 7th (→ 'changed'); unchanged keys
    must NOT appear. The +1.0 price bump is exact in doubles (prices ≪
    2^52), so both engines see the identical changed set."""
    from food_panda_etl_spark.operators.diff import snapshot_diff

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", F.col("o_totalprice").cast("double")
    )
    old = o.filter(F.col("o_orderkey") % 97 != 0)
    new = o.filter(F.col("o_orderkey") % 89 != 0).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 7 == 0, F.col("o_totalprice") + F.lit(1.0)
        ).otherwise(F.col("o_totalprice")),
    )
    return snapshot_diff(old, new, keys=["o_orderkey"])


_ZKEY_SQL = zorder_key_sql(["db", "pb"], bits=8)


@query(
    "q_zorder",
    oracle=f"""
    WITH b AS (
      SELECT CAST(date_diff('day', DATE '1995-01-01', CAST(l_shipdate AS DATE))
                  % 256 AS BIGINT) AS db,
             CAST(l_partkey % 256 AS BIGINT) AS pb
      FROM lineitem),
    k AS (SELECT ({_ZKEY_SQL}) AS zkey, db, pb FROM b)
    SELECT CAST(zkey >> 8 AS BIGINT) AS zbox,
           count(*) AS n,
           CAST(min(db) AS BIGINT) AS min_db, CAST(max(db) AS BIGINT) AS max_db,
           CAST(min(pb) AS BIGINT) AS min_pb, CAST(max(pb) AS BIGINT) AS max_pb
    FROM k GROUP BY zbox
    """,
)
def q_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key, DECLARED and oracled (VERDICT r3
    task 4): every lineitem row gets the bit-interleaved key of its
    (ship-day bucket, partkey bucket) — ``operators/zorder.py::
    zorder_key``, pure codegen bit arithmetic — and rows aggregate per
    coarse Z-box (key >> 8, the top 4 bits of each dimension
    interleaved). The DuckDB oracle recomputes the key with
    ``zorder_key_sql``, the function's own ANSI-SQL mirror — a
    bit-for-bit cross-engine proof of the interleave arithmetic
    (BIGINT-cast terms, input masking, position layout). The per-box
    min/max spans in the output are exactly the per-file statistics a
    Z-clustered write exposes for multi-dimension file skipping — the
    skipping effect itself (clustered layout touches fewer files than
    unclustered under a 2-predicate filter) is asserted in
    tests/test_zorder.py on real written parquet footers."""
    li = load_table(spark, sf_dir, "lineitem")
    b = li.select(
        (F.datediff(F.col("l_shipdate"), F.lit("1995-01-01").cast("date")) % 256)
        .cast("long")
        .alias("db"),
        (F.col("l_partkey") % 256).cast("long").alias("pb"),
    )
    k = b.select(
        "db", "pb", zorder_key([F.col("db"), F.col("pb")], bits=8).alias("zkey")
    )
    return k.groupBy(
        F.shiftright("zkey", 8).cast("long").alias("zbox")
    ).agg(
        F.count("*").alias("n"),
        F.min("db").alias("min_db"),
        F.max("db").alias("max_db"),
        F.min("pb").alias("min_pb"),
        F.max("pb").alias("max_pb"),
    )


@query(
    "q_upsert",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           CASE WHEN o_orderkey % 7 = 0
                THEN CAST(o_totalprice AS DOUBLE) + 1.0
                ELSE CAST(o_totalprice AS DOUBLE) END AS o_totalprice
    FROM orders WHERE o_orderkey % 89 <> 0
    """,
)
def q_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC APPLY — the other half of q_snapshot_diff's story: starting
    from the same derived ``old``/``new`` snapshots, Spark computes the
    diff manifest, extracts the change set FROM it (updates = new rows
    semi-joined to added/changed keys; tombstones = removed keys), and
    replays it onto ``old`` with `operators/diff.py::upsert_snapshot`.
    The oracle is simply the direct derivation of ``new`` — so a hash
    match proves diff→apply is the identity: every inserted, overwritten,
    deleted, and untouched row lands bit-for-bit where the target
    snapshot has it. At 100 TB this is two co-partitioned joins (diff +
    apply) and an anti join; bucketed bases pay zero exchanges."""
    from food_panda_etl_spark.operators.diff import snapshot_diff, upsert_snapshot

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", F.col("o_totalprice").cast("double")
    )
    old = o.filter(F.col("o_orderkey") % 97 != 0)
    new = o.filter(F.col("o_orderkey") % 89 != 0).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 7 == 0, F.col("o_totalprice") + F.lit(1.0)
        ).otherwise(F.col("o_totalprice")),
    )
    diff = snapshot_diff(old, new, keys=["o_orderkey"])
    updates = new.join(
        diff.filter(F.col("change_type") != "removed").select("o_orderkey"),
        "o_orderkey",
        "semi",
    )
    deletes = diff.filter(F.col("change_type") == "removed")
    return upsert_snapshot(old, updates, keys=["o_orderkey"], deletes=deletes)


@query(
    "q_mix_to_target",
    oracle="""
    WITH w AS (SELECT * FROM (VALUES
        ('en',40),('zh',15),('es',15),('de',15),('fr',15)) AS t(lang, wgt)),
    n AS (SELECT lang, count(*) AS n_s FROM documents GROUP BY lang),
    j AS (SELECT n.lang, n.n_s, w.wgt FROM n JOIN w USING (lang)),
    cap AS (SELECT min(n_s * 100 // wgt) AS n_out FROM j),
    r AS (SELECT lang, n_s,
                 (wgt * (SELECT n_out FROM cap)) // 100 AS quota,
                 (997 * ((wgt * (SELECT n_out FROM cap)) // 100)) // n_s AS rate
          FROM j)
    SELECT d.lang,
           CAST(r.n_s AS BIGINT) AS n_total,
           CAST(r.quota AS BIGINT) AS quota,
           CAST(sum(CASE WHEN ((d.doc_id % 997) * 631) % 997 < r.rate
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
    FROM documents d JOIN r USING (lang)
    GROUP BY d.lang, r.n_s, r.quota
    """,
)
def q_mix_to_target(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 — mixture rebalancing to TARGET weights (en 40%, zh/es/de/
    fr 15% each): unlike `q_stratified_sample`'s fixed per-stratum
    rates, the keep rates here are DERIVED from the targets and the
    observed counts — the output size is capped by the binding stratum
    (largest feasible N_out with downsampling only), each stratum gets
    quota = wgt·N_out/100, and membership is the same engine/partition-
    invariant multiplicative-hash bucket as q_stratified_sample. All
    rate arithmetic is integer division (`div` / `//`), so the oracle
    matches bit-for-bit.

    100 TB shape: pass 1 is a count-only scan (column-pruned to the
    stratum key), the rate table is derived IN-PLAN from stratum-count
    joins (broadcast, no collect anywhere), and pass 2 is a narrow
    broadcast-join + keep predicate — rows drop before any shuffle. The
    declared output is the per-stratum audit (n_total, quota, n_kept);
    production keeps the rows instead of counting them."""
    d = load_table(spark, sf_dir, "documents")
    w = values_df(
        spark,
        [("en", 40), ("zh", 15), ("es", 15), ("de", 15), ("fr", 15)],
        "lang string, wgt int",
    )
    n = d.groupBy("lang").agg(F.count("*").alias("n_s"))
    j = n.join(F.broadcast(w), "lang")
    cap = j.agg(F.min(F.expr("n_s * 100 div wgt")).alias("n_out"))
    r = (
        j.crossJoin(F.broadcast(cap))
        .withColumn("quota", F.expr("(wgt * n_out) div 100"))
        .withColumn("rate", F.expr("(997 * quota) div n_s"))
        .select("lang", "n_s", "quota", "rate")
    )
    keep = (((F.col("doc_id") % 997) * F.lit(631)) % 997 < F.col("rate")).cast(
        "long"
    )
    return (
        d.join(F.broadcast(r), "lang")
        .groupBy("lang", "n_s", "quota")
        .agg(F.sum(keep).alias("n_kept"))
        .select(
            "lang",
            F.col("n_s").cast("long").alias("n_total"),
            F.col("quota").cast("long").alias("quota"),
            F.col("n_kept").cast("long").alias("n_kept"),
        )
    )


@query(
    "q_shuffle_order",
    # PRE-REDUCED hash form (ADVICE r12, the r11 sample_order_hash
    # engine fix): residue-identical to (doc_id·M) % P on every id in
    # both engines' truncated-modulo semantics, but overflow-free on
    # the full int64 range — the raw product leaves int64 at
    # |id| ≳ 7.0e9. Pinned in _PREREDUCED_ORACLES.
    oracle="""
    SELECT doc_id,
           CAST(row_number() OVER (
             ORDER BY ((doc_id % 1000003) * 1315423911) % 1000003, doc_id)
             AS BIGINT)
           AS pos
    FROM documents
    """,
)
def q_shuffle_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 deterministic training-order shuffle (r6) — the
    epoch-reproducible global permutation every trainer wants: order by
    the samplers' shared keyed multiplicative hash
    (`operators/sampling.py::sample_order_hash` — pre-reduced mod P,
    overflow-free on the FULL int64 id range; doc_id tie-break gives a
    total order), position assigned by the two-phase
    `operators/order.py::global_row_number` — range partition + local
    rank + broadcast offsets, never a single-partition window. Unlike
    `df.orderBy(rand())` the permutation is engine-, partitioning- and
    rerun-invariant, so a resumed epoch sees the same order; at 100 TB
    the cost is one range exchange, same as any sort. The oracle is the
    naive global window — equality IS the scale-plan correctness
    proof."""
    from food_panda_etl_spark.operators.order import global_row_number

    from food_panda_etl_spark.operators.sampling import sample_order_hash

    d = load_table(spark, sf_dir, "documents")
    keyed = d.select("doc_id", sample_order_hash("doc_id").alias("__h"))
    return global_row_number(keyed, ["__h", "doc_id"], out_col="pos").select(
        "doc_id", F.col("pos").cast("bigint").alias("pos")
    )


_PPS_K = 25


@query(
    "q_pps_sample",
    # Interpolated from _PPS_K (the CHUNK_WINDOW convention); the oracle
    # is the naive global-window prefix sum — equality with the two-phase
    # range-partitioned plan IS the scale-plan correctness proof.
    oracle=f"""
    WITH w AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS wgt,
                      ((doc_id % 1000003) * 1315423911) % 1000003 AS h
               FROM documents),
    c AS (SELECT doc_id, wgt,
                 sum(wgt) OVER (ORDER BY h, doc_id
                                ROWS UNBOUNDED PRECEDING) AS cum
          FROM w),
    t AS (SELECT sum(wgt) AS tot FROM w)
    SELECT doc_id, wgt AS weight, CAST(cum AS BIGINT) AS cum_weight,
           CAST(({_PPS_K} * cum) // tot
                - ({_PPS_K} * (cum - wgt)) // tot AS BIGINT) AS n_ticks
    FROM c CROSS JOIN t
    WHERE ({_PPS_K} * cum) // tot > ({_PPS_K} * (cum - wgt)) // tot
    """,
)
def q_pps_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 weighted sampling (r6) — systematic probability-
    proportional-to-size selection (Madow), the deterministic
    resampling half of DSIR-style data selection: pick ~25 documents
    with inclusion probability exactly min(1, k·n_chars/Σn_chars) by
    dropping k equally spaced ticks on the hash-ordered cumulative
    weight line. Pure integer arithmetic on the two-phase global prefix
    sum — no RNG, no floats, rerun- and partitioning-invariant; one
    range exchange + a broadcast 1-row total at any scale. See
    `operators/sampling.py` for the certainty-unit and overflow
    accounting."""
    from food_panda_etl_spark.operators.sampling import pps_systematic_sample

    d = load_table(spark, sf_dir, "documents")
    return pps_systematic_sample(d, "n_chars", k=_PPS_K)


_TEMP_K = 300


@query(
    "q_temperature_mix",
    # Interpolated from _TEMP_K. α is fixed at 1/2 because sqrt is the
    # one power IEEE 754 requires to be CORRECTLY ROUNDED — unlike
    # ln/exp/pow it is bit-identical across engines, so temperature
    # sampling at α=0.5 is oracle-exact with no log-free workaround.
    oracle=f"""
    WITH n AS (SELECT lang, count(*) AS n_s FROM documents GROUP BY lang),
    sq AS (SELECT lang, n_s,
                  CAST(sqrt(CAST(n_s AS DOUBLE)) AS DECIMAL(18,9)) AS sqd
           FROM n),
    t AS (SELECT sum(sqd) AS tot FROM sq),
    r AS (SELECT lang, n_s,
                 CAST(floor(CAST({_TEMP_K} AS DOUBLE) * CAST(sqd AS DOUBLE)
                            / CAST((SELECT tot FROM t) AS DOUBLE))
                      AS BIGINT) AS quota
          FROM sq),
    r2 AS (SELECT lang, n_s, quota, (997 * quota) // n_s AS rate FROM r)
    SELECT d.lang,
           CAST(r2.n_s AS BIGINT) AS n_total,
           CAST(r2.quota AS BIGINT) AS quota,
           CAST(sum(CASE WHEN ((d.doc_id % 997) * 631) % 997 < r2.rate
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
    FROM documents d JOIN r2 USING (lang)
    GROUP BY d.lang, r2.n_s, r2.quota
    """,
)
def q_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 temperature mixture sampling (r6) — the mT5/multilingual
    α-sampling rule: stratum quotas ∝ n_s^α with α=1/2, flattening the
    source distribution so small strata (languages, domains) are not
    drowned by the head. Unlike `q_mix_to_target` the weights are
    DATA-DERIVED, not user-supplied. sqrt is IEEE-correctly-rounded —
    the only power function that is — so quotas are bit-exact across
    engines; the per-stratum sqrt addends are decimal-cast before the
    order-independent SUM, membership is the same multiplicative-hash
    bucket as the other samplers. Same 100 TB shape as q_mix_to_target:
    one count-only scan, rates derived in-plan (broadcast, no collect),
    narrow keep predicate — rows drop before any shuffle. Strata whose
    quota exceeds n_s keep everything (downsampling-only; α<1 cannot
    mint rows)."""
    d = load_table(spark, sf_dir, "documents")
    n = d.groupBy("lang").agg(F.count("*").alias("n_s"))
    sq = n.withColumn(
        "__sq", F.sqrt(F.col("n_s").cast("double")).cast("decimal(18,9)")
    )
    tot = sq.agg(F.sum("__sq").alias("__tot"))
    r = (
        sq.crossJoin(F.broadcast(tot))
        .withColumn(
            "quota",
            F.floor(
                F.lit(_TEMP_K).cast("double")
                * F.col("__sq").cast("double")
                / F.col("__tot").cast("double")
            ).cast("bigint"),
        )
        .withColumn("rate", F.expr("(997 * quota) div n_s"))
        .select("lang", "n_s", "quota", "rate")
    )
    keep = (((F.col("doc_id") % 997) * F.lit(631)) % 997 < F.col("rate")).cast(
        "long"
    )
    return (
        d.join(F.broadcast(r), "lang")
        .groupBy("lang", "n_s", "quota")
        .agg(F.sum(keep).alias("n_kept"))
        .select(
            "lang",
            F.col("n_s").cast("long").alias("n_total"),
            F.col("quota").cast("long").alias("quota"),
            F.col("n_kept").cast("long").alias("n_kept"),
        )
    )


@query(
    "q_incremental_agg",
    # The oracle is the DIRECT aggregation of the new snapshot — the
    # q_upsert convention: equality proves maintenance ≡ recompute.
    oracle="""
    WITH new AS (
      SELECT o_orderkey, o_orderstatus,
             CASE WHEN o_orderkey % 7 = 0
                  THEN CAST(o_totalprice AS DOUBLE) + 1.0
                  ELSE CAST(o_totalprice AS DOUBLE) END AS o_totalprice
      FROM orders WHERE o_orderkey % 89 <> 0
    )
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS cnt,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM new GROUP BY o_orderstatus
    """,
)
def q_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 incremental aggregate maintenance (r6) — materialized-view
    refresh from CDC: fold the `snapshot_diff` manifest (the
    q_snapshot_diff fixtures: every 97th key added, every 89th removed,
    every 7th price bumped) into the OLD snapshot's per-status
    (count, sum) aggregate with retraction/insertion deltas — the fact
    table is never re-aggregated; the refresh is change-proportional.
    Values are DECIMAL(18,2)-quantized so decimal sums are associative
    and the maintained aggregate equals the direct recompute of the new
    snapshot BIT-FOR-BIT — which is exactly what the oracle checks
    (the q_upsert identity-proof convention, aggregate edition). See
    `operators/diff.py::incremental_agg_refresh` for the streaming
    update-mode analogy and 100 TB accounting."""
    from food_panda_etl_spark.operators.diff import (
        incremental_agg_refresh,
        snapshot_diff,
    )

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", F.col("o_totalprice").cast("double")
    )
    old = o.filter(F.col("o_orderkey") % 97 != 0)
    new = o.filter(F.col("o_orderkey") % 89 != 0).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 7 == 0, F.col("o_totalprice") + F.lit(1.0)
        ).otherwise(F.col("o_totalprice")),
    )
    qold = old.withColumn("__val", F.col("o_totalprice").cast("decimal(18,2)"))
    qnew = new.withColumn("__val", F.col("o_totalprice").cast("decimal(18,2)"))
    old_agg = qold.groupBy("o_orderstatus").agg(
        F.count("*").cast("bigint").alias("cnt"), F.sum("__val").alias("total")
    )
    # keep_images=True: the manifest carries before/after images, so
    # the refresh never re-joins the snapshots (change-proportional)
    manifest = snapshot_diff(
        qold.select("o_orderkey", "o_orderstatus", "__val"),
        qnew.select("o_orderkey", "o_orderstatus", "__val"),
        keys=["o_orderkey"],
        keep_images=True,
    )
    refreshed = incremental_agg_refresh(
        old_agg,
        manifest,
        keys=["o_orderkey"],
        group_col="o_orderstatus",
        value_col="__val",
    )
    return refreshed.select(
        "o_orderstatus",
        F.col("cnt").cast("bigint").alias("cnt"),
        F.col("total").cast("double").alias("total"),
    )
