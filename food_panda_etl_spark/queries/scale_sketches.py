"""Declared scale-path queries (r13) — the five r12 build-ahead
operators' first driver evidence: the partitioned Bloom membership
filter and its zero-fact-shuffle broadcast pre-filter
(`operators/bloom.py`), the trailing-window HLL distinct
(`operators/hll_windowed.py`), group-wise priority (weighted)
sampling (`operators/sampling_group.py`), and the exact set-similarity
join via prefix filtering (`operators/prefix_join.py`) — plus the
Bloom false-positive-rate audit gate (VERDICT r12 task 6) completing
the sketch-gate symmetry (every other sketch family already carries a
driver-evidenced quality gate). A NEW module (the
`queries/sketch_extras.py` convention) so every previously-green
queries file stays byte-identical to its recorded evidence.

The query bodies and oracle strings moved VERBATIM from
`tests/test_r13_oracle_previews.py`, where they were pre-verified end
to end through the driver's own compare harness at sf0.001 and
sf0.01. `q_jaccard_prefix_join`'s oracle IS the brute-force
`q_ngram_jaccard` SQL — ONE definition, the shared
`operators/overlap_join.NGRAM_JACCARD_ORACLE_SQL` constant, imported
directly into the decorator (r15: overlap_join registers no queries,
so the decoration-time import is order-safe and `_load_all`'s
post-import special case is retired) — hash-matching it is the
prefix-filtering completeness theorem checked by the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from food_panda_etl_spark.operators.bloom import oracle_bloom_dm_sql
from food_panda_etl_spark.operators.cms import _P
from food_panda_etl_spark.operators.overlap_join import (
    NGRAM_JACCARD_ORACLE_SQL,
)
from food_panda_etl_spark.queries import query
from food_panda_etl_spark.queries.curation import _hll_oracle
from food_panda_etl_spark.tables import load_table

_BF_M, _BF_K, _BF_PROBES = 4096, 4, 2000
_BF_WIDTH = _BF_M // _BF_K
_HW_WIN = 7
_DAY_US = 86400 * 1000000
_GPS_K = 10

# FPR audit gate: probe keys live at a base far above any fixture key
# domain (custkeys are ≤ 1.5e5 even at sf1), so the probe set is pure
# absent mass; truly_present is still computed, never assumed. The
# bound is ONE-SIDED like the filter's own guarantee: realized fp may
# undershoot the model freely (at sf0.001 the expected fp over 2000
# probes is ≈ 0.15 — a lower bound would flake), but must not exceed
# 4× the partitioned-form model Π_j(s_j/width) plus an 8-probe
# additive floor. The comparison is PURE INTEGER:
# fp·width⁴ ≤ 4·(Πs_j)·n_absent + 8·width⁴, all terms < 2^54.
_FPR_BASE = 10**9
_FPR_PROBES = 2000
_FPR_MULT_SLACK = 4
_FPR_ADD_SLACK = 8
_W4 = _BF_WIDTH**4


@query(
    "q_bloom_filter",
    oracle=f"""
    WITH dm AS {oracle_bloom_dm_sql(_BF_K)},
    keys AS (SELECT DISTINCT o_custkey AS key FROM orders
             WHERE o_custkey IS NOT NULL),
    bits AS MATERIALIZED (
        SELECT DISTINCT j,
               (((key % {_P}) + {_P}) % {_P} * a + c) % {_P} % {_BF_WIDTH} AS b,
               1 AS st
        FROM keys CROSS JOIN dm),
    pr AS (SELECT unnest(generate_series(0, {_BF_PROBES - 1})) AS k),
    pc AS (SELECT k, j, (((k % {_P}) + {_P}) % {_P} * a + c) % {_P} % {_BF_WIDTH} AS b
           FROM pr CROSS JOIN dm),
    hit AS (SELECT k,
                   CAST(sum(coalesce(st, 0)) = {_BF_K} AS INT)
                     AS maybe_present
            FROM pc LEFT JOIN bits USING (j, b) GROUP BY k),
    tr AS (SELECT pr.k,
                  CAST(keys.key IS NOT NULL AS INT) AS truly_present
           FROM pr LEFT JOIN keys ON pr.k = keys.key)
    SELECT CAST(hit.k AS BIGINT) AS k,
           hit.maybe_present,
           tr.truly_present,
           CAST(hit.maybe_present >= tr.truly_present AS INT) AS never_miss
    FROM hit JOIN tr ON hit.k = tr.k
    """,
)
def q_bloom_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 Bloom membership filter (r12 operator, declared r13) —
    membership over the order custkeys, probed on a fixed id range
    spanning present AND absent keys: no false negatives ever (the
    never_miss audit), and the false positives are THE SAME false
    positives in both engines (deterministic affine bits) — so the
    whole verdict table hash-matches, not just a gate
    (`operators/bloom.py`: build = one k-way explode + ONE ≤ m-row
    distinct agg; probe = broadcast join on (j, b) + per-key agg)."""
    from food_panda_etl_spark.operators.bloom import (
        bloom_probe,
        bloom_sketch,
    )

    o = load_table(spark, sf_dir, "orders")
    sk = bloom_sketch(o, "o_custkey", m_bits=_BF_M, k_hashes=_BF_K)
    probes = spark.range(_BF_PROBES).select(F.col("id").alias("k"))
    mp = bloom_probe(sk, probes, "k", m_bits=_BF_M, k_hashes=_BF_K)
    truth = (
        o.filter(F.col("o_custkey").isNotNull())
        .select(F.col("o_custkey").alias("k"))
        .distinct()
        .withColumn("__t", F.lit(1))
    )
    return mp.join(truth, "k", "left").select(
        F.col("k").cast("bigint").alias("k"),
        F.col("maybe_present"),
        F.coalesce(F.col("__t"), F.lit(0)).cast("int").alias(
            "truly_present"
        ),
        (F.col("maybe_present") >= F.coalesce(F.col("__t"), F.lit(0)))
        .cast("int")
        .alias("never_miss"),
    )


@query(
    "q_bloom_prefilter",
    oracle=f"""
    WITH dm AS {oracle_bloom_dm_sql(_BF_K)},
    keys AS (SELECT DISTINCT c_custkey AS key FROM customer
             WHERE c_acctbal > 5000 AND c_custkey IS NOT NULL),
    bits AS MATERIALIZED (
        SELECT DISTINCT j,
               (((key % {_P}) + {_P}) % {_P} * a + c) % {_P} % {_BF_WIDTH} AS b,
               1 AS st
        FROM keys CROSS JOIN dm),
    pc AS (SELECT o_orderkey, j,
                  (((o_custkey % {_P}) + {_P}) % {_P} * a + c)
                    % {_P} % {_BF_WIDTH} AS b
           FROM orders CROSS JOIN dm),
    verd AS (SELECT o_orderkey,
                    CAST(sum(coalesce(st, 0)) = {_BF_K} AS INT) AS mp
             FROM pc LEFT JOIN bits USING (j, b) GROUP BY o_orderkey),
    agg AS (SELECT CAST(count(*) AS BIGINT) AS n_orders,
                   CAST(sum(mp) AS BIGINT) AS n_pass FROM verd),
    ex AS (SELECT CAST(count(*) AS BIGINT) AS n_exact FROM orders
           WHERE o_custkey IN (SELECT key FROM keys))
    SELECT n_orders, n_pass, n_exact,
           CAST(n_pass >= n_exact AS INT) AS never_miss
    FROM agg CROSS JOIN ex
    """,
)
def q_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 Bloom join pre-filter (r12 operator, declared r13) — the
    operator's actual 100 TB job, driver-evidenced: build over the
    SMALL join side (high-balance customers), pre-filter the FACT
    (orders) with the zero-fact-shuffle broadcast form
    (`operators/bloom.py::bloom_prefilter`: the sketch folds into ONE
    broadcast (j·width+b)→1 map row, the fact side is map-only —
    exchange count PINNED by `tests/test_bloom.py`'s differential plan
    gate), and report the one-row audit — total orders, orders passing
    the filter, the exact semi-join count, and the no-false-negative
    verdict (n_pass ≥ n_exact ALWAYS; the gap is the deterministic FP
    mass both engines reproduce bit-for-bit)."""
    from food_panda_etl_spark.operators.bloom import (
        bloom_prefilter,
        bloom_sketch,
    )

    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_acctbal") > 5000
    )
    sk = bloom_sketch(c, "c_custkey", m_bits=_BF_M, k_hashes=_BF_K)
    o = load_table(spark, sf_dir, "orders")
    flt = bloom_prefilter(sk, o, "o_custkey", m_bits=_BF_M, k_hashes=_BF_K)
    agg = flt.agg(
        F.count("*").cast("bigint").alias("n_orders"),
        F.sum("maybe_present").cast("bigint").alias("n_pass"),
    )
    ex = (
        o.join(
            c.select(F.col("c_custkey").alias("o_custkey")).distinct(),
            "o_custkey",
            "semi",
        )
        .agg(F.count("*").cast("bigint").alias("n_exact"))
    )
    return agg.crossJoin(F.broadcast(ex)).select(
        "n_orders",
        "n_pass",
        "n_exact",
        (F.col("n_pass") >= F.col("n_exact")).cast("int").alias(
            "never_miss"
        ),
    )


@query(
    "q_bloom_fpr_gate",
    oracle=f"""
    WITH dm AS {oracle_bloom_dm_sql(_BF_K)},
    keys AS (SELECT DISTINCT o_custkey AS key FROM orders
             WHERE o_custkey IS NOT NULL),
    bits AS MATERIALIZED (
        SELECT DISTINCT j,
               (((key % {_P}) + {_P}) % {_P} * a + c) % {_P} % {_BF_WIDTH} AS b,
               1 AS st
        FROM keys CROSS JOIN dm),
    sb AS (SELECT CAST(sum(CASE WHEN j = 0 THEN 1 ELSE 0 END)
                  * sum(CASE WHEN j = 1 THEN 1 ELSE 0 END)
                  * sum(CASE WHEN j = 2 THEN 1 ELSE 0 END)
                  * sum(CASE WHEN j = 3 THEN 1 ELSE 0 END) AS BIGINT)
                    AS sbits_prod
          FROM bits),
    pr AS (SELECT unnest(generate_series({_FPR_BASE},
                  {_FPR_BASE + _FPR_PROBES - 1})) AS k),
    pc AS (SELECT k, j, (((k % {_P}) + {_P}) % {_P} * a + c)
                    % {_P} % {_BF_WIDTH} AS b
           FROM pr CROSS JOIN dm),
    hit AS (SELECT k,
                   CAST(sum(coalesce(st, 0)) = {_BF_K} AS INT) AS mp
            FROM pc LEFT JOIN bits USING (j, b) GROUP BY k),
    tr AS (SELECT pr.k, CAST(keys.key IS NOT NULL AS INT) AS tp
           FROM pr LEFT JOIN keys ON pr.k = keys.key),
    agg AS (SELECT CAST(sum(1 - tr.tp) AS BIGINT) AS n_absent,
                   CAST(sum(CASE WHEN tr.tp = 0 THEN hit.mp
                            ELSE 0 END) AS BIGINT) AS n_fp
            FROM hit JOIN tr ON hit.k = tr.k)
    SELECT n_absent, n_fp, sbits_prod,
           CAST(n_fp AS DOUBLE) / CAST(n_absent AS DOUBLE) AS fpr,
           CAST(sbits_prod AS DOUBLE) / CAST({_W4} AS DOUBLE)
             AS expected_fpr,
           1 AS within_bound
    FROM agg CROSS JOIN sb
    """,
)
def q_bloom_fpr_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 Bloom FPR audit gate (declared r13, VERDICT r12 task 6) —
    completes the sketch-gate symmetry (CMS/HLL/minhash/simhash/IVF/KLL
    all carry driver-evidenced quality gates; Bloom's never-miss was
    pinned but its FPR was formula-in-docstring only). Probes 2000
    keys far above the custkey domain, counts realized false positives
    against the ``o_custkey`` sketch, and checks them against the
    partitioned-form model Π_j(s_j/width) — the per-row set-bit ratio
    product, TIGHTER than the classic (1−e^(−kn/m))^k and exactly
    computable in integer arithmetic (no exp, oracle-safe). The bound
    is one-sided with pinned tolerance (4× multiplicative + 8-probe
    additive — realized fp may undershoot freely, exactly like the
    filter's own one-sided guarantee); the oracle recomputes every
    measurement column exactly and PINS within_bound=1, so an
    out-of-model FPR breaks the hash-match. All comparisons integer:
    fp·width⁴ ≤ 4·(Πs_j)·n_absent + 8·width⁴, every term < 2^54."""
    from food_panda_etl_spark.operators.bloom import (
        bloom_probe,
        bloom_sketch,
    )

    o = load_table(spark, sf_dir, "orders")
    sk = bloom_sketch(
        o, "o_custkey", m_bits=_BF_M, k_hashes=_BF_K
    ).localCheckpoint(eager=False)
    sb = sk.agg(
        *[
            F.sum(F.when(F.col("j") == j, 1).otherwise(0)).alias(f"__s{j}")
            for j in range(_BF_K)
        ]
    ).select(
        (
            F.col("__s0") * F.col("__s1") * F.col("__s2") * F.col("__s3")
        )
        .cast("bigint")
        .alias("sbits_prod")
    )
    probes = spark.range(_FPR_BASE, _FPR_BASE + _FPR_PROBES).select(
        F.col("id").alias("k")
    )
    mp = bloom_probe(sk, probes, "k", m_bits=_BF_M, k_hashes=_BF_K)
    truth = (
        o.filter(F.col("o_custkey").isNotNull())
        .select(F.col("o_custkey").alias("k"))
        .distinct()
        .withColumn("__t", F.lit(1))
    )
    agg = (
        mp.join(truth, "k", "left")
        .select(
            F.col("maybe_present"),
            F.coalesce(F.col("__t"), F.lit(0)).alias("tp"),
        )
        .agg(
            F.sum(1 - F.col("tp")).cast("bigint").alias("n_absent"),
            F.sum(
                F.when(F.col("tp") == 0, F.col("maybe_present")).otherwise(
                    0
                )
            )
            .cast("bigint")
            .alias("n_fp"),
        )
    )
    return agg.crossJoin(F.broadcast(sb)).select(
        "n_absent",
        "n_fp",
        "sbits_prod",
        (F.col("n_fp").cast("double") / F.col("n_absent").cast("double"))
        .alias("fpr"),
        (
            F.col("sbits_prod").cast("double")
            / F.lit(_W4).cast("double")
        ).alias("expected_fpr"),
        (
            F.col("n_fp") * F.lit(_W4)
            <= F.lit(_FPR_MULT_SLACK) * F.col("sbits_prod") * F.col("n_absent")
            + F.lit(_FPR_ADD_SLACK) * F.lit(_W4)
        )
        .cast("int")
        .alias("within_bound"),
    )


@query(
    "q_hll_windowed",
    oracle=_hll_oracle(
        key="k",
        relation="win",
        prefix_ctes=f"""ev AS (SELECT user_id AS k,
                      epoch_us(ts) // {_DAY_US} AS day
               FROM events
               WHERE user_id IS NOT NULL AND ts IS NOT NULL),
    mx AS (SELECT max(day) AS md FROM ev),
    win AS MATERIALIZED (
        SELECT k FROM ev CROSS JOIN mx WHERE day > md - {_HW_WIN}),
    """,
        key_filter="",
    ),
)
def q_hll_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 trailing-window HLL distinct (r12 operator, declared r13)
    — trailing-7-day distinct users from per-day HLL sketches
    (`operators/hll_windowed.py`): filter the day groups → max
    registers across the day dimension → estimate, NO rescan of the
    fact — vs the oracle's register replay over the window's rows
    through the SHARED `curation._hll_oracle` builder (one definition
    for flat, grouped, AND windowed — the no-drift rule; the window
    CTEs thread in via ``prefix_ctes``)."""
    from food_panda_etl_spark.operators.hll import hll_estimate, hll_sketch
    from food_panda_etl_spark.operators.hll_windowed import (
        hll_merge_groups,
    )

    ev = (
        load_table(spark, sf_dir, "events")
        .select(
            F.col("user_id").alias("k"),
            F.expr(
                f"unix_micros(cast(ts as timestamp)) div {_DAY_US}"
            ).alias("day"),
        )
        .filter(F.col("k").isNotNull() & F.col("day").isNotNull())
    )
    by_day = hll_sketch(ev, "k", group_cols=("day",)).localCheckpoint(
        eager=False
    )
    mx = by_day.agg(F.max("day").alias("md"))
    recent = hll_merge_groups(
        by_day.crossJoin(F.broadcast(mx))
        .filter(F.col("day") > F.col("md") - _HW_WIN)
        .drop("md")
    )
    est = hll_estimate(recent)
    exact = (
        ev.crossJoin(F.broadcast(mx))
        .filter(F.col("day") > F.col("md") - _HW_WIN)
        .agg(F.countDistinct("k").cast("bigint").alias("n_exact"))
    )
    return est.crossJoin(F.broadcast(exact)).select(
        "nonzero_regs",
        "dyadic_sum",
        "raw_estimate",
        "n_exact",
        (F.col("raw_estimate") / F.col("n_exact").cast("double")).alias(
            "ratio"
        ),
    )


@query(
    "q_group_priority_sample",
    oracle=f"""
    WITH h AS (SELECT lang, doc_id, CAST(n_chars AS BIGINT) AS w,
                      ((doc_id % 1000003) * 1315423911) % 1000003 AS h
               FROM documents),
    p AS (SELECT lang, doc_id, w,
                 CAST(h AS DOUBLE) / CAST(w AS DOUBLE) AS priority
          FROM h WHERE w > 0),
    r AS (SELECT lang, doc_id, w, priority,
                 CAST(row_number() OVER (PARTITION BY lang
                      ORDER BY priority, doc_id) AS INT) AS rk
          FROM p)
    SELECT lang, doc_id, w AS weight, priority, rk
    FROM r WHERE rk <= {_GPS_K}
    """,
)
def q_group_priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 group-wise priority (weighted) sampling (r12 operator,
    declared r13) — per-language WEIGHTED bottom-10 (priority sampling
    per group, weight = n_chars): inclusion ~proportional to length
    within each language at WindowGroupLimit cost
    (`operators/sampling_group.py::group_priority_sample`, the shared
    `priority_expr`) — the row_number-over-(h/w, id) replay;
    priorities are single IEEE divisions of integer-derived doubles,
    so even the double column hash-matches."""
    from food_panda_etl_spark.operators.sampling_group import (
        group_priority_sample,
    )

    d = load_table(spark, sf_dir, "documents")
    return group_priority_sample(d, ("lang",), "n_chars", _GPS_K)


# Oracle = the brute-force q_ngram_jaccard SQL — the ONE shared
# constant (see module docstring); hash-matching it IS the
# prefix-filtering completeness theorem.
@query("q_jaccard_prefix_join", oracle=NGRAM_JACCARD_ORACLE_SQL)
def q_jaccard_prefix_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 exact set-similarity join via prefix filtering (r12
    operator, declared r13) — EXACT 5-gram Jaccard pairs at θ=4/5
    (`operators/prefix_join.py`, Chaudhuri-Ganti-Kaushik 2006 / Xiao
    et al. 2008) — the exact-Jaccard SCALE path: candidates bounded by
    rare-shingle co-occurrence (rarest-first global (df, shingle)
    order, integer-grid prefix length) instead of the brute-force
    O(Σ df²) inverted index, yet not one pair lost — the oracle is
    deliberately the brute-force `q_ngram_jaccard` SQL, so the driver
    hash-match IS the completeness theorem."""
    from food_panda_etl_spark.operators.prefix_join import (
        jaccard_prefix_join,
    )

    d = load_table(spark, sf_dir, "documents")
    return jaccard_prefix_join(
        d, "doc_id", "text", n=5, threshold_num=4, threshold_den=5
    )
