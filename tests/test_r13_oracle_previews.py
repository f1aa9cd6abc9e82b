"""r13 declaration previews: the r12 build-ahead operators' future
declared queries, run against their EXACT intended DuckDB oracle SQL
through the same compare harness the driver uses — everything but the
registry entries (which must wait for the r13 window per the rotation
contract). When r13 declares them, the bodies and oracle strings move
VERBATIM into a queries/ module and this file is rewritten
registry-driven (the r10/r12 convention, now ENFORCED by
tests/test_registry_rotation.py::test_preview_verified_queries_get_declared
— these ``*_preview`` functions fail the build if WINDOW_ROUND
reaches 13 without the declarations landing)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from food_panda_etl_spark.tables import load_table
from tests.oracle_compare import compare

_SF01 = "/root/testdata/sf0.01"

_BF_M, _BF_K, _BF_PROBES = 4096, 4, 2000
_HW_WIN = 7
_DAY_US = 86400 * 1000000


@pytest.fixture(params=["sf0.001", "sf0.01"])
def any_sf(request, sf_dir):
    return _SF01 if request.param == "sf0.01" else sf_dir


def test_bloom_filter_preview(spark, any_sf):
    """Bloom membership over the order custkeys, probed on a fixed id
    range spanning present AND absent keys: no false negatives ever
    (the never_miss audit), and the false positives are THE SAME false
    positives in both engines (deterministic affine bits) — so the
    whole verdict table hash-matches, not just a gate."""
    from food_panda_etl_spark.operators.bloom import (
        bloom_probe,
        bloom_sketch,
        oracle_bloom_dm_sql,
    )
    from food_panda_etl_spark.operators.cms import _P

    width = _BF_M // _BF_K
    o = load_table(spark, any_sf, "orders")
    sk = bloom_sketch(o, "o_custkey", m_bits=_BF_M, k_hashes=_BF_K)
    probes = spark.range(_BF_PROBES).select(F.col("id").alias("k"))
    mp = bloom_probe(sk, probes, "k", m_bits=_BF_M, k_hashes=_BF_K)
    truth = (
        o.filter(F.col("o_custkey").isNotNull())
        .select(F.col("o_custkey").alias("k"))
        .distinct()
        .withColumn("__t", F.lit(1))
    )
    got = mp.join(truth, "k", "left").select(
        F.col("k").cast("bigint").alias("k"),
        F.col("maybe_present"),
        F.coalesce(F.col("__t"), F.lit(0)).cast("int").alias(
            "truly_present"
        ),
        (F.col("maybe_present") >= F.coalesce(F.col("__t"), F.lit(0)))
        .cast("int")
        .alias("never_miss"),
    )
    oracle = f"""
    WITH dm AS {oracle_bloom_dm_sql(_BF_K)},
    keys AS (SELECT DISTINCT o_custkey AS key FROM orders
             WHERE o_custkey IS NOT NULL),
    bits AS MATERIALIZED (
        SELECT DISTINCT j,
               (((key % {_P}) + {_P}) % {_P} * a + c) % {_P} % {width} AS b,
               1 AS st
        FROM keys CROSS JOIN dm),
    pr AS (SELECT unnest(generate_series(0, {_BF_PROBES - 1})) AS k),
    pc AS (SELECT k, j, (((k % {_P}) + {_P}) % {_P} * a + c) % {_P} % {width} AS b
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
    """
    assert compare(got, oracle, any_sf) == []


def test_hll_windowed_preview(spark, any_sf):
    """Trailing-window distinct users from per-day HLL sketches
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
    from food_panda_etl_spark.queries.curation import _hll_oracle

    ev = (
        load_table(spark, any_sf, "events")
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
    got = est.crossJoin(F.broadcast(exact)).select(
        "nonzero_regs",
        "dyadic_sum",
        "raw_estimate",
        "n_exact",
        (F.col("raw_estimate") / F.col("n_exact").cast("double")).alias(
            "ratio"
        ),
    )
    prefix = f"""ev AS (SELECT user_id AS k,
                      epoch_us(ts) // {_DAY_US} AS day
               FROM events
               WHERE user_id IS NOT NULL AND ts IS NOT NULL),
    mx AS (SELECT max(day) AS md FROM ev),
    win AS MATERIALIZED (
        SELECT k FROM ev CROSS JOIN mx WHERE day > md - {_HW_WIN}),
    """
    oracle = _hll_oracle(
        key="k", relation="win", prefix_ctes=prefix, key_filter=""
    )
    assert compare(got, oracle, any_sf) == []


_GPS_K = 10


def test_group_priority_sample_preview(spark, any_sf):
    """Per-language WEIGHTED bottom-10 (priority sampling per group,
    weight = n_chars): inclusion ~proportional to length within each
    language at WindowGroupLimit cost — the
    row_number-over-(h/w, id) replay; priorities are single IEEE
    divisions of integer-derived doubles, so even the double column
    hash-matches."""
    from food_panda_etl_spark.operators.sampling_group import (
        group_priority_sample,
    )

    d = load_table(spark, any_sf, "documents")
    got = group_priority_sample(d, ("lang",), "n_chars", _GPS_K)
    oracle = f"""
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
    """
    assert compare(got, oracle, any_sf) == []


def test_bloom_prefilter_preview(spark, any_sf):
    """The Bloom operator's actual 100 TB job, driver-evidenced: build
    over the SMALL join side (high-balance customers), pre-filter the
    FACT (orders) with the zero-fact-shuffle broadcast form, and report
    the one-row audit — total orders, orders passing the filter, the
    exact semi-join count, and the no-false-negative verdict
    (n_pass >= n_exact ALWAYS; the gap is the deterministic FP mass
    both engines reproduce bit-for-bit)."""
    from food_panda_etl_spark.operators.bloom import (
        bloom_prefilter,
        bloom_sketch,
        oracle_bloom_dm_sql,
    )
    from food_panda_etl_spark.operators.cms import _P

    width = _BF_M // _BF_K
    c = load_table(spark, any_sf, "customer").filter(
        F.col("c_acctbal") > 5000
    )
    sk = bloom_sketch(c, "c_custkey", m_bits=_BF_M, k_hashes=_BF_K)
    o = load_table(spark, any_sf, "orders")
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
    got = agg.crossJoin(F.broadcast(ex)).select(
        "n_orders",
        "n_pass",
        "n_exact",
        (F.col("n_pass") >= F.col("n_exact")).cast("int").alias(
            "never_miss"
        ),
    )
    oracle = f"""
    WITH dm AS {oracle_bloom_dm_sql(_BF_K)},
    keys AS (SELECT DISTINCT c_custkey AS key FROM customer
             WHERE c_acctbal > 5000 AND c_custkey IS NOT NULL),
    bits AS MATERIALIZED (
        SELECT DISTINCT j,
               (((key % {_P}) + {_P}) % {_P} * a + c) % {_P} % {width} AS b,
               1 AS st
        FROM keys CROSS JOIN dm),
    pc AS (SELECT o_orderkey, j,
                  (((o_custkey % {_P}) + {_P}) % {_P} * a + c)
                    % {_P} % {width} AS b
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
    """
    assert compare(got, oracle, any_sf) == []


def test_jaccard_prefix_join_preview(spark, any_sf):
    """EXACT 5-gram Jaccard pairs at θ=4/5 via prefix filtering
    (`operators/prefix_join.py`) — the exact-Jaccard SCALE path. The
    oracle is deliberately the BRUTE-FORCE inverted-index SQL (the
    declared q_ngram_jaccard oracle form): hash-matching it IS the
    prefix-filtering completeness theorem checked by the driver —
    candidates bounded by rare-shingle co-occurrence, yet not one pair
    lost."""
    from food_panda_etl_spark.operators.prefix_join import (
        jaccard_prefix_join,
    )
    from food_panda_etl_spark.queries import ORACLES

    d = load_table(spark, any_sf, "documents")
    got = jaccard_prefix_join(
        d, "doc_id", "text", n=5, threshold_num=4, threshold_den=5
    )
    assert compare(got, ORACLES["q_ngram_jaccard"], any_sf) == []
