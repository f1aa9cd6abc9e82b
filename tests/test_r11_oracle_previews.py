"""r11 declaration preview: the r10 build-ahead operator's future
declared query, run against its EXACT intended DuckDB oracle SQL
through the same compare harness the driver uses — everything but the
registry entry (which must wait for the r11 window per the rotation
contract, enforced by tests/test_registry_rotation.py). When r11
declares q_group_sample, the query body and oracle string move
verbatim into a queries/ module (the tests/test_r10_oracle_previews.py
convention, which executed exactly this way for r10's three keys)."""

from __future__ import annotations

import pytest

from food_panda_etl_spark.tables import load_table
from tests.oracle_compare import compare

_SF01 = "/root/testdata/sf0.01"

_GS_K = 10


@pytest.fixture(params=["sf0.001", "sf0.01"])
def any_sf(request, sf_dir):
    return _SF01 if request.param == "sf0.01" else sf_dir


def test_hll_by_group_preview(spark, any_sf):
    """Group-wise HLL estimate record — distinct part keys per return
    flag in ONE register hash agg (state m rows per group); the oracle
    is the SHARED register-replay builder (`curation._hll_oracle`, one
    definition for flat and grouped — the no-drift rule) with a GROUP
    BY threaded through every stage."""
    from pyspark.sql import functions as F

    from food_panda_etl_spark.operators.hll import hll_estimate, hll_sketch
    from food_panda_etl_spark.queries.curation import _hll_oracle

    li = load_table(spark, any_sf, "lineitem")
    est = hll_estimate(
        hll_sketch(li, "l_partkey", group_cols=("l_returnflag",)),
        group_cols=("l_returnflag",),
    )
    exact = (
        li.filter(F.col("l_partkey").isNotNull())
        .groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").cast("bigint").alias("n_exact"))
    )
    got = est.join(exact, "l_returnflag").select(
        "l_returnflag",
        "nonzero_regs",
        "dyadic_sum",
        "raw_estimate",
        "n_exact",
        (F.col("raw_estimate") / F.col("n_exact").cast("double")).alias(
            "ratio"
        ),
    )
    assert compare(got, _hll_oracle("l_returnflag"), any_sf) == []


def test_random_projection_preview(spark, any_sf):
    """Deterministic JL sign projection 64→4 over the embeddings table:
    one map-only narrow projection, each component a fixed-order double
    fold over zip_with(embedding, ±1 literals) scaled by 1/√k; the
    oracle replays with the SAME literal sign rows from the same
    builder (`operators/random_projection.py::oracle_projection_sql` —
    one definition per side), so every component hash-matches
    bit-for-bit despite being floating point (the q_vector_norm
    fixed-order-fold convention)."""
    from food_panda_etl_spark.operators.random_projection import (
        oracle_projection_sql,
        random_project,
    )

    e = load_table(spark, any_sf, "embeddings")
    got = random_project(e, "embedding", 64, 4)
    assert compare(got, oracle_projection_sql(64, 4), any_sf) == []


def test_hll_xxhash_gate_preview(spark, any_sf):
    """Quality gate for the PRODUCTION HLL mixer (the q_approx_distinct
    gate convention): the xxhash64-mixed sketch estimate must land
    within 20% of the exact distinct order count — generous against
    m=256's ~6.5% standard error, and l_orderkey keeps both SFs in the
    raw-estimator regime (n ≳ 2.5·m: ~1,500 at sf0.001, ~15,000 at
    sf0.01). A 64-bit avalanche hash has no SQL replay, so the oracle
    pins the exact count and the verdict — this is what makes the
    1e9-ceiling swap-out driver-evidenced, not just unit-tested."""
    from pyspark.sql import functions as F

    from food_panda_etl_spark.operators.hll import hll_estimate, hll_sketch

    li = load_table(spark, any_sf, "lineitem")
    est = hll_estimate(
        hll_sketch(li, "l_orderkey", mixer="xxhash64"), mixer="xxhash64"
    )
    exact = li.agg(
        F.count_distinct("l_orderkey").cast("bigint").alias("n_orders")
    )
    got = est.crossJoin(F.broadcast(exact)).select(
        "n_orders",
        (
            F.abs(
                F.col("raw_estimate") - F.col("n_orders").cast("double")
            )
            / F.col("n_orders").cast("double")
            <= 0.2
        )
        .cast("int")
        .alias("meets_target"),
    )
    oracle = """
    SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
           1 AS meets_target
    FROM lineitem
    """
    assert compare(got, oracle, any_sf) == []


def test_cms_windowed_preview(spark, any_sf):
    """Windowed CMS — per-user event frequency over ONLY the trailing
    7 epoch-days: per-day sketches summed over the window (the engine
    side, CMS linearity) vs a direct sketch of the window's rows (the
    oracle side) — equal cell-for-cell by linearity, property-tested in
    tests/test_cms_windowed.py; plus exact recount and the one-sided
    never_under audit (the q_cms_counts convention)."""
    from pyspark.sql import functions as F

    from food_panda_etl_spark.operators.cms import _ADDS, _MULTS, _P, cms_estimate
    from food_panda_etl_spark.operators.cms_windowed import (
        cms_merge_groups,
        cms_sketch_by_group,
    )

    width, depth, probes_n, win = 256, 4, 50, 7
    day_us = 86400 * 1000000
    ev = load_table(spark, any_sf, "events").select(
        F.col("user_id").alias("k"),
        F.expr(f"unix_micros(cast(ts as timestamp)) div {day_us}").alias(
            "day"
        ),
    ).filter(F.col("k").isNotNull() & F.col("day").isNotNull())
    by_day = cms_sketch_by_group(
        ev, "k", ("day",), width=width, depth=depth
    ).localCheckpoint(eager=False)
    mx = by_day.agg(F.max("day").alias("md"))
    recent = cms_merge_groups(
        by_day.crossJoin(F.broadcast(mx))
        .filter(F.col("day") > F.col("md") - win)
        .drop("md")
    )
    probes = spark.range(probes_n).select(F.col("id").alias("k"))
    est = cms_estimate(recent, probes, "k", width=width, depth=depth)
    exact = (
        ev.crossJoin(F.broadcast(mx))
        .filter(
            (F.col("day") > F.col("md") - win)
            & (F.col("k") >= 0) & (F.col("k") < probes_n)
        )
        .groupBy("k")
        .agg(F.count("*").alias("exact_cnt"))
    )
    got = est.join(exact, "k", "left").select(
        F.col("k").cast("bigint").alias("k"),
        F.col("est").cast("bigint").alias("est"),
        F.coalesce(F.col("exact_cnt"), F.lit(0))
        .cast("bigint")
        .alias("exact_cnt"),
        (F.col("est") >= F.coalesce(F.col("exact_cnt"), F.lit(0)))
        .cast("int")
        .alias("never_under"),
    )
    dm = ", ".join(
        f"({d}, {_MULTS[d]}, {_ADDS[d]})" for d in range(depth)
    )
    oracle = f"""
    WITH dm AS (SELECT * FROM (VALUES {dm}) AS t(d, a, c)),
    ev AS (SELECT user_id AS k, epoch_us(ts) // {day_us} AS day
           FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
    mx AS (SELECT max(day) AS md FROM ev),
    win AS MATERIALIZED (
        SELECT k FROM ev CROSS JOIN mx WHERE day > md - {win}),
    sk AS MATERIALIZED (
        SELECT d, ((k % {_P}) * a + c) % {_P} % {width} AS b,
               count(*) AS cnt
        FROM win CROSS JOIN dm
        GROUP BY d, ((k % {_P}) * a + c) % {_P} % {width}),
    pr AS (SELECT unnest(generate_series(0, {probes_n - 1})) AS k),
    pc AS (SELECT k, d, ((k % {_P}) * a + c) % {_P} % {width} AS b
           FROM pr CROSS JOIN dm),
    est AS (SELECT k, min(coalesce(cnt, 0)) AS est
            FROM pc LEFT JOIN sk USING (d, b) GROUP BY k),
    ex AS (SELECT k, count(*) AS exact_cnt FROM win
           WHERE k BETWEEN 0 AND {probes_n - 1} GROUP BY k)
    SELECT CAST(est.k AS BIGINT) AS k,
           CAST(est.est AS BIGINT) AS est,
           CAST(coalesce(ex.exact_cnt, 0) AS BIGINT) AS exact_cnt,
           CAST(est.est >= coalesce(ex.exact_cnt, 0) AS INT) AS never_under
    FROM est LEFT JOIN ex USING (k)
    """
    assert compare(got, oracle, any_sf) == []


def test_group_sample_preview(spark, any_sf):
    """Per-language bottom-10 document sample: deterministic uniform
    per-group selection by the shared multiplicative id-hash, the
    row_number-over-(h, id) replay."""
    from food_panda_etl_spark.operators.sampling_group import (
        group_bottomk_sample,
    )

    d = load_table(spark, any_sf, "documents")
    got = group_bottomk_sample(d, ("lang",), _GS_K)
    oracle = f"""
    WITH h AS (SELECT lang, doc_id,
                      (doc_id * 1315423911) % 1000003 AS h
               FROM documents),
    r AS (SELECT lang, doc_id,
                 CAST(row_number() OVER (PARTITION BY lang
                                         ORDER BY h, doc_id) AS INT) AS rk
          FROM h)
    SELECT lang, doc_id, rk FROM r WHERE rk <= {_GS_K}
    """
    assert compare(got, oracle, any_sf) == []
