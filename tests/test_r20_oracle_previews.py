"""r20 declaration previews: the late-r18 build-ahead operators'
future declared queries, run against their EXACT intended DuckDB
oracle SQL through the same compare harness the driver uses —
everything but the registry entries (which must wait for the r20
window per the rotation contract). When r20 declares them, the bodies
and oracle strings move VERBATIM into a queries/ module and this file
is rewritten registry-driven (the r10–r18 convention, ENFORCED by
tests/test_registry_rotation.py::test_preview_verified_queries_get_declared
— these ``*_preview`` functions fail the build if WINDOW_ROUND reaches
20 without the declarations landing; until then the guard skips this
file, so banking here does NOT bind r19's tight window).

Two component families (the LAST two gaps in the incremental-state
matrix), two declarations:

- q_incremental_cms — the maintained-state refresh face of the
  FREQUENCY-sketch family (`operators/cms_incremental.py`): a 3×512
  CMS of the lineitem part-key stream (non-default geometry — the
  stamp path is exercised off the defaults; ~2k distinct keys into
  512 buckets collide for real at sf0.01), built on the l_orderkey%10
  corpus split and refreshed with the batch split. CMS is LINEAR, so
  the refreshed state is IDENTICAL to the from-scratch sketch of
  corpus ∪ batch and the oracle is the full cell replay over ALL of
  lineitem (the `q_cms_counts` oracle family, constants from the ONE
  shared `oracle_dm_sql` builder) — the hash-match is the linearity
  identity, plus probe estimates with the exact recount and the
  one-sided never_under audit.

- q_incremental_hll — the maintained-state refresh face of the
  DISTINCT-sketch family (`operators/hll_incremental.py`):
  register state over lineitem l_orderkey (~15k distinct at sf0.01 —
  the raw-estimator regime n ≳ 2.5·m), built on the l_orderkey%7
  corpus split via `build_hll_state` (the stamp HLL sketches
  previously lacked), refreshed with the batch split, estimated via
  the stamp-validated `hll_state_estimate` with the exact-distinct
  audit. Registers merge by MAX, so refresh ≡
  from-scratch and the oracle is the full register replay over ALL
  of lineitem via the ONE shared `_hll_oracle` builder
  (`queries/curation.py` — relation/key parameterized, no drift).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from food_panda_etl_spark.tables import load_table
from tests.oracle_compare import compare

_SF01 = "/root/testdata/sf0.01"

_IC_W, _IC_D, _IC_PROBES = 512, 3, 150


@pytest.fixture(params=["sf0.001", "sf0.01"])
def any_sf(request, sf_dir):
    return _SF01 if request.param == "sf0.01" else sf_dir


def test_incremental_cms_preview(spark, any_sf):
    """Incremental CMS from maintained cell state
    (operators/cms_incremental.py): corpus-state + batch refresh →
    probe estimates + exact recount over corpus ∪ batch (= all of
    lineitem, by linearity) with the one-sided never_under audit."""
    from food_panda_etl_spark.operators.cms import cms_estimate, cms_sketch
    from food_panda_etl_spark.operators.cms_incremental import (
        incremental_cms_refresh,
    )

    li = (
        load_table(spark, any_sf, "lineitem")
        .select("l_orderkey", "l_partkey")
        .localCheckpoint(eager=False)  # consumers: state build + recount
    )
    st = cms_sketch(
        li.filter(F.col("l_orderkey") % 10 != 0), "l_partkey", _IC_W, _IC_D
    )
    # pin the refreshed state (the maintained-state regime: state IS a
    # materialized table between refreshes)
    st = incremental_cms_refresh(
        st, li.filter(F.col("l_orderkey") % 10 == 0), "l_partkey",
        _IC_W, _IC_D,
    ).localCheckpoint(eager=False)
    probes = spark.range(1, _IC_PROBES + 1).select(F.col("id").alias("k"))
    est = cms_estimate(st, probes, "k", _IC_W, _IC_D)
    exact = (
        li.filter(
            (F.col("l_partkey") >= 1) & (F.col("l_partkey") <= _IC_PROBES)
        )
        .groupBy(F.col("l_partkey").alias("k"))
        .agg(F.count("*").alias("exact_cnt"))
    )
    got = (
        est.join(exact, "k", "left")
        .select(
            "k",
            "est",
            F.coalesce(F.col("exact_cnt"), F.lit(0)).alias("exact_cnt"),
            (F.col("est") >= F.coalesce(F.col("exact_cnt"), F.lit(0)))
            .cast("int")
            .alias("never_under"),
        )
    )
    from food_panda_etl_spark.operators.cms import _P, oracle_dm_sql

    oracle = f"""
    WITH dm AS {oracle_dm_sql(_IC_D)},
    sk AS MATERIALIZED (
      SELECT d, ((l_partkey % {_P}) * a + c) % {_P} % {_IC_W} AS b,
             count(*) AS cnt
      FROM lineitem CROSS JOIN dm
      GROUP BY d, ((l_partkey % {_P}) * a + c) % {_P} % {_IC_W}),
    pr AS (SELECT unnest(generate_series(1, {_IC_PROBES})) AS k),
    pc AS (SELECT k, d, ((k % {_P}) * a + c) % {_P} % {_IC_W} AS b
           FROM pr CROSS JOIN dm),
    est AS (SELECT k, min(coalesce(cnt, 0)) AS est
            FROM pc LEFT JOIN sk USING (d, b) GROUP BY k),
    ex AS (SELECT l_partkey AS k, count(*) AS exact_cnt FROM lineitem
           WHERE l_partkey BETWEEN 1 AND {_IC_PROBES} GROUP BY l_partkey)
    SELECT CAST(est.k AS BIGINT) AS k,
           CAST(est.est AS BIGINT) AS est,
           CAST(coalesce(ex.exact_cnt, 0) AS BIGINT) AS exact_cnt,
           CAST(est.est >= coalesce(ex.exact_cnt, 0) AS INT) AS never_under
    FROM est LEFT JOIN ex USING (k)
    """
    assert compare(got, oracle, any_sf) == []


def test_incremental_hll_preview(spark, any_sf):
    """Incremental HLL from stamped register state
    (operators/hll_incremental.py): corpus-state + batch refresh →
    the one-row estimate record with the exact-distinct audit, equal
    to the from-scratch sketch of all of lineitem by register-max
    mergeability."""
    from food_panda_etl_spark.operators.hll_incremental import (
        build_hll_state,
        hll_state_estimate,
        incremental_hll_refresh,
    )
    from food_panda_etl_spark.queries.curation import _hll_oracle

    li = (
        load_table(spark, any_sf, "lineitem")
        .select("l_orderkey")
        .localCheckpoint(eager=False)  # consumers: state build + audit
    )
    st = build_hll_state(
        li.filter(F.col("l_orderkey") % 7 != 0), "l_orderkey"
    )
    st = incremental_hll_refresh(
        st, li.filter(F.col("l_orderkey") % 7 == 0), "l_orderkey"
    ).localCheckpoint(eager=False)
    est = hll_state_estimate(st)  # the stamp-validated read
    exact = li.agg(
        F.countDistinct("l_orderkey").cast("bigint").alias("n_exact")
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
    oracle = _hll_oracle(key="l_orderkey")
    assert compare(got, oracle, any_sf) == []
