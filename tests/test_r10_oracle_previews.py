"""r10 declaration previews: the three build-ahead operators' future
declared queries, run against their EXACT intended DuckDB oracle SQL
through the same compare harness the driver uses — everything but the
registry entry (which must wait for the r10 window per the rotation
contract, enforced by tests/test_registry_rotation.py). When r10
declares q_curriculum_mix / q_priority_sample / q_hll_counts, the query
bodies and oracle strings move verbatim into a queries/ module."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from food_panda_etl_spark.tables import load_table
from tests.oracle_compare import compare


_SF01 = "/root/testdata/sf0.01"


@pytest.fixture(params=["sf0.001", "sf0.01"])
def any_sf(request, sf_dir):
    return _SF01 if request.param == "sf0.01" else sf_dir


def test_curriculum_mix_preview(spark, any_sf):
    """Quality-quartile × language counts: exact rank-quantile buckets
    of n_chars (tiebreak doc_id), the curriculum/data-card report."""
    from food_panda_etl_spark.operators.quantile_bucket import (
        rank_quantile_buckets,
    )

    d = load_table(spark, any_sf, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    got = (
        rank_quantile_buckets(d, "n_chars", 4, tiebreak_cols=("doc_id",))
        .groupBy("bucket", "lang")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    oracle = """
    WITH r AS (SELECT lang,
                      CAST(((row_number() OVER (ORDER BY n_chars, doc_id)
                             - 1) * 4) // (count(*) OVER ()) AS INT)
                        AS bucket
               FROM documents)
    SELECT bucket, lang, CAST(count(*) AS BIGINT) AS n
    FROM r GROUP BY bucket, lang
    """
    assert compare(got, oracle, any_sf) == []


def test_priority_sample_preview(spark, any_sf):
    """Sequential Poisson top-25 by n_chars weight — the one-pass
    approximate-PPS selection, ORDER BY h/w LIMIT k replay."""
    from food_panda_etl_spark.operators.sampling_priority import (
        priority_sample,
    )

    d = load_table(spark, any_sf, "documents")
    got = priority_sample(d, "n_chars", k=25)
    oracle = """
    WITH w AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS wgt,
                      (doc_id * 1315423911) % 1000003 AS h
               FROM documents WHERE n_chars > 0)
    SELECT doc_id, wgt AS weight,
           CAST(h AS DOUBLE) / CAST(wgt AS DOUBLE) AS priority
    FROM w
    ORDER BY priority, doc_id
    LIMIT 25
    """
    assert compare(got, oracle, any_sf) == []


def test_hll_counts_preview(spark, any_sf):
    """HLL distinct sketch over lineitem l_partkey: the one-row
    estimate record (register count, exact dyadic harmonic sum, raw
    estimate, exact distinct, ratio) — the full register pipeline
    replays in SQL, and the alpha·m²·2^grid constant round-trips as the
    Python float's repr CAST to DOUBLE (identical bits both engines)."""
    from food_panda_etl_spark.operators.hll import (
        _ALPHA,
        _HASH_MOD,
        _HASH_MUL,
        HLL_M,
        _rank_cap,
        hll_estimate,
        hll_sketch,
    )

    li = load_table(spark, any_sf, "lineitem")
    est = hll_estimate(hll_sketch(li, "l_partkey"))
    exact = li.agg(
        F.countDistinct("l_partkey").cast("bigint").alias("n_exact")
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
    m, P, C = HLL_M, _HASH_MOD, _HASH_MUL
    cap = _rank_cap(m)
    grid = cap + 1
    numer = repr(float(_ALPHA[m]) * m * m * (1 << grid))
    h = f"(((l_partkey % {P}) + {P}) % {P})"
    for _ in range(2):
        h = f"(((({h} * {h}) % {P}) * {C}) % {P})"
    oracle = f"""
    WITH r AS (SELECT CAST({h} % {m} AS INT) AS reg,
                      CAST({h} // {m} AS BIGINT) AS w
               FROM lineitem WHERE l_partkey IS NOT NULL),
    sk AS (SELECT reg,
                  max(CASE WHEN w > 0
                           THEN bit_count((w & -w) - 1) + 1
                           ELSE {cap} END) AS rho
           FROM r GROUP BY reg),
    agg AS (SELECT CAST(count(*) AS BIGINT) AS nonzero_regs,
                   CAST(coalesce(sum(CAST(1 AS BIGINT) << ({grid} - rho)), 0)
                        AS BIGINT) AS sp
            FROM sk),
    ex AS (SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_exact
           FROM lineitem)
    SELECT nonzero_regs,
           CAST(sp + ({m} - nonzero_regs)
                * (CAST(1 AS BIGINT) << {grid}) AS BIGINT) AS dyadic_sum,
           CAST({numer} AS DOUBLE)
             / CAST(sp + ({m} - nonzero_regs)
                    * (CAST(1 AS BIGINT) << {grid}) AS DOUBLE)
             AS raw_estimate,
           n_exact,
           (CAST({numer} AS DOUBLE)
             / CAST(sp + ({m} - nonzero_regs)
                    * (CAST(1 AS BIGINT) << {grid}) AS DOUBLE))
             / CAST(n_exact AS DOUBLE) AS ratio
    FROM agg CROSS JOIN ex
    """
    assert compare(got, oracle, any_sf) == []
    # informativeness holds only in the raw regime (n ≳ 2.5·m — the
    # documented small-range bias floor): sf0.01 has ~2000 distinct
    # partkeys (in-regime), sf0.001 ~200 (below it — the estimate
    # still hash-matches, it is just biased high, as documented)
    [row] = got.collect()
    if row["n_exact"] >= 3 * m:
        assert 0.7 < row["ratio"] < 1.3, row
