"""Declared count-min-sketch query (r7) — the full sketch replay, not
just a gate verdict: the oracle rebuilds the identical 4×1024 cell
table with the same affine mod-P hashes, so estimates, exact counts,
and the never-underestimate flags must all hash-match bit-for-bit."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from food_panda_etl_spark.operators.cms import _P, oracle_dm_sql
from food_panda_etl_spark.queries import query
from food_panda_etl_spark.tables import load_table

_CMS_WIDTH = 1024
_CMS_DEPTH = 4
_CMS_PROBES = 100

# The (d, A_d, B_d) affine-hash rows come from the ONE shared builder
# (`operators/cms.py::oracle_dm_sql` — constants interpolated from the
# operator, so the oracle's hash family can never drift from the Spark
# side); the former inline _DM_VALUES copy retired when this file's
# keys windowed in r16 (the dm-fragment consolidation, VERDICT r15
# task 5). l_partkey is non-negative, so the raw `% P` form below
# needs no sign re-reduction.


@query(
    "q_cms_counts",
    oracle=f"""
    WITH dm AS {oracle_dm_sql(_CMS_DEPTH)},
    sk AS MATERIALIZED (
      SELECT d, ((l_partkey % {_P}) * a + c) % {_P} % {_CMS_WIDTH} AS b,
             count(*) AS cnt
      FROM lineitem CROSS JOIN dm
      GROUP BY d, ((l_partkey % {_P}) * a + c) % {_P} % {_CMS_WIDTH}),
    pr AS (SELECT unnest(generate_series(1, {_CMS_PROBES})) AS k),
    pc AS (SELECT k, d, ((k % {_P}) * a + c) % {_P} % {_CMS_WIDTH} AS b
           FROM pr CROSS JOIN dm),
    est AS (SELECT k, min(coalesce(cnt, 0)) AS est
            FROM pc LEFT JOIN sk USING (d, b) GROUP BY k),
    ex AS (SELECT l_partkey AS k, count(*) AS exact_cnt FROM lineitem
           WHERE l_partkey BETWEEN 1 AND {_CMS_PROBES} GROUP BY l_partkey)
    SELECT CAST(est.k AS BIGINT) AS k,
           CAST(est.est AS BIGINT) AS est,
           CAST(coalesce(ex.exact_cnt, 0) AS BIGINT) AS exact_cnt,
           CAST(est.est >= coalesce(ex.exact_cnt, 0) AS INT) AS never_under
    FROM est LEFT JOIN ex USING (k)
    """,
)
def q_cms_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 count-min sketch (r7) — point-frequency estimates for 100
    probe part keys against a 4×1024 sketch of the lineitem part-key
    stream (`operators/cms.py`): one depth-way explode + one (d, b)
    hash agg builds the width·depth-bounded sketch whatever the key
    cardinality, the probe estimate is a broadcast cell join + per-key
    MIN, and the exact recount audits the one-sided guarantee
    (never_under must be 1 on every row — CMS cannot underestimate).
    The oracle replays the FULL sketch with the same affine mod-P hash
    family (constants interpolated from the operator), so every cell
    count, estimate, and flag must agree bit-for-bit. At sf0.01 the 20k
    part keys into 1024 buckets produce real collisions (estimates
    strictly above exact counts on most probes) — a real sketch regime,
    not a collision-free toy."""
    from food_panda_etl_spark.operators.cms import cms_estimate, cms_sketch

    li = load_table(spark, sf_dir, "lineitem")
    sk = cms_sketch(li, "l_partkey", width=_CMS_WIDTH, depth=_CMS_DEPTH)
    probes = spark.range(1, _CMS_PROBES + 1).select(F.col("id").alias("k"))
    est = cms_estimate(sk, probes, "k", width=_CMS_WIDTH, depth=_CMS_DEPTH)
    exact = (
        li.filter(
            (F.col("l_partkey") >= 1) & (F.col("l_partkey") <= _CMS_PROBES)
        )
        .groupBy(F.col("l_partkey").alias("k"))
        .agg(F.count("*").alias("exact_cnt"))
    )
    return (
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


_GHH_FRACTION = 0.01


@query(
    "q_group_heavy_hitters",
    # The oracle is the brute-force per-group HAVING — exactly what the
    # operator's output is proven equal to under any partitioning
    # (tests/test_heavy_group.py): the MG candidate set is a per-group
    # superset, the recount is exact, and the threshold arithmetic is
    # the same double comparison on both sides.
    oracle=f"""
    WITH tok AS (SELECT lang, unnest(string_split(text, ' ')) AS token
                 FROM documents),
    ng AS (SELECT lang, count(*) AS n FROM tok GROUP BY lang),
    c AS (SELECT lang, token, CAST(count(*) AS BIGINT) AS cnt
          FROM tok GROUP BY lang, token)
    SELECT c.lang, c.token, c.cnt
    FROM c JOIN ng ON c.lang IS NOT DISTINCT FROM ng.lang
    WHERE CAST(c.cnt AS DOUBLE)
          > CAST({_GHH_FRACTION} AS DOUBLE) * CAST(ng.n AS DOUBLE)
    """,
)
def q_group_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 group-wise heavy hitters (r7) — tokens exceeding 1% of
    EACH language's token stream (`operators/heavy_group.py`): per-
    (partition, group) Misra-Gries summaries with marker rows carrying
    group totals (no separate count pass), then ONE (group, value)
    null-safe semi join + exact per-group recount. The global operator
    would drown minority languages under the majority vocabulary
    (tested); the per-group summaries report each stratum against its
    OWN denominator. Output is identical to the brute-force per-group
    HAVING under any partitioning — which is exactly what the oracle
    computes. 150 (lang, token) hitters at sf0.01."""
    from food_panda_etl_spark.operators.heavy_group import (
        heavy_hitters_by_group,
    )

    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "lang", F.explode(F.split(F.col("text"), " ")).alias("token")
    )
    return heavy_hitters_by_group(
        tok, "lang", "token", fraction=_GHH_FRACTION
    )
