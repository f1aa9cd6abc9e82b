"""Declared sketch/sampling queries (r12) — the five r10/r11
build-ahead operators' first driver evidence: group-wise bottom-k
sampling (`operators/sampling_group.py`), the grouped HLL estimate and
the production-mixer HLL gate (`operators/hll.py`), the windowed CMS
(`operators/cms_windowed.py`), and the JL random projection
(`operators/random_projection.py`). A NEW module (the
`queries/curation.py` / `selection.py` convention) so every
previously-green queries file stays byte-identical to its recorded
evidence.

The query bodies and oracle strings moved VERBATIM from
`tests/test_r11_oracle_previews.py`, where they were pre-verified end
to end through the driver's own compare harness at sf0.001 and sf0.01,
with two intended deltas — both value-identical on every fixture row:
the q_group_sample oracle uses the PRE-REDUCED hash form
``((doc_id % P) * M) % P`` matching the r11 engine fix in
`operators/sampling_group.py` (residue-identical to the preview's raw
form on every fixture id, overflow-free on the full int64 range), and
the q_cms_windowed oracle SIGN-NORMALIZES the key residue
(``((k % P) + P) % P`` — review-caught: the engine's `_cell` uses
pmod while DuckDB's % truncates, so the raw form diverges on negative
keys; fixture user_ids are non-negative, hence value-identical here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from food_panda_etl_spark.operators.cms import _P, oracle_dm_sql
from food_panda_etl_spark.operators.random_projection import (
    oracle_projection_sql,
)
from food_panda_etl_spark.queries import query
from food_panda_etl_spark.queries.curation import _hll_oracle
from food_panda_etl_spark.tables import load_table

_GS_K = 10

_CMSW_WIDTH = 256
_CMSW_DEPTH = 4
_CMSW_PROBES = 50
_CMSW_WIN = 7
_DAY_US = 86400 * 1000000

# The (d, A_d, B_d) affine-hash rows come from the ONE shared builder
# (`operators/cms.py::oracle_dm_sql`); the former inline _CMSW_DM copy
# retired when this file's keys windowed in r16 (the dm-fragment
# consolidation, VERDICT r15 task 5). The q_cms_windowed hash cells
# below keep their sign-normalized `((k % P) + P) % P` form — user_id
# keys could in principle be negative and the engine's `_cell` uses
# pmod where DuckDB's % truncates.


@query(
    "q_group_sample",
    oracle=f"""
    WITH h AS (SELECT lang, doc_id,
                      ((doc_id % 1000003) * 1315423911) % 1000003 AS h
               FROM documents),
    r AS (SELECT lang, doc_id,
                 CAST(row_number() OVER (PARTITION BY lang
                                         ORDER BY h, doc_id) AS INT) AS rk
          FROM h)
    SELECT lang, doc_id, rk FROM r WHERE rk <= {_GS_K}
    """,
)
def q_group_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 group-wise bottom-k sampling (r10 operator, declared r12)
    — per-language bottom-10 document sample: deterministic uniform
    per-group selection by the shared multiplicative id-hash
    (`operators/sampling_group.py`), the row_number-over-(h, id)
    replay. ONE narrow projection + ONE per-group window the optimizer
    rewrites to WindowGroupLimit, so ≤ k rows per (group, partition)
    ever move — per-group state is bounded whatever the group size."""
    from food_panda_etl_spark.operators.sampling_group import (
        group_bottomk_sample,
    )

    d = load_table(spark, sf_dir, "documents")
    return group_bottomk_sample(d, ("lang",), _GS_K)


@query("q_hll_by_group", oracle=_hll_oracle("l_returnflag"))
def q_hll_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 grouped HLL distinct sketch (r10 operator, declared r12)
    — distinct part keys per return flag in ONE register hash agg
    (state m rows per group); the oracle is the SHARED register-replay
    builder (`curation._hll_oracle`, one definition for flat and
    grouped — the no-drift rule) with a GROUP BY threaded through
    every stage."""
    from food_panda_etl_spark.operators.hll import hll_estimate, hll_sketch

    li = load_table(spark, sf_dir, "lineitem")
    est = hll_estimate(
        hll_sketch(li, "l_partkey", group_cols=("l_returnflag",)),
        group_cols=("l_returnflag",),
    )
    exact = (
        li.filter(F.col("l_partkey").isNotNull())
        .groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").cast("bigint").alias("n_exact"))
    )
    return est.join(exact, "l_returnflag").select(
        "l_returnflag",
        "nonzero_regs",
        "dyadic_sum",
        "raw_estimate",
        "n_exact",
        (F.col("raw_estimate") / F.col("n_exact").cast("double")).alias(
            "ratio"
        ),
    )


@query(
    "q_hll_xxhash_gate",
    oracle="""
    SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
           1 AS meets_target
    FROM lineitem
    """,
)
def q_hll_xxhash_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 HLL production-mixer gate (declared r12) — the
    `q_approx_distinct` gate convention for ``mixer="xxhash64"``: the
    xxhash64-mixed sketch estimate must land within 20% of the exact
    distinct order count — generous against m=256's ~6.5% standard
    error, and l_orderkey keeps both SFs in the raw-estimator regime
    (n ≳ 2.5·m: ~1,500 at sf0.001, ~15,000 at sf0.01). A 64-bit
    avalanche hash has no SQL replay, so the oracle pins the exact
    count and the verdict — this is what makes the 1e9-ceiling
    swap-out driver-evidenced, not just unit-tested."""
    from food_panda_etl_spark.operators.hll import hll_estimate, hll_sketch

    li = load_table(spark, sf_dir, "lineitem")
    est = hll_estimate(
        hll_sketch(li, "l_orderkey", mixer="xxhash64"), mixer="xxhash64"
    )
    exact = li.agg(
        F.count_distinct("l_orderkey").cast("bigint").alias("n_orders")
    )
    return est.crossJoin(F.broadcast(exact)).select(
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


@query(
    "q_cms_windowed",
    oracle=f"""
    WITH dm AS {oracle_dm_sql(_CMSW_DEPTH)},
    ev AS (SELECT user_id AS k, epoch_us(ts) // {_DAY_US} AS day
           FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
    mx AS (SELECT max(day) AS md FROM ev),
    win AS MATERIALIZED (
        SELECT k FROM ev CROSS JOIN mx WHERE day > md - {_CMSW_WIN}),
    sk AS MATERIALIZED (
        SELECT d, (((k % {_P}) + {_P}) % {_P} * a + c) % {_P} % {_CMSW_WIDTH} AS b,
               count(*) AS cnt
        FROM win CROSS JOIN dm
        GROUP BY d, (((k % {_P}) + {_P}) % {_P} * a + c) % {_P} % {_CMSW_WIDTH}),
    pr AS (SELECT unnest(generate_series(0, {_CMSW_PROBES - 1})) AS k),
    pc AS (SELECT k, d, (((k % {_P}) + {_P}) % {_P} * a + c) % {_P} % {_CMSW_WIDTH} AS b
           FROM pr CROSS JOIN dm),
    est AS (SELECT k, min(coalesce(cnt, 0)) AS est
            FROM pc LEFT JOIN sk USING (d, b) GROUP BY k),
    ex AS (SELECT k, count(*) AS exact_cnt FROM win
           WHERE k BETWEEN 0 AND {_CMSW_PROBES - 1} GROUP BY k)
    SELECT CAST(est.k AS BIGINT) AS k,
           CAST(est.est AS BIGINT) AS est,
           CAST(coalesce(ex.exact_cnt, 0) AS BIGINT) AS exact_cnt,
           CAST(est.est >= coalesce(ex.exact_cnt, 0) AS INT) AS never_under
    FROM est LEFT JOIN ex USING (k)
    """,
)
def q_cms_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 windowed / group-wise CMS (r10 operator, declared r12) —
    per-user event frequency over ONLY the trailing 7 epoch-days:
    per-day sketches summed over the window (the engine side, CMS
    linearity — `operators/cms_windowed.py`) vs a direct sketch of the
    window's rows (the oracle side) — equal cell-for-cell by
    linearity, property-tested in tests/test_cms_windowed.py; plus
    exact recount and the one-sided never_under audit (the
    q_cms_counts convention). Window state is (groups × d × width)
    cells regardless of event volume — the 100 TB shape."""
    from food_panda_etl_spark.operators.cms import cms_estimate
    from food_panda_etl_spark.operators.cms_windowed import (
        cms_merge_groups,
        cms_sketch_by_group,
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
    by_day = cms_sketch_by_group(
        ev, "k", ("day",), width=_CMSW_WIDTH, depth=_CMSW_DEPTH
    ).localCheckpoint(eager=False)
    mx = by_day.agg(F.max("day").alias("md"))
    recent = cms_merge_groups(
        by_day.crossJoin(F.broadcast(mx))
        .filter(F.col("day") > F.col("md") - _CMSW_WIN)
        .drop("md")
    )
    probes = spark.range(_CMSW_PROBES).select(F.col("id").alias("k"))
    est = cms_estimate(
        recent, probes, "k", width=_CMSW_WIDTH, depth=_CMSW_DEPTH
    )
    exact = (
        ev.crossJoin(F.broadcast(mx))
        .filter(
            (F.col("day") > F.col("md") - _CMSW_WIN)
            & (F.col("k") >= 0)
            & (F.col("k") < _CMSW_PROBES)
        )
        .groupBy("k")
        .agg(F.count("*").alias("exact_cnt"))
    )
    return est.join(exact, "k", "left").select(
        F.col("k").cast("bigint").alias("k"),
        F.col("est").cast("bigint").alias("est"),
        F.coalesce(F.col("exact_cnt"), F.lit(0))
        .cast("bigint")
        .alias("exact_cnt"),
        (F.col("est") >= F.coalesce(F.col("exact_cnt"), F.lit(0)))
        .cast("int")
        .alias("never_under"),
    )


@query("q_random_projection", oracle=oracle_projection_sql(64, 4))
def q_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 JL random projection (r10 operator, declared r12) —
    deterministic sign projection 64→4 over the embeddings table: one
    map-only narrow projection, each component a fixed-order double
    fold over zip_with(embedding, ±1 literals) scaled by 1/√k; the
    oracle replays with the SAME literal sign rows from the same
    builder (`operators/random_projection.py::oracle_projection_sql` —
    one definition per side), so every component hash-matches
    bit-for-bit despite being floating point (the q_vector_norm
    fixed-order-fold convention). No shuffle, no UDF — the plan
    scales as a pure scan."""
    from food_panda_etl_spark.operators.random_projection import (
        random_project,
    )

    e = load_table(spark, sf_dir, "embeddings")
    return random_project(e, "embedding", 64, 4)
