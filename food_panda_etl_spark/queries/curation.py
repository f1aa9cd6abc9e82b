"""Declared curation-primitive queries (r10) — the three r9 build-ahead
operators' first driver evidence: exact rank-quantile bucketing
(`operators/quantile_bucket.py`), sequential Poisson priority sampling
(`operators/sampling_priority.py`), and the HLL distinct sketch
(`operators/hll.py`). A NEW module (the `queries/selection.py` /
`graph_extras.py` convention) so every previously-green queries file
stays byte-identical to its recorded evidence.

The query bodies and oracle strings moved VERBATIM from
`tests/test_r10_oracle_previews.py`, where they were pre-verified end
to end through the driver's own compare harness at sf0.001 and sf0.01
during round 9 (the only delta: the HLL hash now pre-casts its key to
BIGINT on BOTH sides — the ADVICE r9 int32-overflow fix, value-
preserving for the bigint l_partkey so the pre-verified hashes stand).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from food_panda_etl_spark.operators.hll import (
    _ALPHA,
    _HASH_MOD,
    _HASH_MUL,
    HLL_M,
    _rank_cap,
)
from food_panda_etl_spark.queries import query
from food_panda_etl_spark.tables import load_table

_CUR_BUCKETS = 4
_PRI_K = 25


@query(
    "q_curriculum_mix",
    oracle=f"""
    WITH r AS (SELECT lang,
                      CAST(((row_number() OVER (ORDER BY n_chars, doc_id)
                             - 1) * {_CUR_BUCKETS}) // (count(*) OVER ())
                           AS INT)
                        AS bucket
               FROM documents)
    SELECT bucket, lang, CAST(count(*) AS BIGINT) AS n
    FROM r GROUP BY bucket, lang
    """,
)
def q_curriculum_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 curriculum/data-card mix (r10) — quality-quartile ×
    language counts over exact rank-quantile buckets of n_chars
    (tiebreak doc_id): `operators/quantile_bucket.py`'s
    bucket = ((rank−1)·b) div N on the two-phase global row number, so
    cut points are the exact empirical quartiles (bucket sizes differ
    by ≤ 1) and the whole assignment replays in SQL as
    `(row_number()−1)*b // count(*)`. ONE range exchange for the rank,
    then a narrow hash agg — never a single-partition window."""
    from food_panda_etl_spark.operators.quantile_bucket import (
        rank_quantile_buckets,
    )

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    return (
        rank_quantile_buckets(
            d, "n_chars", _CUR_BUCKETS, tiebreak_cols=("doc_id",)
        )
        .groupBy("bucket", "lang")
        .agg(F.count("*").cast("bigint").alias("n"))
    )


@query(
    "q_priority_sample",
    oracle=f"""
    WITH w AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS wgt,
                      ((doc_id % 1000003) * 1315423911) % 1000003 AS h
               FROM documents WHERE n_chars > 0)
    SELECT doc_id, wgt AS weight,
           CAST(h AS DOUBLE) / CAST(wgt AS DOUBLE) AS priority
    FROM w
    ORDER BY priority, doc_id
    LIMIT {_PRI_K}
    """,
)
def q_priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 priority (sequential Poisson) sampling (r10) — the
    one-pass approximate-PPS top-25 by n_chars weight
    (`operators/sampling_priority.py`, Ohlsson 1998): ONE narrow
    projection + a global TakeOrdered (per-partition heaps — the fact
    never shuffles), vs the systematic sampler's range exchange +
    broadcast total; measured ~9× cheaper at equal k. The priority is
    one IEEE division of integer-derived doubles with a total-order id
    tiebreak, so the selected set replays exactly as
    `ORDER BY CAST(h AS DOUBLE)/w, id LIMIT k`."""
    from food_panda_etl_spark.operators.sampling_priority import (
        priority_sample,
    )

    d = load_table(spark, sf_dir, "documents")
    return priority_sample(d, "n_chars", k=_PRI_K)


def _hll_oracle(
    group_col: str | None = None,
    key: str = "l_partkey",
    relation: str = "lineitem",
    prefix_ctes: str = "",
    key_filter: str | None = None,
) -> str:
    """The full register replay: same BIGINT-cast key, same two-round
    quadratic mod-Mersenne mix (outer-parenthesised — `%`/`*` equal
    precedence), same bit_count((w & -w) − 1) rank, same integer dyadic
    grid; the alpha·m²·2^grid constant round-trips as the Python
    float's repr CAST to DOUBLE (identical bits both engines). ONE
    builder for the flat and GROUPED replays (the no-drift rule):
    ``group_col`` threads a GROUP BY through every stage — the r11
    q_hll_by_group preview (tests/test_r11_oracle_previews.py) imports
    this with ``group_col="l_returnflag"`` so the grouped declaration
    can never drift from the flat one. The same no-drift rule extends
    to OTHER relations (``key``/``relation``/``prefix_ctes``/
    ``key_filter`` — the r12 q_hll_windowed preview replays the
    registers over a windowed events CTE through this exact builder;
    defaults reproduce the lineitem strings verbatim)."""
    m, P, C = HLL_M, _HASH_MOD, _HASH_MUL
    cap = _rank_cap(m)
    grid = cap + 1
    numer = repr(float(_ALPHA[m]) * m * m * (1 << grid))
    if key_filter is None:
        key_filter = f" WHERE {key} IS NOT NULL"
    h = f"(((CAST({key} AS BIGINT) % {P}) + {P}) % {P})"
    for _ in range(2):
        h = f"(((({h} * {h}) % {P}) * {C}) % {P})"
    if group_col is None:
        return f"""
    WITH {prefix_ctes}r AS (SELECT CAST({h} % {m} AS INT) AS reg,
                      CAST({h} // {m} AS BIGINT) AS w
               FROM {relation}{key_filter}),
    sk AS (SELECT reg,
                  max(CASE WHEN w > 0
                           THEN bit_count((w & -w) - 1) + 1
                           ELSE {cap} END) AS rho
           FROM r GROUP BY reg),
    agg AS (SELECT CAST(count(*) AS BIGINT) AS nonzero_regs,
                   CAST(coalesce(sum(CAST(1 AS BIGINT) << ({grid} - rho)), 0)
                        AS BIGINT) AS sp
            FROM sk),
    ex AS (SELECT CAST(count(DISTINCT {key}) AS BIGINT) AS n_exact
           FROM {relation})
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
    g = group_col
    return f"""
    WITH {prefix_ctes}r AS (SELECT {g} AS g,
                      CAST({h} % {m} AS INT) AS reg,
                      CAST({h} // {m} AS BIGINT) AS w
               FROM {relation}{key_filter}),
    sk AS (SELECT g, reg,
                  max(CASE WHEN w > 0
                           THEN bit_count((w & -w) - 1) + 1
                           ELSE {cap} END) AS rho
           FROM r GROUP BY g, reg),
    agg AS (SELECT g, CAST(count(*) AS BIGINT) AS nz,
                   CAST(coalesce(sum(CAST(1 AS BIGINT) << ({grid} - rho)), 0)
                        AS BIGINT) AS sp
            FROM sk GROUP BY g),
    ex AS (SELECT {g} AS g,
                  CAST(count(DISTINCT {key}) AS BIGINT) AS n_exact
           FROM {relation}{key_filter} GROUP BY {g})
    SELECT agg.g AS {g}, nz AS nonzero_regs,
           CAST(sp + ({m} - nz)
                * (CAST(1 AS BIGINT) << {grid}) AS BIGINT) AS dyadic_sum,
           CAST({numer} AS DOUBLE)
             / CAST(sp + ({m} - nz)
                    * (CAST(1 AS BIGINT) << {grid}) AS DOUBLE)
             AS raw_estimate,
           n_exact,
           (CAST({numer} AS DOUBLE)
             / CAST(sp + ({m} - nz)
                    * (CAST(1 AS BIGINT) << {grid}) AS DOUBLE))
             / CAST(n_exact AS DOUBLE) AS ratio
    FROM agg JOIN ex ON agg.g = ex.g
    """


@query("q_hll_counts", oracle=_hll_oracle())
def q_hll_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 HLL distinct sketch (r10) — the one-row estimate record
    over lineitem l_partkey (`operators/hll.py`): register count, exact
    dyadic harmonic sum (integer grid — every addend a whole power of
    two), raw estimate, exact distinct, and their ratio. ONE narrow
    projection + ONE register hash agg with map-side combine — state is
    m = 256 rows whatever the key cardinality; the oracle replays the
    FULL register pipeline bit-for-bit (trailing-zero rank via
    bit_count((w & -w) − 1), no log2, no clz). The exact-count audit
    column makes the driver check informative: sf0.01's ~2000 distinct
    partkeys sit in the raw-estimator regime (n ≳ 2.5·m), where the
    measured error is 4–12% at m=256. Production path for true 100 TB
    cardinalities: ``mixer="xxhash64"`` (gate-form checks,
    tests/test_hll.py)."""
    from food_panda_etl_spark.operators.hll import hll_estimate, hll_sketch

    li = load_table(spark, sf_dir, "lineitem")
    est = hll_estimate(hll_sketch(li, "l_partkey"))
    exact = li.agg(
        F.countDistinct("l_partkey").cast("bigint").alias("n_exact")
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
