"""Declared-query registry (SURVEY.md §2 ledger).

Each query is registered with ``@query(name, oracle=...)`` so the Spark
implementation and its DuckDB oracle SQL live side by side — the single
most important invariant is that the two produce hash-identical results
(same column names, same value types, deterministic numerics).

Determinism conventions (SURVEY.md §7 "hard parts"):
- Money/double SUMs: cast each addend to DECIMAL(18,s) first (exact,
  order-independent sum), cast the total back to DOUBLE. Identical in both
  engines because the addends are identical doubles rounded to the same
  decimal, and decimal addition is associative.
- Averages: exact decimal sum → double, divided by count in double space
  (IEEE division of identical operands is identical).
- Never ROUND() for correctness; never rely on float aggregation order.
- Decimal→double casts are cross-engine-exact ONLY while the unscaled
  decimal stays below 2^53: DuckDB converts int128→double then divides
  by 10^scale (two roundings), Spark/Python round the decimal directly
  (one). Measured divergence: SUM(price²) AS DECIMAL(28,4) at sf0.001
  differs by 1 ulp after cast. Keep summed scales small and magnitudes
  bounded; multi-moment statistics (corr/covar assembled from big
  moments) are NOT oracle-safe — don't declare them oracled.
- Temporal outputs: strings (date_format/strftime) or integer epochs.
- Ranking windows: always a total order (unique tie-break column).
- Int widths: explicit CASTs so Spark and DuckDB agree (INT vs BIGINT).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a declared query; ``oracle=None`` → rows-only check."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _load_all() -> None:
    # Import side effects populate the registries. ORDER MATTERS: the
    # correctness driver records only the first N registered queries, so
    # modules still lacking fresh driver evidence register first. Round-4
    # rotation (VERDICT r3 tasks 2-6): changed/new code leads — aggregates
    # (q_dedup second-hash rewrite, r3 green predates it), sql_layer
    # (q_tpch_q5 window moved to 1995), setops (q_except now non-vacuous),
    # approx_gates (NEW recall/precision gates for the rows-only
    # approximate queries + the LSH-candidate cluster-dedup scale path),
    # storage (new q_zorder; q_partition_prune dim now Range-generated) —
    # then the modules whose latest greens are r2-era (joins, windows,
    # text, udx, vendor_pipeline). Modules hash-verified in
    # CORRECTNESS_r03.json (similarity, analytics, sorts, relational)
    # register last.
    from food_panda_etl_spark.queries import (  # noqa: F401
        aggregates,
        sql_layer,
        setops,
        approx_gates,
        storage,
        skew_queries,
        clustering,
        joins,
        windows,
        text,
        udx,
        vendor_pipeline,
        similarity,
        analytics,
        sorts,
        relational,
    )


_load_all()
