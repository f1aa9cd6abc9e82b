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
    # correctness driver records only the first N (~50) registered
    # queries, so modules still lacking fresh driver evidence register
    # first. Round-5 rotation (VERDICT r4 task 1): modules CHANGED in r5
    # lead — llm_prep (new composite), clustering (kmeans oracle now
    # mirrors the empty-cell carry-forward + new q_semantic_dedup),
    # approx_gates (+ new q_approx_quantile_gate) — then the
    # r2-era-evidence modules (text, + new q_heavy_hitters /
    # q_token_count_bpe; udx; vendor_pipeline), then retrieval (NEW in
    # r5: q_chunk_text, q_bm25, q_hybrid_rrf) and the r3-era set
    # (similarity — also changed: sampled q_ann_recall, Arrow corpus
    # signing, new q_png_decode + q_quantize_embed — and analytics).
    # The r5 window cut (~50) lands at the analytics module boundary
    # (q_pivot/q_unpivot/q_cube/q_percentile/q_regex_extract/
    # q_histogram displaced — byte-unchanged r3-green code);
    # sorts/relational onward keep their latest green.
    #
    # R6 ROTATION PLAN: promote q_incremental_dedup, q_vocab_topp and
    # q_mix_to_target (NEW late-r5 in aggregates/analytics/storage, no
    # driver evidence yet — the r5 window was full) to the front, then
    # the analytics tail
    # displaced this round (q_pivot/
    # q_unpivot/q_cube/q_percentile/q_regex_extract/q_histogram), then
    # relational (11, r3-era) + sorts (3, r3-era), then aggregates /
    # sql_layer / setops / storage / skew_queries / joins / windows
    # (r4-era), pushing the r5-recorded modules to the back.
    from food_panda_etl_spark.queries import (  # noqa: F401
        llm_prep,
        clustering,
        approx_gates,
        text,
        udx,
        vendor_pipeline,
        retrieval,
        similarity,
        analytics,
        sorts,
        relational,
        aggregates,
        sql_layer,
        setops,
        storage,
        skew_queries,
        joins,
        windows,
    )

    # PROMOTION PASS: registration is module-granular, but the two
    # queries NEW in r5 (q_upsert in storage, q_interval_join in joins)
    # live in modules whose other queries hold fresh r4 greens — pulling
    # the whole modules forward would evict ~15 rotation slots. Instead,
    # promote just these two keys to the head of the registry so
    # brand-new code gets first driver evidence THIS round; the two
    # entries displaced past the window cut (tail of analytics) are
    # byte-unchanged r3-green code. Dict order is what queries() exposes,
    # so reordering here is exactly reordering the driver's window.
    promoted = ["q_upsert", "q_interval_join"]
    snapshot = dict(QUERIES)
    QUERIES.clear()
    for name in promoted:
        QUERIES[name] = snapshot.pop(name)
    QUERIES.update(snapshot)


_load_all()
