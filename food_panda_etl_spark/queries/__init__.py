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
- Double→decimal addend casts are safe ONLY for full-mantissa doubles
  (products, divisions, sqrt — their decimal expansions cannot
  terminate on the rounding digit). FLOAT32-sourced values are
  short-mantissa dyadics that CAN terminate exactly on a ...5 at the
  tie digit (0.1494140625 at scale 9), and Spark (HALF_UP) vs DuckDB
  (HALF_EVEN) break that tie differently — found by an sf0.1 sweep,
  r6. For raw float32 columns quantize on the INTEGER grid instead:
  CAST(round(v·1e9) AS BIGINT), one rounding with identical
  half-away-from-zero semantics in both engines, then sum exactly.
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
    # first. Round-6 rotation (VERDICT r5 task 1, executed as written,
    # then extended as r6 grew): 23 promoted keys lead (3 zero-evidence
    # r5 stragglers + 18 new-in-r6 + 2 changed-in-r6), then the r3-era
    # modules — analytics tail, relational (11), sorts (3) — then
    # r4-era aggregates/sql_layer; the cut (~50) lands after
    # q_scalar_subquery (pos 49; tpch_q3/grouping_sets/exists/tpch_q5
    # are first out, all r4-green).
    # setops/storage/skew_queries/joins/windows
    # keep their r4 greens (byte-unchanged, displaced by the r6-new
    # keys — first evidence for new code outranks refreshing green
    # evidence).
    #
    # R7 ROTATION PLAN: declare + promote q_pagerank and q_pmi queries
    # (operators/pagerank.py + operators/pmi.py landed r6 with property
    # tests only — the window was full) and other r7-new/changed keys first, then the
    # r4-era modules displaced this round (setops, storage,
    # skew_queries, joins, windows — oldest evidence remaining), then r5-era
    # llm_prep/clustering/approx_gates to fill ~50; text/udx/vendor/
    # retrieval/similarity carry r5-or-r6 evidence and can close the
    # file.
    from food_panda_etl_spark.queries import (  # noqa: F401
        analytics,
        relational,
        sorts,
        aggregates,
        sql_layer,
        setops,
        storage,
        skew_queries,
        joins,
        windows,
        llm_prep,
        clustering,
        approx_gates,
        text,
        udx,
        vendor_pipeline,
        retrieval,
        similarity,
    )

    # PROMOTION PASS: registration is module-granular, but a handful of
    # keys need window slots ahead of their module's position. Head of
    # the r6 window, in order:
    #   - q_incremental_dedup / q_vocab_topp / q_mix_to_target: landed
    #     late in r5 after the window filled — the ONLY declared queries
    #     with zero driver evidence (judge-verified green locally).
    #   - q_lm_score / q_substring_dedup / q_jpeg_decode: NEW in r6
    #     (VERDICT r5 tasks 3-5) — new code gets first evidence in its
    #     own round.
    #   - q_pii_redact / q_shuffle_order / q_bpe_train / q_bpe_encode /
    #     q_dsir_weight / q_image_resize / q_pps_sample /
    #     q_select_pipeline / q_temperature_mix / q_embed_outlier / q_corpus_stats / q_incremental_agg / q_tpch_q1 / q_tpch_q6 / q_nfc_normalize:
    #     NEW in r6 beyond the verdict tasks (PII,
    #     training-order shuffle, BPE train+encode, DSIR weighting,
    #     image resize, systematic PPS, the selection composite, and
    #     mT5-style temperature mixing, embedding outlier QA, the
    #     corpus statistics card, incremental aggregate maintenance, and
    #     the TPC-H Q1/Q6 scan benchmarks, Unicode NFC normalization).
    #   - q_approx_quantile_gate / q_heavy_hitters: code CHANGED in r6
    #     (scale-safe exact rank pick, task 2; single-action recount,
    #     task 6) — their r5 greens no longer cover the bytes.
    # Dict order is what queries() exposes, so reordering here is
    # exactly reordering the driver's window.
    promoted = [
        "q_incremental_dedup",
        "q_vocab_topp",
        "q_mix_to_target",
        "q_lm_score",
        "q_substring_dedup",
        "q_jpeg_decode",
        "q_pii_redact",
        "q_shuffle_order",
        "q_bpe_train",
        "q_bpe_encode",
        "q_dsir_weight",
        "q_image_resize",
        "q_pps_sample",
        "q_select_pipeline",
        "q_temperature_mix",
        "q_embed_outlier",
        "q_corpus_stats",
        "q_incremental_agg",
        "q_tpch_q1",
        "q_tpch_q6",
        "q_nfc_normalize",
        "q_approx_quantile_gate",
        "q_heavy_hitters",
    ]
    snapshot = dict(QUERIES)
    QUERIES.clear()
    for name in promoted:
        assert name in snapshot, (
            f"promotion list references unknown query {name!r} — update "
            "the r6 rotation list in _load_all alongside any rename"
        )
        QUERIES[name] = snapshot.pop(name)
    QUERIES.update(snapshot)


_load_all()
