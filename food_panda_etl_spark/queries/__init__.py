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
    # queries, so keys needing fresh driver evidence register first.
    #
    # R7 ROTATION (VERDICT r6 tasks 1-3, executed as amended by the
    # judge): the 50-slot window is, in order —
    #   1-10  NEW in r7: q_pagerank + q_pmi (operators landed r6 with
    #         property tests; first driver evidence now), then
    #         q_triangle_count, q_labelprop, q_cms_counts,
    #         q_quality_classifier (VERDICT task 3), q_funnel,
    #         q_retention, q_sessionize, q_group_heavy_hitters (all
    #         eight operators new in r7 — every operator in the repo
    #         now has a declared oracled query except sandbox-bound
    #         S10).
    #   11-15 judge-mandated RE-RECORDS: q_kmeans, q_semantic_dedup,
    #         q_embed_centroid (r6 integer-grid quantization, 0b80096),
    #         q_snapshot_diff, q_upsert (r6 null-safe fold, 68c8f7c) —
    #         byte-changed after their r4/r5 greens; judge re-oracled
    #         all five green at sf0.01, contract wants the driver hash.
    #   16-19 byte-changed THIS round (ADVICE r6 guards): q_dsir_weight
    #         + q_select_pipeline (dsir empty-target raise + decimal
    #         widening), q_pps_sample (negative/NaN-weight raise),
    #         q_heavy_hitters (NULL-key contract docs in heavy.py).
    #   20-50 the 31 r4-era greens (VERDICT task 2 — oldest evidence):
    #         sql_layer tail (tpch_q3, grouping_sets, exists_subquery,
    #         tpch_q5), setops (3), storage r4 keys (partition_prune,
    #         train_split, stratified_sample, pack_chunks, zorder),
    #         skew (2), joins (9), windows (8).
    # After r7 nothing in the ledger sits on pre-r5 evidence.
    #
    # R8 ROTATION PLAN: declare + promote q_pps_stratified first
    # (operators/sampling_stratified.py landed r7 with the composition-
    # equivalence property test — the window was full; the oracle form
    # is the flat per-stratum replay) and other r8-new/changed keys,
    # then the
    # r5-era evidence displaced longest (q_llm_prep; approx_gates:
    # minhash/simhash/embed_lsh/cosine_lsh/ivf/dedup_components_lsh/
    # approx_distinct/dedup_keep_rep_lsh; text r5 keys; udx; vendor;
    # retrieval; similarity r5 keys), then the r6-era block (the r6
    # window head), keeping every key's latest evidence ≤ 2 rounds old.
    from food_panda_etl_spark.queries import (  # noqa: F401
        graph,
        quality,
        funnel,
        sketch,
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

    # PROMOTION PASS: registration is module-granular; this list is the
    # exact r7 window order. Dict order is what queries() exposes, so
    # reordering here is exactly reordering the driver's window.
    promoted = [
        # new in r7
        "q_pagerank",
        "q_pmi",
        "q_triangle_count",
        "q_labelprop",
        "q_cms_counts",
        "q_quality_classifier",
        "q_funnel",
        "q_retention",
        "q_sessionize",
        "q_group_heavy_hitters",
        # judge-mandated re-records (r6 byte changes)
        "q_kmeans",
        "q_semantic_dedup",
        "q_embed_centroid",
        "q_snapshot_diff",
        "q_upsert",
        # byte-changed in r7 (ADVICE guards)
        "q_dsir_weight",
        "q_select_pipeline",
        "q_pps_sample",
        "q_heavy_hitters",
        # r4-era refresh (VERDICT r6 task 2)
        "q_tpch_q3",
        "q_grouping_sets",
        "q_exists_subquery",
        "q_tpch_q5",
        "q_union_all",
        "q_intersect",
        "q_except",
        "q_partition_prune",
        "q_train_split",
        "q_stratified_sample",
        "q_pack_chunks",
        "q_zorder",
        "q_skew_agg",
        "q_skew_join",
        "q_inner_join",
        "q_left_join",
        "q_semi_join",
        "q_anti_join",
        "q_range_join",
        "q_join_1n_agg",
        "q_asof_join",
        "q_nullsafe_join",
        "q_interval_join",
        "q_topk_per_group",
        "q_batch_number",
        "q_rank",
        "q_lag_lead",
        "q_running_sum",
        "q_tumbling_window",
        "q_sliding_window",
        "q_session_window",
    ]
    # No filler slots remain: the four r5-era fillers originally slated
    # (q_llm_prep, q_minhash_gate, q_simhash_gate, q_embed_lsh_gate)
    # gave their slots to the late-r7 declarations q_labelprop /
    # q_cms_counts / q_sessionize / q_group_heavy_hitters — first
    # evidence for NEW queries outranks refreshing green r5 evidence;
    # all four displaced keys stay r5-green, byte-unchanged, and lead
    # the r8 refresh list.
    snapshot = dict(QUERIES)
    QUERIES.clear()
    for name in promoted:
        assert name in snapshot, (
            f"promotion list references unknown query {name!r} — update "
            "the r7 rotation list in _load_all alongside any rename"
        )
        QUERIES[name] = snapshot.pop(name)
    QUERIES.update(snapshot)


_load_all()
