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


# The driver-window plan, AS CODE (VERDICT r8 task 7): the correctness
# driver records only the first len(DECLARED_WINDOW) registered queries,
# so this list IS the round's evidence plan — _load_all() promotes it
# verbatim and tests/test_registry_rotation.py asserts the registry
# order matches it, so a planned rotation that fails to land in code
# fails loudly instead of silently (round 8 shipped zero commits because
# the plan lived only in a comment).
WINDOW_ROUND = 12

DECLARED_WINDOW = [
    # 1-5 NEW in r12: the five r10/r11 build-ahead operators' first
    # driver evidence — bodies and oracle strings moved VERBATIM from
    # tests/test_r11_oracle_previews.py (now registry-driven, the r10
    # convention) into queries/sketch_extras.py, where they were
    # pre-verified at sf0.001+sf0.01 through the driver's own compare
    # harness (the only delta: the q_group_sample oracle uses the
    # PRE-REDUCED hash form matching the r11 engine fix — VERDICT r11
    # "what's wrong" #2).
    "q_group_sample",
    "q_hll_by_group",
    "q_hll_xxhash_gate",
    "q_cms_windowed",
    "q_random_projection",
    # +1 byte-changed THIS round: hll.py's merge column check tightened
    # (ADVICE r11) — the flat HLL record re-records on the new bytes.
    "q_hll_counts",
    # 7-14 the r6-era greens — 5-round-old evidence, displaced twice
    # (VERDICT r11 task 1): all byte-unchanged pure-relational keys.
    "q_regex_extract",
    "q_math_funcs",
    "q_rollup",
    "q_cube",
    "q_histogram",
    "q_percentile",
    "q_pivot",
    "q_unpivot",
    # 15-19 byte-changed THIS round (ADVICE r11 medium: the int64
    # pre-reduction moved into the shared sample_order_hash, and the
    # duplicated hash in sampling_group.py deleted): every declared
    # query riding operators/sampling.py re-records on the fixed
    # bytes. Residue-identical on all prior ids, so these must
    # re-record green byte-for-byte.
    "q_priority_sample",
    "q_pps_sample",
    "q_pps_stratified",
    "q_select_pipeline",
    "q_select_stratified",
    # 20 byte-changed THIS round (the nodes localCheckpoint hoist in
    # operators/pagerank.py — VERDICT r10/r11 micro-nit): re-records
    # on the touched bytes.
    "q_pagerank",
    # …-50 the r8-era greens (oldest remaining evidence, 30 of 45 —
    # the 14 left, the graph/funnel/clustering block, rotate in r13):
    # joins, windows, setops, sql-layer, storage/skew blocks.
    "q_inner_join",
    "q_left_join",
    "q_semi_join",
    "q_anti_join",
    "q_range_join",
    "q_join_1n_agg",
    "q_asof_join",
    "q_nullsafe_join",
    "q_exists_subquery",
    "q_interval_join",
    "q_topk_per_group",
    "q_rank",
    "q_lag_lead",
    "q_running_sum",
    "q_union_all",
    "q_intersect",
    "q_except",
    "q_tpch_q3",
    "q_tpch_q5",
    "q_grouping_sets",
    "q_tumbling_window",
    "q_sliding_window",
    "q_session_window",
    "q_partition_prune",
    "q_train_split",
    "q_zorder",
    "q_skew_agg",
    "q_skew_join",
    "q_stratified_sample",
    "q_embed_centroid",
]

# R13 ROTATION PLAN: FIVE pre-verified declarations first — bodies and
# oracle strings move VERBATIM from tests/test_r13_oracle_previews.py
# into a new queries/ module (the executed r12 flow; the preview guard
# in tests/test_registry_rotation.py FAILS the build if WINDOW_ROUND
# reaches 13 without them): q_bloom_filter (operators/bloom.py verdict
# table), q_bloom_prefilter (the zero-fact-shuffle broadcast
# pre-filter audit), q_hll_windowed (operators/hll_windowed.py
# trailing-window distinct via the parameterized curation._hll_oracle),
# q_group_priority_sample (operators/sampling_group.py weighted
# bottom-k per group), q_jaccard_prefix_join (operators/prefix_join.py
# exact-Jaccard scale path — oracle is the brute-force q_ngram_jaccard
# SQL, so the hash-match IS the completeness theorem). Then the 14
# remaining r8-era keys
# (q_snapshot_diff, q_upsert, q_kmeans, q_semantic_dedup,
# q_heavy_hitters, q_dsir_weight, q_pmi, q_triangle_count,
# q_labelprop, q_cms_counts, q_quality_classifier, q_funnel,
# q_retention, q_sessionize) plus any r13 byte-changed operators'
# queries; fill remaining slots from the r9-era greens — keeping
# every key's latest evidence ≤ 4 rounds old.


def _load_all() -> None:
    # Import side effects populate the registries. ORDER MATTERS: the
    # correctness driver records only the first N (~50) registered
    # queries, so keys needing fresh driver evidence register first —
    # DECLARED_WINDOW (above) is the authoritative order.
    from food_panda_etl_spark.queries import (  # noqa: F401
        curation,
        sketch_extras,
        selection,
        graph_extras,
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

    # PROMOTION PASS: registration is module-granular; DECLARED_WINDOW
    # is the exact driver-window order. Dict order is what queries()
    # exposes, so reordering here is exactly reordering the driver's
    # window.
    snapshot = dict(QUERIES)
    QUERIES.clear()
    for name in DECLARED_WINDOW:
        assert name in snapshot, (
            f"DECLARED_WINDOW references unknown query {name!r} — update "
            "the rotation list in queries/__init__.py alongside any rename"
        )
        QUERIES[name] = snapshot.pop(name)
    QUERIES.update(snapshot)


_load_all()
