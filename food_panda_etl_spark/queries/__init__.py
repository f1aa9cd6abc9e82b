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
WINDOW_ROUND = 15

DECLARED_WINDOW = [
    # 1-3 NEW in r15: the three r14 build-ahead components' first
    # driver evidence — bodies and oracle strings moved VERBATIM from
    # tests/test_r15_oracle_previews.py (now registry-driven, the
    # r10/r12/r13/r14 convention) into queries/scale_ops.py, where
    # they were pre-verified at sf0.001+sf0.01 (and once manually at
    # sf0.1) through the driver's own compare harness.
    "q_weighted_jaccard",
    "q_decontaminate_bloom",
    "q_join_advice",
    # 4-30 the FULL 27-key r11 block — nothing is age-mandatory at r15
    # itself, so spending the slots here defuses the r16 age wall
    # entirely (VERDICT r14 task 1, executed verbatim).
    "q_approx_distinct",
    "q_approx_quantile_gate",
    "q_batch_number",
    "q_case_when",
    "q_ceil_div",
    "q_count_distinct",
    "q_date_parts",
    "q_dedup",
    "q_epoch_cast",
    "q_filter_range",
    "q_group_pct",
    "q_groupby_agg",
    "q_incremental_dedup",
    "q_json_extract",
    "q_kcore",
    "q_limit_offset",
    "q_llm_prep",
    "q_null_handling",
    "q_project",
    "q_scalar_subquery",
    "q_scan_count",
    "q_sort_multi",
    "q_string_funcs",
    "q_topk_global",
    "q_tpch_q1",
    "q_tpch_q6",
    "q_vocab_topp",
    # 31-41 rotation option (a) executed (VERDICT r14 task 2):
    # operators/dedup.py byte-changed this round — the shared gram
    # builder (gram_table) extracted so weighted_jaccard's multiset
    # table stops mirroring _shingles' core — so ALL declared keys
    # whose execution flows through dedup.py re-record. The plan's
    # 11-key rider list:
    "q_ngram_jaccard",
    "q_dedup_components",
    "q_dedup_keep_rep",
    "q_minhash_neardup",
    "q_simhash_neardup",
    "q_dedup_components_lsh",
    "q_dedup_keep_rep_lsh",
    "q_decontaminate",
    "q_substring_dedup",
    "q_jaccard_prefix_join",
    "q_overlap_join",
    # 42-43 two MORE true dedup.py riders the plan's list missed:
    # q_minhash_gate calls minhash_lsh_pairs + exact_jaccard_pairs and
    # q_simhash_gate calls simhash_pairs (queries/approx_gates.py:27)
    # — the file-granular evidence rule forces them like the other 11.
    "q_minhash_gate",
    "q_simhash_gate",
    # 44-48 queries/scale_sketches.py — byte-changed this round
    # (VERDICT r14 task 3: q_jaccard_prefix_join's oracle moved into
    # its decorator via the shared NGRAM_JACCARD_ORACLE_SQL constant,
    # deleting _load_all's special case), so ALL its keys re-record
    # (q_jaccard_prefix_join itself is #40 above).
    "q_bloom_filter",
    "q_bloom_prefilter",
    "q_bloom_fpr_gate",
    "q_hll_windowed",
    "q_group_priority_sample",
    # 49-50 oldest-r12 fills (queries/joins.py, no byte-change — just
    # evidence refresh toward the r17 wall).
    "q_inner_join",
    "q_left_join",
]

# R16 ROTATION PLAN (arithmetic on the ACTUAL post-r15 evidence ages:
# after this window re-records, the oldest standing evidence is the
# 36 remaining r12-era keys — wall at r17 — then 42 r13-era — wall at
# r18). NOTHING is age-mandatory at r16 itself, so: MANDATORY 5 = the
# r15 build-aheads preview-verified at sf0.001/0.01/0.1 in
# tests/test_r16_oracle_previews.py — q_incremental_neardup,
# q_weighted_minhash_gate, q_incremental_embed_neardup,
# q_edit_distance_join, q_containment_join (the guard FAILS the build
# once WINDOW_ROUND reaches 16 without them).
# STRONGLY RECOMMENDED = the full 36-key r12 block, defusing
# r17 entirely: joins/windows/setops/sql_layer/analytics-era keys
# (q_semi_join q_anti_join q_range_join q_asof_join q_nullsafe_join
# q_join_1n_agg q_interval_join q_exists_subquery q_tpch_q3 q_tpch_q5
# q_topk_per_group q_rank q_lag_lead q_running_sum q_tumbling_window
# q_sliding_window q_session_window q_union_all q_intersect q_except
# q_rollup q_cube q_grouping_sets q_math_funcs q_regex_extract
# q_pivot q_skew_join q_pagerank q_pmi q_triangles q_labelprop
# q_funnel q_retention q_sessionize q_domain_drift q_bucket_quantile
# — recount against the CORRECTNESS union before pinning; see
# test_evidence_age). Remaining slots: r13-era fills
# (scale_sketches is re-recorded r15; sketch.py / sketch_extras.py
# dm-fragment consolidation still waits for whichever round windows
# their keys — their riders are r13-era, so r16/r17 is the moment).


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
        scale_sketches,
        cross_sketches,
        scale_ops,
    )

    # (r15: q_jaccard_prefix_join's oracle now lives in its decorator —
    # scale_sketches.py imports the shared NGRAM_JACCARD_ORACLE_SQL
    # constant directly from operators/overlap_join, which registers no
    # queries, so there is no import-order hazard and no special case
    # left here. VERDICT r14 "What's wrong" #1 closed.)

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
