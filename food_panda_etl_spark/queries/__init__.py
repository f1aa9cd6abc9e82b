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
WINDOW_ROUND = 10

DECLARED_WINDOW = [
    # 1-3 NEW in r10: the three r9 build-ahead operators' first driver
    # evidence — bodies and oracle strings moved VERBATIM from
    # tests/test_r10_oracle_previews.py where they were pre-verified at
    # sf0.001+sf0.01 through the driver's own compare harness (the only
    # delta: the HLL key pre-casts to BIGINT on both sides — ADVICE r9).
    "q_hll_counts",
    "q_priority_sample",
    "q_curriculum_mix",
    # 4 byte-changed THIS round: k-core's threshold made scale-honest
    # (degree-scaled k — the VERDICT r9 cosmetic nit; non-empty core at
    # every SF now), so its declared query re-records.
    "q_kcore",
    # 5-12 byte-changed THIS round (the order.py correctness pin): the
    # r10 sf0.1 oracle sweep caught the two-phase rank machinery
    # silently corrupting when the optimizer declines exchange reuse
    # (three separate range exchanges, independently sampled
    # boundaries → offsets mismatch pids); the (row, pid) binding is
    # now pinned in operators/order.py, and all 11 declared queries
    # that ride global_row_number / global_running_sum / the samplers
    # re-record on the fixed bytes (q_shuffle_order,
    # q_approx_quantile_gate, q_curriculum_mix are affected too and
    # already in the window above/below; q_vocab_topp's cumsum is a
    # vocab-sized plain window and q_vendor_enrich's batch stamp is
    # fixture SQL arithmetic — neither touches order.py).
    "q_batch_number",
    "q_pack_chunks",
    "q_pps_sample",
    "q_select_pipeline",
    "q_llm_prep",
    "q_pps_stratified",
    "q_select_stratified",
    "q_padding_waste",
    # 13-50 the r6-era greens (VERDICT r9 task 2 — oldest evidence,
    # byte-unchanged since their r6 greens), led by q_lm_score (the
    # displaced r9 filler): dedup, corpus/media, text-norm, BPE, mixes,
    # then the relational/sorts/sql_layer/aggregates r6 blocks; the 8
    # lowest-risk pure-relational refreshes (q_regex_extract,
    # q_math_funcs, q_rollup, q_cube, q_histogram, q_percentile,
    # q_pivot, q_unpivot — all byte-unchanged r6 greens) are displaced
    # to r11 by the order.py re-records above.
    "q_lm_score",
    "q_dedup",
    "q_incremental_dedup",
    "q_substring_dedup",
    "q_corpus_stats",
    "q_jpeg_decode",
    "q_image_resize",
    "q_pii_redact",
    "q_nfc_normalize",
    "q_shuffle_order",
    "q_bpe_train",
    "q_bpe_encode",
    "q_mix_to_target",
    "q_temperature_mix",
    "q_vocab_topp",
    "q_string_funcs",
    "q_scan_count",
    "q_project",
    "q_json_extract",
    "q_epoch_cast",
    "q_date_parts",
    "q_case_when",
    "q_null_handling",
    "q_filter_range",
    "q_ceil_div",
    "q_sort_multi",
    "q_limit_offset",
    "q_topk_global",
    "q_tpch_q1",
    "q_tpch_q6",
    "q_scalar_subquery",
    "q_groupby_agg",
    "q_group_pct",
    "q_count_distinct",
    "q_approx_distinct",
    "q_incremental_agg",
    "q_embed_outlier",
    "q_approx_quantile_gate",
]

# R11 ROTATION PLAN: r11-new declarations first — FIVE are pre-tested
# end to end in tests/test_r11_oracle_previews.py at sf0.001+sf0.01
# (bodies and oracle strings move verbatim into queries/ modules, the
# executed r10 flow): q_group_sample (operators/sampling_group.py
# group-wise bottom-k reservoir), q_hll_by_group (the grouped HLL
# estimate record over lineitem l_returnflag — oracle from the SHARED
# curation._hll_oracle builder), q_hll_xxhash_gate (the production
# 64-bit mixer through the q_approx_distinct_gate convention — the
# 1e9-ceiling swap-out becomes driver evidence), q_cms_windowed
# (operators/cms_windowed.py per-day sketches summed over a trailing
# window, the linearity replay), and q_random_projection
# (operators/random_projection.py JL 64→4 sign projection, bit-exact
# double folds, oracle from the shared builder). Plus any r11
# byte-changed operators' queries; then the 8 r6-era keys displaced by
# the r10 order.py re-records (q_regex_extract, q_math_funcs,
# q_rollup, q_cube, q_histogram, q_percentile, q_pivot, q_unpivot);
# then the r7-era greens (the q_pagerank/q_pmi/q_triangle_count/
# q_labelprop/q_cms_counts/q_quality_classifier/q_funnel/q_retention/
# q_sessionize block, the r7 re-records q_kmeans/q_semantic_dedup/
# q_embed_centroid/q_snapshot_diff/q_upsert, and the r7 ADVICE
# re-records q_dsir_weight/q_select_pipeline/q_pps_sample/
# q_heavy_hitters); fill remaining slots from the r8-era joins/windows/
# setops/storage block — keeping every key's latest evidence ≤ 3
# rounds old.


def _load_all() -> None:
    # Import side effects populate the registries. ORDER MATTERS: the
    # correctness driver records only the first N (~50) registered
    # queries, so keys needing fresh driver evidence register first —
    # DECLARED_WINDOW (above) is the authoritative order.
    from food_panda_etl_spark.queries import (  # noqa: F401
        curation,
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
