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
WINDOW_ROUND = 14

DECLARED_WINDOW = [
    # 1-3 NEW in r14: the three r13 build-ahead components' first
    # driver evidence — bodies and oracle strings moved VERBATIM from
    # tests/test_r14_oracle_previews.py (now registry-driven, the
    # r10/r12/r13 convention) into queries/cross_sketches.py, where
    # they were pre-verified at sf0.001+sf0.01 (and once manually at
    # sf0.1) through the driver's own compare harness.
    "q_overlap_join",
    "q_cms_join_size",
    "q_hll_intersect_gate",
    # 4-33 ALL 30 r9-era keys — they hit evidence-age 5 this round and
    # test_evidence_age fails the build otherwise (the allocation
    # pinned by the r13 plan comment, executed verbatim). 16 of these
    # live in queries/similarity.py, byte-changed this round by the
    # shingle-CTE consolidation (VERDICT r13 task 3), so the
    # file-granular evidence rule independently forces them.
    "q_ann_recall",
    "q_approx_distinct_gate",
    "q_array_size",
    "q_bm25",
    "q_chunk_text",
    "q_cosine_lsh_gate",
    "q_cosine_topk",
    "q_cosine_topk_lsh",
    "q_dedup_components",
    "q_dedup_components_lsh",
    "q_dedup_keep_rep",
    "q_dedup_keep_rep_lsh",
    "q_embed_lsh_gate",
    "q_embed_neardup",
    "q_embed_neardup_lsh",
    "q_hybrid_rrf",
    "q_image_decode",
    "q_ivf_gate",
    "q_ivf_topk",
    "q_map_funcs",
    "q_minhash_gate",
    "q_minhash_neardup",
    "q_ngram_jaccard",
    "q_png_decode",
    "q_quantize_embed",
    "q_simhash_gate",
    "q_simhash_neardup",
    "q_to_json",
    "q_udaf",
    "q_vector_norm",
    # 34-45 queries/storage.py — byte-changed this round (VERDICT r13
    # task 2: q_pps_sample's and q_shuffle_order's oracles move to the
    # pre-reduced overflow-free hash, residue-identical on every
    # fixture id; q_shuffle_order's Spark side now rides the shared
    # sample_order_hash), so ALL 12 of its keys re-record.
    "q_partition_prune",
    "q_train_split",
    "q_stratified_sample",
    "q_pack_chunks",
    "q_snapshot_diff",
    "q_zorder",
    "q_upsert",
    "q_mix_to_target",
    "q_shuffle_order",
    "q_pps_sample",
    "q_temperature_mix",
    "q_incremental_agg",
    # 46-49 the 4 similarity.py riders of the shingle-CTE
    # consolidation (the other 16 similarity keys are in the r9 block
    # above — together that is ALL 20 of the byte-changed file's keys).
    "q_embed_outlier",
    "q_image_resize",
    "q_jpeg_decode",
    "q_embed_centroid",
    # 50 q_jaccard_prefix_join: its oracle PROVENANCE moved this round
    # (the _load_all post-import ORACLES alias retired in favor of the
    # shared overlap_join.NGRAM_JACCARD_ORACLE_SQL constant — VERDICT
    # r13 "What's wrong" #2). The assembled string is byte-identical
    # to the r13-recorded oracle, but fresh driver evidence under the
    # new plumbing costs one slot and removes all doubt.
    "q_jaccard_prefix_join",
]

# R15 ROTATION PLAN (the arithmetic, computed on the ACTUAL post-r14
# evidence ages: r11-era 27 keys hit the wall at r16, r12-era 38 at
# r17, r13-era 47 at r18). NOTHING is age-mandatory at r15 itself, so:
# MANDATORY 3 = the pre-verified r14 build-aheads (q_weighted_jaccard,
# q_decontaminate_bloom, q_join_advice — bodies move verbatim from
# tests/test_r15_oracle_previews.py; the preview guard FAILS the build
# once WINDOW_ROUND reaches 15 without them). STRONGLY RECOMMENDED
# +27 = the FULL r11 block, defusing r16 entirely: q_approx_distinct
# q_approx_quantile_gate q_batch_number q_case_when q_ceil_div
# q_count_distinct q_date_parts q_dedup q_epoch_cast q_filter_range
# q_group_pct q_groupby_agg q_incremental_dedup q_json_extract q_kcore
# q_limit_offset q_llm_prep q_null_handling q_project
# q_scalar_subquery q_scan_count q_sort_multi q_string_funcs
# q_topk_global q_tpch_q1 q_tpch_q6 q_vocab_topp. The remaining 20
# slots: EITHER (a) rotate operators/dedup.py — extract the shared
# gram builder so weighted_jaccard.shingle_multiset_table stops
# mirroring _shingles' core (behaviorally pinned until then —
# tests/test_weighted_jaccard.py::test_distinct_collapse_matches_shingle_table)
# — whose riders beyond the mandatory/r11 sets are 11 keys
# (q_ngram_jaccard q_dedup_components q_dedup_keep_rep
# q_minhash_neardup q_simhash_neardup q_dedup_components_lsh
# q_dedup_keep_rep_lsh q_decontaminate q_substring_dedup
# q_jaccard_prefix_join q_overlap_join), leaving 9 oldest-r12 fills;
# OR (b) no file rotation and 20 oldest-r12 fills (joins/windows'
# q_inner_join q_left_join q_semi_join q_anti_join q_range_join
# q_asof_join q_nullsafe_join q_join_1n_agg q_tpch_q3 q_tpch_q5
# q_topk_per_group q_rank q_lag_lead q_running_sum q_tumbling_window
# q_sliding_window q_session_window q_union_all q_intersect q_except).
# sketch.py / sketch_extras.py dm-fragment consolidation still waits
# for whichever round windows their keys.


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
    )
    from food_panda_etl_spark.operators.overlap_join import (
        NGRAM_JACCARD_ORACLE_SQL,
    )

    # q_jaccard_prefix_join's oracle IS the brute-force q_ngram_jaccard
    # SQL — ONE definition, owned since r14 by operators/overlap_join
    # next to the shingle replay it builds on (q_ngram_jaccard's
    # decorator uses the SAME constant; the r13 post-import
    # ORACLES→ORACLES alias this replaces was import-order
    # load-bearing). scale_sketches.py stays byte-frozen to its r13
    # evidence, so the assignment lives here rather than in its
    # decorator. The driver hash-match against the brute-force SQL is
    # the prefix-filtering completeness theorem.
    ORACLES["q_jaccard_prefix_join"] = NGRAM_JACCARD_ORACLE_SQL

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
