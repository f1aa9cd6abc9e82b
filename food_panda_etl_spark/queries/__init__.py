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
WINDOW_ROUND = 17

DECLARED_WINDOW = [
    # 1-4 NEW in r17: the four r16 build-ahead components' first
    # driver evidence — bodies and oracle strings moved VERBATIM from
    # tests/test_r17_oracle_previews.py (now registry-driven, the
    # r10..r16 convention) into queries/weighted_ops.py, where they
    # were pre-verified at sf0.001/0.01/0.1 through the driver's own
    # compare harness.
    "q_incremental_containment",
    "q_tf_jaccard",
    "q_icws_gate",
    "q_bloom_by_group",
    # 5 NEW in r17: the trailing-window Bloom membership query
    # (VERDICT r16 task 3 / registry r18-bank head, pulled forward) —
    # "seen in the last N days?" answered from per-day Bloom state
    # OR-merged via bloom_merge_groups, the q_cms_windowed /
    # q_hll_windowed convention applied to the membership family
    # (queries/weighted_ops.py, oracle replays the OR-merged bit
    # table).
    "q_bloom_window",
    # 6-7 ADVICE-r17 byte-change riders: operators/edit_join.py (the
    # eager-collect guard skip) and operators/join_advisor.py (the
    # deterministic driver-side grid check) byte-change this round, so
    # their declared keys re-record (file-granular evidence rule; call
    # graph: incremental_ops.py:312 and scale_ops.py:218 are their
    # only query-body callers).
    "q_edit_distance_join",
    "q_join_advice",
    # 8-11 the bloom.py `_exploded_cells` consolidation riders
    # (VERDICT r15/r16 deferred item, taken NOW because q_bloom_window
    # lands in the same family): operators/bloom.py and
    # operators/bloom_group.py byte-change, so every declared key
    # whose body calls bloom.py functions re-records — the three
    # scale_sketches.py keys plus q_decontaminate_bloom
    # (decontam_bloom.py imports bloom_sketch/bloom_prefilter) plus
    # q_bloom_by_group (already #4; bloom_group.py calls _validate).
    # test_matches_flat_probe_per_group's pin retires with the
    # consolidation.
    "q_bloom_filter",
    "q_bloom_prefilter",
    "q_bloom_fpr_gate",
    "q_decontaminate_bloom",
    # 12-44 the FULL remaining 33-key r13 block (recounted against the
    # CORRECTNESS r01-r16 union this round — exactly these 33 carry
    # r13-latest evidence post-r16), defusing the r18 age wall
    # entirely (VERDICT r16 task 2). No byte-changes to their files —
    # evidence refresh only.
    "q_binary_meta",
    "q_bpe_encode",
    "q_bpe_train",
    "q_corpus_stats",
    "q_curriculum_mix",
    "q_domain_drift",
    "q_dsir_weight",
    "q_funnel",
    "q_heavy_hitters",
    "q_hll_counts",
    "q_kmeans",
    "q_labelprop",
    "q_langid",
    "q_lm_score",
    "q_nfc_normalize",
    "q_padding_waste",
    "q_pii_redact",
    "q_pmi",
    "q_pps_stratified",
    "q_quality_classifier",
    "q_quality_score",
    "q_repetition",
    "q_retention",
    "q_select_pipeline",
    "q_select_stratified",
    "q_semantic_dedup",
    "q_sessionize",
    "q_text_clean",
    "q_tfidf",
    "q_token_count_bpe",
    "q_token_fertility",
    "q_triangle_count",
    "q_vendor_enrich",
    # 45-50 oldest-r14 fills (no byte-change — evidence refresh toward
    # the r19 wall; cheap keys so the driver window stays fast).
    "q_array_size",
    "q_map_funcs",
    "q_vector_norm",
    "q_train_split",
    "q_shuffle_order",
    "q_pps_sample",
]

# R18 ROTATION PLAN (arithmetic on the ACTUAL post-r17 evidence ages:
# after this window re-records, the oldest standing evidence is the
# 33 remaining r14-era keys — wall at r19 — then 48 r15-era — wall at
# r20). NOTHING is age-mandatory at r18 itself, but the 33-key r14
# remainder SHOULD be windowed at r18 to defuse the r19 wall:
# q_ann_recall q_approx_distinct_gate q_bm25 q_chunk_text
# q_cms_join_size q_cosine_lsh_gate q_cosine_topk q_cosine_topk_lsh
# q_embed_centroid q_embed_lsh_gate q_embed_neardup
# q_embed_neardup_lsh q_embed_outlier q_hll_intersect_gate
# q_hybrid_rrf q_image_decode q_image_resize q_incremental_agg
# q_ivf_gate q_ivf_topk q_jpeg_decode q_mix_to_target q_pack_chunks
# q_partition_prune q_png_decode q_quantize_embed q_snapshot_diff
# q_stratified_sample q_temperature_mix q_to_json q_train_split*
# q_udaf q_upsert q_zorder (* minus whatever r17 refreshed — recount
# against the union before pinning; see test_evidence_age).
# MANDATORY = whatever r17 banks in tests/test_r18_oracle_previews.py
# (guard-enforced): the ICWS maintained-state incremental face
# (q_incremental_icws — band index as state probed by a refresh
# batch, completing the incremental symmetry for real weights) and
# ONE sampling-symmetry candidate (grouped priority-sample refresh or
# per-group quantile-bucket), per VERDICT r16 task 4's 2-3-family
# guidance — the sampling family banks BOTH faces (one component),
# so r18 declares FOUR across THREE families: q_incremental_icws,
# q_incremental_group_priority + q_group_priority_window (the
# trailing-window sample via group_priority_rebucket — the
# q_bloom_window convention applied to sampling), and
# q_bloom_intersect (Bloom set algebra — the AND combine completing
# the membership family's cross-sketch symmetry with
# q_hll_intersect_gate/q_cms_join_size, operators/bloom_algebra.py;
# all four preview-verified sf0.001/0.01/0.1).
# Remaining slots: oldest-r15 fills. RIDER-BLOCKED
# CANDIDATES deferred from r17 (window was full at 50): (a) geometry
# stamps for operators/incremental_neardup.py (the one incremental
# face still without the metadata-stamp pattern — byte-change rider
# q_incremental_neardup, r16-era, fits any later window); (b) a CMS
# geometry stamp closing the advisor's "sketch built NARROWER than
# requested passes undetected" mode — byte-changing operators/cms.py
# pulls a LARGE closure (every declared key whose body reaches
# cms._cell / oracle_dm_sql: the cms family, q_cms_join_size,
# q_join_advice, ALL bloom keys via bloom.py's imports — recompute
# from the CALL GRAPH before attempting; q_cms_join_size is r14-era
# and windows at r18 anyway, but the bloom keys would re-window).
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
        incremental_ops,
        weighted_ops,
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
