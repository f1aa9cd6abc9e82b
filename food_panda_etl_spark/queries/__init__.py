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
WINDOW_ROUND = 18

DECLARED_WINDOW = [
    # 1-4 NEW in r18: the three r17 build-ahead component families'
    # first driver evidence — bodies and oracle strings moved VERBATIM
    # from tests/test_r18_oracle_previews.py (now registry-driven, the
    # r10..r17 convention) into queries/state_ops.py, where they were
    # pre-verified at sf0.001/0.01/0.1 through the driver's own
    # compare harness. The sampling family declares BOTH its faces
    # (incremental + windowed) — ONE component, the sketch-family
    # convention.
    "q_incremental_icws",
    "q_incremental_group_priority",
    "q_group_priority_window",
    "q_bloom_intersect",
    # 5 the incremental_neardup geometry-stamp rider (VERDICT r17 task
    # 3 / registry rider-blocked candidate (a)): stamping the
    # maintained band-index state byte-changes
    # operators/incremental_neardup.py, whose only query-body caller
    # is incremental_ops.py:144.
    "q_incremental_neardup",
    # 6-7 the shared state-geometry helper extraction riders (ADVICE
    # r17 #1): the stamp/validate block duplicated across
    # incremental_embed.py / incremental_containment.py /
    # incremental_icws.py moves to ONE definition in
    # operators/state_geometry.py (a NEW module — sketch_checks.py
    # must NOT byte-change, its importers include hll_windowed.py
    # whose key q_hll_windowed is r15-era and outside this window), so
    # all three faces' files byte-change; q_incremental_icws is #1
    # above, these are the other two riders.
    "q_incremental_containment",
    "q_incremental_embed_neardup",
    # 8-16 the CMS + Bloom geometry-stamp closure (VERDICT r17 task 4,
    # taken NOW because the recount shows it fits: byte-changing
    # operators/cms.py pulls every declared key whose body reaches
    # cms._cell — q_cms_counts (sketch.py), q_cms_windowed
    # (sketch_extras.py), q_cms_join_size (cross_sketches.py, already
    # in the r14 block below), q_join_advice (scale_ops.py via
    # join_advisor.py), and ALL bloom keys (bloom.py imports
    # _MULTS/_P/_cell) — which also makes the Bloom geometry stamp
    # (ADVICE r17 #4) and the join-advisor check_grid escape hatch
    # (ADVICE r17 #2) free this round. Call graph recomputed from
    # imports, not the plan comment (the r15 lesson).
    "q_cms_counts",
    "q_cms_windowed",
    "q_join_advice",
    "q_bloom_filter",
    "q_bloom_prefilter",
    "q_bloom_fpr_gate",
    "q_decontaminate_bloom",
    "q_bloom_by_group",
    "q_bloom_window",
    # 17-49 the FULL remaining 33-key r14 block (recounted against the
    # CORRECTNESS r01-r17 union this round — exactly these 33 carry
    # r14-latest evidence post-r17), defusing the r19 age wall
    # entirely (VERDICT r17 task 2). No byte-changes to their files —
    # evidence refresh only (q_cms_join_size's operator file DOES
    # byte-change via the cms stamp; it is in this block anyway).
    "q_ann_recall",
    "q_approx_distinct_gate",
    "q_bm25",
    "q_chunk_text",
    "q_cms_join_size",
    "q_cosine_lsh_gate",
    "q_cosine_topk",
    "q_cosine_topk_lsh",
    "q_embed_centroid",
    "q_embed_lsh_gate",
    "q_embed_neardup",
    "q_embed_neardup_lsh",
    "q_embed_outlier",
    "q_hll_intersect_gate",
    "q_hybrid_rrf",
    "q_image_decode",
    "q_image_resize",
    "q_incremental_agg",
    "q_ivf_gate",
    "q_ivf_topk",
    "q_jpeg_decode",
    "q_mix_to_target",
    "q_pack_chunks",
    "q_partition_prune",
    "q_png_decode",
    "q_quantize_embed",
    "q_snapshot_diff",
    "q_stratified_sample",
    "q_temperature_mix",
    "q_to_json",
    "q_udaf",
    "q_upsert",
    "q_zorder",
    # 50 one r15 fill (evidence refresh toward the r20 wall; cheap).
    "q_scan_count",
]

# R19 ROTATION PLAN (arithmetic on the ACTUAL post-r18 evidence ages:
# after this window re-records, the oldest standing evidence is the
# 44 remaining r15-era keys — wall at r20 — then the r16 block — wall
# at r21, beyond the final round). NOTHING is age-mandatory at r19,
# but the r15 remainder (44 keys = the 45-key r15 list minus
# q_scan_count, refreshed here) SHOULD be windowed at r19 so the r20
# wall never binds:
# q_approx_distinct q_approx_quantile_gate q_batch_number q_case_when
# q_ceil_div q_count_distinct q_date_parts q_decontaminate q_dedup
# q_dedup_components q_dedup_components_lsh q_dedup_keep_rep
# q_dedup_keep_rep_lsh q_epoch_cast q_filter_range q_group_pct
# q_group_priority_sample q_groupby_agg q_hll_windowed
# q_incremental_dedup q_inner_join q_jaccard_prefix_join
# q_json_extract q_kcore q_left_join q_limit_offset q_llm_prep
# q_minhash_gate q_minhash_neardup q_ngram_jaccard q_null_handling
# q_overlap_join q_project q_scalar_subquery q_simhash_gate
# q_simhash_neardup q_sort_multi q_string_funcs q_substring_dedup
# q_topk_global q_tpch_q1 q_tpch_q6 q_vocab_topp q_weighted_jaccard
# (recount against the union before pinning; see test_evidence_age).
# 44 + r19's FIVE banked declarations (tests/test_r19_oracle_
# previews.py, guard-enforced: q_incremental_heavy + q_heavy_window —
# the FREQUENT-ITEMS family's maintained-state faces, ONE component,
# operators/heavy_incremental.py; q_quantile_bucket_by_group,
# operators/quantile_bucket_group.py; and the late-r18 bank addition
# q_incremental_quantile + q_quantile_window — the RANK/QUANTILE
# family's maintained-state/windowed faces, ONE component,
# operators/histogram_state.py, mergeable equi-width histograms with
# exact-rank audit sides; all five preview-verified sf0.001/0.01/0.1,
# plan shapes + curves in SCALE.md) = 49, leaving ONE slot of slack.
# If r19 ADVICE riders need more, defer the cheapest r15 keys (e.g.
# q_case_when / q_project) to r20 — their wall binds AT r20, so the
# final round can window them alongside its own declarations.
# R20 BANK ALREADY EXISTS (late-r18): q_incremental_cms +
# q_incremental_hll (operators/cms_incremental.py,
# operators/hll_incremental.py — the last two incremental-matrix
# gaps) pre-verified sf0.001/0.01/0.1 in
# tests/test_r20_oracle_previews.py; the promotion guard arms only
# at WINDOW_ROUND=20, so these do NOT bind the r19 window — r19
# need not bank further build-aheads unless a new family gap opens. NOTE byte-change hazards for r19: touching
# sketch_checks.py pulls q_hll_windowed + q_cms_windowed +
# q_bloom_* + sampling keys (hll_windowed/cms_windowed/bloom/
# bloom_algebra/sampling_incremental all import it) — q_hll_windowed
# IS in the r19 window, so a sketch_checks.py change fits at r19 if
# the bloom/cms riders (r18-era) take ~10 extra slots — tight; defer
# to r20 unless needed.


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
        state_ops,
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
