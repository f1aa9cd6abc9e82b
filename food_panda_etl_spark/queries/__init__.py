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
WINDOW_ROUND = 16

DECLARED_WINDOW = [
    # 1-5 NEW in r16: the five r15 build-ahead components' first
    # driver evidence — bodies and oracle strings moved VERBATIM from
    # tests/test_r16_oracle_previews.py (now registry-driven, the
    # r10/r12/r13/r14/r15 convention) into queries/incremental_ops.py,
    # where they were pre-verified at sf0.001/0.01/0.1 through the
    # driver's own compare harness.
    "q_incremental_neardup",
    "q_incremental_embed_neardup",
    "q_weighted_minhash_gate",
    "q_containment_join",
    "q_edit_distance_join",
    # 6-41 the FULL 36-key r12 block (recounted against the
    # CORRECTNESS r01-r15 union this round — the ACTUAL r12-latest
    # set, which differs from the r15 plan comment's guess: it
    # includes q_histogram/q_percentile/q_unpivot/q_group_sample/
    # q_random_projection/q_skew_agg/q_hll_by_group/q_hll_xxhash_gate
    # and excludes the r13-era graph/funnel keys the comment listed).
    # Nothing is age-mandatory at r16 itself; spending the slots here
    # defuses the r17 age wall entirely (VERDICT r15 task 2).
    "q_anti_join",
    "q_asof_join",
    "q_cube",
    "q_except",
    "q_exists_subquery",
    "q_group_sample",
    "q_grouping_sets",
    "q_histogram",
    "q_hll_by_group",
    "q_hll_xxhash_gate",
    "q_intersect",
    "q_interval_join",
    "q_join_1n_agg",
    "q_lag_lead",
    "q_math_funcs",
    "q_nullsafe_join",
    "q_pagerank",
    "q_percentile",
    "q_pivot",
    "q_random_projection",
    "q_range_join",
    "q_rank",
    "q_regex_extract",
    "q_rollup",
    "q_running_sum",
    "q_semi_join",
    "q_session_window",
    "q_skew_agg",
    "q_skew_join",
    "q_sliding_window",
    "q_topk_per_group",
    "q_tpch_q3",
    "q_tpch_q5",
    "q_tumbling_window",
    "q_union_all",
    "q_unpivot",
    # 42-44 the sketch.py / sketch_extras.py dm-fragment consolidation
    # riders (VERDICT r15 task 5): both files byte-change this round
    # (the duplicated (d, A_d, B_d) VALUES builders consolidate onto
    # operators/cms.py's shared oracle_dm_sql family), so ALL their
    # declared keys re-record. Four are r12-era and already above
    # (q_group_sample, q_hll_by_group, q_hll_xxhash_gate,
    # q_random_projection); these are the r13-era remainder:
    "q_cms_counts",
    "q_cms_windowed",
    "q_group_heavy_hitters",
    # 45-46 hardening byte-change riders (VERDICT r15 tasks 3-4 +
    # ADVICE r16): operators/decontam_bloom.py (derived m_bits
    # default) and operators/join_advisor.py (maintained-sketch
    # geometry validation + skew-bar check) byte-change this round,
    # so their r15-era keys re-record. (operators/edit_join.py and
    # operators/incremental_embed.py also byte-change for their
    # ADVICE guards — their only keys are #5 and #2 above.)
    "q_decontaminate_bloom",
    "q_join_advice",
    # 47-50 oldest-r13 fills (no byte-change — evidence refresh toward
    # the r18 wall; cheap keys so the driver window stays fast).
    "q_token_count",
    "q_priority_sample",
    "q_fingerprint",
    "q_array_explode",
]

# R17 ROTATION PLAN (arithmetic on the ACTUAL post-r16 evidence ages:
# after this window re-records, the oldest standing evidence is the
# 37 remaining r13-era keys — wall at r18 — then 39 r14-era — wall at
# r19). NOTHING is age-mandatory at r17 itself. MANDATORY 4 = the r16
# build-aheads preview-verified at sf0.001/0.01/0.1 in
# tests/test_r17_oracle_previews.py — q_incremental_containment,
# q_tf_jaccard, q_icws_gate, q_bloom_by_group (the guard FAILS the
# build once WINDOW_ROUND reaches 17 without the declarations; the
# tf/icws pair is one exact↔approximate component, so this is three
# component families, inside the keep-the-bank-small guidance).
# STRONGLY RECOMMENDED = the remaining 37-key r13 block, defusing the
# r18 wall: q_binary_meta q_bpe_encode q_bpe_train q_corpus_stats
# q_curriculum_mix q_domain_drift q_dsir_weight q_funnel
# q_heavy_hitters q_hll_counts q_kmeans q_labelprop q_langid
# q_lm_score q_nfc_normalize q_padding_waste q_pii_redact q_pmi
# q_pps_stratified q_quality_classifier q_quality_score q_repetition
# q_retention q_select_pipeline q_select_stratified q_semantic_dedup
# q_sessionize q_text_clean q_tfidf q_token_count_bpe
# q_token_fertility q_triangle_count q_vendor_enrich (33 after the
# four r16 fills above re-record; recount against the CORRECTNESS
# union before pinning — see test_evidence_age). Remaining slots:
# oldest-r14 fills. IF the r15-era bloom keys (q_bloom_filter,
# q_bloom_prefilter, q_bloom_fpr_gate) are windowed in some round,
# take the deferred bloom.py `_exploded_cells` consolidation with
# them (review r16 — bloom_group.py mirrors bloom_probe's cell
# expansion; test_matches_flat_probe_per_group is the pin until
# then). r18 BANK CANDIDATES (keep it at 2-3), from the inventory's
# remaining symmetry gaps: a trailing-WINDOW Bloom query
# (bloom_merge_groups already proves the re-bucketing combine and the
# streamed state face — no declared query asks the "seen in the last
# N days?" question yet); an approximate/incremental face for the
# TF-weighted family (ICWS band index as maintained state probed by a
# refresh batch — the machinery now exists on both the text and
# embedding sides); a windowed/grouped priority-sample or a
# per-group quantile-bucket refresh if the verdict prefers sampling
# symmetry.


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
