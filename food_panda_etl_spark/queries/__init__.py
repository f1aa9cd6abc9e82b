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
WINDOW_ROUND = 13

DECLARED_WINDOW = [
    # 1-5 NEW in r13: the five r12 build-ahead operators' first driver
    # evidence — bodies and oracle strings moved VERBATIM from
    # tests/test_r13_oracle_previews.py (now registry-driven, the
    # r10/r12 convention) into queries/scale_sketches.py, where they
    # were pre-verified at sf0.001+sf0.01 through the driver's own
    # compare harness.
    "q_bloom_filter",
    "q_bloom_prefilter",
    "q_hll_windowed",
    "q_group_priority_sample",
    "q_jaccard_prefix_join",
    # 6 NEW in r13 (VERDICT r12 task 6): the Bloom FPR audit gate —
    # completes the sketch-gate symmetry (every other sketch family
    # already carries a driver-evidenced quality gate).
    "q_bloom_fpr_gate",
    # 7-20 the 14 remaining r8-era greens — 5-round-old evidence
    # (VERDICT r12 task 2; the list pre-encoded in the r12 rotation
    # plan comment): graph/funnel/clustering/storage-CDC blocks.
    "q_snapshot_diff",
    "q_upsert",
    "q_kmeans",
    "q_semantic_dedup",
    "q_heavy_hitters",
    "q_dsir_weight",
    "q_pmi",
    "q_triangle_count",
    "q_labelprop",
    "q_cms_counts",
    "q_quality_classifier",
    "q_funnel",
    "q_retention",
    "q_sessionize",
    # 21-39 byte-changed THIS round (ADVICE r12 low #3: the remaining
    # raw-form (doc_id * M) % P oracle strings move to the PRE-REDUCED
    # ((doc_id % P) * M) % P, matching the r11 engine fix in
    # operators/sampling.py::sample_order_hash — residue-identical on
    # every fixture id, overflow-free on full int64). text.py carries
    # one such oracle (q_select_pipeline), so ALL text.py queries
    # re-record on the new bytes (the file-granular evidence rule).
    "q_select_pipeline",
    "q_array_explode",
    "q_binary_meta",
    "q_decontaminate",
    "q_fingerprint",
    "q_langid",
    "q_quality_score",
    "q_repetition",
    "q_text_clean",
    "q_tfidf",
    "q_token_count",
    "q_token_count_bpe",
    "q_bpe_encode",
    "q_bpe_train",
    "q_corpus_stats",
    "q_lm_score",
    "q_nfc_normalize",
    "q_pii_redact",
    "q_substring_dedup",
    # 40-42 curation.py riders of the same ADVICE fix
    # (q_priority_sample's oracle): the whole file re-records.
    "q_priority_sample",
    "q_curriculum_mix",
    "q_hll_counts",
    # 43-47 selection.py riders of the same ADVICE fix
    # (q_pps_stratified's and q_select_stratified's oracles).
    "q_pps_stratified",
    "q_select_stratified",
    "q_domain_drift",
    "q_token_fertility",
    "q_padding_waste",
    # 48-49 fills from the r9-era greens (oldest remaining evidence;
    # the bulk of the 45-key r9 block rotates in r14 —
    # test_evidence_age now forces it).
    "q_vendor_enrich",
    "q_group_heavy_hitters",
    # 50 byte-changed THIS round: operators/cms.py grew the shared
    # oracle_dm_sql builder (review r13 — four hand-joined copies of
    # the affine dm VALUES fragment consolidated), so the one declared
    # key riding cms.py from OUTSIDE this window (via
    # operators/cms_windowed.py) re-records on the new bytes; sketch.py
    # and scale_sketches riders are already windowed above.
    "q_cms_windowed",
]

# R14 ROTATION PLAN — the window is essentially FULLY ALLOCATED, do
# NOT add more r14 previews (the arithmetic, computed r13):
# MANDATORY 33 = the 3 pre-verified declarations (q_overlap_join,
# q_cms_join_size, q_hll_intersect_gate — bodies move verbatim from
# tests/test_r14_oracle_previews.py; the preview guard FAILS the
# build if WINDOW_ROUND reaches 14 without them) + ALL 30 r9-era
# keys, which hit evidence-age 5 at r14 (test_evidence_age fails the
# build otherwise): q_ann_recall q_approx_distinct_gate q_array_size
# q_bm25 q_chunk_text q_cosine_lsh_gate q_cosine_topk
# q_cosine_topk_lsh q_dedup_components q_dedup_components_lsh
# q_dedup_keep_rep q_dedup_keep_rep_lsh q_embed_lsh_gate
# q_embed_neardup q_embed_neardup_lsh q_hybrid_rrf q_image_decode
# q_ivf_gate q_ivf_topk q_map_funcs q_minhash_gate q_minhash_neardup
# q_ngram_jaccard q_png_decode q_quantize_embed q_simhash_gate
# q_simhash_neardup q_to_json q_udaf q_vector_norm.
# OPTIONAL with the remaining 17 slots: (a) rotate storage.py
# (12 riders — all its keys) to move q_pps_sample's oracle to the
# pre-reduced hash (ADVICE r12 low #3; then add it to
# tests/test_r11_oracle_previews.py::_PREREDUCED_ORACLES) and switch
# q_shuffle_order's raw-form inline hashes; (b) byte-change
# similarity.py (its 16 r9 keys are already mandatory; +4 riders
# q_embed_outlier q_image_resize q_jpeg_decode q_embed_centroid) to
# consolidate its shingle CTE onto overlap_join.SHINGLE5_CTE_SQL and
# its dm fragment onto cms.oracle_dm_sql. (a)+(b) = 49/50 — pick at
# most both, nothing else; sketch.py/sketch_extras dm consolidation
# waits for their own rotations.


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
    )

    # q_jaccard_prefix_join's oracle IS the brute-force q_ngram_jaccard
    # SQL — ONE definition (queries/similarity.py), aliased here after
    # every module has registered (a decoration-time ORACLES lookup in
    # scale_sketches would silently depend on import order). The driver
    # hash-match against the brute-force SQL is the prefix-filtering
    # completeness theorem.
    ORACLES["q_jaccard_prefix_join"] = ORACLES["q_ngram_jaccard"]

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
