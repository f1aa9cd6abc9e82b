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
WINDOW_ROUND = 9

DECLARED_WINDOW = [
    # 1-6 NEW in r9 (the executed r8 plan head + the build-ahead
    # composites): the stratified PPS sampler's first driver evidence,
    # its DSIR composite, three reports composing green operators, and
    # k-core peeling (declared late-r9, displacing the discretionary
    # q_lm_score r6-era filler — new evidence outranks refresh).
    "q_pps_stratified",
    "q_select_stratified",
    "q_domain_drift",
    "q_token_fertility",
    "q_padding_waste",
    "q_kcore",
    # 7 byte-changed THIS round (ADVICE fixes): heavy_group.py integral
    # string bridge → its declared query re-records.
    "q_group_heavy_hitters",
    # 8-50 the 43 r5-era greens (VERDICT r8 task 2 — oldest evidence;
    # byte-unchanged since their r5 greens): the llm-prep composite,
    # the approx-gate family, vendor, then the text/udx/retrieval/
    # similarity r5 keys.
    "q_llm_prep",
    "q_minhash_gate",
    "q_simhash_gate",
    "q_embed_lsh_gate",
    "q_cosine_lsh_gate",
    "q_ivf_gate",
    "q_approx_distinct_gate",
    "q_dedup_components_lsh",
    "q_dedup_keep_rep_lsh",
    "q_minhash_neardup",
    "q_simhash_neardup",
    "q_embed_neardup",
    "q_embed_neardup_lsh",
    "q_cosine_topk",
    "q_cosine_topk_lsh",
    "q_ivf_topk",
    "q_ann_recall",
    "q_dedup_components",
    "q_dedup_keep_rep",
    "q_decontaminate",
    "q_ngram_jaccard",
    "q_quantize_embed",
    "q_vector_norm",
    "q_array_size",
    "q_vendor_enrich",
    "q_chunk_text",
    "q_bm25",
    "q_hybrid_rrf",
    "q_token_count",
    "q_token_count_bpe",
    "q_tfidf",
    "q_repetition",
    "q_langid",
    "q_quality_score",
    "q_text_clean",
    "q_fingerprint",
    "q_array_explode",
    "q_map_funcs",
    "q_udaf",
    "q_to_json",
    "q_binary_meta",
    "q_image_decode",
    "q_png_decode",
]
# The r6-era refresh block, led by the displaced q_lm_score, moves
# whole to the r10 plan below.

# R10 ROTATION PLAN: r10-new keys first — THREE build-ahead operators
# landed r9 with property tests and oracle replay forms ready:
# operators/quantile_bucket.py (declare q_curriculum_mix:
# rank-quantile buckets of a quality score × lang counts; oracle =
# (row_number()-1)*b // count(*)), operators/sampling_priority.py
# (declare q_priority_sample: sequential Poisson ORDER BY h/w LIMIT k),
# and operators/hll.py (declare q_hll_counts: full register replay +
# dyadic-sum estimate). All three declarations are PRE-TESTED end to
# end: tests/test_r10_oracle_previews.py runs the exact future query
# bodies against their exact oracle SQL through the driver's compare
# harness at sf0.001 AND sf0.01 — r10 moves them into queries/
# modules verbatim. Then the 46
# r6-era greens, led by
# q_lm_score (q_dedup, q_incremental_dedup, q_substring_dedup,
# q_corpus_stats, q_jpeg_decode, q_image_resize, q_pii_redact,
# q_nfc_normalize, q_shuffle_order, q_bpe_train, q_bpe_encode,
# q_mix_to_target, q_temperature_mix, q_vocab_topp, relational/sorts/
# sql_layer r6 keys, q_incremental_agg, q_embed_outlier,
# q_approx_quantile_gate, q_scalar_subquery …), then the r7/r8-era
# block — keeping every key's latest evidence ≤ 3 rounds old.


def _load_all() -> None:
    # Import side effects populate the registries. ORDER MATTERS: the
    # correctness driver records only the first N (~50) registered
    # queries, so keys needing fresh driver evidence register first —
    # DECLARED_WINDOW (above) is the authoritative order.
    from food_panda_etl_spark.queries import (  # noqa: F401
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
