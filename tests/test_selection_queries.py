"""Invariants of the r9 selection/report queries beyond their oracle
hash-matches: quota accounting for the stratified samples, bounds and
internal consistency for the drift/fertility/padding reports."""

from __future__ import annotations

from food_panda_etl_spark.queries import QUERIES
from food_panda_etl_spark.queries.selection import (
    _PACK_L,
    _SEL_QUOTAS,
    _STRAT_QUOTAS,
)


def test_drift_oracle_bucket_polynomial_matches_dsir():
    """q_domain_drift's oracle carries its own copy of the portable
    bucket polynomial (it cannot import text.py's `_DSIR_CTES` fragment
    verbatim — that CTE is doc-keyed, this one lang-keyed, and text.py
    must stay byte-stable for its windowed greens). This test is the
    no-drift pin: the polynomial and modulus chain must be
    character-identical (whitespace-normalized) across the two oracles,
    so a future change to the shared feature space that misses one copy
    fails here instead of silently measuring drift in a different space
    than the weights. Fold both into one shared fragment at the next
    legitimate text.py byte-change (the r10 rotation re-records its
    keys)."""
    import re

    from food_panda_etl_spark.queries import ORACLES

    def poly(sql: str) -> str:
        m = re.search(r"\(\(7\*31.*?%\s*1000003\s*%\s*\d+", sql, re.S)
        assert m, "bucket polynomial not found"
        return re.sub(r"\s+", "", m.group(0))

    assert poly(ORACLES["q_dsir_weight"]) == poly(ORACLES["q_domain_drift"])


def test_pps_stratified_quota_accounting(spark, sf_dir):
    """Per-stratum ticks telescope to exactly k_s for every quoted
    stratum present in the data; unquoted strata never appear."""
    rows = QUERIES["q_pps_stratified"](spark, sf_dir).collect()
    ticks: dict = {}
    for r in rows:
        assert r["lang"] in _STRAT_QUOTAS
        assert r["n_ticks"] >= 1 and r["weight"] >= 0
        ticks[r["lang"]] = ticks.get(r["lang"], 0) + r["n_ticks"]
    for s, got in ticks.items():
        assert got == _STRAT_QUOTAS[s], (s, got)


def test_select_stratified_sample_is_kept_and_quotad(spark, sf_dir):
    """Every sampled row carries a keep-worthy dsir_score (the upstream
    filter) and per-stratum ticks telescope to the stratum quota."""
    rows = QUERIES["q_select_stratified"](spark, sf_dir).collect()
    assert rows
    ticks: dict = {}
    for r in rows:
        assert r["dsir_score"] >= 1.0  # the DSIR keep threshold
        ticks[r["lang"]] = ticks.get(r["lang"], 0) + r["n_ticks"]
    for s, got in ticks.items():
        assert got == _SEL_QUOTAS[s], (s, got)


def test_domain_drift_bounds_and_self_consistency(spark, sf_dir):
    """TV is in [0, 1] by construction; the integer numerator and the
    double ratio must agree; every language appears exactly once; and
    the report is non-degenerate (some language actually drifts)."""
    rows = QUERIES["q_domain_drift"](spark, sf_dir).collect()
    langs = [r["lang"] for r in rows]
    assert len(langs) == len(set(langs)) and len(langs) >= 2
    assert any(r["tv"] > 0 for r in rows)
    for r in rows:
        assert 0.0 <= r["tv"] <= 1.0
        assert r["tv_num"] >= 0 and r["n_bigrams"] > 0


def test_token_fertility_bounds(spark, sf_dir):
    """Fertility ≥ 1 (a word is at least one symbol after 6 merges —
    most words keep several), sums consistent, every language present."""
    rows = QUERIES["q_token_fertility"](spark, sf_dir).collect()
    assert len(rows) >= 2
    for r in rows:
        assert r["n_docs"] > 0 and r["n_words"] > 0
        assert r["n_bpe_tokens"] >= r["n_words"]  # merges never cross words
        assert r["fertility"] == r["n_bpe_tokens"] / r["n_words"]
        assert r["fertility"] >= 1.0


def test_padding_waste_arithmetic(spark, sf_dir):
    """The one-row report's fields must satisfy the packing identities:
    packed_chunks = ceil(total/L), packed_waste < L, pad_sequences ≥
    packed_chunks (padding can only add sequences), split_docs ≤ n_docs,
    and both percentages in [0, 1)."""
    [r] = QUERIES["q_padding_waste"](spark, sf_dir).collect()
    L = _PACK_L
    assert r["packed_chunks"] == -(-r["total_tokens"] // L)
    assert r["packed_waste"] == r["packed_chunks"] * L - r["total_tokens"]
    assert 0 <= r["packed_waste"] < L
    assert r["pad_sequences"] >= r["packed_chunks"]
    assert r["pad_waste"] == r["pad_sequences"] * L - r["total_tokens"]
    assert 0 <= r["split_docs"] <= r["n_docs"]
    assert 0.0 <= r["packed_waste_pct"] < 1.0
    assert 0.0 <= r["pad_waste_pct"] < 1.0
    assert r["pad_waste_pct"] >= r["packed_waste_pct"]  # packing never loses
