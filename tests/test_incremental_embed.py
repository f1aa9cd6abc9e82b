"""Incremental embedding near-dup (operators/incremental_embed.py,
r15 build-ahead for r16): cross-side banded sign-LSH + exact cosine
verify must equal the brute-force cross join at the fixture
similarities, the maintained-state path must equal the from-raw path,
and injected exact copies must surface at score ≈ 1."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from food_panda_etl_spark.operators.incremental_embed import (
    build_embed_state,
    incremental_embed_neardup,
)
from food_panda_etl_spark.operators.similarity import cosine
from food_panda_etl_spark.tables import load_table

_TAU = 0.9


def _split(spark, sf_dir):
    """corpus = vec_id % 10 <> 0; batch = vec_id % 10 = 0 plus every
    corpus vector with vec_id % 7 = 0 re-id'd at +1e6 (guaranteed
    exact copies — the incremental_neardup injection)."""
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    corpus = e.filter(F.col("vec_id") % 10 != 0)
    batch = e.filter(F.col("vec_id") % 10 == 0).unionByName(
        corpus.filter(F.col("vec_id") % 7 == 0).select(
            (F.col("vec_id") + 1000000).alias("vec_id"), "embedding"
        )
    )
    return corpus, batch


def _brute_force(corpus, batch, threshold):
    """Reference cross-side cosine pairs via an explicit cross join —
    test-only (the quadratic shape the operator exists to avoid)."""
    b = batch.select(
        F.col("vec_id").alias("bid"), F.col("embedding").alias("vb")
    )
    c = corpus.select(
        F.col("vec_id").alias("dup_of"), F.col("embedding").alias("vc")
    )
    score = cosine(F.col("vb"), F.col("vc"))
    return (
        b.crossJoin(c)
        .select(F.col("bid").alias("vec_id"), "dup_of", score.alias("score"))
        .filter(F.col("score") >= threshold)
    )


def test_equals_brute_force_cross_join(spark, sf_dir):
    corpus, batch = _split(spark, sf_dir)
    got = sorted(
        map(
            tuple,
            incremental_embed_neardup(
                corpus, batch, threshold=_TAU
            ).collect(),
        )
    )
    want = sorted(map(tuple, _brute_force(corpus, batch, _TAU).collect()))
    assert got == want
    assert len(want) > 0  # non-vacuous: the injection guarantees pairs


def test_prebuilt_state_matches_raw(spark, sf_dir):
    corpus, batch = _split(spark, sf_dir)
    c_vec, c_bands = build_embed_state(corpus, threshold=_TAU)
    got = sorted(
        map(
            tuple,
            incremental_embed_neardup(
                None,
                batch,
                threshold=_TAU,
                corpus_vectors=c_vec,
                corpus_bands=c_bands,
            ).collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            incremental_embed_neardup(corpus, batch, threshold=_TAU).collect(),
        )
    )
    assert got == want


def test_injected_exact_copies_surface_near_one(spark, sf_dir):
    corpus, batch = _split(spark, sf_dir)
    pairs = incremental_embed_neardup(corpus, batch, threshold=_TAU)
    hits = {
        (r.vec_id, r.dup_of): r.score
        for r in pairs.filter(F.col("vec_id") >= 1000000).collect()
    }
    injected = [
        r.vec_id
        for r in corpus.filter(F.col("vec_id") % 7 == 0)
        .select("vec_id")
        .collect()
    ]
    assert injected
    for vid in injected:
        assert hits[(vid + 1000000, vid)] > 0.999999


def test_partial_state_raises(spark):
    with pytest.raises(ValueError, match="BOTH corpus_vectors"):
        incremental_embed_neardup(
            None, None, corpus_vectors=None, corpus_bands=object()  # type: ignore[arg-type]
        )
    with pytest.raises(ValueError, match="need a corpus DataFrame"):
        incremental_embed_neardup(None, None)


def test_state_geometry_mismatch_raises(spark, sf_dir):
    """ADVICE r16: probing state built at a different (threshold, seed,
    target_miss) must raise, not silently compare incomparable band
    values (near-zero recall with no error)."""
    corpus, batch = _split(spark, sf_dir)
    c_vec, c_bands = build_embed_state(corpus, threshold=0.95)
    with pytest.raises(ValueError, match="does not match the supplied"):
        incremental_embed_neardup(
            None, batch, threshold=_TAU,
            corpus_vectors=c_vec, corpus_bands=c_bands,
        )
    c_vec2, c_bands2 = build_embed_state(corpus, threshold=_TAU, seed=7)
    with pytest.raises(ValueError, match="does not match the supplied"):
        incremental_embed_neardup(
            None, batch, threshold=_TAU,
            corpus_vectors=c_vec2, corpus_bands=c_bands2,
        )
    # mixed pairs from two different builds are caught too
    with pytest.raises(ValueError, match="different geometries"):
        incremental_embed_neardup(
            None, batch, threshold=_TAU,
            corpus_vectors=c_vec, corpus_bands=c_bands2,
        )


def test_batch_dim_mismatch_raises(spark, sf_dir):
    """ADVICE r16: a batch whose vectors differ from the state's dim
    must fail loudly — for stamped state AND for hand-built state
    (where the dim is probed from the state's own vectors)."""
    corpus, batch = _split(spark, sf_dir)
    bad_batch = batch.select(
        "vec_id", F.slice("embedding", 1, 8).alias("embedding")
    )
    c_vec, c_bands = build_embed_state(corpus, threshold=_TAU)
    with pytest.raises(ValueError, match="batch vectors have dim=8"):
        incremental_embed_neardup(
            None, bad_batch, threshold=_TAU,
            corpus_vectors=c_vec, corpus_bands=c_bands,
        )
    # hand-built state (no metadata stamp — stripped from BOTH frames;
    # the stamp survives plain selects/aliases by design, and a
    # one-sided strip would still read the other frame's geometry,
    # review-caught r16): the fallback probes the state's vectors
    plain_vec = c_vec.withMetadata("vec", {})
    plain_bands = c_bands.withMetadata("band", {})
    assert "threshold" not in (plain_vec.schema["vec"].metadata or {})
    assert "threshold" not in (plain_bands.schema["band"].metadata or {})
    with pytest.raises(ValueError, match="batch vectors have dim=8"):
        incremental_embed_neardup(
            None, bad_batch, threshold=_TAU,
            corpus_vectors=plain_vec, corpus_bands=plain_bands,
        )
    # and the FROM-CORPUS path raises the same friendly error instead
    # of an opaque Arrow matmul shape failure (review r16)
    with pytest.raises(ValueError, match="batch vectors have dim=8"):
        incremental_embed_neardup(corpus, bad_batch, threshold=_TAU)
