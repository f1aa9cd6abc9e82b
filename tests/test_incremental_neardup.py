"""Incremental near-dup (operators/incremental_neardup.py, r15
build-ahead for r16): batch-vs-corpus banded candidates + exact verify
must equal the brute-force cross-side Jaccard join (completeness at
the fixture similarities), the maintained-state path must equal the
from-raw path, and injected exact duplicates must surface at j=1."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from food_panda_etl_spark.operators.dedup import shingle_table
from food_panda_etl_spark.operators.incremental_neardup import (
    build_neardup_state,
    incremental_neardup_pairs,
)
from food_panda_etl_spark.tables import load_table


def _split(spark, sf_dir):
    """corpus = doc_id % 10 <> 0; batch = doc_id % 10 = 0 plus every
    corpus doc with doc_id % 7 = 0 re-id'd at +1e6 (guaranteed exact
    dups of standing-corpus docs — the q_incremental_dedup injection,
    so the cross-side path is non-vacuous at every SF)."""
    d = load_table(spark, sf_dir, "documents")
    corpus = d.filter(F.col("doc_id") % 10 != 0)
    batch = (
        d.filter(F.col("doc_id") % 10 == 0)
        .select("doc_id", "text")
        .unionByName(
            corpus.filter(F.col("doc_id") % 7 == 0).select(
                (F.col("doc_id") + 1000000).alias("doc_id"), "text"
            )
        )
    )
    return corpus, batch


def _brute_force(spark, corpus, batch, threshold, n=5):
    """Reference cross-side exact Jaccard from the shingle tables."""
    c_sh = shingle_table(corpus, "doc_id", "text", n)
    b_sh = shingle_table(batch, "doc_id", "text", n)
    c_sz = c_sh.groupBy("doc").agg(F.count("*").alias("nc"))
    b_sz = b_sh.groupBy("doc").agg(F.count("*").alias("nb"))
    inter = (
        b_sh.alias("b")
        .join(c_sh.alias("c"), F.col("b.shingle") == F.col("c.shingle"))
        .groupBy(
            F.col("b.doc").alias("doc_id"), F.col("c.doc").alias("dup_of")
        )
        .agg(F.count("*").alias("inter"))
    )
    jac = F.col("inter").cast("double") / (
        F.col("nb") + F.col("nc") - F.col("inter")
    ).cast("double")
    return (
        inter.join(b_sz.withColumnRenamed("doc", "doc_id"), "doc_id")
        .join(c_sz.withColumnRenamed("doc", "dup_of"), "dup_of")
        .select("doc_id", "dup_of", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def test_equals_brute_force_cross_join(spark, sf_dir):
    corpus, batch = _split(spark, sf_dir)
    got = sorted(
        map(
            tuple,
            incremental_neardup_pairs(
                corpus, batch, "doc_id", "text", n=5, threshold=0.8
            ).collect(),
        )
    )
    want = sorted(
        map(tuple, _brute_force(spark, corpus, batch, 0.8).collect())
    )
    assert got == want
    assert len(want) > 0  # non-vacuous: the injection guarantees pairs


def test_prebuilt_state_matches_raw(spark, sf_dir):
    """The maintained-state mode: pairs computed against a prebuilt
    corpus index must equal the from-raw path row-for-row (same seeded
    coefficient family on both construction routes)."""
    corpus, batch = _split(spark, sf_dir)
    c_sh, c_bands = build_neardup_state(corpus, "doc_id", "text", n=5)
    got = sorted(
        map(
            tuple,
            incremental_neardup_pairs(
                None,
                batch,
                "doc_id",
                "text",
                n=5,
                threshold=0.8,
                corpus_shingles=c_sh,
                corpus_bands=c_bands,
            ).collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            incremental_neardup_pairs(
                corpus, batch, "doc_id", "text", n=5, threshold=0.8
            ).collect(),
        )
    )
    assert got == want


def test_injected_exact_dups_surface_at_one(spark, sf_dir):
    """Every injected batch doc (corpus doc re-id'd at +1e6) must pair
    with its original at jaccard exactly 1.0."""
    corpus, batch = _split(spark, sf_dir)
    pairs = incremental_neardup_pairs(
        corpus, batch, "doc_id", "text", n=5, threshold=0.8
    )
    hits = {
        (r.doc_id, r.dup_of): r.jaccard
        for r in pairs.filter(F.col("doc_id") >= 1000000).collect()
    }
    injected = [
        r.doc_id
        for r in corpus.filter(F.col("doc_id") % 7 == 0)
        # docs shorter than n=5 tokens have empty shingle sets and
        # legitimately cannot pair
        .filter(F.size(F.split("text", " ")) >= 5)
        .select("doc_id")
        .collect()
    ]
    assert injected
    for doc in injected:
        assert hits.get((doc + 1000000, doc)) == 1.0


def test_band_validation(spark):
    with pytest.raises(ValueError, match="divisible"):
        incremental_neardup_pairs(
            None, None, "doc_id", "text", num_hashes=32, bands=7
        )


def test_state_geometry_mismatch_raises(spark, sf_dir):
    """VERDICT r17 task 3 (the incremental-family geometry contract,
    `operators/state_geometry.py` — this was the last incremental face
    without the stamp): probing state built at a different
    n/num_hashes/bands/seed must raise, not silently band-join
    incomparable hashes (near-zero recall with no error). Mixed pairs
    from two different builds are caught too."""
    corpus, batch = _split(spark, sf_dir)
    c_sh4, c_bands4 = build_neardup_state(corpus, "doc_id", "text", n=4)
    with pytest.raises(ValueError, match="does not match the supplied"):
        incremental_neardup_pairs(
            None, batch, "doc_id", "text", n=5,
            corpus_shingles=c_sh4, corpus_bands=c_bands4,
        )
    c_sh5, c_bands5 = build_neardup_state(
        corpus, "doc_id", "text", n=5, seed=7
    )
    with pytest.raises(ValueError, match="does not match the supplied"):
        incremental_neardup_pairs(
            None, batch, "doc_id", "text", n=5,
            corpus_shingles=c_sh5, corpus_bands=c_bands5,
        )
    with pytest.raises(ValueError, match="different geometries"):
        incremental_neardup_pairs(
            None, batch, "doc_id", "text", n=5,
            corpus_shingles=c_sh4, corpus_bands=c_bands5,
        )
    # matching geometry passes, and the stamp survives the frames'
    # own checkpoint (the withMetadata persistence property)
    sh, bands = build_neardup_state(corpus, "doc_id", "text", n=5)
    got = incremental_neardup_pairs(
        None, batch, "doc_id", "text", n=5, threshold=0.8,
        corpus_shingles=sh.localCheckpoint(eager=False),
        corpus_bands=bands.localCheckpoint(eager=False),
    )
    assert got.columns == ["doc_id", "dup_of", "jaccard"]
    assert got.count() > 0


def test_hand_built_state_still_accepted(spark, sf_dir):
    """Unstamped (hand-built) state stays accepted with matching
    geometry as the caller's contract — the stamp is a safety net for
    the build_neardup_state path, not a new input requirement (the
    incremental-family convention)."""
    from food_panda_etl_spark.operators.dedup import (
        band_rows,
        minhash_from_shingles,
    )

    corpus, batch = _split(spark, sf_dir)
    sh = shingle_table(corpus, "doc_id", "text", 5)
    bands = band_rows(minhash_from_shingles(sh, 32, 42), 32, 16)
    got = incremental_neardup_pairs(
        None, batch, "doc_id", "text", n=5, threshold=0.8,
        corpus_shingles=sh, corpus_bands=bands,
    ).count()
    want = incremental_neardup_pairs(
        corpus, batch, "doc_id", "text", n=5, threshold=0.8
    ).count()
    assert got == want
