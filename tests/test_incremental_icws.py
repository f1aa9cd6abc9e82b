"""Incremental ICWS real-weight near-dup screen
(operators/incremental_icws.py, r17 build-ahead for r18): cross-side
band probe + exact TF-weighted verify must equal the brute-force
cross-side count-join at the fixture similarities, the
maintained-state path must equal the from-raw path, injected copies
must surface at tf_jaccard 1, and the geometry stamps must fail loudly
on mismatched / mixed / partial state."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from food_panda_etl_spark.operators.incremental_icws import (
    build_icws_state,
    incremental_icws_pairs,
)
from food_panda_etl_spark.operators.tf_jaccard import (
    tf_count_table_verify,
)
from food_panda_etl_spark.operators.weighted_jaccard import (
    shingle_multiset_table,
)
from food_panda_etl_spark.tables import load_table

_NUM, _DEN = 7, 10
_N = 3


def _split(spark, sf_dir):
    """corpus = doc_id % 10 <> 0; batch = doc_id % 10 = 0 plus every
    corpus doc with doc_id % 7 = 0 re-id'd at +1e6 (guaranteed
    tf_jaccard-1 rows — the incremental_neardup injection)."""
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


def _brute_force(corpus, batch):
    """The unfiltered cross-side exact TF-weighted join: ALL candidate
    pairs through the shared verify (cross-side mode) — candidate
    completeness by construction (every (batch, corpus) pair)."""
    b_shc = shingle_multiset_table(batch, "doc_id", "text", _N)
    c_shc = shingle_multiset_table(corpus, "doc_id", "text", _N)
    cand = (
        b_shc.select(F.col("doc").alias("doc_a"))
        .distinct()
        .crossJoin(c_shc.select(F.col("doc").alias("doc_b")).distinct())
    )
    return tf_count_table_verify(b_shc, cand, _NUM, _DEN, shc_b=c_shc)


def test_equals_brute_force_cross_side(spark, sf_dir):
    corpus, batch = _split(spark, sf_dir)
    got = sorted(
        map(
            tuple,
            incremental_icws_pairs(
                corpus, batch, "doc_id", "text", n=_N,
                threshold_num=_NUM, threshold_den=_DEN,
            ).collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            _brute_force(corpus, batch)
            .select("doc_a", "doc_b", "wi_scaled", "tf_jaccard")
            .collect(),
        )
    )
    assert got == want
    assert len(want) > 0


def test_prebuilt_state_matches_raw(spark, sf_dir):
    corpus, batch = _split(spark, sf_dir)
    counts, index = build_icws_state(corpus, "doc_id", "text", n=_N)
    got = sorted(
        map(
            tuple,
            incremental_icws_pairs(
                None, batch, "doc_id", "text", n=_N,
                threshold_num=_NUM, threshold_den=_DEN,
                corpus_counts=counts, corpus_bands=index,
            ).collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            incremental_icws_pairs(
                corpus, batch, "doc_id", "text", n=_N,
                threshold_num=_NUM, threshold_den=_DEN,
            ).collect(),
        )
    )
    assert got == want


def test_injected_copies_surface_at_one(spark, sf_dir):
    corpus, batch = _split(spark, sf_dir)
    got = incremental_icws_pairs(
        corpus, batch, "doc_id", "text", n=_N,
        threshold_num=_NUM, threshold_den=_DEN,
    )
    inj = got.filter(
        (F.col("doc_id") > 1000000)
        & (F.col("doc_id") - 1000000 == F.col("dup_of"))
    )
    n_inj = (
        corpus.filter(F.col("doc_id") % 7 == 0)
        # docs shorter than n tokens have empty shingle multisets and
        # an undefined tf_jaccard — the join family's contract
        .filter(F.size(F.split(F.col("text"), " ")) >= _N)
        .count()
    )
    rows = inj.collect()
    assert len(rows) == n_inj and n_inj > 0
    assert all(r.tf_jaccard == 1.0 for r in rows)


def test_partial_state_raises(spark, sf_dir):
    corpus, batch = _split(spark, sf_dir)
    counts, index = build_icws_state(corpus, "doc_id", "text", n=_N)
    with pytest.raises(ValueError, match="supply BOTH"):
        incremental_icws_pairs(
            None, batch, "doc_id", "text", n=_N,
            corpus_counts=counts,
        )
    with pytest.raises(ValueError, match="need a corpus"):
        incremental_icws_pairs(None, batch, "doc_id", "text", n=_N)


def test_state_geometry_mismatch_raises(spark, sf_dir):
    """The incremental-family geometry contract (ADVICE r16/r17
    pattern): a probe at different n / bands / seed raises; a mixed
    pair from two different builds raises."""
    corpus, batch = _split(spark, sf_dir)
    counts4, index4 = build_icws_state(corpus, "doc_id", "text", n=4)
    with pytest.raises(ValueError, match="does not match the supplied"):
        incremental_icws_pairs(
            None, batch, "doc_id", "text", n=_N,
            corpus_counts=counts4, corpus_bands=index4,
        )
    counts3, index3 = build_icws_state(
        corpus, "doc_id", "text", n=_N, seed=7
    )
    with pytest.raises(ValueError, match="does not match the supplied"):
        incremental_icws_pairs(
            None, batch, "doc_id", "text", n=_N,
            corpus_counts=counts3, corpus_bands=index3,
        )
    with pytest.raises(ValueError, match="different geometries"):
        incremental_icws_pairs(
            None, batch, "doc_id", "text", n=_N,
            corpus_counts=counts4, corpus_bands=index3,
        )


def test_hand_built_state_still_accepted(spark, sf_dir):
    """Unstamped state stays accepted with matching geometry as the
    caller's contract (the incremental-family convention)."""
    from food_panda_etl_spark.operators.dedup import band_rows
    from food_panda_etl_spark.operators.icws import icws_signatures
    from food_panda_etl_spark.operators.tf_jaccard import tf_weights

    corpus, batch = _split(spark, sf_dir)
    counts = shingle_multiset_table(corpus, "doc_id", "text", _N)
    index = band_rows(icws_signatures(tf_weights(counts), 32, 42), 32, 16)
    got = incremental_icws_pairs(
        None, batch, "doc_id", "text", n=_N,
        threshold_num=_NUM, threshold_den=_DEN,
        corpus_counts=counts, corpus_bands=index,
    ).count()
    want = incremental_icws_pairs(
        corpus, batch, "doc_id", "text", n=_N,
        threshold_num=_NUM, threshold_den=_DEN,
    ).count()
    assert got == want


def test_bands_zero_raises_value_error(spark):
    """bands=0 must raise the geometry ValueError, not a
    ZeroDivisionError from the modulo itself (review r17)."""
    with pytest.raises(ValueError, match="dividing num_hashes"):
        build_icws_state(None, "doc_id", "text", bands=0)
    with pytest.raises(ValueError, match="dividing num_hashes"):
        incremental_icws_pairs(None, None, "doc_id", "text", bands=0)
