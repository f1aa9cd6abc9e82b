"""Incremental DSIR (operators/dsir_incremental.py, r19 build-ahead
for r20): the maintained hashed-bigram count state must (a) be
IDENTICAL to the from-scratch state under any refresh chain
(linearity — counts sum), (b) score a corpus against its own state
BIT-identically to `dsir_weights` (the declared-identity the r20
preview rides), (c) be deterministic under repartitioning, (d) be
loud on mismatched/empty-target state while accepting hand-built
state with matching geometry, and (e) score never-seen features as
ρ=0 without poisoning the rest of the document."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from food_panda_etl_spark.operators.dsir import dsir_weights
from food_panda_etl_spark.operators.dsir_incremental import (
    DSIR_STATE_GEO_KEYS,
    build_dsir_state,
    dsir_score_against_state,
    incremental_dsir_refresh,
)
from food_panda_etl_spark.operators.state_geometry import state_geometry
from food_panda_etl_spark.tables import load_table

_B = 1024


def _tgt():
    """Target predicate, built lazily (no Columns at import time)."""
    return F.col("lang") == "en"


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )


def _state_rows(df):
    # positional access: Row.__getattr__ rejects dunder column names
    return sorted(
        tuple(r) for r in df.select("__b", "__rb", "__tb").collect()
    )


def test_refresh_equals_from_scratch(spark, sf_dir):
    d = _docs(spark, sf_dir)
    st = build_dsir_state(
        d.filter(F.col("doc_id") % 10 != 0), _tgt(), buckets=_B
    )
    st = incremental_dsir_refresh(
        st, d.filter(F.col("doc_id") % 10 == 0), _tgt(), buckets=_B
    )
    want = build_dsir_state(d, _tgt(), buckets=_B)
    assert _state_rows(st) == _state_rows(want)
    # chained refreshes land on the same state (any merge tree)
    st3 = build_dsir_state(d.filter(F.col("doc_id") % 3 == 0), _tgt())
    for m in (1, 2):
        st3 = incremental_dsir_refresh(
            st3, d.filter(F.col("doc_id") % 3 == m), _tgt()
        )
    assert _state_rows(st3) == _state_rows(want)


def test_score_against_state_matches_dsir_weights(spark, sf_dir):
    d = _docs(spark, sf_dir)
    st = build_dsir_state(
        d.filter(F.col("doc_id") % 10 != 0), _tgt(), buckets=_B
    )
    st = incremental_dsir_refresh(
        st, d.filter(F.col("doc_id") % 10 == 0), _tgt(), buckets=_B
    ).localCheckpoint(eager=False)
    got = dsir_score_against_state(
        d, st, buckets=_B, keep_threshold=1.0
    )
    want = dsir_weights(d, _tgt(), buckets=_B, keep_threshold=1.0)
    assert got.columns == want.columns
    g = sorted(
        (r.doc_id, r.n_bigrams, float(r.dsir_score).hex(), r.keep)
        for r in got.collect()
    )
    w = sorted(
        (r.doc_id, r.n_bigrams, float(r.dsir_score).hex(), r.keep)
        for r in want.collect()
    )
    assert g == w and len(g) > 0


def test_state_deterministic_under_repartitioning(spark, sf_dir):
    d = _docs(spark, sf_dir).limit(300)
    s1 = build_dsir_state(d.repartition(1), _tgt())
    s2 = build_dsir_state(d.repartition(13), _tgt())
    assert _state_rows(s1) == _state_rows(s2)


def test_geometry_stamp_round_trip_and_mismatch(spark, sf_dir, tmp_path):
    d = _docs(spark, sf_dir).limit(200)
    st = build_dsir_state(d, _tgt(), buckets=_B)
    assert state_geometry(st, "__rb", DSIR_STATE_GEO_KEYS) == {
        "buckets": _B,
        "featurizer": "dsir_incremental.hashed-bigram/v1",
    }
    # survives parquet — the maintained-state persistence path
    p = os.path.join(str(tmp_path), "dsir_state")
    st.write.parquet(p)
    back = spark.read.parquet(p)
    assert state_geometry(back, "__rb", DSIR_STATE_GEO_KEYS) == {
        "buckets": _B,
        "featurizer": "dsir_incremental.hashed-bigram/v1",
    }
    with pytest.raises(ValueError, match="different feature space"):
        incremental_dsir_refresh(back, d, _tgt(), buckets=512)
    with pytest.raises(ValueError, match="wrong cells"):
        dsir_score_against_state(d, back, buckets=2048)
    # matching geometry through parquet still works
    r = incremental_dsir_refresh(back, d.limit(50), _tgt(), buckets=_B)
    assert r.count() > 0


def test_hand_built_state_still_accepted(spark, sf_dir):
    """Unstamped state with the right columns is the caller's
    contract (the state_geometry convention everywhere)."""
    d = _docs(spark, sf_dir).limit(200)
    hand = spark.createDataFrame(
        [(0, 10, 5), (1, 4, 0)], "__b long, __rb long, __tb long"
    )
    assert state_geometry(hand, "__rb", DSIR_STATE_GEO_KEYS) is None
    assert incremental_dsir_refresh(hand, d, _tgt()).count() > 0
    assert dsir_score_against_state(d, hand).count() > 0


def test_unseen_buckets_score_zero(spark):
    """A document whose bigrams the state has never seen scores ρ=0
    per gram — dsir_score 0.0, n_bigrams still counted — and a mixed
    document is not poisoned (its seen grams still contribute)."""
    corpus = spark.createDataFrame(
        [(1, "en", "aa bb aa bb aa bb"), (2, "de", "aa bb aa bb")],
        "doc_id long, lang string, text string",
    )
    st = build_dsir_state(corpus, _tgt()).localCheckpoint(eager=False)
    probe = spark.createDataFrame(
        # "zz yy" never seen; "aa bb" seen (5 occurrences, 3 target)
        [(10, "x", "zz yy zz yy"), (11, "x", "aa bb")],
        "doc_id long, lang string, text string",
    )
    got = {
        r.doc_id: (r.n_bigrams, r.dsir_score)
        for r in dsir_score_against_state(probe, st).collect()
    }
    assert got[10][0] == 3 and got[10][1] == 0.0
    # doc 11's single gram: rho = (tb*RT)/(rb*TT) = (3*8)/(5*5) = 0.96
    assert got[11][0] == 1 and abs(got[11][1] - 0.96) < 1e-9


def test_empty_target_state_raises(spark):
    corpus = spark.createDataFrame(
        [(1, "de", "aa bb aa")], "doc_id long, lang string, text string"
    )
    st = build_dsir_state(corpus, _tgt()).localCheckpoint(eager=False)
    with pytest.raises(Exception, match="no target bigrams"):
        dsir_score_against_state(corpus, st).collect()
