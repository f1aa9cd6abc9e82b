"""Incremental group-wise priority sampling
(operators/sampling_incremental.py, r17 build-ahead for r18): a
refresh over maintained ≤ k-per-group state must be row-identical to
re-sampling the full union from scratch (the mergeable bottom-k
identity, machine-checked), chain-refreshable (the output IS the next
state), and loud on malformed state."""

from __future__ import annotations

import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from food_panda_etl_spark.operators.sampling_group import (
    group_priority_sample,
)
from food_panda_etl_spark.operators.sampling_incremental import (
    incremental_group_priority_sample,
)
from food_panda_etl_spark.tables import load_table

_K = 7


def _split(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    corpus = d.filter(F.col("doc_id") % 10 != 0)
    batch = d.filter(F.col("doc_id") % 10 == 0)
    return d, corpus, batch


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_refresh_equals_full_resample(spark, sf_dir):
    d, corpus, batch = _split(spark, sf_dir)
    state = group_priority_sample(corpus, ("lang",), "n_chars", _K)
    got = incremental_group_priority_sample(
        state, batch, ("lang",), "n_chars", _K
    )
    want = group_priority_sample(d, ("lang",), "n_chars", _K)
    assert _rows(got) == _rows(want)
    assert got.count() > 0


def test_chained_refresh_equals_one_shot(spark, sf_dir):
    """The output is the next round's state: two sequential batch
    refreshes equal one refresh over both batches equal the full
    resample — the identity composed."""
    d, corpus, batch = _split(spark, sf_dir)
    b1 = batch.filter(F.col("doc_id") % 20 == 0)
    b2 = batch.filter(F.col("doc_id") % 20 != 0)
    state = group_priority_sample(corpus, ("lang",), "n_chars", _K)
    s1 = incremental_group_priority_sample(
        state, b1, ("lang",), "n_chars", _K
    )
    s2 = incremental_group_priority_sample(s1, b2, ("lang",), "n_chars", _K)
    want = group_priority_sample(d, ("lang",), "n_chars", _K)
    assert _rows(s2) == _rows(want)


def test_state_shape_validated(spark, sf_dir):
    _, corpus, batch = _split(spark, sf_dir)
    state = group_priority_sample(corpus, ("lang",), "n_chars", _K)
    with pytest.raises(ValueError, match="state has columns"):
        incremental_group_priority_sample(
            state.drop("priority"), batch, ("lang",), "n_chars", _K
        )
    with pytest.raises(ValueError, match="state has columns"):
        incremental_group_priority_sample(
            corpus, batch, ("lang",), "n_chars", _K
        )
    with pytest.raises(ValueError, match="k must be"):
        incremental_group_priority_sample(
            state, batch, ("lang",), "n_chars", 0
        )
    with pytest.raises(ValueError, match="group_cols must be"):
        incremental_group_priority_sample(
            state, batch, (), "n_chars", _K
        )


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=400),  # id
            st.sampled_from(["a", "b", "c"]),  # group
            st.integers(min_value=0, max_value=50),  # weight
        ),
        min_size=1,
        max_size=60,
    ),
    cut=st.integers(min_value=0, max_value=9),
    k=st.integers(min_value=1, max_value=5),
)
def test_merge_identity_random(spark, rows, cut, k):
    """bottomk(S ∪ B) == refresh(bottomk(S), B) per group for random
    weights/groups/split points — the full merge theorem, including
    zero weights (never selected) and groups present on one side
    only."""
    uniq = {r[0]: r for r in rows}.values()  # unique ids (the contract)
    df = spark.createDataFrame(
        list(uniq), "doc_id long, g string, w long"
    )
    corpus = df.filter(F.col("doc_id") % 10 >= cut)
    batch = df.filter(F.col("doc_id") % 10 < cut)
    state = group_priority_sample(corpus, ("g",), "w", k)
    got = incremental_group_priority_sample(state, batch, ("g",), "w", k)
    want = group_priority_sample(df, ("g",), "w", k)
    assert _rows(got) == _rows(want)


def test_rebucket_equals_direct_coarse_sample(spark, sf_dir):
    """The re-bucketing combine: per-(lang, source) fine samples
    re-ranked to per-lang must equal sampling per-lang directly (the
    dropped-dimension identity — coarse bottom-k ⊆ union of fine
    bottom-k's while fine k >= coarse k)."""
    from food_panda_etl_spark.operators.sampling_incremental import (
        group_priority_rebucket,
    )

    d = load_table(spark, sf_dir, "documents")
    fine = group_priority_sample(d, ("lang", "source"), "n_chars", _K)
    got = group_priority_rebucket(fine, ("lang",), _K)
    want = group_priority_sample(d, ("lang",), "n_chars", _K)
    assert _rows(got) == _rows(want)
    assert got.count() > 0


def test_rebucket_validation(spark, sf_dir):
    from food_panda_etl_spark.operators.sampling_incremental import (
        group_priority_rebucket,
    )

    d = load_table(spark, sf_dir, "documents")
    fine = group_priority_sample(d, ("lang", "source"), "n_chars", _K)
    with pytest.raises(ValueError, match="k must be"):
        group_priority_rebucket(fine, ("lang",), 0)
    with pytest.raises(ValueError, match="group_cols must be"):
        group_priority_rebucket(fine, (), _K)
    with pytest.raises(ValueError, match="lacks columns"):
        group_priority_rebucket(fine.drop("priority"), ("lang",), _K)
    with pytest.raises(ValueError, match="lacks columns"):
        group_priority_rebucket(fine, ("nonexistent",), _K)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=400),  # id
            st.sampled_from(["a", "b"]),  # coarse group
            st.integers(min_value=0, max_value=6),  # fine dim (day)
            st.integers(min_value=0, max_value=50),  # weight
        ),
        min_size=1,
        max_size=60,
    ),
    k=st.integers(min_value=1, max_value=5),
)
def test_rebucket_identity_random(spark, rows, k):
    """Re-bucketing (g, day) → g equals the direct per-g sample for
    random weights/days, including zero weights and groups existing in
    one day only — the dropped-dimension identity in full."""
    from food_panda_etl_spark.operators.sampling_incremental import (
        group_priority_rebucket,
    )

    uniq = {r[0]: r for r in rows}.values()
    df = spark.createDataFrame(
        list(uniq), "doc_id long, g string, day long, w long"
    )
    fine = group_priority_sample(df, ("g", "day"), "w", k)
    got = group_priority_rebucket(fine, ("g",), k)
    want = group_priority_sample(df, ("g",), "w", k)
    assert _rows(got) == _rows(want)
