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


def test_state_geometry_mismatch_raises(spark, sf_dir):
    """ADVICE r17 (the incremental-family geometry contract,
    `operators/state_geometry.py`): the same-k contract was
    docstring-only — a state truncated at a smaller k silently yields
    a wrong sample. State stamped by `build_group_priority_state` now
    raises on a mismatched refresh/rebucket probe."""
    from food_panda_etl_spark.operators.sampling_incremental import (
        build_group_priority_state,
        group_priority_rebucket,
        incremental_group_priority_sample,
    )

    d, corpus, batch = _split(spark, sf_dir)
    state3 = build_group_priority_state(corpus, ("lang",), "n_chars", 3)
    # refresh at a WIDER k than the state was truncated at
    with pytest.raises(ValueError, match="does not match the supplied"):
        incremental_group_priority_sample(
            state3, batch, ("lang",), "n_chars", _K
        )
    # refresh with a different id ranking
    state_k = build_group_priority_state(
        corpus.withColumn("alt_id", F.col("doc_id")),
        ("lang",), "n_chars", _K, id_col="alt_id",
    ).withColumnRenamed("alt_id", "doc_id")
    with pytest.raises(ValueError, match="does not match the supplied"):
        incremental_group_priority_sample(
            state_k, batch, ("lang",), "n_chars", _K
        )
    # rebucket widening the per-fine-group k
    fine = build_group_priority_state(
        d, ("lang", "source"), "n_chars", 3
    )
    with pytest.raises(ValueError, match="cannot be widened"):
        group_priority_rebucket(fine, ("lang",), _K)
    # rebucket to a non-subset grouping: the shape check would pass if
    # the column exists on the state via carry, so build one that does
    fine2 = build_group_priority_state(
        d, ("lang",), "n_chars", _K, carry_cols=("source",)
    )
    with pytest.raises(ValueError, match="not a\\s+subset"):
        group_priority_rebucket(
            fine2.select(
                "source", "doc_id", "lang", "weight", "priority", "rk"
            ),
            ("source",), _K, carry_cols=("lang",),
        )


def test_stamped_state_matching_geometry_passes(spark, sf_dir):
    """The stamp rides chained refreshes (the output IS the next
    state, stamp included) and rebuckets at narrower-or-equal k; the
    matched path stays row-identical to the unstamped path."""
    from food_panda_etl_spark.operators.sampling_incremental import (
        build_group_priority_state,
        group_priority_rebucket,
        incremental_group_priority_sample,
    )

    d, corpus, batch = _split(spark, sf_dir)
    state = build_group_priority_state(corpus, ("lang",), "n_chars", _K)
    s1 = incremental_group_priority_sample(
        state, batch.filter(F.col("doc_id") % 20 == 0),
        ("lang",), "n_chars", _K,
    )
    # the refreshed output carries the stamp forward — a mismatched
    # SECOND refresh still raises
    with pytest.raises(ValueError, match="does not match the supplied"):
        incremental_group_priority_sample(
            s1, batch, ("lang",), "n_chars", _K + 1
        )
    s2 = incremental_group_priority_sample(
        s1, batch.filter(F.col("doc_id") % 20 != 0),
        ("lang",), "n_chars", _K,
    )
    want = group_priority_sample(d, ("lang",), "n_chars", _K)
    assert _rows(s2.select(*want.columns)) == _rows(want)
    # rebucket: fine (lang, source) k=7 → lang at k=3 passes (7 ≥ 3)
    fine = build_group_priority_state(d, ("lang", "source"), "n_chars", _K)
    mx = group_priority_rebucket(fine, ("lang",), 3)
    direct = group_priority_sample(d, ("lang",), "n_chars", 3)
    assert _rows(mx) == _rows(direct)


def test_hand_built_state_still_accepted(spark, sf_dir):
    """Unstamped (plain `group_priority_sample`) state stays accepted
    with matching geometry as the caller's contract — the stamp is a
    safety net for the build_group_priority_state path, not a new
    input requirement (the incremental-family convention)."""
    d, corpus, batch = _split(spark, sf_dir)
    state = group_priority_sample(corpus, ("lang",), "n_chars", _K)
    got = incremental_group_priority_sample(
        state, batch, ("lang",), "n_chars", _K
    )
    want = group_priority_sample(d, ("lang",), "n_chars", _K)
    assert _rows(got) == _rows(want)
