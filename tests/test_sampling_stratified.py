"""Stratified PPS invariants: per-stratum ticks telescope to exactly
k_s under any weights and partitionings, the stratum-local cumulative
equals a per-stratum flat sample (composition equivalence — the
operator is ONE prefix-sum job but must select exactly what running
the flat sampler per stratum selects), unquoted strata are dropped,
and validation."""

from __future__ import annotations

import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


SET = settings(max_examples=5, deadline=None,
               suppress_health_check=[HealthCheck.function_scoped_fixture])


@SET
@given(
    weights=st.lists(
        st.tuples(st.sampled_from(["en", "de"]),
                  st.integers(min_value=1, max_value=50)),
        min_size=4, max_size=40,
    ),
    parts=st.integers(min_value=1, max_value=5),
)
def test_stratified_ticks_telescope_and_match_flat_per_stratum(
    spark, weights, parts
):
    from food_panda_etl_spark.operators.sampling import pps_systematic_sample
    from food_panda_etl_spark.operators.sampling_stratified import (
        pps_stratified_sample,
    )

    quotas = {"en": 3, "de": 2}
    rows = [(i, s, w) for i, (s, w) in enumerate(weights)]
    df = spark.createDataFrame(
        rows, "doc_id long, lang string, n_chars long"
    ).repartition(parts)
    got = pps_stratified_sample(df, "lang", "n_chars", quotas).collect()
    by_stratum: dict = {}
    for r in got:
        by_stratum.setdefault(r["lang"], []).append(r)
    for s, k in quotas.items():
        present = [r for r in rows if r[1] == s]
        if not present:
            assert s not in by_stratum
            continue
        sel = by_stratum.get(s, [])
        assert sum(r["n_ticks"] for r in sel) == k
        assert all(r["n_ticks"] >= 1 for r in sel)
        # composition equivalence: the flat sampler on the stratum's
        # rows alone must pick the SAME ids with the SAME tick counts
        flat = pps_systematic_sample(
            spark.createDataFrame(
                [(i, w) for i, s2, w in present], "doc_id long, n_chars long"
            ),
            "n_chars",
            k=k,
        ).collect()
        assert {(r["doc_id"], r["n_ticks"]) for r in sel} == {
            (r["doc_id"], r["n_ticks"]) for r in flat
        }


def test_stratified_drops_unquoted_strata_and_validates(spark):
    from food_panda_etl_spark.operators.sampling_stratified import (
        pps_stratified_sample,
    )

    df = spark.createDataFrame(
        [(0, "en", 5), (1, "fr", 7), (2, "en", 3)],
        "doc_id long, lang string, n_chars long",
    )
    got = pps_stratified_sample(df, "lang", "n_chars", {"en": 2}).collect()
    assert {r["lang"] for r in got} == {"en"}
    with pytest.raises(ValueError, match="non-empty"):
        pps_stratified_sample(df, "lang", "n_chars", {})
    with pytest.raises(ValueError, match="negative"):
        pps_stratified_sample(df, "lang", "n_chars", {"en": -1})
    neg = spark.createDataFrame(
        [(0, "en", -5)], "doc_id long, lang string, n_chars long"
    )
    with pytest.raises(Exception, match="non-negative non-NULL"):
        pps_stratified_sample(neg, "lang", "n_chars", {"en": 1}).collect()


def test_stratified_zero_mass_stratum_selects_nothing(spark):
    """All-zero weights in one stratum must yield an empty selection
    for that stratum, not a DIVIDE_BY_ZERO that kills the healthy
    strata (zero weights are individually legal, so all-zero is too)."""
    from food_panda_etl_spark.operators.sampling_stratified import (
        pps_stratified_sample,
    )

    df = spark.createDataFrame(
        [(0, "en", 0), (1, "en", 0), (2, "de", 5), (3, "de", 7)],
        "doc_id long, lang string, n_chars long",
    )
    got = pps_stratified_sample(
        df, "lang", "n_chars", {"en": 2, "de": 1}
    ).collect()
    assert {r["lang"] for r in got} == {"de"}
    assert sum(r["n_ticks"] for r in got) == 1


def test_stratified_rejects_none_quota_key(spark):
    """ADVICE r8 regression: {None: k} used to pass validation but the
    inner stratum equi-join can never match a NULL stratum, so the
    quota silently selected nothing — must raise instead."""
    from food_panda_etl_spark.operators.sampling_stratified import (
        pps_stratified_sample,
    )

    df = spark.createDataFrame(
        [(0, None, 5), (1, "en", 7)],
        "doc_id long, lang string, n_chars long",
    )
    with pytest.raises(ValueError, match="non-NULL"):
        pps_stratified_sample(df, "lang", "n_chars", {None: 1})
    # a NULL stratum in the DATA under a non-NULL quota dict is still
    # fine — it is simply unquoted, hence dropped
    got = pps_stratified_sample(df, "lang", "n_chars", {"en": 1}).collect()
    assert {r["lang"] for r in got} == {"en"}


def test_stratified_rejects_fractional_quota(spark):
    from food_panda_etl_spark.operators.sampling_stratified import (
        pps_stratified_sample,
    )

    df = spark.createDataFrame(
        [(0, "en", 5)], "doc_id long, lang string, n_chars long"
    )
    with pytest.raises(ValueError, match="non-negative integer"):
        pps_stratified_sample(df, "lang", "n_chars", {"en": 2.9})


def test_flat_sampler_zero_total_selects_nothing(spark):
    """The flat sampler's analog of the zero-mass guard: an all-zero
    input returns empty instead of aborting under ANSI division."""
    from food_panda_etl_spark.operators.sampling import pps_systematic_sample

    df = spark.createDataFrame(
        [(0, 0), (1, 0)], "doc_id long, n_chars long"
    )
    assert pps_systematic_sample(df, "n_chars", k=3).collect() == []
