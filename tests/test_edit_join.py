"""Edit-distance similarity join (operators/edit_join.py, r15
build-ahead for r16): completeness against the brute-force all-pairs
levenshtein join on fixture-derived strings AND on random short
strings from a tiny alphabet (the short-bucket / zero-shared-gram /
duplicate regime the count bound cannot prune), plus the guards."""

from __future__ import annotations

import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from food_panda_etl_spark.operators.edit_join import edit_distance_join
from food_panda_etl_spark.tables import load_table


def _brute_force(strs):
    """Reference all-pairs levenshtein join — test-only (the quadratic
    shape the operator exists to avoid)."""
    a = strs.select(F.col("doc").alias("id_a"), F.col("s").alias("sa"))
    b = strs.select(F.col("doc").alias("id_b"), F.col("s").alias("sb"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.levenshtein("sa", "sb").cast("int").alias("dist"),
        )
    )


def _fixture_relation(spark, sf_dir):
    """40-char document prefixes plus a third-character-deletion
    variant of every doc_id%9 doc (re-id'd at +1e6) — each variant
    sits at exactly distance 1 from its original, so the k=2 join is
    non-vacuous at every SF."""
    d = load_table(spark, sf_dir, "documents")
    base = d.select(
        F.col("doc_id").alias("doc"),
        F.substring("text", 1, 40).alias("s"),
    )
    variants = base.filter(F.col("doc") % 9 == 0).select(
        (F.col("doc") + 1000000).alias("doc"),
        F.concat(
            F.col("s").substr(1, 2), F.expr("substring(s, 4)")
        ).alias("s"),
    )
    return base.unionByName(variants)


def test_equals_brute_force_on_fixture(spark, sf_dir):
    strs = _fixture_relation(spark, sf_dir)
    got = sorted(
        map(
            tuple,
            edit_distance_join(strs, "doc", "s", k=2, q=2).collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            _brute_force(strs).filter(F.col("dist") <= 2).collect(),
        )
    )
    assert got == want
    assert len(want) > 0  # the injected deletion variants guarantee pairs


SET = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

strings_strategy = st.lists(
    st.text(alphabet="abc", min_size=0, max_size=8),
    min_size=2,
    max_size=12,
)


@SET
@given(strings=strings_strategy, k=st.integers(min_value=0, max_value=2))
def test_equals_brute_force_random_short_strings(spark, strings, k):
    """Random strings of length 0..8 over a 3-letter alphabet: heavy
    duplicate mass (dist 0), empty strings, and pairs within k edits
    that share ZERO q-grams — the regimes only the short-bucket route
    covers. Output must equal brute force exactly for every k."""
    rows = [(i, s) for i, s in enumerate(strings)]
    strs = spark.createDataFrame(rows, "doc long, s string")
    got = sorted(
        map(tuple, edit_distance_join(strs, "doc", "s", k=k, q=2).collect())
    )
    want = sorted(
        map(tuple, _brute_force(strs).filter(F.col("dist") <= k).collect())
    )
    assert got == want


def test_null_strings_never_pair(spark):
    strs = spark.createDataFrame(
        [(1, "abcdefgh"), (2, None), (3, "abcdefgx")], "doc long, s string"
    )
    rows = edit_distance_join(strs, "doc", "s", k=2, q=2).collect()
    assert sorted((r.id_a, r.id_b, r.dist) for r in rows) == [(1, 3, 1)]


def test_validation():
    with pytest.raises(ValueError, match="need k >= 0"):
        edit_distance_join(None, "doc", "s", k=-1)
    with pytest.raises(ValueError, match="need q >= 1"):
        edit_distance_join(None, "doc", "s", k=1, q=0)


def test_degenerate_digit_corpus_raises(spark):
    """The digit-corpus shape that filled the shuffle disk at 1.28M
    rows in the r15 curve run (module docstring): 20k 12-digit strings
    have ≤100 distinct 2-grams, so N_long/G ≈ 200 clears the DEFAULT
    degenerate_factor=64 bar — the operator must raise with the
    remedy instead of building the ≥P²/G candidate join."""
    strs = spark.range(20000).select(
        F.col("id").alias("doc"),
        F.lpad(
            ((F.col("id") * 2654435761) % 1000000000000).cast("string"),
            12,
            "0",
        ).alias("s"),
    )
    with pytest.raises(ValueError, match="degenerate q-gram alphabet"):
        edit_distance_join(strs, "doc", "s", k=2, q=2)
    # the documented remedy works: q=4 over 10 digits has |Σ|^q = 10^4
    # distinct grams — above the bar, so the same corpus plans fine
    # (exactness at q=4 is covered by the property tests; here we only
    # need the guard to admit it)
    edit_distance_join(
        strs.limit(100), "doc", "s", k=2, q=4
    ).count()


def test_degenerate_guard_disabled_still_exact(spark):
    """degenerate_factor=0 disables the guard (the caller takes the
    quadratic risk knowingly) — output still equals brute force."""
    strs = spark.createDataFrame(
        [(i, f"{i * 37 % 1000:03d}") for i in range(40)],
        "doc long, s string",
    )
    got = sorted(
        map(
            tuple,
            edit_distance_join(
                strs, "doc", "s", k=1, q=2, degenerate_factor=0
            ).collect(),
        )
    )
    want = sorted(
        map(tuple, _brute_force(strs).filter(F.col("dist") <= 1).collect())
    )
    assert got == want


def test_short_bucket_shuffle_fallback_exact(spark):
    """short_broadcast_rows=0 forces the non-broadcast path (the
    ADVICE r16 guard for short-dominated corpora): the length-key
    equi-join must produce the identical pair set."""
    strings = ["ab", "cd", "", "a", "abc", "ab", "xy", "abcd"]
    strs = spark.createDataFrame(
        [(i, s) for i, s in enumerate(strings)], "doc long, s string"
    )
    got = sorted(
        map(
            tuple,
            edit_distance_join(
                strs, "doc", "s", k=2, q=2, short_broadcast_rows=0
            ).collect(),
        )
    )
    want = sorted(
        map(tuple, _brute_force(strs).filter(F.col("dist") <= 2).collect())
    )
    assert got == want
    assert len(want) > 0


def test_both_guards_off_is_fully_lazy(spark, monkeypatch):
    """degenerate_factor=0 + short_broadcast_rows=0 → NO eager action
    at plan-construction time (ADVICE r17: plan-only callers composing
    lazily pay no job — previously the guard collect ran even when no
    decision depended on it). collect() is patched to raise, so ANY
    construction-time action fails the test; the plan must still be
    buildable AND, once the patch lifts, exact."""
    from pyspark.sql import DataFrame

    strings = ["abcdef", "abcdxf", "ab", "cd"]
    strs = spark.createDataFrame(
        [(i, s) for i, s in enumerate(strings)], "doc long, s string"
    )

    def _no_action(self, *a, **kw):
        raise AssertionError("eager action during lazy plan construction")

    monkeypatch.setattr(DataFrame, "collect", _no_action)
    plan = edit_distance_join(
        strs, "doc", "s", k=2, q=2,
        degenerate_factor=0, short_broadcast_rows=0,
    )
    monkeypatch.undo()
    got = sorted(map(tuple, plan.collect()))
    want = sorted(
        map(tuple, _brute_force(strs).filter(F.col("dist") <= 2).collect())
    )
    assert got == want
    assert len(want) > 0
