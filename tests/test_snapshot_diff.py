"""snapshot_diff (operators/diff.py) — CDC semantics incl. null handling."""

from __future__ import annotations

from food_panda_etl_spark.operators.diff import snapshot_diff


def _diff(spark, old_rows, new_rows):
    schema = "k bigint, a string, b double"
    old = spark.createDataFrame(old_rows, schema)
    new = spark.createDataFrame(new_rows, schema)
    return {
        r["k"]: r["change_type"]
        for r in snapshot_diff(old, new, keys=["k"]).collect()
    }


def test_added_removed_changed_unchanged(spark):
    got = _diff(
        spark,
        [(1, "x", 1.0), (2, "y", 2.0), (3, "z", 3.0)],
        [(2, "y", 2.0), (3, "z", 99.0), (4, "w", 4.0)],
    )
    assert got == {1: "removed", 3: "changed", 4: "added"}


def test_null_transitions(spark):
    got = _diff(
        spark,
        [(1, None, None), (2, "x", None), (3, None, 3.0)],
        [(1, None, None), (2, None, None), (3, None, 3.0)],
    )
    # NULL→NULL is unchanged; value→NULL is a change
    assert got == {2: "changed"}


def test_all_null_rows_present_on_one_side(spark):
    # a row whose every compare column is NULL must still count as
    # added/removed — presence is tracked by sentinel, not by columns
    got = _diff(spark, [(1, None, None)], [(2, None, None)])
    assert got == {1: "removed", 2: "added"}


def test_compare_cols_subset(spark):
    old = spark.createDataFrame([(1, "x", 1.0)], "k bigint, a string, b double")
    new = spark.createDataFrame([(1, "x", 2.0)], "k bigint, a string, b double")
    full = snapshot_diff(old, new, keys=["k"]).collect()
    only_a = snapshot_diff(old, new, keys=["k"], compare_cols=["a"]).collect()
    assert [r["change_type"] for r in full] == ["changed"]
    assert only_a == []


def test_upsert_applies_diff_back_to_new(spark):
    """diff→apply must be the identity onto the target snapshot,
    including NULL transitions in both directions (the presence-sentinel
    cases: a NULL update value must overwrite; an absent row must not)."""
    from food_panda_etl_spark.operators.diff import upsert_snapshot

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, None, 20.0), (3, "c", None), (4, "d", 40.0)],
        "k long, s string, v double",
    )
    new = spark.createDataFrame(
        [(1, None, 10.0), (2, "b", 20.0), (4, "d", 40.0), (5, "e", 50.0)],
        "k long, s string, v double",
    )
    diff = snapshot_diff(old, new, keys=["k"])
    updates = new.join(
        diff.filter("change_type <> 'removed'").select("k"), "k", "semi"
    )
    deletes = diff.filter("change_type = 'removed'")
    got = sorted(
        tuple(r) for r in upsert_snapshot(old, updates, ["k"], deletes).collect()
    )
    want = sorted(tuple(r) for r in new.collect())
    assert got == want
