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


def test_incremental_agg_refresh_group_moves_and_vanishes(spark):
    """The retraction/insertion fold must handle the two tricky CDC
    cases: a changed row whose GROUP moved (retraction and insertion
    land in different groups) and a group whose count reaches zero
    (must disappear from the refreshed aggregate). Maintained result
    must equal the direct recompute of the new snapshot."""
    from pyspark.sql import functions as F

    from food_panda_etl_spark.operators.diff import (
        incremental_agg_refresh,
        snapshot_diff,
    )

    old = spark.createDataFrame(
        [(1, "A", 10), (2, "A", 5), (3, "B", 2), (4, "C", 7)],
        "k long, g string, v long",
    )
    new = spark.createDataFrame(
        # k1 moved A->B, k3 value changed, k4 (the only C) removed,
        # k5 added into a brand-new group D
        [(1, "B", 10), (2, "A", 5), (3, "B", 9), (5, "D", 1)],
        "k long, g string, v long",
    )
    old_agg = old.groupBy("g").agg(
        F.count("*").cast("bigint").alias("cnt"), F.sum("v").alias("total")
    )
    got = {
        r["g"]: (r["cnt"], r["total"])
        for r in incremental_agg_refresh(
            old_agg, snapshot_diff(old, new, keys=["k"]), old, new,
            keys=["k"], group_col="g", value_col="v",
        ).collect()
    }
    want = {
        r["g"]: (r["cnt"], r["total"])
        for r in new.groupBy("g")
        .agg(F.count("*").cast("bigint").alias("cnt"), F.sum("v").alias("total"))
        .collect()
    }
    assert got == want
    assert "C" not in got and got["D"] == (1, 1)


def test_incremental_agg_refresh_null_group_and_image_manifest(spark):
    """NULL group keys must MERGE with their delta (null-safe fold), and
    the keep_images manifest path must equal both the snapshot-join path
    and the direct recompute."""
    from pyspark.sql import functions as F

    from food_panda_etl_spark.operators.diff import (
        incremental_agg_refresh,
        snapshot_diff,
    )

    old = spark.createDataFrame(
        [(1, None, 10), (2, None, 5), (3, "B", 2)],
        "k long, g string, v long",
    )
    new = spark.createDataFrame(
        # one NULL-group row changes value, one is removed, B unchanged
        [(1, None, 11), (3, "B", 2)],
        "k long, g string, v long",
    )
    old_agg = old.groupBy("g").agg(
        F.count("*").cast("bigint").alias("cnt"), F.sum("v").alias("total")
    )
    want = {
        r["g"]: (r["cnt"], r["total"])
        for r in new.groupBy("g")
        .agg(F.count("*").cast("bigint").alias("cnt"), F.sum("v").alias("total"))
        .collect()
    }
    for manifest, args in (
        (snapshot_diff(old, new, keys=["k"]), (old, new)),
        (snapshot_diff(old, new, keys=["k"], keep_images=True), ()),
    ):
        got = {
            r["g"]: (r["cnt"], r["total"])
            for r in incremental_agg_refresh(
                old_agg, manifest, *args,
                keys=["k"], group_col="g", value_col="v",
            ).collect()
        }
        assert got == want, got
    assert want[None] == (1, 11)
