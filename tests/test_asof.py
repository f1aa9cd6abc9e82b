"""As-of join unit contracts beyond the oracled q_asof_join: strict vs
inclusive boundaries, and atomicity of multi-column payloads when right
rows carry NULLs (ADVICE r1)."""

from __future__ import annotations

from food_panda_etl_spark.operators.asof import asof_join


def test_asof_payload_is_atomic_per_right_row(spark):
    """A right row with NULL in one payload column must NOT have that
    column back-filled from an older right row: the match is one row,
    taken whole."""
    left = spark.createDataFrame(
        [(1, 100), (1, 250)], "k int, lts int"
    )
    right = spark.createDataFrame(
        [
            (1, 50, "old", 10),
            (1, 200, None, 20),  # newest before lts=250; price is NULL
        ],
        "k int, rts int, price string, qty int",
    )
    out = {
        (r["k"], r["lts"]): (r["asof_price"], r["asof_qty"])
        for r in asof_join(
            left, right, key="k", left_ts="lts", right_ts="rts",
            right_payload=["price", "qty"],
        ).collect()
    }
    assert out[(1, 100)] == ("old", 10)
    # atomic: price must be NULL (from the rts=200 row), not "old"
    assert out[(1, 250)] == (None, 20)


def test_asof_strict_vs_inclusive_boundary(spark):
    left = spark.createDataFrame([(1, 100)], "k int, lts int")
    right = spark.createDataFrame([(1, 100, "same")], "k int, rts int, p string")
    strict = asof_join(
        left, right, "k", "lts", "rts", ["p"], strict=True
    ).collect()[0]
    incl = asof_join(
        left, right, "k", "lts", "rts", ["p"], strict=False
    ).collect()[0]
    assert strict["asof_p"] is None  # rts < lts has no match at equality
    assert incl["asof_p"] == "same"
