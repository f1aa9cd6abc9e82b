"""Group-wise heavy hitters: output must equal the brute-force
per-group HAVING under every partitioning (the oracle-checkability
property), minority-group hitters must survive a dominant group's
vocabulary, and the real-data smoke (frequent tokens per language)."""

from __future__ import annotations

from collections import Counter

import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F


def _brute(rows, fraction):
    ng: Counter = Counter(g for g, _ in rows)
    cnt: Counter = Counter(rows)
    return {
        (g, v): c for (g, v), c in cnt.items() if c > fraction * ng[g]
    }


SET = settings(max_examples=5, deadline=None,
               suppress_health_check=[HealthCheck.function_scoped_fixture])


@SET
@given(
    # 12-value alphabet vs k = int(2.0/0.3) = 6 counters: the per-group
    # MG COMPRESSION branch (len > k -> subtract kth) genuinely fires
    # under these draws, so the equality property covers the lossy
    # path, not just lossless counting. NULL group keys are drawn too
    # (their own group, per the contract).
    rows=st.lists(
        st.tuples(st.sampled_from(["en", "de", "fr", None]),
                  st.sampled_from(list("abcdefghijkl"))),
        min_size=1, max_size=60,
    ),
    parts=st.integers(min_value=1, max_value=5),
)
def test_group_heavy_equals_brute_force(spark, rows, parts):
    from food_panda_etl_spark.operators.heavy_group import (
        heavy_hitters_by_group,
    )

    df = spark.createDataFrame(rows, "lang string, v string").repartition(parts)
    got = {
        (r["lang"], r["v"]): r["cnt"]
        for r in heavy_hitters_by_group(df, "lang", "v", fraction=0.3).collect()
    }
    assert got == _brute(rows, 0.3)


def test_group_heavy_null_group_is_its_own_group(spark):
    """NULL group keys must be reported like any other group (SQL
    GROUP BY semantics) — the recount joins must be null-safe."""
    from food_panda_etl_spark.operators.heavy_group import (
        heavy_hitters_by_group,
    )

    rows = [(None, "x")] * 10 + [("en", "y")] * 10
    df = spark.createDataFrame(rows, "grp string, v string")
    got = {
        (r["grp"], r["v"]): r["cnt"]
        for r in heavy_hitters_by_group(df, "grp", "v", fraction=0.5).collect()
    }
    assert got == {(None, "x"): 10, ("en", "y"): 10}


def test_minority_group_hitter_survives_majority_vocabulary(spark):
    """A tiny group's dominant value must be reported even when a huge
    group floods the stream with distinct values — the failure mode of
    the GLOBAL operator that the per-group summaries exist to fix."""
    from food_panda_etl_spark.operators.heavy import heavy_hitters
    from food_panda_etl_spark.operators.heavy_group import (
        heavy_hitters_by_group,
    )

    rows = [("big", f"w{i}") for i in range(2000)] + [("small", "gem")] * 10
    df = spark.createDataFrame(rows, "grp string, v string")
    per_group = {
        (r["grp"], r["v"])
        for r in heavy_hitters_by_group(df, "grp", "v", fraction=0.5).collect()
    }
    assert ("small", "gem") in per_group
    # the global operator at the same fraction reports NOTHING (gem is
    # 10/2010 of the whole stream)
    assert heavy_hitters(df, "v", fraction=0.5).count() == 0


def test_group_heavy_big_int_keys_with_nulls_survive(spark):
    """ADVICE r7 regression: a nullable int64 batch reaches pandas as
    float64 (Arrow null → NaN), so group keys above 2^53 used to
    collapse (2^53+1 and 2^53+2 merge in float64) and the NULL group
    leaned on a NaN dict key. The string bridge must keep them exact —
    distinct counts per distinct key, NULL group reported, original
    int64 type preserved in the output."""
    from food_panda_etl_spark.operators.heavy_group import (
        heavy_hitters_by_group,
    )

    a, b = 2**53 + 1, 2**53 + 2
    rows = (
        [(a, 2**53 + 5)] * 6
        + [(b, 2**53 + 7)] * 4
        + [(None, 2**53 + 9)] * 5
    )
    df = spark.createDataFrame(rows, "grp long, v long").repartition(3)
    out = heavy_hitters_by_group(df, "grp", "v", fraction=0.5)
    assert out.schema["grp"].dataType.simpleString() == "bigint"
    assert out.schema["v"].dataType.simpleString() == "bigint"
    got = {(r["grp"], r["v"]): r["cnt"] for r in out.collect()}
    assert got == {
        (a, 2**53 + 5): 6,
        (b, 2**53 + 7): 4,
        (None, 2**53 + 9): 5,
    }


def test_group_heavy_validates_fraction(spark):
    from food_panda_etl_spark.operators.heavy_group import (
        heavy_hitters_by_group,
    )

    df = spark.createDataFrame([("a", "b")], "g string, v string")
    with pytest.raises(ValueError, match="fraction"):
        heavy_hitters_by_group(df, "g", "v", fraction=1.5)


def test_group_heavy_tokens_per_language(spark, sf_dir):
    """Real-data smoke: frequent tokens per language over documents —
    equal to the brute-force per-group HAVING computed in Spark."""
    from food_panda_etl_spark.operators.heavy_group import (
        heavy_hitters_by_group,
    )
    from food_panda_etl_spark.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "lang", F.explode(F.split(F.col("text"), " ")).alias("token")
    )
    got = {
        (r["lang"], r["token"]): r["cnt"]
        for r in heavy_hitters_by_group(
            tok, "lang", "token", fraction=0.01
        ).collect()
    }
    brute = (
        tok.groupBy("lang", "token")
        .agg(F.count("*").alias("cnt"))
        .join(
            tok.groupBy("lang").agg(F.count("*").alias("n")), "lang"
        )
        .filter(F.col("cnt").cast("double") > 0.01 * F.col("n").cast("double"))
    )
    want = {(r["lang"], r["token"]): r["cnt"] for r in brute.collect()}
    assert got == want and got
