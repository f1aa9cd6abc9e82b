"""Exact containment join (operators/containment_join.py, r15
build-ahead for r16): completeness against the brute-force
inverted-index join, directionality on an engineered strict-subset
pair, pruning volume, and the guards."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from food_panda_etl_spark.operators.containment_join import containment_join
from food_panda_etl_spark.operators.dedup import shingle_table
from food_panda_etl_spark.tables import load_table


def _brute_force(sh, num: int, den: int):
    """Reference containment pairs straight from the shingle table."""
    sz = sh.groupBy("doc").agg(F.count("*").alias("n"))
    a = sh.select(F.col("doc").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc").alias("doc_b"), "shingle")
    ov = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") != F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").cast("bigint").alias("inter"))
    )
    return (
        ov.join(sz.withColumnRenamed("doc", "doc_a"), "doc_a")
        .filter(F.col("inter") * den >= num * F.col("n"))
        .select(
            "doc_a",
            "doc_b",
            "inter",
            (F.col("inter").cast("double") / F.col("n").cast("double")).alias(
                "containment"
            ),
        )
    )


@pytest.mark.parametrize("num,den", [(4, 5), (1, 2)])
def test_completeness_equals_brute_force(spark, sf_dir, num, den):
    d = load_table(spark, sf_dir, "documents")
    got = sorted(
        map(
            tuple,
            containment_join(
                d, "doc_id", "text", n=5, threshold_num=num,
                threshold_den=den,
            ).collect(),
        )
    )
    sh = shingle_table(d, "doc_id", "text", 5)
    want = sorted(map(tuple, _brute_force(sh, num, den).collect()))
    assert got == want
    assert len(want) > 0  # the fixture's near-dup clusters qualify


def test_directionality_on_strict_subset(spark):
    """A is the first half of B: every A-shingle appears in B, so
    A→B containment is exactly 1.0 while B→A is well below the 4/5
    threshold — the direction symmetric Jaccard erases."""
    b_text = " ".join(f"w{i}" for i in range(40))
    a_text = " ".join(f"w{i}" for i in range(20))
    d = spark.createDataFrame(
        [(1, a_text), (2, b_text)], ["doc_id", "text"]
    )
    rows = containment_join(
        d, "doc_id", "text", n=5, threshold_num=4, threshold_den=5
    ).collect()
    assert [(r.doc_a, r.doc_b, r.containment) for r in rows] == [(1, 2, 1.0)]


def test_pruning_volume_on_hot_shingle_corpus(spark):
    """The hot-shingle regime the rarest-first order exists for: every
    doc shares ONE boilerplate 5-gram (df = N) on top of a unique
    body, so the brute-force inverted index materializes all N·(N−1)
    ordered pairs while the A-prefixes — the RAREST shingles, never
    the boilerplate — generate ZERO candidates (no qualifying pair
    exists; completeness holds under ANY order, only the volume
    assertion detects a destroyed canonical order)."""
    from food_panda_etl_spark.operators.prefix_join import ranked_shingles

    n_docs = 30
    d = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.lit("terms of service apply here"),
            F.concat_ws(
                " ",
                *[
                    F.concat(
                        F.lit("b"), (F.col("id") * 40 + j).cast("string")
                    )
                    for j in range(40)
                ],
            ),
        ).alias("text"),
    )
    sh = shingle_table(d, "doc_id", "text", 5)
    ranked = ranked_shingles(sh)
    ceil_tn = F.expr("(4 * n_sh + 4) div 5")
    pa = ranked.filter(F.col("__pos") <= F.col("n_sh") - ceil_tn + 1).select(
        F.col("doc").alias("doc_a"), "shingle"
    )
    n_cand = (
        pa.join(sh.select(F.col("doc").alias("doc_b"), "shingle"), "shingle")
        .filter(F.col("doc_a") != F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
        .count()
    )
    a = sh.select(F.col("doc").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc").alias("doc_b"), "shingle")
    n_brute = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") != F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
        .count()
    )
    assert n_brute == n_docs * (n_docs - 1)
    assert n_cand == 0


def test_threshold_validation():
    with pytest.raises(ValueError, match="need 0 < num <= den"):
        containment_join(None, "doc_id", "text", threshold_num=0)
    with pytest.raises(ValueError, match="need 0 < num <= den"):
        containment_join(None, "doc_id", "text", threshold_num=6,
                         threshold_den=5)
