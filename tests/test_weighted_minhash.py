"""Weighted MinHash LSH pairs (operators/weighted_minhash.py, r15
build-ahead for r16): the occurrence-expanded banded path must equal
the exact weighted prefix join on the fixtures (candidate recall 1 at
the fixtures' sharply-separated similarities), and the multiset
semantics must be visible end to end (repetition-only differences
change the reported similarity)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from food_panda_etl_spark.operators.weighted_jaccard import (
    weighted_jaccard_join,
)
from food_panda_etl_spark.operators.weighted_minhash import (
    weighted_minhash_lsh_pairs,
)
from food_panda_etl_spark.tables import load_table


@pytest.mark.parametrize("num,den", [(7, 10), (1, 2)])
def test_matches_exact_weighted_join(spark, sf_dir, num, den):
    d = load_table(spark, sf_dir, "documents")
    got = sorted(
        map(
            tuple,
            weighted_minhash_lsh_pairs(
                d, "doc_id", "text", n=3,
                threshold_num=num, threshold_den=den,
            ).collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            weighted_jaccard_join(
                d, "doc_id", "text", n=3,
                threshold_num=num, threshold_den=den,
            ).collect(),
        )
    )
    assert got == want
    assert len(want) > 0


def test_repetition_changes_similarity(spark):
    """Two docs with IDENTICAL distinct 1-gram sets but different
    repetition: distinct Jaccard would say 1.0; the weighted path must
    report Σmin/Σmax = 3/6 = 0.5 — the multiset semantics survive the
    sketch+verify pipeline end to end."""
    d = spark.createDataFrame(
        [(1, "x y z x y z"), (2, "x y z")], ["doc_id", "text"]
    )
    rows = weighted_minhash_lsh_pairs(
        d, "doc_id", "text", n=1, threshold_num=1, threshold_den=2,
        # r=1 bands: P(candidate) per band = j — at j=0.5 and 32 bands
        # the pair is missed with probability (1-0.5)^32 ≈ 2e-10
        num_hashes=32, bands=32,
    ).collect()
    assert [(r.doc_a, r.doc_b, r.wi, r.wjaccard) for r in rows] == [
        (1, 2, 3, 0.5)
    ]


def test_validation():
    with pytest.raises(ValueError, match="divisible"):
        weighted_minhash_lsh_pairs(
            None, "doc_id", "text", num_hashes=32, bands=7
        )
    with pytest.raises(ValueError, match="need 0 < num <= den"):
        weighted_minhash_lsh_pairs(None, "doc_id", "text", threshold_num=0)
