"""ICWS real-weight MinHash (operators/icws.py, r16 build-ahead for
r17): the estimator property (component collision rate ≈ true
weighted Jaccard — Ioffe 2010's defining identity), cross-side
comparability under partitioning, recall ≥ the banding bound on the
fixtures with output ⊆ the exact pair set, and the guards."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from food_panda_etl_spark.operators.icws import (
    icws_lsh_pairs,
    icws_signatures,
)
from food_panda_etl_spark.operators.tf_jaccard import tf_jaccard_join
from food_panda_etl_spark.tables import load_table

_NUM, _DEN = 7, 10


def _sig_agreement(spark, wa: dict, wb: dict, k: int) -> float:
    """Fraction of agreeing signature components for two weighted sets."""
    rows = [("A", s, float(w)) for s, w in wa.items()] + [
        ("B", s, float(w)) for s, w in wb.items()
    ]
    wt = spark.createDataFrame(rows, "doc string, shingle string, w double")
    sig = icws_signatures(wt, num_hashes=k).collect()
    by = {r.doc: [r[f"m{i}"] for i in range(k)] for r in sig}
    return sum(a == b for a, b in zip(by["A"], by["B"])) / k


def _true_jw(wa: dict, wb: dict) -> float:
    keys = set(wa) | set(wb)
    mins = sum(min(wa.get(s, 0.0), wb.get(s, 0.0)) for s in keys)
    maxs = sum(max(wa.get(s, 0.0), wb.get(s, 0.0)) for s in keys)
    return mins / maxs


def test_collision_rate_estimates_weighted_jaccard(spark):
    """P[sample_A(i) == sample_B(i)] = J_w exactly (Ioffe 2010): over
    k = 256 independent hashes the agreement rate must land within 4σ
    of the true real-weight Jaccard — REAL weights, no integer
    structure for the occurrence expansion to exploit. (k and the case
    count are sized to keep the 256-wide agg's planning cost inside
    the suite budget; 4σ at k=256 is a ±0.125 band at J=0.5.)"""
    cases = [
        ({"a": 0.5, "b": 0.5}, {"a": 0.25, "b": 0.25, "c": 0.5}),
        ({"a": 1.0}, {"b": 1.0}),
        ({"a": 1.7, "b": 0.03}, {"a": 1.1, "b": 0.6, "z": 2.0}),
    ]
    k = 256
    for wa, wb in cases:
        jw = _true_jw(wa, wb)
        got = _sig_agreement(spark, wa, wb, k)
        sigma = max((jw * (1 - jw) / k) ** 0.5, 1e-9)
        assert abs(got - jw) <= max(4 * sigma, 0.02), (wa, wb, jw, got)


def test_signatures_partition_invariant(spark):
    """The component min is a hash aggregate over a deterministic
    per-row value — signatures must be identical at any parallelism
    (the cross-side comparability the incremental screens rely on)."""
    rows = [("d%d" % (i % 7), "s%d" % i, 0.1 + (i % 13) / 7.0)
            for i in range(200)]
    wt = spark.createDataFrame(rows, "doc string, shingle string, w double")
    a = icws_signatures(wt.repartition(1), num_hashes=16).collect()
    b = icws_signatures(wt.repartition(32), num_hashes=16).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_zero_and_null_weights_skipped(spark):
    wt = spark.createDataFrame(
        [("d", "a", 1.0), ("d", "z", 0.0), ("d", "n", None),
         ("e", "a", 1.0)],
        "doc string, shingle string, w double",
    )
    sig = icws_signatures(wt, num_hashes=32).collect()
    by = {r.doc: [r[f"m{i}"] for i in range(32)] for r in sig}
    # zero/NULL-weight elements are not in the weighted set: d's
    # signature must equal e's (both reduce to {a: 1.0})
    assert by["d"] == by["e"]


def test_fixture_recall_and_exactness(spark, sf_dir):
    """On the fixture corpus the exact pairs sit at J_tf ≈ 0.8-0.98
    where the r=2, b=16 banding miss is ≤ 1e-5 — recall must be 1.0
    here, and every emitted row must carry the exact verify's values
    (output ⊆ exact row-for-row)."""
    d = load_table(spark, sf_dir, "documents")
    exact = {
        (r.doc_a, r.doc_b): (r.wi_scaled, r.tf_jaccard)
        for r in tf_jaccard_join(
            d, "doc_id", "text", n=3,
            threshold_num=_NUM, threshold_den=_DEN,
        ).collect()
    }
    approx = {
        (r.doc_a, r.doc_b): (r.wi_scaled, r.tf_jaccard)
        for r in icws_lsh_pairs(
            d, "doc_id", "text", n=3,
            threshold_num=_NUM, threshold_den=_DEN,
        ).collect()
    }
    assert exact  # non-vacuous
    assert approx == exact  # recall 1.0 AND verified values identical


def test_hof_form_matches_unrolled_reference(spark):
    """The r19 optimization rebuilt the per-hash chain as ONE
    higher-order-function lambda over sequence(0, k−1) (Catalyst tree
    O(1) instead of O(k·40) — see icws_signatures docstring). The draw
    stream must be BIT-IDENTICAL to the original unrolled form: ``i``
    enters the chain only as the IntegerType hash salt ``i*4+j``, so
    an unrolled reference with Python-int literals must reproduce
    every component exactly (this is what keeps q_incremental_icws's
    candidate set — and therefore its oracle hash — unchanged)."""
    from food_panda_etl_spark.operators.icws import _units

    rows = [
        ("d%d" % (i % 11), "tok%d pre%d" % (i, i % 5), 0.03 + (i % 17) / 9.0)
        for i in range(300)
    ]
    wt = spark.createDataFrame(rows, "doc string, shingle string, w double")
    k = 16

    # unrolled reference: the pre-r19 form, one struct column per hash
    el = F.col("shingle")
    lnw = F.log(F.col("w").cast("double"))
    cols = []
    for i in range(k):
        u1, u2 = _units(el, F.lit(i), F.lit(1), 42)
        u3, u4 = _units(el, F.lit(i), F.lit(2), 42)
        u5, _ = _units(el, F.lit(i), F.lit(3), 42)
        r = -F.log(u1 * u2)
        cg = -F.log(u3 * u4)
        beta = u5
        t = F.floor(lnw / r + beta)
        lna = F.log(cg) - r * (t.cast("double") + 1.0 - beta)
        cols.append(
            F.struct(lna.alias("a"), F.xxhash64(el, t).alias("s")).alias(
                f"__h{i}"
            )
        )
    ref = (
        wt.filter(F.col("w").isNotNull() & (F.col("w") > 0))
        .select(F.col("doc"), *cols)
        .groupBy("doc")
        .agg(*[F.min(f"__h{i}").getField("s").alias(f"m{i}") for i in range(k)])
    )
    got = icws_signatures(wt, num_hashes=k)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, ref.collect())
    )


def test_validation():
    with pytest.raises(ValueError, match="dividing num_hashes"):
        icws_lsh_pairs(None, "doc_id", "text", num_hashes=30, bands=16)
    with pytest.raises(ValueError, match="dividing num_hashes"):
        # bands=0 must raise the geometry ValueError, not a
        # ZeroDivisionError from the modulo itself (review r17)
        icws_lsh_pairs(None, "doc_id", "text", bands=0)
    with pytest.raises(ValueError, match="need 0 < num <= den"):
        icws_lsh_pairs(None, "doc_id", "text", threshold_num=0)
