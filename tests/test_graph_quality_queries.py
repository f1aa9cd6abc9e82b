"""Unit + plan gates for the r7 declared queries (graph/quality/funnel
modules) — oracle parity runs in test_oracle_parity; these pin the
operator semantics on hand-built frames and the plan shapes the
docstrings claim."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from food_panda_etl_spark.plans import lint_plan, plan_summary
from food_panda_etl_spark.queries import QUERIES


@pytest.mark.parametrize(
    "name",
    [
        "q_pagerank",
        "q_pmi",
        "q_triangle_count",
        "q_labelprop",
        "q_cms_counts",
        "q_quality_classifier",
        "q_funnel",
        "q_retention",
        "q_sessionize",
        "q_group_heavy_hitters",
    ],
)
def test_r7_queries_cartesian_free(spark, sf_dir, name):
    assert lint_plan(QUERIES[name](spark, sf_dir)) == []


def test_classifier_weight_join_broadcasts(spark, sf_dir):
    """The ≤B-row weight table must ride as a BroadcastHashJoin (the
    VERDICT r6 task-3 plan contract: one hash-agg pair + one broadcast
    join), never a sort-merge join."""
    s = plan_summary(QUERIES["q_quality_classifier"](spark, sf_dir))
    assert s.broadcast_joins >= 1
    assert s.sort_merge_joins == 0


def test_classifier_margin_hand_computed(spark):
    """Tiny corpus with hand-computable buckets: margin = Σ cnt·w in
    exact integers, clf_score = margin/n, keep = sign(margin)."""
    from food_panda_etl_spark.operators.classifier import (
        classify_quality,
        hashed_weights,
    )

    # one doc, bigrams (aa bb) and (bb aa) — distinct buckets
    df = spark.createDataFrame(
        [(0, "aa bb aa"), (1, "x")], "doc_id long, text string"
    )
    B = 1024
    out = {r["doc_id"]: r for r in classify_quality(
        df, hashed_weights(spark, B), buckets=B
    ).collect()}
    assert set(out) == {0}  # doc 1 has < 2 tokens: excluded

    def bucket(w1, w2):
        v1 = len(w1) * 131 + ord(w1[0])
        v2 = len(w2) * 131 + ord(w2[0])
        return ((7 * 31 + v1) * 31 + v2) % 1000003 % B

    def w(b):
        return (b * 2654435761) % 2000003 - 1000001

    margin = w(bucket("aa", "bb")) + w(bucket("bb", "aa"))
    assert out[0]["n_bigrams"] == 2
    assert out[0]["clf_score"] == float(margin) / 2.0
    assert out[0]["keep"] == (1 if margin >= 0 else 0)


def test_classifier_partition_invariant(spark, sf_dir):
    """Integer margins are exact under any partitioning."""
    from food_panda_etl_spark.operators.classifier import (
        classify_quality,
        hashed_weights,
    )
    from food_panda_etl_spark.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    wt = hashed_weights(spark)
    base = {
        r["doc_id"]: (r["n_bigrams"], r["clf_score"].hex(), r["keep"])
        for r in classify_quality(d, wt).collect()
    }
    got = {
        r["doc_id"]: (r["n_bigrams"], r["clf_score"].hex(), r["keep"])
        for r in classify_quality(d.repartition(7), wt).collect()
    }
    assert got == base


def test_funnel_strictness_and_window_hand_case(spark, monkeypatch):
    """Hand-built event stream: same-timestamp stage events do NOT
    convert (strict >), conversions outside 24 h do NOT convert, and
    the chain orders by event time regardless of input order."""
    import food_panda_etl_spark.queries.funnel as fu

    rows = [
        # user 1: full conversion within windows
        (1, "2024-01-01 00:00:00", "view"),
        (1, "2024-01-01 01:00:00", "click"),
        (1, "2024-01-01 02:00:00", "purchase"),
        # user 2: click ties the view timestamp -> strict > excludes
        (2, "2024-01-01 00:00:00", "view"),
        (2, "2024-01-01 00:00:00", "click"),
        # user 3: click lands 25 h after the first view -> outside 24 h
        (3, "2024-01-01 00:00:00", "view"),
        (3, "2024-01-02 01:00:00", "click"),
        # user 4: purchase BEFORE the click -> stage order violated
        (4, "2024-01-01 00:00:00", "view"),
        (4, "2024-01-01 02:00:00", "purchase"),
        (4, "2024-01-01 03:00:00", "click"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts_s string, event_type string"
    ).select(
        "user_id",
        F.col("ts_s").cast("timestamp").alias("ts"),
        "event_type",
    )
    monkeypatch.setattr(
        fu, "load_table", lambda spark_, sf_dir_, name_: ev
    )
    got = {
        r["stage"]: r["users"]
        for r in QUERIES["q_funnel"](spark, "unused").collect()
    }
    assert got == {"view": 4, "click": 2, "purchase": 1}
