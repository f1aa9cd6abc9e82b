"""The LLM-prep composite: every stage must be observable in the output
(non-vacuous on the fixture), not just hash-green."""

from __future__ import annotations

from pyspark.sql import functions as F

from food_panda_etl_spark.queries import QUERIES
from food_panda_etl_spark.tables import load_table


def test_llm_prep_stages_are_observable(spark, sf_dir):
    out = QUERIES["q_llm_prep"](spark, sf_dir)
    rows = out.collect()
    n_docs = load_table(spark, sf_dir, "documents").count()

    # Stage 0+4: every injected duplicate key (doc_id+10000) must be
    # dropped by exact dedup — min-id wins, originals survive.
    assert all(r["doc_id"] < 10000 for r in rows)
    # Stage 3: the quality filter dropped something.
    assert 0 < len(rows) < n_docs
    # Stage 5: near-dup delete removed docs (some cluster_size > 1) and
    # only representatives remain (cluster sizes account for the drops).
    assert any(r["cluster_size"] > 1 for r in rows)
    # Stage 6: all three splits appear.
    assert {r["split"] for r in rows} == {"train", "val", "test"}
    # Stage 7: chunk ids are monotone in doc_id order and start at 0.
    ordered = sorted(rows, key=lambda r: r["doc_id"])
    assert ordered[0]["chunk_start"] == 0
    cum = 0
    for r in ordered:
        assert r["chunk_start"] == cum // 2048
        cum += r["n_tokens"]
        assert r["chunk_end"] == (cum - 1) // 2048


def test_llm_prep_dedup_stage_sees_real_duplicates(spark, sf_dir):
    """The injected dup rows actually reach the dedup stage: at least one
    duplicated doc passes the quality filter (otherwise the exact-dedup
    stage is vacuous and the composite's evidence is weaker than
    declared)."""
    d = load_table(spark, sf_dir, "documents")
    cleaned = d.filter(F.col("doc_id") % 37 == 0).select(
        F.size(F.split(F.trim(F.regexp_replace(F.col("text"), r" +", " ")), " ")).alias(
            "n_tokens"
        )
    )
    assert cleaned.filter(F.col("n_tokens") >= 20).count() > 0
