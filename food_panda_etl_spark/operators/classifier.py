"""Hashed linear quality-classifier inference (fastText-style; Joulin
1607.01759 "Bag of Tricks for Efficient Text Classification") — the
public-knowledge quality filter CCNet / RefinedWeb run beside the LM
perplexity filter: a linear model over hashed n-gram counts scores
every document, and the keep decision is a sign/threshold test.

Inference only: training happens offline (fastText / sklearn on a
labeled subset) and the model arrives as a (bucket → weight) table.
The engine's job is the scoring pass at corpus scale: hash each
document's bigrams into B buckets (`operators/dsir.py::_bucket`, the
portable polynomial fold the oracles replay exactly), count per
(doc, bucket), join the ≤B-row weight table (broadcast — B is fixed at
training time, never corpus-sized), and fold Σ count·weight per
document.

Determinism: everything up to the final mean is INTEGER arithmetic —
the weight table stores integer weights on a fixed grid (the trained
floats quantized once at export; the test/oracle weights derive from a
multiplicative hash), so Σ cnt·w is exact under any partitioning and
the per-document mean is ONE IEEE division of integer-derived doubles.
No sigmoid is needed: sigmoid is monotone, so the sign/threshold
decision on the raw margin is the same decision (the log-free
convention — see `operators/lm.py`).

Overflow: |Σ cnt·w| ≤ n_bigrams · max|w| — with the ~1e6 weight grid a
single document would need ~9e12 bigrams to wrap int64; the decimal
widening `operators/dsir.py` documents applies verbatim if a caller
ships wider weights.

Scale shape: one narrow bigram projection collapsing immediately to
per-(doc, bucket) counts (the DSIR compression layout — the fact-sized
gram stream is never shuffled or checkpointed), one bucket-count hash
agg, one broadcast join, one per-doc hash agg. No windows, no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Feature-space size shared with DSIR (both are hashed-bigram models).
CLF_BUCKETS = 1024

#: Weight grid: multiplicative-hash pseudo-weights in
#: [-1000001, 1000001], centered so both classes occur. Stands in for a
#: trained fastText weight vector (same table shape a real export has).
_W_MULT = 2654435761
_W_MOD = 2000003
_W_SHIFT = 1000001


def hashed_weights(spark, buckets: int = CLF_BUCKETS) -> DataFrame:
    """The deterministic (bucket, weight) table: w(b) =
    (b·2654435761) mod 2000003 − 1000001. Replayable in any engine —
    the declared-query oracle regenerates it with generate_series."""
    return spark.range(buckets).select(
        F.col("id").alias("__b"),
        ((F.col("id") * _W_MULT) % _W_MOD - _W_SHIFT).alias("__w"),
    )


def classify_quality(
    df: DataFrame,
    weights: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = CLF_BUCKETS,
) -> DataFrame:
    """Per-document linear margin over hashed bigram counts.

    Returns (id_col, n_bigrams bigint, clf_score double, keep int):
    clf_score is the mean per-bigram weight (margin / n_bigrams — the
    fastText mean-of-feature-vectors convention), keep = 1 iff the raw
    integer margin is >= 0 (sign test — decided in exact integer space,
    never on the rounded double). Documents with < 2 tokens have no
    features and are excluded (the DSIR/LM convention).

    ``weights`` must be (__b bigint, __w bigint) with one row per
    bucket in [0, buckets); absent buckets would silently drop their
    counts from the margin (inner join), so ship the full table.
    """
    from food_panda_etl_spark.operators.dsir import _bucket
    from food_panda_etl_spark.operators.lm import bigram_pairs

    per = (
        df.select(
            F.col(id_col),
            F.explode(bigram_pairs(text_col)).alias("__bg"),
        )
        .select(
            id_col,
            _bucket(F.col("__bg.w1"), F.col("__bg.w2"), buckets).alias("__b"),
        )
        .groupBy(id_col, "__b")
        .agg(F.count("*").alias("__cnt"))
    )
    margin = F.sum(F.col("__cnt") * F.col("__w")).cast("bigint")
    return (
        per.join(F.broadcast(weights), "__b")
        .groupBy(id_col)
        .agg(
            F.sum("__cnt").cast("bigint").alias("n_bigrams"),
            (
                margin.cast("double") / F.sum("__cnt").cast("double")
            ).alias("clf_score"),
            (margin >= 0).cast("int").alias("keep"),
        )
    )
