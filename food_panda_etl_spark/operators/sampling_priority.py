"""Sequential Poisson (priority) sampling — the ONE-PASS approximate
PPS sampler (Ohlsson 1998; Rosén 1997): order rows by hash/weight
ascending and keep the k smallest. Inclusion probability is
approximately proportional to weight (a row enters the sample iff
h_i/w_i clears the data-dependent threshold set by the (k+1)-th
priority — heavier rows clear it proportionally more often), which is
the classic survey-statistics trade: near-PPS inclusion WITHOUT the
global prefix sum.

vs `operators/sampling.py::pps_systematic_sample`: systematic selection
gives EXACT min(1, k·w/T) inclusion and exactly-k samples but costs a
range exchange + broadcast total (two fact passes through the prefix
sum machinery); priority sampling is ONE narrow projection + a global
top-k (TakeOrdered — per-partition heaps, no shuffle of the fact at
all), the cheapest possible distributed plan, at the cost of
approximate inclusion probabilities. Use systematic when the sample
feeds a weighted estimator that needs exact π_i; use priority for "give
me ~k docs, long ones more often" selection loops where plan cost
dominates.

Determinism: the priority is ONE IEEE division h/w of integer-derived
doubles (h = the samplers' shared multiplicative hash in [0, 1000003),
w the guarded integer weight). h is always exactly representable; w is
exact only below 2^53 — a larger int64 weight ROUNDS on the cast — but
cross-engine determinism holds regardless, because both engines apply
the IDENTICAL IEEE int64→double cast (round-to-nearest-even) and then
the identical division, so the (possibly rounded) operands and quotient
are bit-equal either way (the repo's division convention). The order is
made TOTAL by the id tiebreak, so the
selected set is partitioning/rerun-invariant and SQL-replayable as
`ORDER BY CAST(h AS DOUBLE)/w, id LIMIT k` (the r10 declared-query
form). Zero-weight rows are never selected (empty inclusion mass — the
systematic sampler's convention) rather than dividing by zero; weight
validation is the shared `guarded_weight` (negative/NULL/NaN raise
in-plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from food_panda_etl_spark.operators.sampling import (
    guarded_weight,
    priority_expr,
    sample_order_hash,
)


def priority_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """The k rows with the smallest hash/weight priority. Returns
    (id_col, *carry_cols, weight bigint, priority double), priority
    ascending — heavier rows hold systematically smaller priorities.
    Exactly min(k, #rows with w>0) rows."""
    if int(k) < 1:
        raise ValueError(f"priority_sample: k must be >= 1, got {k!r}")
    keyed = df.select(
        F.col(id_col),
        *[F.col(c) for c in carry_cols],
        guarded_weight(weight_col, "priority_sample").alias("__w"),
        sample_order_hash(id_col).alias("__h"),
    ).filter(F.col("__w") > 0)
    pri = priority_expr().alias("priority")
    return (
        keyed.select(id_col, *carry_cols, F.col("__w").alias("weight"), pri)
        .orderBy("priority", id_col)
        .limit(int(k))
    )
