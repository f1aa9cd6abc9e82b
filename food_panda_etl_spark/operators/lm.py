"""N-gram language-model quality scoring (CCNet / Gopher style).

The most-used quality filter after dedup in large-scale training-data
pipelines: score every document by how likely its token stream is under
a corpus n-gram model, then drop the tail (boilerplate, lorem-ipsum,
encoding garbage and template spam sit far from the corpus distribution).
CCNet trains a 5-gram KenLM on Wikipedia and buckets CommonCrawl by
perplexity; at engine level the primitive is the same regardless of the
model's provenance: train counts with hash aggregations, score with a
join against the count tables, filter on the score.

Determinism (the q_bm25 / q_tfidf trick): classic perplexity is
exp(−1/n·Σ ln p) — libm ``ln``/``exp`` rounding differs across engines,
so the score here is the LOG-FREE arithmetic mean of the bigram
conditional probabilities, Σ p(wᵢ|wᵢ₋₁) / n. Each
p = C(w₁w₂)/C(w₁·) is one IEEE division of integer-derived doubles
(bit-identical everywhere); addends quantize onto the 1e-12 INTEGER
grid — round(p·1e12) as BIGINT, identical tie semantics in both engines
(a decimal cast is tie-unsafe for dyadic ratios like 1/8192; see the
registry conventions) — and sum exactly; the final mean is one division
of identical operands. Monotone in the same direction as likelihood — unusual
documents score low — which is all a threshold filter needs.

Trained on the scored corpus itself (self-scoring), every scored bigram
has a nonzero count, so the estimate needs no smoothing and the mean is
total. Documents with fewer than 2 tokens have no bigrams and are
excluded from the output (nothing to score), matching the SQL oracle's
GROUP BY over the bigram stream.

Scale: the bigram stream is fact-sized ×(tokens−1); it feeds three
consumers (bigram counts, context counts, the scoring probe), so it is
local-checkpointed once (the ``bm25_topk`` tf convention — no executor
cache pinning). Both count tables are vocabulary-sized and join
UNHINTED: AQE broadcasts them when they fit and falls back to a shuffle
hash join when the vocabulary is genuinely huge — forcing a broadcast
would be wrong at 100 TB. Everything else is two hash aggregations and
one per-document aggregation: no window over the fact, no collect.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bigram_pairs(text_col: str) -> Column:
    """Adjacent whitespace-token pairs of ``text_col`` as
    array<struct<w1,w2>> — the shared tokenization of the LM and DSIR
    scorers (one definition so the two can never drift). Guard size<2:
    Spark sequence(1, 0) counts DOWN (step defaults to -1), unlike
    DuckDB generate_series which is empty — the documented cross-engine
    trap.

    The token array is BOUND ONCE through a one-element-array transform
    (r19 optimization): the previous form indexed ``split(text)[i-1]``
    / ``split(text)[i]`` inside the lambda, and a non-trivial
    expression captured in a higher-order lambda re-evaluates PER
    ELEMENT (the `dedup._grams` docstring rule this module missed) —
    every document paid 2·(tokens−1) full split() calls, O(tokens²)
    work. Binding via ``transform(array(split(text)), t -> …)[0]``
    evaluates split once per row; the produced pairs are value- and
    type-identical (measured 9.5× on the sf0.1 bigram stream: 2.5 s →
    0.26 s; the win compounds across every DSIR/LM/classifier/drift
    consumer)."""
    empty = F.array().cast("array<struct<w1:string,w2:string>>")

    def _pairs(t: Column) -> Column:
        return F.when(
            F.size(t) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(t) - 1),
                lambda i: F.struct(
                    F.element_at(t, i).alias("w1"),
                    F.element_at(t, i + 1).alias("w2"),
                ),
            ),
        ).otherwise(empty)

    return F.transform(F.array(F.split(F.col(text_col), " ")), _pairs)[0]


def bigram_lm_score(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_threshold: float | None = None,
) -> DataFrame:
    """Per-document mean bigram conditional probability under the
    corpus's own bigram counts.

    Returns (id_col, n_bigrams bigint, lm_score double[, keep int]) —
    ``keep`` only when ``keep_threshold`` is given: 1 iff
    lm_score >= keep_threshold (the CCNet-style tail drop, expressed as
    a flag so callers can audit what a filter would remove before
    removing it).
    """
    # The fact-sized bigram stream collapses to per-(doc, bigram) counts
    # before its first shuffle (the operators/dsir.py compression): the
    # count tables, both scoring joins, and the per-doc mean all run on
    # the compressed table. Σcnt·p_grid in exact integer/decimal
    # arithmetic ≡ p summed once per gram row (what the SQL oracle
    # does) — compression changes the plan, not one bit of the result.
    dbg = (
        df.select(F.col(id_col), F.explode(bigram_pairs(text_col)).alias("__bg"))
        .select(id_col, F.col("__bg.w1").alias("w1"), F.col("__bg.w2").alias("w2"))
        .groupBy(id_col, "w1", "w2")
        .agg(F.count("*").alias("__cnt"))
        .localCheckpoint(eager=False)
    )
    cbig = dbg.groupBy("w1", "w2").agg(F.sum("__cnt").alias("__cbig"))
    cctx = dbg.groupBy("w1").agg(F.sum("__cnt").alias("__cctx"))
    # p quantizes onto the 1e-12 INTEGER grid — round(p·1e12) as BIGINT
    # — not a decimal cast: an integer ratio cbig/cctx CAN be a dyadic
    # with exactly 13 fractional bits (1/8192 = 0.0001220703125), which
    # lands exactly on the scale-12 decimal tie where Spark (HALF_UP)
    # and DuckDB (HALF_EVEN) diverge; round() on the identical double
    # has identical tie semantics everywhere (the r6 centroid lesson).
    # Grid products stay in int64: grid ≤ 1e12 (p ≤ 1) × cnt ≤ ~1e6.
    p_grid = F.round(
        (F.col("__cbig").cast("double") / F.col("__cctx").cast("double"))
        * 1000000000000.0
    ).cast("bigint")
    scored = (
        dbg.join(cbig, ["w1", "w2"])
        .join(cctx, ["w1"])
        .groupBy(id_col)
        .agg(
            F.sum("__cnt").cast("bigint").alias("n_bigrams"),
            # decimal product (10,0)×(13,0)=(24,0): exact — both
            # factors are integers so the conversion cannot round — and
            # immune to the int64 wrap a bigint product hits at
            # cnt·grid ≥ 2^63 (cnt ~1e7 × grid ≤ 1e12, reachable for a
            # near-2GB single-token spam document)
            (
                (
                    F.sum(
                        F.col("__cnt").cast("decimal(10,0)")
                        * p_grid.cast("decimal(13,0)")
                    ).cast("double")
                    / F.lit(1000000000000.0)
                )
                / F.sum("__cnt").cast("double")
            ).alias("lm_score"),
        )
    )
    if keep_threshold is not None:
        scored = scored.withColumn(
            "keep",
            (F.col("lm_score") >= F.lit(float(keep_threshold))).cast("int"),
        )
    return scored
