"""DSIR-style data selection via hashed n-gram importance weights
(Xie et al., arXiv:2302.03169 — Data Selection for Language Models via
Importance Resampling).

The selection primitive behind "make the pretraining mix look like the
target domain": fit two bag-of-hashed-ngrams multinomials — one on the
TARGET subset (the distribution you want more of), one on the RAW
corpus — and weight every raw document by how much more likely its
features are under the target model. High-weight documents are
target-like; the resampling step then keeps them preferentially.

Engine shape (all hash aggregations and vocabulary-sized joins — the
`bigram_lm_score` layout with a second count table):

1. bigram stream — fact-sized ×(tokens−1), local-checkpointed once for
   its three consumers (raw counts, target counts, scoring probe);
2. feature hashing — each bigram folds to a bucket in [0, B) with the
   portable polynomial hash the repo already oracles in q_fingerprint
   (v(t) = length·131 + ascii; fold ×31 mod 1000003), so the bucket
   arithmetic is bit-identical in Spark and DuckDB with no engine hash
   functions involved. Hashing bounds the feature table at B rows no
   matter the vocabulary — the point of DSIR's hashed features;
3. two bucket-count tables (raw, target) — ≤ B rows each, joined
   UNHINTED (AQE broadcasts; B=1024 always fits, but the plan stays
   correct if a caller passes B=2^30);
4. per-document score — the LOG-FREE mean likelihood ratio
   Σ ρ_b / n_grams with ρ_b = (tb·RT)/(rb·TT), the same libm-free
   determinism trick as `bigram_lm_score`: each ρ is ONE IEEE division
   of exactly-representable integer products (counts ≤ ~10^6 at fixture
   scale keep tb·RT < 2^63; at true 100 TB counts switch the ratio to
   (tb/TT)/(rb/RT) in doubles — same ordering, two divisions, no
   overflow — documented here because the oracle pins the product
   form), addends quantized onto the 1e-10 integer grid (round(ρ·1e10)
   as BIGINT — identical tie semantics in both engines, unlike a
   decimal cast) so the SUM is exact and order-independent.
   Classic DSIR sums log-ratios; the arithmetic mean of ratios is the
   same "is this document target-like" ordering for a threshold rule,
   which is all the filter consumes.

Totals RT/TT ride in-plan as a broadcast 1-row aggregate (the
q_mix_to_target convention — no driver collect). Target is a subset of
raw, so every scored bucket has rb ≥ 1: no division by zero and no
smoothing term needed; buckets absent from the target contribute ρ=0.
Documents with fewer than 2 tokens have no bigrams and are excluded
(nothing to featurize), matching the oracle's GROUP BY.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Feature-space size. 2^10 keeps the count tables trivially
#: broadcastable while leaving measurable collision structure (the
#: hashing is the point, not a bijection).
DSIR_BUCKETS = 1024


def _bucket(w1: Column, w2: Column, buckets: int) -> Column:
    """Portable bigram bucket: q_fingerprint's polynomial fold over the
    two token values, reduced mod ``buckets``."""
    v1 = (F.length(w1) * 131 + F.ascii(w1)).cast("long")
    v2 = (F.length(w2) * 131 + F.ascii(w2)).cast("long")
    return ((F.lit(7).cast("long") * 31 + v1) * 31 + v2) % 1000003 % buckets


def dsir_weights(
    df: DataFrame,
    target: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = DSIR_BUCKETS,
    keep_threshold: float | None = None,
) -> DataFrame:
    """Per-document hashed-bigram importance weight of ``df`` against
    the subset where ``target`` holds.

    Returns (id_col, n_bigrams bigint, dsir_score double[, keep int]);
    ``keep`` (1 iff dsir_score >= keep_threshold) is emitted only when a
    threshold is given, so callers can audit the would-be selection
    before resampling.
    """
    from food_panda_etl_spark.operators.lm import bigram_pairs

    # The fact-sized bigram stream collapses IMMEDIATELY to per-(doc,
    # bucket) counts — everything downstream (raw counts, target
    # counts, totals, the scoring joins, the per-doc mean) derives from
    # this compressed table, so the checkpointed object and both join
    # inputs are bounded by docs × min(buckets, grams-per-doc). The
    # per-doc sum Σcnt·ρ is EXACT integer multiplication of the shared
    # per-bucket ρ grid value, bit-identical to summing ρ once per gram
    # row (what the SQL oracle does) — compression changes the plan,
    # not one bit of the result.
    dbg = (
        df.select(
            F.col(id_col),
            target.cast("int").alias("__tgt"),
            F.explode(bigram_pairs(text_col)).alias("__bg"),
        )
        .select(
            id_col,
            "__tgt",
            _bucket(F.col("__bg.w1"), F.col("__bg.w2"), buckets).alias("__b"),
        )
        .groupBy(id_col, "__tgt", "__b")
        .agg(F.count("*").alias("__cnt"))
        .localCheckpoint(eager=False)
    )
    raw_counts = dbg.groupBy("__b").agg(F.sum("__cnt").alias("__rb"))
    tgt_counts = (
        dbg.filter(F.col("__tgt") == 1)
        .groupBy("__b")
        .agg(F.sum("__cnt").alias("__tb"))
    )
    totals = dbg.agg(
        F.sum("__cnt").alias("__rt"),
        F.sum(F.col("__tgt") * F.col("__cnt")).cast("bigint").alias("__tt"),
    ).select(
        "__rt",
        # ADVICE r6: an empty target (the predicate matched no document
        # with >= 2 tokens) leaves __tt = 0 — every rho would divide by
        # zero and every dsir_score would silently become NULL, so a
        # downstream resample would keep nothing with no error surfaced.
        # Fail loudly in-plan instead. The guard lives INSIDE the
        # consumed column (not a prunable side column), so column
        # pruning cannot elide it; it also fires when dbg is empty
        # (sum → NULL → the WHEN is false).
        F.when(F.col("__tt") > 0, F.col("__tt"))
        .otherwise(
            F.raise_error(
                F.lit(
                    "dsir_weights: target predicate matched no bigrams "
                    "(no target document has >= 2 tokens) — importance "
                    "ratios are undefined"
                )
            )
        )
        .alias("__tt"),
    )
    # ρ quantizes onto the 1e-10 INTEGER grid — round(ρ·1e10) as BIGINT
    # — not a decimal cast: an integer ratio CAN be a dyadic landing
    # exactly on the decimal tie digit where Spark (HALF_UP) and DuckDB
    # (HALF_EVEN) diverge (the r6 centroid lesson). The bigint grid
    # also covers the likelihood-ratio ceiling RT/TT up to ~10^8 for
    # rare targets (grid ≤ 1e18; a decimal(18,12) would have silently
    # NULLed the MOST target-like buckets below target fraction ~1e-6
    # — exactly the rare-domain case DSIR exists for).
    rho = F.round(
        (
            (F.coalesce(F.col("__tb"), F.lit(0)) * F.col("__rt")).cast("double")
            / (F.col("__rb") * F.col("__tt")).cast("double")
        )
        * 10000000000.0
    ).cast("bigint")
    scored = (
        dbg.join(raw_counts, ["__b"])
        .join(tgt_counts, ["__b"], "left")
        .crossJoin(F.broadcast(totals))
        .groupBy(id_col)
        .agg(
            F.sum("__cnt").cast("bigint").alias("n_bigrams"),
            # the cnt·grid product runs in DECIMAL, not int64: for a
            # rare target the grid value approaches 1e18 (ratio ~1e8 ·
            # 1e10) and an int64 product would silently wrap at cnt ≥
            # 10 — exactly the most target-like documents. decimal(10,0)
            # × decimal(19,0) = decimal(30,0): exact (both factors are
            # integers, so the decimal conversion itself cannot round),
            # and the decimal SUM holds to 1e38. The count factor is
            # decimal(10,0) — lm.py's headroom convention (ADVICE r6:
            # 9,0 silently NULLed a per-(doc,bucket) count >= 1e9, a
            # tighter ceiling than the analogous LM path on exactly the
            # pathological-giant-document case). Hard ceiling that
            # remains: ratio > ~9.2e8 overflows the rho grid itself
            # (documented above; switch to the divided-doubles ratio
            # form at that scale).
            (
                (
                    F.sum(
                        F.col("__cnt").cast("decimal(10,0)")
                        * rho.cast("decimal(19,0)")
                    ).cast("double")
                    / F.lit(10000000000.0)
                )
                / F.sum("__cnt").cast("double")
            ).alias("dsir_score"),
        )
    )
    if keep_threshold is not None:
        scored = scored.withColumn(
            "keep",
            (F.col("dsir_score") >= F.lit(float(keep_threshold))).cast("int"),
        )
    return scored
