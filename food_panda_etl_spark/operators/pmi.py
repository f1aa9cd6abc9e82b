"""Pointwise mutual information over sliding-window token co-occurrence
— the classic corpus-association operator (collocation mining, phrase
detection, word2vec-era embedding preprocessing): which token pairs
occur together far more often than chance?

Engine shape:

1. pair generation — for each position i, the pairs (tok[i], tok[i+j])
   for j = 1..window, produced by one NARROW higher-order projection
   (flatten of per-position transforms) — no self-join on position, no
   shuffle before counting; the generated stream is fact-sized × window;
2. counts — one pair hash-agg and one unigram hash-agg;
3. association — classic PMI is log(C(ab)·T / (C(a)·C(b))). The log is
   monotone, so the engine ranks by the RATIO C(ab)·T / (C(a)·C(b))
   instead (the repo's log-free determinism convention): numerator and
   denominator are exact integer products (C ≤ ~10^9 and T ≤ ~10^9 at
   fixture scales keeps both < 2^63; at true corpus scale divide the
   doubles (C(ab)/T) / ((C(a)/T)·(C(b)/T)) — same ordering), the ratio
   is ONE IEEE division, bit-identical in any engine;
4. pruning — a min-count floor (PMI is notoriously noisy on rare pairs)
   and a top-k by (ratio, pair) total order.

Unigram joins are vocabulary-sized and unhinted (AQE broadcasts when
they fit — the q_tfidf/q_bm25 reasoning). Pairs are UNORDERED: (a, b)
is canonicalized to a <= b at generation, so "new york" and "york new"
accumulate together.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pmi_pairs(
    df: DataFrame,
    text_col: str = "text",
    window: int = 3,
    min_count: int = 5,
    k: int = 50,
) -> DataFrame:
    """Top-``k`` token pairs by the log-free PMI ratio.

    Returns (w1, w2, pair_cnt bigint, ratio double) with w1 <= w2,
    ordered by (ratio DESC, w1, w2) — a total order, so the LIMIT is
    deterministic."""
    if window < 1:
        raise ValueError(
            f"window must be >= 1, got {window} (Spark sequence(1, 0) "
            "counts DOWN and would emit distance-0 self-pairs)"
        )
    # materialize the token array BEFORE the lambdas capture it: a
    # split() expression inside a higher-order lambda re-evaluates per
    # element (the quadratic trap operators/dedup.py::_shingles and
    # queries/text.py document — re-splitting tokens×window times per
    # doc measured 30 s vs 3 s at 20k docs)
    with_toks = df.select(F.split(F.col(text_col), " ").alias("__toks"))
    pairs = F.when(
        F.size(F.col("__toks")) >= 2,
        F.expr(
            f"""flatten(transform(__toks,
                 (t, i) -> filter(transform(sequence(1, {int(window)}),
                    j -> CASE WHEN i + j < size(__toks)
                         THEN struct(
                           least(t, __toks[i + j]) AS a,
                           greatest(t, __toks[i + j]) AS b)
                         ELSE NULL END),
                    p -> p IS NOT NULL)))"""
        ),
    ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
    pg = with_toks.select(F.explode(pairs).alias("__p")).select(
        F.col("__p.a").alias("w1"), F.col("__p.b").alias("w2")
    )
    # the fact×window pair stream has exactly ONE consumer (the pair
    # count) — never cached; unigram masses and the grand total derive
    # from the vocabulary²-bounded count table, which is what gets the
    # lazy checkpoint for its three consumers (the DSIR/LM compression
    # pattern — checkpointing the 48M-row raw stream instead measured
    # 76 s vs 13 s at 320k docs)
    pc = (
        pg.groupBy("w1", "w2")
        .agg(F.count("*").alias("pair_cnt"))
        .localCheckpoint(eager=False)
    )
    # unigram occurrences over the SAME pair sample space (each token
    # occurrence counts once per pair it joins)
    ug = (
        pc.select(F.explode(F.array("w1", "w2")).alias("w"), "pair_cnt")
        .groupBy("w")
        .agg(F.sum("pair_cnt").alias("__u"))
    )
    total = pc.agg(F.sum("pair_cnt").alias("__t"))
    u1 = ug.select(F.col("w").alias("w1"), F.col("__u").alias("__u1"))
    u2 = ug.select(F.col("w").alias("w2"), F.col("__u").alias("__u2"))
    ratio = (F.col("pair_cnt") * F.col("__t")).cast("double") / (
        F.col("__u1") * F.col("__u2")
    ).cast("double")
    return (
        pc.filter(F.col("pair_cnt") >= int(min_count))
        .join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(total))
        .select("w1", "w2", "pair_cnt", ratio.alias("ratio"))
        .orderBy(F.desc("ratio"), "w1", "w2")
        .limit(int(k))
    )
