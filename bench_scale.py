"""Empirical scale curves for the near-dup family (VERDICT r2 task 4).

Measures wall time vs corpus size N for:
- ``triangle``: exact all-pairs triangle block equi-join (θ=0.4)
- ``banded``:   banded sign-LSH + exact verify (θ per run)
- ``hyperplane``: fixed-width hyperplane LSH + verify (θ=0.4)
- ``minhash``:  MinHash+LSH over documents

and the θ-crossover where banded LSH beats the exact triangle join at
fixed N. Corpora: the real sf0.01/sf0.1 fixtures, extended past their
2 000 / 5 000 rows with GENERATED rows (seeded xxhash64 pseudo-random —
isotropic vectors / 50-token documents over a 5 000-word vocabulary) so
growth adds independent rows, not duplicate explosion: the timing then
tracks the candidate/verify machinery, not an output blow-up.

Sizes deliberately reach 32k vectors: below ~10k rows every path is
dominated by fixed overhead (plan compile, Python worker spin-up,
stage scheduling ≈ 1-2 s) and fitted exponents are meaningless — the
first run of this script measured a "0.5 exponent" for the exact
quadratic triangle join at 4k→8k precisely because of that floor. The
crossover runs at N=16k for the same reason.

Scaling exponent between consecutive sizes: log(t2/t1)/log(n2/n1).
Prints one JSON line; SCALE.md records the fitted exponents.

Usage: python bench_scale.py [--quick]  (quick stops at 8k/20k sizes)
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from food_panda_etl_spark.session import get_spark  # noqa: E402
from food_panda_etl_spark.tables import load_table  # noqa: E402

SF01 = "/root/testdata/sf0.1"


def synth_embeddings(spark, n: int, base=None, dim: int = 64):
    """Extend a real corpus to n rows with seeded pseudo-random isotropic
    vectors (uniform [-1,1) per component via xxhash64 — JVM-side,
    deterministic, no Python loop)."""
    base = base.select("vec_id", "embedding") if base is not None else None
    have = base.count() if base is not None else 0
    if n <= have:
        return base.limit(n)
    extra = (
        spark.range(10_000_000, 10_000_000 + (n - have))
        .select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(1), F.lit(dim)),
                lambda i: (
                    F.pmod(F.xxhash64(F.col("id") * dim + i), F.lit(20001)) - 10000
                ).cast("double")
                / 10000.0,
            ).alias("embedding"),
        )
    )
    return base.unionByName(extra) if base is not None else extra


def synth_documents(spark, n: int, base=None, tokens: int = 50, vocab: int = 5000):
    have = base.count() if base is not None else 0
    if n <= have:
        return base.limit(n)
    extra = (
        spark.range(10_000_000, 10_000_000 + (n - have))
        .select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ",
                F.transform(
                    F.sequence(F.lit(1), F.lit(tokens)),
                    lambda i: F.concat(
                        F.lit("w"),
                        F.pmod(F.xxhash64(F.col("id") * tokens + i), F.lit(vocab)).cast(
                            "string"
                        ),
                    ),
                ),
            ).alias("text"),
        )
    )
    return base.select("doc_id", "text").unionByName(extra) if base is not None else extra


def synth_documents_boiler(spark, n: int, tokens: int = 50, vocab: int = 5000):
    """Corpus where EVERY document starts with the same 5-token
    boilerplate sentence — i.e. every document shares exactly ONE 5-gram
    shingle (the boundary grams mix in random body tokens and stay
    unique). This is the df² stressor for inverted-index pair
    generation: that one shingle's document frequency is N, so
    `exact_jaccard_pairs`' shingle self-join materializes Θ(N²)
    intersection rows even though every pairwise Jaccard is ≈1/100 and
    NO pair passes the threshold. The banded path pays the linear
    signature cost plus candidates ∝ (1-(1-j²)^bands)·N² ≈ 0.0016·N² at
    j≈0.01 — the same asymptotic class for a constant-j clique, but a
    ~600× smaller constant, and (unlike Σ df²) it shrinks further as the
    shared-content fraction falls."""
    boiler = F.lit("terms of service apply here")
    body = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(1), F.lit(tokens)),
            lambda i: F.concat(
                F.lit("w"),
                F.pmod(F.xxhash64(F.col("id") * tokens + i), F.lit(vocab)).cast(
                    "string"
                ),
            ),
        ),
    )
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", boiler, body).alias("text"),
    )


def timed(fn) -> float:
    t0 = time.monotonic()
    fn()
    return round(time.monotonic() - t0, 3)


def main() -> None:
    quick = "--quick" in sys.argv
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={
            "spark.ui.enabled": "false",
            # local-mode default driver heap is 1g; the 8k-row triangle
            # verify holds ~32M pair rows in flight across 32 threads.
            "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"),
        },
    )
    from food_panda_etl_spark.operators.dedup import minhash_lsh_pairs
    from food_panda_etl_spark.operators.similarity import (
        banded_neardup_pairs,
        lsh_neardup_pairs,
        triangle_neardup_pairs,
    )

    emb_base = load_table(spark, SF01, "embeddings")
    doc_base = load_table(spark, SF01, "documents")

    # warmup: JIT + codegen caches
    triangle_neardup_pairs(emb_base.limit(200), 0.4).count()
    minhash_lsh_pairs(doc_base.limit(200), "doc_id", "text").count()

    out: dict = {"cpus": cpus, "curves": {}, "crossover": {}}

    emb_sizes = [500, 2000, 4000, 8000] + ([] if quick else [16000, 32000])
    lsh_sizes = [500, 2000, 4000, 8000, 16000] + ([] if quick else [32000])
    doc_sizes = [500, 5000, 10000, 20000] + ([] if quick else [40000, 80000])

    curves: dict[str, dict[int, float]] = {
        "triangle_t04": {},
        "hyperplane_t04": {},
        "banded_t07": {},
        "minhash": {},
    }
    for n in emb_sizes:
        e = synth_embeddings(spark, n, emb_base).cache()
        e.count()
        curves["triangle_t04"][n] = timed(
            lambda: triangle_neardup_pairs(e, 0.4).count()
        )
        e.unpersist()
    for n in lsh_sizes:
        e = synth_embeddings(spark, n, emb_base).cache()
        e.count()
        curves["hyperplane_t04"][n] = timed(lambda: lsh_neardup_pairs(e, 0.4).count())
        curves["banded_t07"][n] = timed(lambda: banded_neardup_pairs(e, 0.7).count())
        e.unpersist()
    for n in doc_sizes:
        d = synth_documents(spark, n, doc_base).cache()
        d.count()
        curves["minhash"][n] = timed(
            lambda: minhash_lsh_pairs(
                d, "doc_id", "text", num_hashes=32, bands=8, shingle_n=3, threshold=0.7
            ).count()
        )
        d.unpersist()
    # Pair-generation under boilerplate (r4): the df² stressor. Exact
    # inverted-index pair generation must go quadratic in the shared-
    # prefix cohort; the verified-LSH path (band candidates + exact
    # verify on candidates) stays near-linear. This is the measured case
    # for q_dedup_components_lsh being the 100 TB cluster-dedup path.
    from food_panda_etl_spark.operators.dedup import (
        exact_jaccard_pairs,
        verified_jaccard_pairs_lsh,
    )

    curves["cc_pairs_exact"] = {}
    curves["cc_pairs_lsh"] = {}
    boiler_sizes = [2000, 4000, 8000] + ([] if quick else [16000, 32000])
    for n in boiler_sizes:
        d = synth_documents_boiler(spark, n).cache()
        d.count()
        curves["cc_pairs_exact"][n] = timed(
            lambda: exact_jaccard_pairs(d, "doc_id", "text", n=5, threshold=0.8).count()
        )
        curves["cc_pairs_lsh"][n] = timed(
            lambda: verified_jaccard_pairs_lsh(
                d, "doc_id", "text", n=5, threshold=0.8, num_hashes=32, bands=16
            ).count()
        )
        d.unpersist()
    out["curves"] = curves

    # fitted exponents over the largest consecutive pair (asymptotic end)
    import math

    out["exponents"] = {}
    for k, pts in curves.items():
        ns = sorted(pts)
        if len(ns) >= 2:
            n1, n2 = ns[-2], ns[-1]
            out["exponents"][k] = round(
                math.log(pts[n2] / pts[n1]) / math.log(n2 / n1), 2
            )

    # θ-crossover at fixed N (16k full / 2k quick): banded vs triangle.
    # Triangle cost is θ-independent (the threshold only filters the
    # scored output), so it is measured once and compared against banded
    # at each θ; banded's cost falls as θ rises (wider bands prune more).
    n_cross = 2000 if quick else 16000
    e = synth_embeddings(spark, n_cross, emb_base).cache()
    e.count()
    tri = timed(lambda: triangle_neardup_pairs(e, 0.6).count())
    for theta in (0.5, 0.6, 0.7, 0.8):
        out["crossover"][str(theta)] = {
            "n": n_cross,
            "triangle": tri,
            "banded": timed(lambda: banded_neardup_pairs(e, theta).count()),
        }
    e.unpersist()

    print(json.dumps(out))


if __name__ == "__main__":
    main()
