"""Empirical scale curves for the near-dup family (VERDICT r2 task 4)
plus the r5 operator set (VERDICT r4 tasks 4 & 7).

Measures wall time vs corpus size N for:
- ``triangle``: exact all-pairs triangle block equi-join (θ=0.4)
- ``banded``:   banded sign-LSH + exact verify (θ per run)
- ``hyperplane``: fixed-width hyperplane LSH + verify (θ=0.4)
- ``minhash``:  MinHash+LSH over documents
- ``semdedup_pairs``: k-means-cell-bounded pairs, k ∝ N (vs triangle)
- ``kmeans_round``: one Lloyd round (assignment + centroid update)
- ``zorder``: Morton-key range exchange + local sort, noop sink
- ``skew_agg_plain`` / ``skew_agg_salted``: hot-key aggregation

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


def synth_clustered_embeddings(spark, n: int, cell_size: int = 250, dim: int = 64):
    """A corpus with GROUND-TRUTH cluster structure — the regime SemDeDup
    targets (real embedding corpora cluster; isotropic data is the
    adversarial case where Voronoi cells cannot bound anything). C =
    n/cell_size centers, each vector = its center + 10% seeded noise.
    Returns (df, centers) with centers computed by the same expression so
    the curve isolates PAIR-GENERATION scaling from fit quality."""
    c = max(8, n // cell_size)

    def center_expr(cid_col):
        return F.transform(
            F.sequence(F.lit(1), F.lit(dim)),
            lambda j: (
                F.pmod(F.xxhash64(cid_col * dim + j), F.lit(20001)) - 10000
            ).cast("double")
            / 10000.0,
        )

    centers_df = spark.range(c).select(center_expr(F.col("id")).alias("c"))
    centers = [list(map(float, r["c"])) for r in centers_df.collect()]
    noise = F.transform(
        F.sequence(F.lit(1), F.lit(dim)),
        lambda j: (
            F.pmod(F.xxhash64(F.col("id") * dim + j + 7_777_777), F.lit(20001))
            - 10000
        ).cast("double")
        / 100000.0,
    )
    df = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.zip_with(
            center_expr(F.col("id") % c), noise, lambda a, b: a + b
        ).alias("embedding"),
    )
    return df, centers


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


def fit_exponents(curves: dict) -> dict:
    """Fitted scaling exponent per curve over the largest consecutive
    size pair (the asymptotic end): log(t2/t1)/log(n2/n1). ONE
    definition serving both the full run and the --r9 subset."""
    import math

    out: dict = {}
    for k, pts in curves.items():
        ns = sorted(pts)
        if len(ns) >= 2:
            n1, n2 = ns[-2], ns[-1]
            out[k] = round(math.log(pts[n2] / pts[n1]) / math.log(n2 / n1), 2)
    return out


def r9_curves(spark, sizes) -> dict:
    """r9 operator curves, also runnable alone via `--r9`.

    - Stratified PPS: the operator's claim is ONE two-phase global
      prefix sum for ALL strata (strata are contiguous ranges under the
      (stratum, hash, id) total order; stratum-local cum is a broadcast
      rebase) vs the naive composition's one prefix-sum JOB per stratum.
      Both are linear in rows; the naive path pays a per-stratum fixed
      job cost — measured at 5 strata, and the gap widens linearly in
      |strata| (the motivating regime is hundreds of language×source
      cells).
    - Domain drift: the fact-wide bigram stream collapses to per-(lang,
      bucket) counts before any shuffle; everything after is
      bucket-bounded — expected near-linear (the DSIR cost shape).

    Each point is the MIN of two runs (bench.py's steady-state
    convention): a first-run 20k point here measures whole-stage
    codegen compilation of the nested-HOF bigram projection, not data
    flow, and single-shot points on this VM occasionally catch 3-50×
    scheduler/GC spikes (measured: the same drift() plan 161 s single-
    shot vs 2 s steady-state at 80k docs).
    """
    from functools import reduce

    from food_panda_etl_spark.operators.dsir import _bucket
    from food_panda_etl_spark.operators.lm import bigram_pairs
    from food_panda_etl_spark.operators.sampling import pps_systematic_sample
    from food_panda_etl_spark.operators.sampling_stratified import (
        pps_stratified_sample,
    )

    langs = ["en", "de", "fr", "es", "zh"]
    quotas = {s: 10 for s in langs}
    lang_col = lambda idc: F.element_at(  # noqa: E731
        F.array(*[F.lit(s) for s in langs]),
        (F.pmod(F.xxhash64(F.col(idc) + 3), F.lit(5)) + 1).cast("int"),
    )
    curves: dict[str, dict[int, float]] = {
        "pps_stratified": {},
        "pps_per_stratum_naive": {},
        "domain_drift": {},
    }

    for n in sizes:
        d = (
            spark.range(n)
            .select(
                F.col("id").alias("doc_id"),
                lang_col("id").alias("lang"),
                (F.pmod(F.xxhash64(F.col("id") + 11), F.lit(1000)) + 1).alias(
                    "w"
                ),
            )
            .cache()
        )
        d.count()
        run_strat = lambda: pps_stratified_sample(  # noqa: E731
            d, "lang", "w", quotas
        ).write.format("noop").mode("overwrite").save()
        curves["pps_stratified"][n] = min(timed(run_strat), timed(run_strat))

        def naive():
            parts = [
                pps_systematic_sample(
                    d.filter(F.col("lang") == s).drop("lang"), "w", k=k
                )
                for s, k in quotas.items()
            ]
            reduce(lambda a, b: a.unionByName(b), parts).write.format(
                "noop"
            ).mode("overwrite").save()

        curves["pps_per_stratum_naive"][n] = min(timed(naive), timed(naive))
        d.unpersist()

    def drift(d):
        cl = (
            d.select("lang", F.explode(bigram_pairs("text")).alias("bg"))
            .select(
                "lang",
                _bucket(F.col("bg.w1"), F.col("bg.w2"), 1024).alias("b"),
            )
            .groupBy("lang", "b")
            .agg(F.count("*").alias("clb"))
            .localCheckpoint(eager=False)
        )
        ct = cl.groupBy("lang").agg(F.sum("clb").alias("ctl"))
        rb = cl.groupBy("b").agg(F.sum("clb").alias("rbb"))
        rt = cl.agg(F.sum("clb").alias("rtt"))
        grid = (
            cl.select("lang")
            .distinct()
            .crossJoin(F.broadcast(rb))
            .join(cl, ["lang", "b"], "left")
            .withColumn("clb", F.coalesce(F.col("clb"), F.lit(0)))
        )
        dev = F.abs(F.col("clb") * F.col("rtt") - F.col("rbb") * F.col("ctl"))
        grid.join(F.broadcast(ct), "lang").crossJoin(F.broadcast(rt)).groupBy(
            "lang"
        ).agg(F.sum(dev).alias("tv_num")).write.format("noop").mode(
            "overwrite"
        ).save()

    for n in sizes:
        d = (
            synth_documents(spark, n, None)
            .select("doc_id", "text", lang_col("doc_id").alias("lang"))
            .cache()
        )
        d.count()
        curves["domain_drift"][n] = min(
            timed(lambda: drift(d)), timed(lambda: drift(d))
        )
        d.unpersist()

    # Priority sampling (r9 build-ahead) vs the flat systematic sampler
    # at the same k: priority is ONE narrow projection + a global top-k
    # (TakeOrdered — the fact never shuffles); systematic pays the
    # two-phase prefix sum (a range exchange + broadcast total). Both
    # linear; the plan-cost gap is the operator's reason to exist.
    from food_panda_etl_spark.operators.sampling_priority import (
        priority_sample,
    )

    curves["pps_systematic"] = {}
    curves["pps_priority"] = {}
    for n in sizes:
        d = (
            spark.range(n)
            .select(
                F.col("id").alias("doc_id"),
                (F.pmod(F.xxhash64(F.col("id") + 11), F.lit(1000)) + 1).alias(
                    "w"
                ),
            )
            .cache()
        )
        d.count()
        run_sys = lambda: pps_systematic_sample(  # noqa: E731
            d, "w", k=50
        ).write.format("noop").mode("overwrite").save()
        run_pri = lambda: priority_sample(  # noqa: E731
            d, "w", k=50
        ).write.format("noop").mode("overwrite").save()
        curves["pps_systematic"][n] = min(timed(run_sys), timed(run_sys))
        curves["pps_priority"][n] = min(timed(run_pri), timed(run_pri))
        d.unpersist()

    # k-core peeling (r9): per round one node hash agg + two semi
    # joins — expected linear in |edges| at fixed rounds (the PageRank
    # cost shape). Same 4-out-edge synthetic digraph, symmetrized;
    # k=3 keeps the peel non-trivial (in-degree is hash-distributed,
    # so low-in-degree nodes cascade out).
    from food_panda_etl_spark.operators.kcore import kcore_peel

    curves["kcore"] = {}
    for n in sizes:
        e = (
            spark.range(n)
            .select(
                F.col("id").alias("src"),
                F.explode(
                    F.array(*[
                        F.pmod(F.xxhash64(F.col("id") * 4 + j), F.lit(n))
                        for j in range(4)
                    ])
                ).alias("dst"),
            )
            .filter(F.col("src") != F.col("dst"))
        )
        edges = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).distinct().cache()
        edges.count()
        run_kc = lambda: kcore_peel(  # noqa: E731
            edges, k=3, n_rounds=3
        ).write.format("noop").mode("overwrite").save()
        curves["kcore"][n] = min(timed(run_kc), timed(run_kc))
        edges.unpersist()

    # HLL sketch+estimate (r9 build-ahead): one narrow projection + one
    # 256-group hash agg — expected flat-to-linear with a tiny constant.
    from food_panda_etl_spark.operators.hll import hll_estimate, hll_sketch

    curves["hll"] = {}
    for n in sizes:
        d = spark.range(n).select(F.col("id").alias("k")).cache()
        d.count()
        run_hll = lambda: hll_estimate(  # noqa: E731
            hll_sketch(d, "k")
        ).write.format("noop").mode("overwrite").save()
        curves["hll"][n] = min(timed(run_hll), timed(run_hll))
        d.unpersist()
    return curves


def r10_curves(spark, sizes) -> dict:
    """r10 operator curves, runnable alone via `--r10` (min-of-two per
    point, the r9 convention).

    - Group bottom-k sampling (r10 build-ahead): one narrow projection
      + one per-group window whose rank filter rewrites to
      WindowGroupLimit (partial per-partition top-k heaps before the
      shuffle — at most k rows per (group, partition) move). Expected
      near-linear in rows with a small constant: the scan dominates,
      the shuffle carries ≤ k·groups·partitions narrow rows.
    - HLL mixer cost: the portable mod-Mersenne quadratic mix (three
      chained %/* rounds) vs the production xxhash64 path (one JVM
      hash call + bit ops) over the same keys — quantifies what the
      SQL-replayable oracle costs at scale and what swapping it out
      buys (both are one narrow projection + one 256-row hash agg).
    - Windowed CMS (r10 build-ahead): per-day sketches + the trailing-
      window merge — one (day, d, b) hash agg over the fact plus a
      cells-only merge agg; expected near-linear with a small constant
      (the flat-CMS cost shape, the group dimension rides the same
      shuffle).
    - Random projection (r10 build-ahead): 64→8 JL sign projection over
      synthetic embeddings — map-only, no shuffle; expected linear with
      the scan floor dominating (the cheapest possible shape).
    """
    from food_panda_etl_spark.operators.cms_windowed import (
        cms_merge_groups,
        cms_sketch_by_group,
    )
    from food_panda_etl_spark.operators.random_projection import (
        random_project,
    )
    from food_panda_etl_spark.operators.hll import hll_estimate, hll_sketch
    from food_panda_etl_spark.operators.sampling_group import (
        group_bottomk_sample,
    )

    langs = ["en", "de", "fr", "es", "zh"]
    lang_col = lambda idc: F.element_at(  # noqa: E731
        F.array(*[F.lit(s) for s in langs]),
        (F.pmod(F.xxhash64(F.col(idc) + 3), F.lit(5)) + 1).cast("int"),
    )
    curves: dict[str, dict[int, float]] = {
        "group_bottomk": {},
        "hll_portable": {},
        "hll_xxhash64": {},
        "cms_windowed": {},
    }
    for n in sizes:
        # the original 2-column frame — the group_bottomk / hll curves
        # keep their recorded input shape (a third column here would
        # quietly change what those curves cache and scan, invalidating
        # comparability with earlier recorded points)
        d = (
            spark.range(n)
            .select(
                F.col("id").alias("doc_id"),
                lang_col("id").alias("lang"),
            )
            .cache()
        )
        d.count()
        run_gb = lambda: group_bottomk_sample(  # noqa: E731
            d, ("lang",), 10
        ).write.format("noop").mode("overwrite").save()
        curves["group_bottomk"][n] = min(timed(run_gb), timed(run_gb))
        for mixer, key in (("portable", "hll_portable"),
                           ("xxhash64", "hll_xxhash64")):
            run_hll = lambda: hll_estimate(  # noqa: E731
                hll_sketch(d, "doc_id", mixer=mixer), mixer=mixer
            ).write.format("noop").mode("overwrite").save()
            curves[key][n] = min(timed(run_hll), timed(run_hll))
        d.unpersist()

        # the windowed-CMS curve caches its OWN (doc_id, day) frame
        dc = (
            spark.range(n)
            .select(
                F.col("id").alias("doc_id"),
                (F.pmod(F.xxhash64(F.col("id") + 29), F.lit(30))).alias(
                    "day"
                ),
            )
            .cache()
        )
        dc.count()

        def run_cms():
            by_day = cms_sketch_by_group(
                dc, "doc_id", ("day",), width=1024, depth=4
            )
            cms_merge_groups(
                by_day.filter(F.col("day") >= 23)
            ).write.format("noop").mode("overwrite").save()

        curves["cms_windowed"][n] = min(timed(run_cms), timed(run_cms))
        dc.unpersist()

    curves["random_projection"] = {}
    for n in sizes:
        e = synth_embeddings(spark, n).cache()
        e.count()
        run_rp = lambda: random_project(  # noqa: E731
            e, "embedding", 64, 8
        ).write.format("noop").mode("overwrite").save()
        curves["random_projection"][n] = min(timed(run_rp), timed(run_rp))
        e.unpersist()
    return curves


def r12_curves(spark, sizes) -> dict:
    """r12 curve, runnable alone via `--r12` (min-of-two per point):
    the order.py correctness pin's cost shape (the r10 carry-over task).

    global_row_number / global_running_sum freeze the (row, pid)
    binding with ONE lazy localCheckpoint before the counts/offsets and
    main subtrees consume it (operators/order.py module docstring) —
    the materialization is executor-local (MEMORY_AND_DISK of the
    post-range-shuffle fact), so the claim to verify at 64× rows is a
    ~linear curve (exponent ≈ 1): no driver funnel, no super-linear
    blow-up from the pin. A naive single-partition global window is
    deliberately NOT curved here — it is the shape the operator exists
    to avoid, and equality against it is already pinned in
    tests/test_order*.py / test_quantile_priority.py.
    """
    from food_panda_etl_spark.operators.order import (
        global_row_number,
        global_running_sum,
    )

    curves: dict[str, dict[int, float]] = {
        "global_row_number_pin": {},
        "global_running_sum_pin": {},
    }
    for n in sizes:
        # keys hashed out of order so the range shuffle does real work
        d = (
            spark.range(n)
            .select(
                F.xxhash64(F.col("id")).alias("k"),
                F.col("id").alias("doc_id"),
                (F.pmod(F.xxhash64(F.col("id") + 7), F.lit(400)) + 1).alias(
                    "w"
                ),
            )
            .cache()
        )
        d.count()
        run_rn = lambda: global_row_number(  # noqa: E731
            d, ["k", "doc_id"]
        ).write.format("noop").mode("overwrite").save()
        curves["global_row_number_pin"][n] = min(timed(run_rn), timed(run_rn))
        run_rs = lambda: global_running_sum(  # noqa: E731
            d, ["k", "doc_id"], "w"
        ).write.format("noop").mode("overwrite").save()
        curves["global_running_sum_pin"][n] = min(
            timed(run_rs), timed(run_rs)
        )
        d.unpersist()
    return curves


def r13_curves(spark, sizes) -> dict:
    """r13 build-ahead curves, runnable alone via `--r13` (min-of-two
    per point):

    - Bloom filter (r12 build-ahead): build (one k-way explode + one
      distinct hash agg, ≤ m rows out) + probe (broadcast join + per-
      key distinct-hit count over a fixed 2k-probe frame). Expected
      near-linear in rows with the scan floor dominating — the sketch
      side of the probe join is bounded by m regardless of n.
    - Windowed HLL (r12 build-ahead): per-day register sketches + the
      trailing-window re-bucket (max across the day dimension) +
      estimate. Expected the hll_portable cost shape — one narrow
      projection + one (day, reg) hash agg; the merge agg touches
      ≤ days·m rows, invariant in n.
    - Exact-Jaccard prefix join (r12 build-ahead): near-dup-heavy
      corpus (every doc duplicated — candidates linear by
      construction). Expected near-linear warm; first runs per size
      spike on ContextCleaner lag (SCALE.md records the isolated
      min-of-three probe).
    """
    from food_panda_etl_spark.operators.bloom import (
        bloom_probe,
        bloom_sketch,
    )
    from food_panda_etl_spark.operators.hll import hll_estimate, hll_sketch
    from food_panda_etl_spark.operators.hll_windowed import (
        hll_merge_groups,
    )

    curves: dict[str, dict[int, float]] = {
        "bloom_build_probe": {},
        "hll_windowed": {},
        "jaccard_prefix_join": {},
    }
    for n in sizes:
        d = (
            spark.range(n)
            .select(
                (F.pmod(F.xxhash64(F.col("id")), F.lit(n))).alias("k"),
                (F.pmod(F.xxhash64(F.col("id") + 29), F.lit(30))).alias(
                    "day"
                ),
            )
            .cache()
        )
        d.count()
        probes = spark.range(2000).select(F.col("id").alias("pk"))

        def run_bloom():
            sk = bloom_sketch(d, "k", m_bits=65536, k_hashes=4)
            bloom_probe(sk, probes, "pk", m_bits=65536, k_hashes=4).write.format(
                "noop"
            ).mode("overwrite").save()

        curves["bloom_build_probe"][n] = min(timed(run_bloom), timed(run_bloom))

        def run_hllw():
            by_day = hll_sketch(d, "k", group_cols=("day",))
            recent = hll_merge_groups(by_day.filter(F.col("day") >= 23))
            hll_estimate(recent).write.format("noop").mode(
                "overwrite"
            ).save()

        curves["hll_windowed"][n] = min(timed(run_hllw), timed(run_hllw))
        d.unpersist()

    # prefix join over a near-dup-heavy corpus: every doc appears twice
    # (ids 2i, 2i+1 share text), so TRUE pairs are ~n/2 and candidate
    # volume tracks them — the linear regime the operator exists for
    # (the brute-force inverted index pays the same here, but explodes
    # quadratically once a hot shingle appears; see test_prefix_join).
    from food_panda_etl_spark.operators.prefix_join import (
        jaccard_prefix_join,
    )

    for n in sizes:
        docs = (
            spark.range(n)
            .select(
                F.col("id").alias("doc_id"),
                F.concat_ws(
                    " ",
                    *[
                        F.concat(
                            F.lit(f"t{j}_"),
                            ((F.col("id") / 2).cast("long") * 31 + j)
                            .cast("string"),
                        )
                        for j in range(8)
                    ],
                ).alias("text"),
            )
            .cache()
        )
        docs.count()
        run_pj = lambda: jaccard_prefix_join(  # noqa: E731
            docs, "doc_id", "text", n=3
        ).write.format("noop").mode("overwrite").save()
        curves["jaccard_prefix_join"][n] = min(timed(run_pj), timed(run_pj))
        docs.unpersist()
    return curves


def r14_curves(spark, sizes) -> dict:
    """r14 build-ahead curves, runnable alone via `--r14` (min-of-two
    per point):

    - CMS inner product (r13 build-ahead): two sketch builds (one
      narrow depth-way explode + ONE (d, b) hash agg each, ≤ W·D rows
      out) + the ≤ W·D-row inner-product join + min. Expected
      near-linear in rows with the scan floor dominating — the product
      stage is invariant in n by construction.
    - Exact overlap join (r13 build-ahead): the same near-dup-heavy
      duplicated-doc corpus as the prefix-join curve (true pairs ~n/2,
      candidates track them — the linear regime); absolute threshold
      c=4 over 6 shared 3-gram shingles per duplicate pair.
    """
    from food_panda_etl_spark.operators.cms import cms_sketch
    from food_panda_etl_spark.operators.cms_inner import cms_inner_product
    from food_panda_etl_spark.operators.overlap_join import overlap_join

    curves: dict[str, dict[int, float]] = {
        "cms_inner_product": {},
        "overlap_join": {},
    }
    for n in sizes:
        d = (
            spark.range(n)
            .select(
                (F.pmod(F.xxhash64(F.col("id")), F.lit(n))).alias("k"),
                (F.pmod(F.xxhash64(F.col("id") + 7), F.lit(3))).alias("g"),
            )
            .cache()
        )
        d.count()

        def run_ip():
            a = cms_sketch(d.filter(F.col("g") == 0), "k")
            b = cms_sketch(d.filter(F.col("g") != 0), "k")
            cms_inner_product(a, b).write.format("noop").mode(
                "overwrite"
            ).save()

        curves["cms_inner_product"][n] = min(timed(run_ip), timed(run_ip))
        d.unpersist()

    for n in sizes:
        docs = (
            spark.range(n)
            .select(
                F.col("id").alias("doc_id"),
                F.concat_ws(
                    " ",
                    *[
                        F.concat(
                            F.lit(f"t{j}_"),
                            ((F.col("id") / 2).cast("long") * 31 + j)
                            .cast("string"),
                        )
                        for j in range(8)
                    ],
                ).alias("text"),
            )
            .cache()
        )
        docs.count()
        run_ov = lambda: overlap_join(  # noqa: E731
            docs, "doc_id", "text", n=3, min_overlap=4
        ).write.format("noop").mode("overwrite").save()
        curves["overlap_join"][n] = min(timed(run_ov), timed(run_ov))
        docs.unpersist()
    return curves


def _wj_corpus(spark, n: int):
    """The duplicated-doc near-dup-heavy multiset corpus shared by the
    r15 weighted-Jaccard curve and the r16 weighted-MinHash curve
    (true pairs ~n/2, candidates track them — the linear regime); each
    doc REPEATS its first trigram so multiset counts > 1 and the
    occurrence expansion is exercised, not degenerate."""
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            *(
                [
                    F.concat(
                        F.lit(f"t{j}_"),
                        ((F.col("id") / 2).cast("long") * 31 + j)
                        .cast("string"),
                    )
                    # repeat tokens 0-2 → the first trigram has
                    # count 2 in every doc (multiset exercised)
                    for j in [0, 1, 2]
                ]
                * 2
                + [
                    F.concat(
                        F.lit(f"t{j}_"),
                        ((F.col("id") / 2).cast("long") * 31 + j)
                        .cast("string"),
                    )
                    for j in range(3, 8)
                ]
            ),
        ).alias("text"),
    )


def r15_curves(spark, sizes) -> dict:
    """r15 build-ahead curves, runnable alone via `--r15` (min-of-two
    per point):

    - Weighted (multiset) Jaccard join (r14 build-ahead): the same
      duplicated-doc near-dup-heavy corpus as the overlap/prefix-join
      curves (true pairs ~n/2, candidates track them — the linear
      regime), n=3 shingles at τ=1/2; each doc also REPEATS its first
      trigram so multiset counts > 1 and the occurrence expansion is
      exercised, not degenerate.
    - Bloom-screened decontamination (r14 build-ahead): train side
      grows with n, the eval "benchmark" stays FIXED at 512 docs (the
      real-world shape — benchmarks don't grow with the corpus);
      expected near-linear in train rows with the map-only screen
      dominating and the verify join bounded by contaminated mass
      (1/16 of train shares the eval boilerplate here). The sketch
      SIZES ITSELF TO THE EVAL SET since r16 (derived_m_bits: ~18k
      distinct eval shingles → m=2^18, FPR ~1e-3): the first run of
      this curve used a FIXED 2^16 and measured a 1.32 exponent — 67%
      of bits set, FPR ≈ 0.2, and ~20% of ALL clean shingles flooding
      the verify join; an overloaded screen degrades toward the
      unscreened cost, it never breaks correctness
      (test_equals_exact_under_tiny_sketch). This curve runs the
      DERIVED default — its near-linearity is the done-condition for
      the r16 sizing rule.
    """
    from food_panda_etl_spark.operators.weighted_jaccard import (
        weighted_jaccard_join,
    )

    curves: dict[str, dict[int, float]] = {
        "weighted_jaccard": {},
        "decontam_bloom": {},
    }
    for n in sizes:
        docs = _wj_corpus(spark, n).cache()
        docs.count()
        # try/finally so an exception mid-loop can't leak the cached
        # frame for the rest of the bench process (ADVICE r15)
        try:
            run_wj = lambda: weighted_jaccard_join(  # noqa: E731
                docs, "doc_id", "text", n=3, threshold_num=1, threshold_den=2
            ).write.format("noop").mode("overwrite").save()
            curves["weighted_jaccard"][n] = min(timed(run_wj), timed(run_wj))
        finally:
            docs.unpersist()

    evals = (
        spark.range(512)
        .select(
            (F.col("id") + 10_000_000).alias("doc_id"),
            F.concat_ws(
                " ",
                F.transform(
                    F.sequence(F.lit(1), F.lit(40)),
                    lambda i: F.concat(
                        F.lit("b"),
                        F.pmod(F.col("id") * 40 + i, F.lit(4096)).cast(
                            "string"
                        ),
                    ),
                ),
            ).alias("text"),
        )
        .cache()
    )
    evals.count()
    try:
        for n in sizes:
            _decontam_point(spark, evals, curves, n)
    finally:
        evals.unpersist()
    return curves


def _decontam_point(spark, evals, curves, n) -> None:
    """One decontam_bloom curve point — split out so the cached train
    frame sits in its own try/finally (ADVICE r15: an exception
    mid-loop must not leak cached frames into the rest of the bench
    process)."""
    from food_panda_etl_spark.operators.decontam_bloom import (
        bloom_screened_contamination,
    )

    # 1/16 of train docs carry a benchmark passage (contaminated);
    # the rest are clean random-vocab text
    train = (
        spark.range(n)
        .select(
            F.col("id").alias("doc_id"),
            F.when(
                F.col("id") % 16 == 0,
                F.concat_ws(
                    " ",
                    F.transform(
                        F.sequence(F.lit(1), F.lit(8)),
                        lambda i: F.concat(
                            F.lit("b"),
                            F.pmod(
                                F.pmod(F.col("id"), F.lit(512)) * 40 + i,
                                F.lit(4096),
                            ).cast("string"),
                        ),
                    ),
                ),
            )
            .otherwise(
                F.concat_ws(
                    " ",
                    F.transform(
                        F.sequence(F.lit(1), F.lit(40)),
                        lambda i: F.concat(
                            F.lit("w"),
                            F.pmod(
                                F.xxhash64(F.col("id") * 40 + i),
                                F.lit(50_000),
                            ).cast("string"),
                        ),
                    ),
                )
            )
            .alias("text"),
        )
        .cache()
    )
    train.count()
    try:
        # DEFAULT geometry: since r16 the operator derives m_bits from
        # the eval shingle count itself (derived_m_bits — ~18k distinct
        # shingles here → 2^18), so the curve no longer needs the
        # manual m=2^20 sizing that fixed the r14 1.32-exponent run
        run_db = lambda: bloom_screened_contamination(  # noqa: E731
            train, evals, "doc_id", "text", n=5
        ).write.format("noop").mode("overwrite").save()
        curves["decontam_bloom"][n] = min(timed(run_db), timed(run_db))
    finally:
        train.unpersist()


def r16_curves(spark, sizes) -> dict:
    """r16 build-ahead curves, runnable alone via `--r16` (min-of-two
    per point):

    - Incremental near-dup (r15 build-ahead): the corpus grows with n,
      the refresh batch stays FIXED at 512 docs (the real-world shape —
      refresh batches don't grow with the corpus), and the corpus's
      shingle table + MinHash band index are PREBUILT, MATERIALIZED
      state (cached, untimed — the maintained-state regime the
      operator exists for). Half the batch docs are near-copies of
      corpus docs (one appended token → j = 4/5 at the 5-gram level),
      half novel. Expected: the per-refresh cost is the map-only
      corpus-index probe plus batch-bounded candidates/verify — a
      slope well under the full re-dedup's, with the probe's linear
      corpus-scan term carrying a small constant (at cluster scale the
      (band, bh)-bucketed index makes even that term batch-sized).
    - Weighted MinHash LSH (r15 build-ahead): the SAME duplicated-doc
      multiset corpus as the r15 weighted-Jaccard curve (`_wj_corpus`),
      τ=1/2 at n=3 — the sketch path should track the exact prefix
      join's near-linear shape (true pairs ~n/2 dominate both).
    - Incremental EMBEDDING near-dup (r15 build-ahead): the same
      fixed-512-batch/growing-corpus shape as the text screen, over
      seeded isotropic vectors with the batch half near-copies (10%
      noise → cosine ≈ 0.995) — prebuilt cached state, expected
      near-flat like the text screen.
    - Edit-distance join (r15 build-ahead): duplicated-core strings
      (each id/2 pair differs by ONE appended char → dist 1; cores
      carry id-derived digits so cross-pair distances are large and
      prefix grams are rare) — true pairs = n/2, candidates track
      them, expected near-linear.
    - Containment join (r15 build-ahead): the same `_wj_corpus`
      duplicated-doc corpus at n=3, τ=4/5 — each id/2 pair is mutually
      ≥4/5-contained, A-prefixes are the pair-private rare trigrams,
      expected near-linear in pair mass like the overlap join.
    """
    from food_panda_etl_spark.operators.containment_join import (
        containment_join,
    )
    from food_panda_etl_spark.operators.edit_join import (
        edit_distance_join,
    )
    from food_panda_etl_spark.operators.incremental_embed import (
        build_embed_state,
        incremental_embed_neardup,
    )
    from food_panda_etl_spark.operators.incremental_neardup import (
        build_neardup_state,
        incremental_neardup_pairs,
    )
    from food_panda_etl_spark.operators.weighted_minhash import (
        weighted_minhash_lsh_pairs,
    )

    curves: dict[str, dict[int, float]] = {
        "incremental_neardup": {},
        "weighted_minhash": {},
        "incremental_embed": {},
        "edit_join": {},
        "containment_join": {},
    }

    def corpus_doc_text(id_col):
        # 8 globally-unique tokens per corpus doc → corpus docs are
        # pairwise disjoint; growth adds independent rows, so the curve
        # tracks the probe machinery, not an output blow-up
        return F.concat_ws(
            " ",
            *[
                F.concat(F.lit("c"), (id_col * 8 + j).cast("string"))
                for j in range(8)
            ],
        )

    half = 256
    for n in sizes:
        corpus = spark.range(n).select(
            F.col("id").alias("doc_id"), corpus_doc_text(F.col("id")).alias("text")
        )
        k = (F.col("id") * 9973) % n  # spread the copied corpus docs
        near = spark.range(half).select(
            (F.col("id") + 10_000_000).alias("doc_id"),
            F.concat_ws(
                " ",
                corpus_doc_text(k),
                F.concat(F.lit("zz"), F.col("id").cast("string")),
            ).alias("text"),
        )
        novel = spark.range(half).select(
            (F.col("id") + 20_000_000).alias("doc_id"),
            F.concat_ws(
                " ",
                *[
                    F.concat(F.lit("b"), (F.col("id") * 8 + j).cast("string"))
                    for j in range(8)
                ],
            ).alias("text"),
        )
        batch = near.unionByName(novel).cache()
        batch.count()
        c_sh, c_bands = build_neardup_state(corpus, "doc_id", "text", n=5)
        c_sh, c_bands = c_sh.cache(), c_bands.cache()
        try:
            c_sh.count(), c_bands.count()  # materialize state, untimed
            run_in = lambda: incremental_neardup_pairs(  # noqa: E731
                None, batch, "doc_id", "text", n=5, threshold=0.8,
                corpus_shingles=c_sh, corpus_bands=c_bands,
            ).write.format("noop").mode("overwrite").save()
            curves["incremental_neardup"][n] = min(timed(run_in), timed(run_in))
        finally:
            batch.unpersist()
            c_sh.unpersist()
            c_bands.unpersist()

    for n in sizes:
        docs = _wj_corpus(spark, n).cache()
        docs.count()
        try:
            run_wm = lambda: weighted_minhash_lsh_pairs(  # noqa: E731
                docs, "doc_id", "text", n=3, threshold_num=1, threshold_den=2
            ).write.format("noop").mode("overwrite").save()
            curves["weighted_minhash"][n] = min(timed(run_wm), timed(run_wm))
        finally:
            docs.unpersist()

    for n in sizes:
        docs = _wj_corpus(spark, n).cache()
        docs.count()
        try:
            run_cj = lambda: containment_join(  # noqa: E731
                docs, "doc_id", "text", n=3, threshold_num=4, threshold_den=5
            ).write.format("noop").mode("overwrite").save()
            curves["containment_join"][n] = min(timed(run_cj), timed(run_cj))
        finally:
            docs.unpersist()

    def iso_vec(id_col, salt=0):
        # seeded isotropic 64-dim vector, the synth_embeddings recipe
        return F.transform(
            F.sequence(F.lit(1), F.lit(64)),
            lambda i: (
                F.pmod(F.xxhash64(id_col * 64 + i + salt), F.lit(20001))
                - 10000
            ).cast("double")
            / 10000.0,
        )

    for n in sizes:
        corpus = spark.range(n).select(
            F.col("id").alias("vec_id"), iso_vec(F.col("id")).alias("embedding")
        )
        k = (F.col("id") * 9973) % n
        near = spark.range(half).select(
            (F.col("id") + 10_000_000).alias("vec_id"),
            F.zip_with(
                iso_vec(k), iso_vec(F.col("id"), salt=7_777_777),
                lambda a, b: a + b / 10.0,  # ~10% noise → cosine ≈ 0.995
            ).alias("embedding"),
        )
        novel = spark.range(half).select(
            (F.col("id") + 20_000_000).alias("vec_id"),
            iso_vec(F.col("id") + 30_000_000).alias("embedding"),
        )
        batch = near.unionByName(novel).cache()
        batch.count()
        c_vec, c_bands = build_embed_state(corpus, threshold=0.9, dim=64)
        c_vec, c_bands = c_vec.cache(), c_bands.cache()
        try:
            c_vec.count(), c_bands.count()  # materialize state, untimed
            run_ie = lambda: incremental_embed_neardup(  # noqa: E731
                None, batch, threshold=0.9, dim=64,
                corpus_vectors=c_vec, corpus_bands=c_bands,
            ).write.format("noop").mode("overwrite").save()
            curves["incremental_embed"][n] = min(timed(run_ie), timed(run_ie))
        finally:
            batch.unpersist()
            c_vec.unpersist()
            c_bands.unpersist()

    # Edit-join curve corpus: 30 RANDOM LETTERS per id/2 core (q=4 →
    # 26^4 ≈ 457k gram values, so prefix grams are genuinely rare —
    # the regime q-gram filtering is FOR). The first cut of this curve
    # used id-derived DIGIT strings: a ~100-value bigram alphabet has
    # no rare grams, the prefix join degenerated toward all-pairs and
    # filled the disk at 1.28M rows — exactly the documented
    # tiny-gram-alphabet trap (operators/edit_join.py); sizes capped
    # at 320k accordingly (the trap is alphabet-, not size-, driven,
    # but the curve's job is the well-posed regime).
    for n in [m for m in sizes if m <= 320_000]:
        core = F.concat_ws(
            "",
            F.transform(
                F.sequence(F.lit(1), F.lit(30)),
                lambda i: F.char(
                    F.lit(97)
                    + F.pmod(
                        F.xxhash64((F.col("id") / 2).cast("long") * 30 + i),
                        F.lit(26),
                    )
                ),
            ),
        )
        strs = (
            spark.range(n)
            .select(
                F.col("id").alias("doc"),
                F.when(F.col("id") % 2 == 0, core)
                .otherwise(F.concat(core, F.lit("q")))
                .alias("s"),
            )
            .cache()
        )
        strs.count()
        try:
            run_ed = lambda: edit_distance_join(  # noqa: E731
                strs, "doc", "s", k=2, q=4
            ).write.format("noop").mode("overwrite").save()
            curves["edit_join"][n] = min(timed(run_ed), timed(run_ed))
        finally:
            strs.unpersist()
    return curves


def r17_curves(spark, sizes) -> dict:
    """r17 build-ahead curves, runnable alone via `--r17` (min-of-two
    per point):

    - Incremental containment (r16 build-ahead): the corpus grows with
      n, the refresh batch stays FIXED at 512 docs, and the corpus's
      shingle index + df table are PREBUILT, MATERIALIZED state
      (cached, untimed — the maintained-state regime). Half the batch
      docs are 6-token prefixes of corpus docs (their two 5-gram
      shingles both sit in the source doc → containment 1), half novel
      (corpus-absent shingles rank FIRST in the corpus-df order, so
      the novel half generates ZERO candidates by construction).
      Expected near-flat like the sibling screens.
    - TF-weighted Jaccard (r16 build-ahead): the `_wj_corpus`
      duplicated-doc multiset corpus at n=3, τ=1/2 — true pairs ~n/2,
      weighted-prefix candidates track them, expected near-linear like
      the integer-multiset curve.
    - ICWS LSH (r16 build-ahead): the same corpus/threshold — the
      real-weight sketch path should track the exact weighted-prefix
      join's shape (banding + candidates-only verify; the per-row cost
      is 32 ln/hash chains, map-only).
    - Grouped Bloom probe (r16 build-ahead): per-group membership
      against PREBUILT grouped sketches (64 groups, keys grow with n;
      m=2^16 per group) with a FIXED 64×512 probe grid — expected
      near-FLAT: the probe joins a bounded (groups × m) bit table,
      never the fact.
    """
    from food_panda_etl_spark.operators.bloom import bloom_sketch
    from food_panda_etl_spark.operators.bloom_group import (
        bloom_probe_by_group,
    )
    from food_panda_etl_spark.operators.icws import icws_lsh_pairs
    from food_panda_etl_spark.operators.incremental_containment import (
        build_containment_state,
        incremental_containment_pairs,
    )
    from food_panda_etl_spark.operators.tf_jaccard import tf_jaccard_join

    curves: dict[str, dict[int, float]] = {
        "incremental_containment": {},
        "tf_jaccard": {},
        "icws": {},
        "bloom_group_probe": {},
    }

    def corpus_doc_text(id_col, tokens=8):
        return F.concat_ws(
            " ",
            *[
                F.concat(F.lit("c"), (id_col * 8 + j).cast("string"))
                for j in range(tokens)
            ],
        )

    half = 256
    for n in sizes:
        corpus = spark.range(n).select(
            F.col("id").alias("doc_id"),
            corpus_doc_text(F.col("id")).alias("text"),
        )
        k = (F.col("id") * 9973) % n  # spread the quoted corpus docs
        quoted = spark.range(half).select(
            (F.col("id") + 10_000_000).alias("doc_id"),
            corpus_doc_text(k, tokens=6).alias("text"),
        )
        novel = spark.range(half).select(
            (F.col("id") + 20_000_000).alias("doc_id"),
            F.concat_ws(
                " ",
                *[
                    F.concat(F.lit("b"), (F.col("id") * 8 + j).cast("string"))
                    for j in range(8)
                ],
            ).alias("text"),
        )
        batch = quoted.unionByName(novel).cache()
        batch.count()
        c_sh, c_df = build_containment_state(corpus, "doc_id", "text", n=5)
        c_sh, c_df = c_sh.cache(), c_df.cache()
        try:
            c_sh.count(), c_df.count()  # materialize state, untimed
            run_ic = lambda: incremental_containment_pairs(  # noqa: E731
                None, batch, "doc_id", "text", n=5,
                threshold_num=4, threshold_den=5,
                corpus_shingles=c_sh, corpus_df=c_df,
            ).write.format("noop").mode("overwrite").save()
            curves["incremental_containment"][n] = min(
                timed(run_ic), timed(run_ic)
            )
        finally:
            batch.unpersist()
            c_sh.unpersist()
            c_df.unpersist()

    for n in sizes:
        docs = _wj_corpus(spark, n).cache()
        docs.count()
        try:
            run_tf = lambda: tf_jaccard_join(  # noqa: E731
                docs, "doc_id", "text", n=3,
                threshold_num=1, threshold_den=2,
            ).write.format("noop").mode("overwrite").save()
            curves["tf_jaccard"][n] = min(timed(run_tf), timed(run_tf))
            run_ic2 = lambda: icws_lsh_pairs(  # noqa: E731
                docs, "doc_id", "text", n=3,
                threshold_num=1, threshold_den=2,
            ).write.format("noop").mode("overwrite").save()
            curves["icws"][n] = min(timed(run_ic2), timed(run_ic2))
        finally:
            docs.unpersist()

    groups = 64
    for n in sizes:
        facts = spark.range(n).select(
            F.pmod(F.col("id"), F.lit(groups)).alias("g"),
            F.pmod(F.xxhash64("id"), F.lit(n)).alias("k"),
        )
        sk = bloom_sketch(
            facts, "k", m_bits=1 << 16, k_hashes=4, group_cols=("g",)
        ).cache()
        probes = (
            spark.range(groups)
            .select(F.col("id").alias("g"))
            .crossJoin(spark.range(512).select(F.col("id").alias("k")))
            .cache()
        )
        try:
            sk.count(), probes.count()  # materialize, untimed
            run_bg = lambda: bloom_probe_by_group(  # noqa: E731
                sk, probes, "k", ("g",), m_bits=1 << 16, k_hashes=4
            ).write.format("noop").mode("overwrite").save()
            curves["bloom_group_probe"][n] = min(timed(run_bg), timed(run_bg))
        finally:
            sk.unpersist()
            probes.unpersist()
    return curves


def r18_curves(spark, sizes) -> dict:
    """r18 build-ahead curves, runnable alone via `--r18` (min-of-two
    per point):

    - Incremental ICWS (real-weight near-dup screen): the corpus grows
      with n, the refresh batch stays FIXED at 512 docs, and the
      corpus's counted shingle table + ICWS band index are PREBUILT,
      MATERIALIZED state (cached, untimed — the maintained-state
      regime). Half the batch docs are 6-token prefixes of corpus docs
      (J_tf = 0.5 at n=3 — exactly the τ=1/2 boundary, included), half
      novel. Expected near-FLAT like the sibling screens: per refresh
      the ln/hash-heavy ICWS projection runs over BATCH rows only and
      the band probe joins a bounded index.
    - Incremental grouped priority sample: per-group bottom-k state
      (64 groups, k=32) PREBUILT from the growing corpus (cached,
      untimed), refreshed with a FIXED 4096-row batch — expected FLAT:
      the refresh re-ranks ≤ k·groups + batch rows, never the corpus.
    - Grouped priority rebucket (the windowed face): per-(day, group)
      states (16 days × 64 groups × k=32) PREBUILT from the growing
      corpus (cached, untimed), re-ranked to per-group — expected FLAT
      by construction: the timed input is the geometry-bounded state
      (days·groups·k rows regardless of corpus size).
    - Bloom AND (set algebra): two m=2^16 sketches PREBUILT from
      growing disjoint-half key sets (cached, untimed), timed
      AND-combine + 4096-probe verdict — expected FLAT: the combine
      shuffles ≤ 2m geometry-bounded rows, never the facts.
    """
    from food_panda_etl_spark.operators.incremental_icws import (
        build_icws_state,
        incremental_icws_pairs,
    )
    from food_panda_etl_spark.operators.sampling_group import (
        group_priority_sample,
    )
    from food_panda_etl_spark.operators.sampling_incremental import (
        group_priority_rebucket,
        incremental_group_priority_sample,
    )

    curves: dict[str, dict[int, float]] = {
        "incremental_icws": {},
        "incremental_group_priority": {},
        "group_priority_rebucket": {},
        "bloom_intersect": {},
    }

    def corpus_doc_text(id_col, tokens=8):
        return F.concat_ws(
            " ",
            *[
                F.concat(F.lit("c"), (id_col * 8 + j).cast("string"))
                for j in range(tokens)
            ],
        )

    half = 256
    for n in sizes:
        corpus = spark.range(n).select(
            F.col("id").alias("doc_id"),
            corpus_doc_text(F.col("id")).alias("text"),
        )
        k = (F.col("id") * 9973) % n  # spread the near-dup'd corpus docs
        neardup = spark.range(half).select(
            (F.col("id") + 10_000_000).alias("doc_id"),
            corpus_doc_text(k, tokens=6).alias("text"),
        )
        novel = spark.range(half).select(
            (F.col("id") + 20_000_000).alias("doc_id"),
            F.concat_ws(
                " ",
                *[
                    F.concat(F.lit("b"), (F.col("id") * 8 + j).cast("string"))
                    for j in range(8)
                ],
            ).alias("text"),
        )
        batch = neardup.unionByName(novel).cache()
        batch.count()
        c_cnt, c_idx = build_icws_state(corpus, "doc_id", "text", n=3)
        c_cnt, c_idx = c_cnt.cache(), c_idx.cache()
        try:
            c_cnt.count(), c_idx.count()  # materialize state, untimed
            run_ii = lambda: incremental_icws_pairs(  # noqa: E731
                None, batch, "doc_id", "text", n=3,
                threshold_num=1, threshold_den=2,
                corpus_counts=c_cnt, corpus_bands=c_idx,
            ).write.format("noop").mode("overwrite").save()
            curves["incremental_icws"][n] = min(timed(run_ii), timed(run_ii))
        finally:
            batch.unpersist()
            c_cnt.unpersist()
            c_idx.unpersist()

    groups, kk = 64, 32
    batch_rows = 4096
    for n in sizes:
        corpus = spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.pmod(F.col("id"), F.lit(groups)).cast("string").alias("g"),
            (F.pmod(F.col("id"), F.lit(100)) + 1).alias("w"),
        )
        state = group_priority_sample(
            corpus, ("g",), "w", kk, id_col="doc_id"
        ).cache()
        batch = spark.range(batch_rows).select(
            (F.col("id") + 10_000_000).alias("doc_id"),
            F.pmod(F.col("id"), F.lit(groups)).cast("string").alias("g"),
            (F.pmod(F.col("id"), F.lit(100)) + 1).alias("w"),
        ).cache()
        try:
            state.count(), batch.count()  # materialize, untimed
            run_gp = lambda: incremental_group_priority_sample(  # noqa: E731
                state, batch, ("g",), "w", kk, id_col="doc_id"
            ).write.format("noop").mode("overwrite").save()
            curves["incremental_group_priority"][n] = min(
                timed(run_gp), timed(run_gp)
            )
        finally:
            state.unpersist()
            batch.unpersist()

    days = 16
    for n in sizes:
        # day decorrelated from g (id div groups, NOT id % days — 16
        # divides 64, so the % form would pin each coarse group to ONE
        # day and the re-rank would merge nothing; review r17)
        corpus = spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.pmod(F.col("id"), F.lit(groups)).cast("string").alias("g"),
            F.pmod(F.col("id") / groups, F.lit(days)).cast("long").alias(
                "day"
            ),
            (F.pmod(F.col("id"), F.lit(100)) + 1).alias("w"),
        )
        fine = group_priority_sample(
            corpus, ("g", "day"), "w", kk, id_col="doc_id"
        ).cache()
        try:
            fine.count()  # materialize the per-day state, untimed
            run_rb = lambda: group_priority_rebucket(  # noqa: E731
                fine, ("g",), kk, id_col="doc_id"
            ).write.format("noop").mode("overwrite").save()
            curves["group_priority_rebucket"][n] = min(
                timed(run_rb), timed(run_rb)
            )
        finally:
            fine.unpersist()

    from food_panda_etl_spark.operators.bloom import bloom_probe, bloom_sketch
    from food_panda_etl_spark.operators.bloom_algebra import bloom_intersect

    m_bi = 1 << 16
    for n in sizes:
        # overlapping halves: [0, 0.6n) and [0.4n, n) — ~n/5 shared keys
        sk_a = bloom_sketch(
            spark.range(0, (6 * n) // 10).select(F.col("id").alias("k")),
            "k", m_bits=m_bi, k_hashes=4,
        ).cache()
        sk_b = bloom_sketch(
            spark.range((4 * n) // 10, n).select(F.col("id").alias("k")),
            "k", m_bits=m_bi, k_hashes=4,
        ).cache()
        probes = spark.range(4096).select(F.col("id").alias("k")).cache()
        try:
            sk_a.count(), sk_b.count(), probes.count()  # untimed
            run_bi = lambda: bloom_probe(  # noqa: E731
                bloom_intersect(sk_a, sk_b), probes, "k",
                m_bits=m_bi, k_hashes=4,
            ).write.format("noop").mode("overwrite").save()
            curves["bloom_intersect"][n] = min(timed(run_bi), timed(run_bi))
        finally:
            sk_a.unpersist()
            sk_b.unpersist()
            probes.unpersist()
    return curves


def r19_curves(spark, sizes) -> dict:
    """r19 build-ahead curves, runnable alone via `--r19` (min-of-two
    per point):

    - Incremental heavy refresh: the exact-then-truncate MG state
      (k=256) PREBUILT from the growing corpus (cached, untimed — the
      maintained-state regime), refreshed with a FIXED 4096-row
      batch — expected FLAT: the refresh hash-aggregates the batch and
      merges ≤ k + batch-distinct summary rows, never the corpus.
    - Windowed heavy merge + screen: per-day summaries (16 days, k=64)
      PREBUILT from the growing corpus (cached, untimed), day-filtered
      and merged across the dropped day dimension, then screened at
      1/16 — expected FLAT by construction: the timed input is the
      geometry-bounded state (days·k rows regardless of corpus size).
    - Per-group quantile buckets: the bank's one full-data operator
      (no maintained state to hide behind) — ONE exchange + per-group
      sort over the growing input; expected ~LINEAR, the honest curve
      for a rank-everything primitive.
    - Incremental histogram refresh (the late-r18 bank addition,
      `operators/histogram_state.py`): per-group equi-width histogram
      state PREBUILT from the growing corpus (cached, untimed),
      refreshed with a FIXED 4096-row batch — expected FLAT: one
      batch-sized hash agg + a ≤ groups·n_buckets-row union-sum.
    - Windowed histogram merge + quantile read: per-day histograms
      (16 days) PREBUILT, day-filtered, merged across the dropped day
      dimension, read at median + p90 — FLAT by construction (the
      timed input is days·n_buckets state rows regardless of corpus).
    """
    from food_panda_etl_spark.operators.heavy_incremental import (
        heavy_candidates,
        incremental_heavy_refresh,
        mg_merge_groups,
        mg_summary,
    )
    from food_panda_etl_spark.operators.histogram_state import (
        hist_merge_groups,
        hist_quantiles,
        hist_summary,
        incremental_hist_refresh,
    )
    from food_panda_etl_spark.operators.quantile_bucket_group import (
        group_rank_quantile_buckets,
    )

    curves: dict[str, dict[int, float]] = {
        "incremental_heavy_refresh": {},
        "heavy_window_merge": {},
        "group_quantile_buckets": {},
        "incremental_hist_refresh": {},
        "hist_window_quantiles": {},
    }
    for n in sizes:
        corpus = spark.range(n).select(
            (F.col("id") % (n // 8)).alias("k"),
            (F.col("id") % 16).alias("day"),
        )
        batch = spark.range(4096).select(
            ((F.col("id") * 9973) % (n // 8)).alias("k")
        )
        c0, t0 = mg_summary(corpus.select("k"), "k", 256)
        c0, t0 = c0.cache(), t0.cache()
        cd, td = mg_summary(corpus, "k", 64, group_cols=("day",))
        cd, td = cd.cache(), td.cache()
        try:
            c0.count(), t0.count(), cd.count(), td.count()  # untimed

            def run_refresh():
                c1, t1 = incremental_heavy_refresh(
                    c0, t0, batch, "k", 256
                )
                c1.write.format("noop").mode("overwrite").save()
                t1.write.format("noop").mode("overwrite").save()

            curves["incremental_heavy_refresh"][n] = min(
                timed(run_refresh), timed(run_refresh)
            )

            def run_window():
                mc, mt = mg_merge_groups(
                    [(cd.filter(F.col("day") >= 9),
                      td.filter(F.col("day") >= 9))],
                    "k", 64,
                )
                heavy_candidates(mc, mt, "k", 1, 16, 64).write.format(
                    "noop"
                ).mode("overwrite").save()

            curves["heavy_window_merge"][n] = min(
                timed(run_window), timed(run_window)
            )
        finally:
            c0.unpersist(), t0.unpersist(), cd.unpersist(), td.unpersist()

        # histogram state: values on a [0, 4096) grid (step 16, 256
        # buckets), 16 day-groups — same corpus/batch discipline as the
        # heavy curves (state cached untimed, fixed batch timed)
        hv = corpus.select(
            "day", (F.col("k") % 4096).alias("v")
        )
        h0 = hist_summary(hv, "v", 0, 16, 256, ("day",)).cache()
        # the refresh batch lands on one (the newest) day
        hb = batch.select(
            F.lit(15).alias("day"), (F.col("k") % 4096).alias("v")
        )
        try:
            h0.count()  # untimed

            def run_hist_refresh():
                incremental_hist_refresh(
                    h0, hb, "v", 0, 16, 256, ("day",)
                ).write.format("noop").mode("overwrite").save()

            curves["incremental_hist_refresh"][n] = min(
                timed(run_hist_refresh), timed(run_hist_refresh)
            )

            def run_hist_window():
                m = hist_merge_groups(
                    [h0.filter(F.col("day") >= 9)], 0, 16, 256, "v"
                )
                hist_quantiles(
                    m, [(1, 2), (9, 10)], "v", 0, 16, 256
                ).write.format("noop").mode("overwrite").save()

            curves["hist_window_quantiles"][n] = min(
                timed(run_hist_window), timed(run_hist_window)
            )
        finally:
            h0.unpersist()

        scored = spark.range(n).select(
            (F.col("id") % 64).alias("g"),
            ((F.col("id") * 2654435761) % 1000003).alias("s"),
            F.col("id"),
        )
        run_qb = lambda: group_rank_quantile_buckets(  # noqa: E731
            scored, ("g",), "s", 4, ("id",)
        ).write.format("noop").mode("overwrite").save()
        curves["group_quantile_buckets"][n] = min(
            timed(run_qb), timed(run_qb)
        )
    return curves


def r20_curves(spark, sizes) -> dict:
    """r20 build-ahead curves, runnable alone via `--r20` (min-of-two
    per point):

    - Incremental CMS refresh: the 4x1024 cell state PREBUILT from the
      growing corpus (cached, untimed -- the maintained-state regime),
      refreshed with a FIXED 4096-row batch -- expected FLAT: one
      batch-sized (d, b) hash agg + a <= 2*width*depth cell union-sum.
    - Incremental HLL refresh: the stamped m=256 register state
      PREBUILT likewise, refreshed with the same fixed batch --
      expected FLAT: one batch-sized register agg + a <= 2*m-row max.
    - Incremental DSIR refresh + state scoring (r19 bank addition):
      the <= 1024-row hashed-bigram count state PREBUILT from a
      growing synthetic two-bigram corpus, (a) refreshed with a FIXED
      4096-doc batch -- expected FLAT: one batch-sized bucket hash agg
      + a <= 2*buckets union-sum -- and (b) probed by scoring the
      fixed batch against the state -- expected FLAT: batch featurize
      + broadcast join against the state, the production CDC shape.
    """
    from food_panda_etl_spark.operators.cms import cms_sketch
    from food_panda_etl_spark.operators.cms_incremental import (
        incremental_cms_refresh,
    )
    from food_panda_etl_spark.operators.dsir_incremental import (
        build_dsir_state,
        dsir_score_against_state,
        incremental_dsir_refresh,
    )
    from food_panda_etl_spark.operators.hll_incremental import (
        build_hll_state,
        incremental_hll_refresh,
    )

    curves: dict[str, dict[int, float]] = {
        "incremental_cms_refresh": {},
        "incremental_hll_refresh": {},
        "incremental_dsir_refresh": {},
        "dsir_score_from_state": {},
    }

    def synth_docs(frame):
        """Three-token docs over a 997-word vocabulary, ~1/5 target."""
        return frame.select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") % 5 == 0, "en").otherwise("de").alias(
                "lang"
            ),
            F.concat(
                F.lit("w"), (F.col("id") % 997).cast("string"),
                F.lit(" w"), ((F.col("id") * 31) % 997).cast("string"),
                F.lit(" w"), ((F.col("id") * 17) % 997).cast("string"),
            ).alias("text"),
        )

    for n in sizes:
        corpus = spark.range(n).select(
            ((F.col("id") * 2654435761) % (n // 2)).alias("k")
        )
        batch = spark.range(4096).select(
            ((F.col("id") * 9973) % (n // 2)).alias("k")
        )
        docs = synth_docs(spark.range(n))
        bdocs = synth_docs(spark.range(n, n + 4096))
        c0 = cms_sketch(corpus, "k", 1024, 4).cache()
        h0 = build_hll_state(corpus, "k").cache()
        d0 = build_dsir_state(docs, F.col("lang") == "en").cache()
        try:
            c0.count(), h0.count(), d0.count()  # untimed

            def run_cms():
                incremental_cms_refresh(
                    c0, batch, "k", 1024, 4
                ).write.format("noop").mode("overwrite").save()

            curves["incremental_cms_refresh"][n] = min(
                timed(run_cms), timed(run_cms)
            )

            def run_hll():
                incremental_hll_refresh(
                    h0, batch, "k"
                ).write.format("noop").mode("overwrite").save()

            curves["incremental_hll_refresh"][n] = min(
                timed(run_hll), timed(run_hll)
            )

            def run_dsir():
                incremental_dsir_refresh(
                    d0, bdocs, F.col("lang") == "en"
                ).write.format("noop").mode("overwrite").save()

            curves["incremental_dsir_refresh"][n] = min(
                timed(run_dsir), timed(run_dsir)
            )

            def run_dsir_score():
                dsir_score_against_state(bdocs, d0).write.format(
                    "noop"
                ).mode("overwrite").save()

            curves["dsir_score_from_state"][n] = min(
                timed(run_dsir_score), timed(run_dsir_score)
            )
        finally:
            c0.unpersist(), h0.unpersist(), d0.unpersist()
    return curves


def cores_probe(spark, quick: bool) -> dict:
    """Core-count scaling evidence at a COMPUTE-DOMINATED size (VERDICT
    r19 task 6): at sf0.1 every bench key sits on the 0.2-2 s fixed-
    overhead floor (plan compile + scheduling), so the driver's
    8-vs-32-core ratios all read ≈1 and say nothing about parallelism.
    This probe runs a representative operator per cost class — scan-agg,
    shuffle join, window, and the shingle/hash hot loops — over SEEDED
    GENERATED inputs (the synth_* row generators above; deterministic,
    no testdata dependence) sized so 32-core wall is multiple seconds,
    i.e. the overhead floor is <10% and the 8-core/32-core wall ratio
    measures actual parallel speedup. Run it twice:

        SPARK_GRAFT_CPUS=32 python bench_scale.py --cores
        SPARK_GRAFT_CPUS=8  python bench_scale.py --cores

    and record the per-probe ratios (SCALING_r20.json / SCALE.md).
    Min-of-two per probe, the bench.py steady-state convention."""
    from food_panda_etl_spark.operators.dedup import minhash_from_shingles, shingle_table
    from food_panda_etl_spark.operators.decontam_bloom import (
        bloom_screened_contamination,
    )
    from food_panda_etl_spark.operators.icws import icws_signatures
    from food_panda_etl_spark.operators.pagerank import pagerank
    from food_panda_etl_spark.operators.prefix_join import jaccard_prefix_join
    from food_panda_etl_spark.operators.tf_jaccard import tf_weights
    from food_panda_etl_spark.operators.weighted_jaccard import (
        shingle_multiset_table,
    )
    from pyspark.sql import Window

    s = 0.25 if quick else 1.0
    probes: dict[str, float] = {}

    def point(name, fn):
        probes[name] = min(timed(fn), timed(fn))

    # scan + hash aggregate: 200M generated rows, 1000 groups
    n = int(200_000_000 * s)
    point(
        "scan_groupby_agg",
        lambda: spark.range(n)
        .select(
            F.pmod(F.xxhash64("id"), F.lit(1000)).alias("g"),
            (F.col("id") % 997).alias("v"),
        )
        .groupBy("g")
        .agg(F.sum("v"), F.avg("v"), F.count("*"))
        .write.format("noop")
        .mode("overwrite")
        .save(),
    )

    # shuffle join + aggregate: 50M fact x 5M dim on an 8-byte key
    nf, nd = int(50_000_000 * s), int(5_000_000 * s)
    fact = spark.range(nf).select(
        F.pmod(F.xxhash64("id"), F.lit(nd)).alias("k"),
        (F.col("id") % 131).alias("v"),
    )
    dim = spark.range(nd).select(
        F.col("id").alias("k"), F.pmod(F.xxhash64("id", F.lit(3)), F.lit(50)).alias("dg")
    )
    point(
        "shuffle_join_agg",
        lambda: fact.join(dim, "k")
        .groupBy("dg")
        .agg(F.sum("v"))
        .write.format("noop")
        .mode("overwrite")
        .save(),
    )

    # per-key running-sum window: 50M rows over 100k keys
    nw = int(50_000_000 * s)
    w = Window.partitionBy("k").orderBy("id")
    point(
        "window_running_sum",
        lambda: spark.range(nw)
        .select(
            "id",
            F.pmod(F.xxhash64("id"), F.lit(100_000)).alias("k"),
            (F.col("id") % 17).alias("v"),
        )
        .withColumn("cum", F.sum("v").over(w))
        .write.format("noop")
        .mode("overwrite")
        .save(),
    )

    # MinHash signature build (shingle explode + 32-hash agg) — the
    # near-dup family's map-side hot loop
    docs = synth_documents(spark, int(300_000 * s), None).localCheckpoint(
        eager=True
    )
    point(
        "minhash_signatures",
        lambda: minhash_from_shingles(
            shingle_table(docs, "doc_id", "text", n=5)
        )
        .write.format("noop")
        .mode("overwrite")
        .save(),
    )

    # ICWS signature build — the real-weight hot loop (3 ln + 4 hashes
    # per (element, hash index))
    wdocs = _wj_corpus(spark, int(150_000 * s)).localCheckpoint(eager=True)
    point(
        "icws_signatures",
        lambda: icws_signatures(
            tf_weights(shingle_multiset_table(wdocs, "doc_id", "text", 3))
        )
        .write.format("noop")
        .mode("overwrite")
        .save(),
    )

    # exact-Jaccard prefix join over the duplicated-doc corpus (the
    # r13 curve's linear regime, at a compute-dominated size)
    pdocs = (
        spark.range(int(200_000 * s))
        .select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ",
                *[
                    F.concat(
                        F.lit(f"t{j}_"),
                        ((F.col("id") / 2).cast("long") * 31 + j).cast(
                            "string"
                        ),
                    )
                    for j in range(8)
                ],
            ).alias("text"),
        )
        .localCheckpoint(eager=True)
    )
    point(
        "jaccard_prefix_join",
        lambda: jaccard_prefix_join(pdocs, "doc_id", "text", n=3)
        .write.format("noop")
        .mode("overwrite")
        .save(),
    )

    # Bloom-screened decontamination: 1M train docs vs a fixed 512-doc
    # eval set (the r15 curve's shape, one big point)
    evals = spark.range(512).select(
        (F.col("id") + 10_000_000).alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(1), F.lit(40)),
                lambda i: F.concat(
                    F.lit("b"),
                    F.pmod(F.col("id") * 40 + i, F.lit(4096)).cast("string"),
                ),
            ),
        ).alias("text"),
    ).localCheckpoint(eager=True)
    train = synth_documents(spark, int(1_000_000 * s), None).localCheckpoint(
        eager=True
    )
    point(
        "decontam_bloom",
        lambda: bloom_screened_contamination(
            train, evals, "doc_id", "text", n=5
        )
        .write.format("noop")
        .mode("overwrite")
        .save(),
    )

    # PageRank, 5 rounds over a 4-out-degree seeded digraph (~8M edges)
    ng = int(1_000_000 * s)
    e = (
        spark.range(ng)
        .select(
            F.col("id").alias("src"),
            F.explode(
                F.array(
                    *[
                        F.pmod(F.xxhash64(F.col("id") * 4 + j), F.lit(ng))
                        for j in range(4)
                    ]
                )
            ).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .localCheckpoint(eager=True)
    )
    nodes = spark.range(ng).select(F.col("id")).localCheckpoint(eager=True)
    point(
        "pagerank_5r",
        lambda: pagerank(nodes, e, n_iter=5)
        .write.format("noop")
        .mode("overwrite")
        .save(),
    )
    return probes


def main() -> None:
    quick = "--quick" in sys.argv
    r5_only = "--r5" in sys.argv  # only the r5 curves (semdedup/kmeans/zorder/skew)
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
    if "--cores" in sys.argv:  # core-count scaling probe (VERDICT r19 task 6)
        probes = cores_probe(spark, quick)
        print(
            json.dumps(
                {"metric": "cores_probe", "cpus": cpus, "quick": quick,
                 "probes": probes}
            )
        )
        return
    if "--r9" in sys.argv:  # only the r9 curves (stratified PPS / drift)
        sizes = [20_000, 80_000] + ([] if quick else [320_000])
        curves = r9_curves(spark, sizes)
        print(json.dumps(
            {"cpus": cpus, "curves": curves, "exponents": fit_exponents(curves)}
        ))
        return
    if "--r10" in sys.argv:  # only the r10 curves (group bottom-k / mixers)
        sizes = [20_000, 80_000] + ([] if quick else [320_000, 1_280_000])
        curves = r10_curves(spark, sizes)
        print(json.dumps(
            {"cpus": cpus, "curves": curves, "exponents": fit_exponents(curves)}
        ))
        return
    if "--r12" in sys.argv:  # only the r12 curve (the order.py pin)
        sizes = [20_000, 80_000] + ([] if quick else [320_000, 1_280_000])
        curves = r12_curves(spark, sizes)
        print(json.dumps(
            {"cpus": cpus, "curves": curves, "exponents": fit_exponents(curves)}
        ))
        return
    if "--r13" in sys.argv:  # r13 curves (bloom / windowed HLL / prefix join)
        sizes = [20_000, 80_000] + ([] if quick else [320_000, 1_280_000])
        curves = r13_curves(spark, sizes)
        print(json.dumps(
            {"cpus": cpus, "curves": curves, "exponents": fit_exponents(curves)}
        ))
        return
    if "--r14" in sys.argv:  # r14 curves (cms inner product / overlap join)
        sizes = [20_000, 80_000] + ([] if quick else [320_000, 1_280_000])
        curves = r14_curves(spark, sizes)
        print(json.dumps(
            {"cpus": cpus, "curves": curves, "exponents": fit_exponents(curves)}
        ))
        return
    if "--r15" in sys.argv:  # r15 curves (weighted jaccard / bloom decontam)
        sizes = [20_000, 80_000] + ([] if quick else [320_000, 1_280_000])
        curves = r15_curves(spark, sizes)
        print(json.dumps(
            {"cpus": cpus, "curves": curves, "exponents": fit_exponents(curves)}
        ))
        return
    if "--r16" in sys.argv:  # r16 curves (incremental neardup / weighted minhash)
        sizes = [20_000, 80_000] + ([] if quick else [320_000, 1_280_000])
        curves = r16_curves(spark, sizes)
        print(json.dumps(
            {"cpus": cpus, "curves": curves, "exponents": fit_exponents(curves)}
        ))
        return
    if "--r17" in sys.argv:  # r17 curves (incr containment / tf jaccard / icws)
        sizes = [20_000, 80_000] + ([] if quick else [320_000, 1_280_000])
        curves = r17_curves(spark, sizes)
        print(json.dumps(
            {"cpus": cpus, "curves": curves, "exponents": fit_exponents(curves)}
        ))
        return
    if "--r18" in sys.argv:  # r18 curves (incr ICWS / incr grouped priority)
        sizes = [20_000, 80_000] + ([] if quick else [320_000, 1_280_000])
        curves = r18_curves(spark, sizes)
        print(json.dumps(
            {"cpus": cpus, "curves": curves, "exponents": fit_exponents(curves)}
        ))
        return
    if "--r19" in sys.argv:  # r19 curves (incr heavy / group quantile buckets)
        sizes = [20_000, 80_000] + ([] if quick else [320_000, 1_280_000])
        curves = r19_curves(spark, sizes)
        print(json.dumps(
            {"cpus": cpus, "curves": curves, "exponents": fit_exponents(curves)}
        ))
        return
    if "--r20" in sys.argv:  # r20 curves (incremental CMS / HLL refresh)
        sizes = [20_000, 80_000] + ([] if quick else [320_000, 1_280_000])
        curves = r20_curves(spark, sizes)
        print(json.dumps(
            {"cpus": cpus, "curves": curves, "exponents": fit_exponents(curves)}
        ))
        return

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
    if r5_only:
        emb_sizes, lsh_sizes, doc_sizes = [], [], []
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
    if r5_only:
        boiler_sizes = []
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

    # --- r5 curves (VERDICT r4 tasks 4 & 7) -----------------------------

    # SemDeDup pair generation with cells sized ∝ N (k = N/250, matmul
    # assignment). TWO regimes, measured separately:
    #
    # - `semdedup_clustered` — ground-truth-clustered corpus, centroids =
    #   the generative centers (isolates pair-generation scaling from fit
    #   quality; the declared query's oracle covers fit correctness).
    #   Cells track real clusters, Σ|cell|² ≈ N·cell_size → near-linear.
    #   Exact all-pairs comparison is `triangle_t04` at the same sizes.
    # - `semdedup_isotropic` — the ADVERSARIAL case: isotropic vectors
    #   have no cluster structure, nearest-sampled-centroid assignment
    #   floods the smallest-norm centroids (measured: top cell 6.7k of
    #   32k rows at k=128, Σ|cell|² ≈ 0.2·N²), so the "bound" decays to
    #   a ~5× constant over all-pairs. Kept small: it documents WHY
    #   SemDeDup presumes clusterable embeddings, not a scaling win.
    from food_panda_etl_spark.operators.similarity import cell_neardup_pairs

    curves["semdedup_clustered"] = {}
    sd_sizes = [8000, 16000] + ([] if quick else [32000, 64000])
    for n in sd_sizes:
        e, centers = synth_clustered_embeddings(spark, n, cell_size=250)
        e = e.cache()
        e.count()
        curves["semdedup_clustered"][n] = timed(
            lambda: cell_neardup_pairs(
                e, centers, threshold=0.8, arrow_assignment=True
            ).count()
        )
        e.unpersist()

    curves["semdedup_isotropic"] = {}
    for n in [8000, 16000]:
        e = synth_embeddings(spark, n, emb_base).cache()
        e.count()
        k = max(8, n // 250)
        cents = [
            list(map(float, r["embedding"]))
            for r in e.orderBy(F.xxhash64(F.col("vec_id")), F.col("vec_id"))
            .limit(k)
            .select("embedding")
            .collect()
        ]
        curves["semdedup_isotropic"][n] = timed(
            lambda: cell_neardup_pairs(
                e, cents, threshold=0.4, arrow_assignment=True
            ).count()
        )
        e.unpersist()

    # k-means per-round cost vs N (k=8, one Lloyd round from hash-min
    # sampled centroids): assignment is a projection, update one
    # posexplode hash-agg — theory says linear in N.
    from food_panda_etl_spark.operators.kmeans import lloyd_refine

    curves["kmeans_round"] = {}
    km_sizes = [8000, 32000] + ([] if quick else [128000])
    for n in km_sizes:
        e = synth_embeddings(spark, n, emb_base).cache()
        e.count()
        init = [
            list(map(float, r["embedding"]))
            for r in e.orderBy(F.xxhash64(F.col("vec_id")), F.col("vec_id"))
            .limit(8)
            .select("embedding")
            .collect()
        ]
        curves["kmeans_round"][n] = timed(lambda: lloyd_refine(e, init, iters=1))
        e.unpersist()

    # Z-order clustering: one range exchange + local sort on the Morton
    # key — theory N·log N. The noop sink materializes the sorted layout
    # (a bare count() would let Catalyst elide the sort).
    from food_panda_etl_spark.operators.zorder import cluster_by_zorder

    curves["zorder"] = {}
    z_sizes = [1_000_000, 4_000_000] + ([] if quick else [16_000_000])
    for n in z_sizes:
        zdf = spark.range(n).select(
            (F.col("id") % 256).alias("db"),
            (F.pmod(F.xxhash64("id"), F.lit(256))).alias("pb"),
        )
        curves["zorder"][n] = timed(
            lambda: cluster_by_zorder(zdf, [F.col("db"), F.col("pb")], bits=8)
            .write.format("noop")
            .mode("overwrite")
            .save()
        )

    # Salted vs plain aggregation under a hot key (50% of rows on one
    # key, remainder uniform over 10k keys). Honest expectation: for
    # count/sum, map-side partial aggregation ALREADY collapses the hot
    # key to one partial row per mapper, so plain should match or beat
    # salted (which pays a second shuffle stage) — the curves quantify
    # that salting is a targeted tool for aggregates without map-side
    # combine, not a blanket default (operators/skew.py docstring).
    from food_panda_etl_spark.operators.skew import salted_count_sum

    curves["skew_agg_plain"] = {}
    curves["skew_agg_salted"] = {}
    sk_sizes = [4_000_000, 16_000_000] + ([] if quick else [64_000_000])
    for n in sk_sizes:
        sdf = spark.range(n).select(
            F.when(F.col("id") % 2 == 0, F.lit(0))
            .otherwise(F.pmod(F.xxhash64("id"), F.lit(10_000)))
            .alias("key"),
            (F.col("id") % 1000).cast("double").alias("value"),
        )
        curves["skew_agg_plain"][n] = timed(
            lambda: sdf.groupBy("key")
            .agg(
                F.count("*").alias("cnt"),
                F.sum(F.col("value").cast("decimal(18,2)"))
                .cast("double")
                .alias("sum_value"),
            )
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        curves["skew_agg_salted"][n] = timed(
            lambda: salted_count_sum(sdf, ["key"], "value", salt=16)
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
    # Retrieval (r5): chunking is a single narrow projection — linear in
    # corpus tokens by construction (no shuffle to go super-linear); BM25
    # is two fact-wide hash aggs + a vocabulary join — ~linear in tokens
    # with a vocab-sized second term. Measured to pin both claims.
    from food_panda_etl_spark.operators.retrieval import bm25_topk, chunk_sliding

    curves["chunk"] = {}
    curves["bm25"] = {}
    rq = spark.createDataFrame(
        [(0, "w1"), (0, "w2"), (1, "w3"), (1, "w4"), (2, "w5")],
        "query_id int, term string",
    )
    # codegen warmup for both shapes — without it the first point carries
    # the JIT cost and the fitted exponent goes negative on a sub-second op
    chunk_sliding(doc_base.limit(200), "doc_id", "text").count()
    bm25_topk(doc_base.limit(200), rq).count()
    rt_sizes = [20_000, 80_000] + ([] if quick else [320_000])
    for n in rt_sizes:
        d = synth_documents(spark, n, doc_base).cache()
        d.count()
        curves["chunk"][n] = timed(
            lambda: chunk_sliding(d, "doc_id", "text")
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        curves["bm25"][n] = timed(lambda: bm25_topk(d, rq).count())
        d.unpersist()

    # Substring dedup (r6): positioned-shingle buckets + extent merge.
    # 10% of docs carry one of 8 shared 16-token passages, so duplicated
    # bucket mass grows ∝ N (rate-proportional), never with the pair
    # count — the claim is near-linear wall time, unlike a pairwise
    # passage join which would go quadratic in the passage cohort.
    from food_panda_etl_spark.operators.dedup import duplicated_substring_spans

    passage = F.concat_ws(
        " ",
        *[
            F.concat(
                F.lit("p"),
                F.pmod(F.xxhash64((F.col("doc_id") % 8) * 16 + i), F.lit(97)).cast(
                    "string"
                ),
            )
            for i in range(16)
        ],
    )
    def docs_with_passages(n: int):
        return synth_documents(spark, n, None).withColumn(
            "text",
            F.when(
                F.col("doc_id") % 10 == 0,
                F.concat_ws(" ", F.col("text"), passage),
            ).otherwise(F.col("text")),
        )

    duplicated_substring_spans(docs_with_passages(500), n=8).count()  # warmup
    curves["substring_spans"] = {}
    ss_sizes = [20_000, 80_000] + ([] if quick else [320_000])
    for n in ss_sizes:
        d = docs_with_passages(n).cache()
        d.count()
        curves["substring_spans"][n] = timed(
            lambda: duplicated_substring_spans(d, "doc_id", "text", n=8)
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        d.unpersist()

    # DSIR (r6): hashed-bigram importance weighting should be LINEAR in
    # the corpus — the only fact-sized work is the bigram projection and
    # its collapse to per-(doc, bucket) counts; the count tables are
    # bucket-bounded and the totals are a 1-row broadcast. Target = the
    # deterministic doc_id%3==0 third of the synthetic corpus.
    from food_panda_etl_spark.operators.dsir import dsir_weights

    curves["dsir"] = {}
    dsir_sizes = [20_000, 80_000] + ([] if quick or r5_only else [320_000])
    if r5_only:
        dsir_sizes = []
    for n in dsir_sizes:
        d = synth_documents(spark, n, None).cache()
        d.count()
        curves["dsir"][n] = timed(
            lambda: dsir_weights(d, F.col("doc_id") % 3 == 0)
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        d.unpersist()

    # PageRank (r6): per round one keyed equi-join pair + one hash agg
    # — expected linear in |edges| at fixed rounds. Synthetic digraph:
    # 4 hash-derived out-edges per node.
    from food_panda_etl_spark.operators.pagerank import pagerank

    curves["pagerank"] = {}
    pr_sizes = [20_000, 80_000] + ([] if quick or r5_only else [320_000])
    if r5_only:
        pr_sizes = []
    for n in pr_sizes:
        nodes = spark.range(n).select(F.col("id"))
        edges = (
            spark.range(n)
            .select(
                F.col("id").alias("src"),
                F.explode(
                    F.array(*[
                        F.pmod(F.xxhash64(F.col("id") * 4 + j), F.lit(n))
                        for j in range(4)
                    ])
                ).alias("dst"),
            )
            .cache()
        )
        edges.count()
        curves["pagerank"][n] = timed(
            lambda: pagerank(nodes, edges, n_iter=3)
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        edges.unpersist()

    # PMI (r6): pair generation is a narrow projection ×window, then
    # two hash aggs + vocabulary joins — expected near-linear.
    from food_panda_etl_spark.operators.pmi import pmi_pairs

    curves["pmi"] = {}
    for n in pr_sizes:
        d = synth_documents(spark, n, None).cache()
        d.count()
        curves["pmi"][n] = timed(
            lambda: pmi_pairs(d, window=3, min_count=5, k=50)
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        d.unpersist()

    # Label propagation (r7 build-ahead): per round one keyed equi-join
    # + one (dst, label) hash agg + a per-node argmax — expected linear
    # in |edges| at fixed rounds (the PageRank cost shape plus the
    # WindowGroupLimit-able argmax). Same synthetic digraph as pagerank;
    # 4 seed labels.
    from food_panda_etl_spark.operators.labelprop import label_propagation

    curves["labelprop"] = {}
    for n in pr_sizes:
        nodes = spark.range(n).select(
            F.col("id"), (F.col("id") % 4).alias("label")
        )
        edges = (
            spark.range(n)
            .select(
                F.col("id").alias("src"),
                F.explode(
                    F.array(*[
                        F.pmod(F.xxhash64(F.col("id") * 4 + j), F.lit(n))
                        for j in range(4)
                    ])
                ).alias("dst"),
            )
            .cache()
        )
        edges.count()
        curves["labelprop"][n] = timed(
            lambda: label_propagation(nodes, edges, n_iter=3)
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        edges.unpersist()

    # Count-min sketch (r7 build-ahead): ONE depth-way explode + ONE
    # (d, b) hash agg — expected linear in rows with a width·depth-
    # bounded output no matter the key cardinality (the point of CMS).
    from food_panda_etl_spark.operators.cms import cms_estimate, cms_sketch

    curves["cms"] = {}
    cms_sizes = pr_sizes + ([1_280_000] if pr_sizes else [])
    for n in cms_sizes:
        # pmod, not % — Spark % keeps the dividend sign, which would
        # double the documented 50k-key cardinality on xxhash64's
        # negative half
        keys = spark.range(n).select(
            F.pmod(F.xxhash64(F.col("id")), F.lit(50021)).alias("k")
        ).cache()
        keys.count()
        probes = spark.range(100).select(F.col("id").alias("k"))
        curves["cms"][n] = timed(
            lambda: cms_estimate(
                cms_sketch(keys, "k", width=1024, depth=4),
                probes, "k", width=1024, depth=4,
            ).write.format("noop").mode("overwrite").save()
        )
        keys.unpersist()

    # Sessionize + group heavy hitters (r7 build-ahead): sessionize is
    # one per-user window pass (expected linear — per-user partitions,
    # bounded groups); group-MG is one mapInPandas summary pass + a
    # (group, value) semi-join recount (expected linear, state bounded
    # by groups×k per partition).
    from food_panda_etl_spark.operators.heavy_group import (
        heavy_hitters_by_group,
    )
    from food_panda_etl_spark.operators.sessionize import sessionize

    curves["sessionize"] = {}
    curves["group_heavy"] = {}
    for n in pr_sizes:
        ev = (
            spark.range(n)
            .select(
                F.col("id").alias("event_id"),
                F.pmod(F.xxhash64(F.col("id")), F.lit(max(1, n // 20))).alias(
                    "user_id"
                ),
                F.timestamp_micros(
                    F.lit(1_700_000_000_000_000)
                    + F.pmod(F.xxhash64(F.col("id") + 7), F.lit(86_400_000_000))
                ).alias("ts"),
                F.concat(
                    F.lit("t"),
                    F.pmod(F.xxhash64(F.col("id") + 13), F.lit(5000)).cast(
                        "string"
                    ),
                ).alias("token"),
            )
            .cache()
        )
        ev.count()
        curves["sessionize"][n] = timed(
            lambda: sessionize(ev, gap_minutes=30)
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        curves["group_heavy"][n] = timed(
            lambda: heavy_hitters_by_group(
                ev.select(
                    F.pmod(F.col("user_id"), F.lit(4)).alias("grp"), F.col("token")
                ),
                "grp",
                "token",
                fraction=0.01,
            )
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        ev.unpersist()

    curves.update(r9_curves(spark, pr_sizes))

    # BPE (r6): training cost = ONE linear corpus histogram + rounds ×
    # O(vocab). With the synth vocab FIXED at 5000 words, growing the
    # corpus 4× should grow bpe_train far slower than 4× (only the
    # histogram term scales; the per-round pair aggs run on the same
    # 5000-row vocabulary). The encode point times the full train→encode
    # round trip (bpe_encode_counts refits); its marginal cost over
    # bpe_train at the same n is the encode itself (explode + broadcast
    # vocab join + hash agg), expected near-linear in the corpus.
    from food_panda_etl_spark.operators.bpe import bpe_encode_counts, bpe_train

    curves["bpe_train"] = {}
    curves["bpe_encode"] = {}
    bpe_sizes = [20_000, 80_000] + ([] if quick or r5_only else [320_000])
    if r5_only:
        bpe_sizes = []
    else:
        bpe_train(synth_documents(spark, 500, None), "text", n_merges=2).count()
    for n in bpe_sizes:
        d = synth_documents(spark, n, None).cache()
        d.count()
        curves["bpe_train"][n] = timed(
            lambda: bpe_train(d, "text", n_merges=4).count()
        )
        curves["bpe_encode"][n] = timed(
            lambda: bpe_encode_counts(d, "text", n_merges=4)
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        d.unpersist()

    out["curves"] = curves

    # fitted exponents over the largest consecutive pair (asymptotic end)
    out["exponents"] = fit_exponents(curves)

    # θ-crossover at fixed N (16k full / 2k quick): banded vs triangle.
    # Triangle cost is θ-independent (the threshold only filters the
    # scored output), so it is measured once and compared against banded
    # at each θ; banded's cost falls as θ rises (wider bands prune more).
    if not r5_only:
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
