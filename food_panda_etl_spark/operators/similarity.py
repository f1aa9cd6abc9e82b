"""Similarity search over embedding columns (SURVEY.md §2.10).

Vectors are ArrayType(FloatType) columns; all math happens in JVM-side
higher-order functions (zip_with/aggregate) widened to double in a fixed
left-to-right fold — deterministic across engines and parallelism (the
fold is per-row, not a shuffle aggregate).

Scale path: brute-force top-k is O(|Q|·|N|) — fine when Q is small and
broadcast; for all-pairs/kNN at corpus scale use `lsh_bucket_topk`
(random-hyperplane signs → band buckets → in-bucket brute force), the
classic approximate-NN trade.
"""

from __future__ import annotations

import pandas as pd  # module level: pandas_udf type hints resolve via globals

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from food_panda_etl_spark.localrel import values_df
from pyspark.sql.window import Window


def dot(a, b) -> Column:
    """Deterministic double-precision dot product of two float arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm_sq(a) -> Column:
    return F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )



def cosine(a, b) -> Column:
    return dot(a, b) / (F.sqrt(l2_norm_sq(a)) * F.sqrt(l2_norm_sq(b)))


def _infer_dim(df: DataFrame, vec_col: str) -> int:
    """Read the embedding dimensionality from the data (one 1-row job).
    Hyperplanes MUST match the vector length: `zip_with` null-pads the
    shorter side, a null product nulls the whole fold, and every sign bit
    silently becomes 0 — all vectors land in one bucket and the 'LSH'
    join degenerates into a full cross product."""
    row = df.select(F.size(F.col(vec_col)).alias("d")).first()
    if row is None or row["d"] is None or row["d"] <= 0:
        raise ValueError(f"cannot infer vector dim from column {vec_col!r}")
    return int(row["d"])


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "qid",
    qvec_col: str = "qe",
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k: broadcast the (small) query set against the
    corpus, score per pair, rank per query. Ties broken by neighbor id.
    The corpus side is repartitioned first — a single-split parquet corpus
    would otherwise score N·|Q| pairs on one task."""
    par = vectors.sparkSession.sparkContext.defaultParallelism
    # Norms are per-row facts — compute them once per corpus/query row
    # BEFORE the pair fan-out, not inside the O(|Q|·|N|) scoring (which
    # would fold every array three times per pair instead of once).
    corpus = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__nv"),
        F.sqrt(l2_norm_sq(F.col(vec_col))).alias("__nn"),
    ).repartition(par, "neighbor_id")
    qs = queries.select(
        F.col(qid_col).alias(qid_col),
        F.col(qvec_col).alias("__qv"),
        F.sqrt(l2_norm_sq(F.col(qvec_col))).alias("__qn"),
    )
    pairs = corpus.join(F.broadcast(qs), F.col("neighbor_id") != F.col(qid_col))
    scored = pairs.select(
        qid_col,
        "neighbor_id",
        (dot(F.col("__nv"), F.col("__qv")) / (F.col("__nn") * F.col("__qn"))).alias(
            "score"
        ),
    )
    w = Window.partitionBy(qid_col).orderBy(F.col("score").desc(), F.col("neighbor_id"))
    return scored.select(
        qid_col, "neighbor_id", "score", F.row_number().over(w).alias("rn")
    ).filter(F.col("rn") <= k)


def rhp_signature(vec_col, planes: list[list[float]]) -> Column:
    """Random-hyperplane sign bits packed into a long — the LSH family for
    cosine similarity (sign(v·p) per plane)."""
    bits = [
        F.when(
            F.aggregate(
                F.zip_with(
                    vec_col,
                    F.array(*[F.lit(float(x)) for x in p]),
                    lambda a, b: a.cast("double") * b,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            > 0,
            F.shiftleft(F.lit(1).cast("long"), i),
        ).otherwise(F.lit(0).cast("long"))
        for i, p in enumerate(planes)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out.bitwiseOR(b)
    return out


def lsh_bucket_topk(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "qid",
    qvec_col: str = "qe",
    k: int = 10,
    num_planes: int = 12,
    bands: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k: candidates = pairs agreeing on at least
    one band of random-hyperplane sign bits; exact cosine re-rank inside
    candidates. Recall grows with bands; cost with bucket size. The join is
    a plain equi-join on (band, band_bits) — shuffle-partitioned, AQE-skew
    safe, no cross product anywhere.

    Corpus signing runs through ``_band_values_arrow`` (ONE numpy matmul
    per Arrow batch) — the r5 rework: the per-plane ``zip_with`` folds
    were 12 interpreted dim-length folds per corpus row and dominated
    `q_ann_recall`'s wall time (~6.4 s of the 50k-row sf0.1 corpus;
    sub-second as a matmul). Sign-boundary rounding may differ from a
    sequential fold for near-zero dots — irrelevant to the contract:
    signatures only GENERATE candidates, the re-rank rescores with the
    exact fixed-order fold (same rationale as the banded near-dup path)."""
    import random

    if num_planes % bands:
        raise ValueError("num_planes must be divisible by bands")
    if dim is None:
        dim = _infer_dim(vectors, vec_col)
    rng = random.Random(seed)
    planes = [[rng.gauss(0, 1) for _ in range(dim)] for _ in range(num_planes)]
    band_vals = _band_values_arrow(planes, bands)

    def banded(df, vcol, idcol, out_id):
        return df.select(
            F.col(idcol).alias(out_id),
            F.posexplode(band_vals(F.col(vcol))).alias("band", "bb"),
        )

    # Candidate dedup carries IDS ONLY — the same shuffle discipline
    # lsh_neardup_pairs documents (floats through a distinct multiplied
    # shuffle bytes by 2·dim); vectors re-attach after the dedup via a
    # narrow corpus join + the broadcast-sized query side.
    vb = banded(vectors, vec_col, id_col, "neighbor_id")
    qb = banded(queries, qvec_col, qid_col, "qid")
    cand_ids = (
        vb.join(qb, ["band", "bb"])
        .filter(F.col("neighbor_id") != F.col("qid"))
        .select("qid", "neighbor_id")
        .distinct()
    )
    corpus = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("neighbor_id_vec"),
        F.sqrt(l2_norm_sq(F.col(vec_col))).alias("neighbor_id_norm"),
    )
    qs = queries.select(
        F.col(qid_col).alias("qid"),
        F.col(qvec_col).alias("qid_vec"),
        F.sqrt(l2_norm_sq(F.col(qvec_col))).alias("qid_norm"),
    )
    cand = cand_ids.join(corpus, "neighbor_id").join(F.broadcast(qs), "qid")
    scored = cand.select(
        "qid",
        "neighbor_id",
        (
            dot(F.col("neighbor_id_vec"), F.col("qid_vec"))
            / (F.col("neighbor_id_norm") * F.col("qid_norm"))
        ).alias("score"),
    )
    w = Window.partitionBy("qid").orderBy(F.col("score").desc(), F.col("neighbor_id"))
    return scored.select(
        "qid", "neighbor_id", "score", F.row_number().over(w).alias("rn")
    ).filter(F.col("rn") <= k)


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "qid",
    qvec_col: str = "qe",
    k: int = 10,
    ncells: int = 16,
    nprobe: int = 4,
    refine_iters: int = 0,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: partition the corpus into
    `ncells` Voronoi cells around centroid vectors, probe only the
    `nprobe` cells nearest each query, exact-rerank inside the probed
    cells. The other classic ANN scale path next to hyperplane LSH
    (`lsh_bucket_topk`): assignment is one broadcast N×C scoring pass
    (C = ncells, tiny), search cost drops to ~nprobe/ncells of brute
    force, and the probed join is a plain equi-join on cell id.

    Centroids are a deterministic sample — the ncells corpus vectors with
    the smallest xxhash64(id) (seedless, data-derived, stable across
    runs/parallelism). ``refine_iters > 0`` runs that many Lloyd rounds
    on the sample (`operators/kmeans.py::lloyd_refine` — per round one
    projection-shaped assignment + one KB-sized aggregate exchange),
    tightening the Voronoi cells the way a production index build would;
    the default stays 0 so the declared `q_ivf_topk` path is unchanged.
    """
    cent_rows = (
        vectors.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec"))
        .orderBy(F.xxhash64(F.col("cid")), F.col("cid"))
        .limit(ncells)
        .collect()
    )
    cent_lists = [list(map(float, r["cvec"])) for r in cent_rows]
    if refine_iters > 0:
        from food_panda_etl_spark.operators.kmeans import lloyd_refine

        cent_lists = lloyd_refine(
            vectors.select(F.col(vec_col)), cent_lists, refine_iters, vec_col
        )
    spark = vectors.sparkSession
    cent = values_df(
        spark,
        [(i, c) for i, c in enumerate(cent_lists)],
        "cell INT, cvec ARRAY<DOUBLE>",
    ).select("cell", "cvec", F.sqrt(l2_norm_sq(F.col("cvec"))).alias("cnorm"))

    def assign(df, idc, vc, out_id, probes):
        """Top-`probes` nearest cells per vector via broadcast scoring."""
        scored = df.select(
            F.col(idc).alias(out_id),
            F.col(vc).alias(f"{out_id}_vec"),
            F.sqrt(l2_norm_sq(F.col(vc))).alias(f"{out_id}_norm"),
        ).crossJoin(F.broadcast(cent))
        # cosine argmax per vector: the vector's own norm is constant
        # across cells, so dividing by the centroid norm alone suffices
        scored = scored.withColumn(
            "__cscore", dot(F.col(f"{out_id}_vec"), F.col("cvec")) / F.col("cnorm")
        )
        w = Window.partitionBy(out_id).orderBy(F.col("__cscore").desc(), F.col("cell"))
        return (
            scored.withColumn("__crn", F.row_number().over(w))
            .filter(F.col("__crn") <= probes)
            .select(out_id, f"{out_id}_vec", f"{out_id}_norm", "cell")
        )

    corpus_cells = assign(vectors, id_col, vec_col, "neighbor_id", 1)
    query_cells = assign(queries, qid_col, qvec_col, "qid", nprobe)
    cand = corpus_cells.join(query_cells, "cell").filter(
        F.col("neighbor_id") != F.col("qid")
    )
    # no distinct needed: each corpus vector lives in exactly one cell
    # (probes=1), so a (qid, neighbor) pair can arise from at most one
    # probed cell
    scored = cand.select(
        "qid",
        "neighbor_id",
        (
            dot(F.col("neighbor_id_vec"), F.col("qid_vec"))
            / (F.col("neighbor_id_norm") * F.col("qid_norm"))
        ).alias("score"),
    )
    w = Window.partitionBy("qid").orderBy(F.col("score").desc(), F.col("neighbor_id"))
    return scored.select(
        "qid", "neighbor_id", "score", F.row_number().over(w).alias("rn")
    ).filter(F.col("rn") <= k)


def cosine_neardup_pairs(
    vectors: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact embedding-cosine near-dup pairs: all (a, b), a < b, with
    cosine(a, b) >= threshold.

    This is the O(N²) exact baseline (a BNLJ with the smaller side
    broadcast) — the verification standard the approximate paths are
    measured against. At corpus scale run `lsh_bucket_topk`-style
    hyperplane bucketing first and verify only in-bucket candidates; the
    scoring expression is shared so approximate and exact agree wherever
    both produce a pair."""
    # The corpus often arrives as one parquet split at test scale; the
    # streamed side of the BNLJ must be repartitioned or the O(N²) scoring
    # runs on a single task regardless of cluster width.
    par = vectors.sparkSession.sparkContext.defaultParallelism
    # Norms once per row, not per pair: inside the N²/2 scoring the old
    # cosine() form folded each 64-float array 3× per pair; hoisting the
    # sqrt(norm²) to the row level leaves one zip_with fold + one multiply
    # per pair (~3× less array work), bit-identical output.
    a = vectors.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("vec_a"),
        F.sqrt(l2_norm_sq(F.col(vec_col))).alias("norm_a"),
    ).repartition(par, "id_a")
    b = vectors.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vec_b"),
        F.sqrt(l2_norm_sq(F.col(vec_col))).alias("norm_b"),
    )
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            (
                dot(F.col("vec_a"), F.col("vec_b"))
                / (F.col("norm_a") * F.col("norm_b"))
            ).alias("score"),
        )
        .filter(F.col("score") >= threshold)
    )


def auto_band_params(threshold: float, target_miss: float = 1e-5) -> tuple[int, int]:
    """(num_planes, bands) for sign-LSH candidate generation sized so a
    pair EXACTLY AT the threshold is missed with probability <= target_miss.

    p(bit agrees) = 1 - arccos(theta)/pi; a band of r bits collides with
    p^r; miss = (1 - p^r)^L. Low thresholds force r small (r=2) — pruning
    is weak there because random pairs collide at 0.25/band, which is the
    honest economics of sign-LSH in the low-similarity regime; high
    thresholds earn wide bands (r=8 → 1/256 random collisions/band).
    Bands round up to a multiple of 4 for even chunking."""
    import math

    # Clamp p strictly below 1: threshold=1.0 gives p=1 and log(1-p^r)
    # would be log(0) (math domain error). At the clamp, l resolves to 1
    # band — the right answer for "exact duplicates only".
    p = min(1.0 - math.acos(min(max(threshold, -1.0), 1.0)) / math.pi, 1.0 - 1e-12)
    r = 2 if threshold < 0.6 else (4 if threshold < 0.8 else 8)
    l = math.ceil(math.log(target_miss) / math.log(1.0 - p**r))
    l = ((l + 3) // 4) * 4
    return r * l, l


def _band_values_arrow(planes: list[list[float]], bands: int):
    """Per-band packed sign-LSH values as ONE Arrow ``pandas_udf`` doing a
    numpy matmul — ``(batch × dim) @ (dim × planes)`` → sign bits →
    ``(batch × bands)`` packed longs.

    Replaces the earlier per-plane ``zip_with`` fold expressions: those
    unroll to planes·dim multiply-adds of whole-stage codegen PER ROW,
    which collapses at high thresholds (θ=0.8 ⇒ 544 planes × 64 dims ⇒
    ~35k expression nodes — measured 25 s for N=2 000 where the matmul
    takes milliseconds; same lesson as the SimHash Arrow rewrite, commit
    d0e9228). Sign boundaries may round differently than a sequential
    fold for near-zero dots — irrelevant to the contract: signatures only
    GENERATE candidates, the verify step rescores exactly, and band
    sizing already budgets per-pair miss probability."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    mat = np.asarray(planes, dtype=np.float64)  # (planes, dim)
    r = len(planes) // bands
    weights = (1 << np.arange(r, dtype=np.int64))

    @pandas_udf("array<long>")
    def band_values(v: pd.Series) -> pd.Series:
        if not len(v):
            return pd.Series([], dtype=object)
        x = np.asarray(v.tolist(), dtype=np.float64)  # (n, dim)
        bits = (x @ mat.T) > 0  # (n, planes); plane p = band p//r, bit p%r
        packed = bits.reshape(len(x), bands, r).astype(np.int64) @ weights
        return pd.Series(list(packed))

    return band_values


def triangle_neardup_pairs(
    vectors: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    blocks: int | None = None,
) -> DataFrame:
    """EXACT all-pairs cosine threshold join expressed as an equi-join —
    the triangle block-partitioning scheme: rows hash into ``blocks``
    blocks; every unordered block pair (i, j) is one join key; each row
    replicates to the keys of the block pairs it belongs to; pairs verify
    inside their bucket. Guaranteed 100% recall (it enumerates every
    pair exactly once), no BroadcastNestedLoopJoin / CartesianProduct
    node, and the quadratic verify work spreads evenly over B(B+1)/2
    reducers — the standard way to do exact all-pairs at cluster scale
    when no candidate filter can prune (cf. the theta-join partitioning
    of Okcan & Riedewald, SIGMOD'11).

    A same-block pair would co-occur in every bucket its block touches,
    so those pairs are kept only in the diagonal bucket (i, i)."""
    spark = vectors.sparkSession
    par = spark.sparkContext.defaultParallelism
    if blocks is None:
        # enough block pairs to fill the cluster: B(B+1)/2 >= parallelism
        blocks = max(2, int((2 * par) ** 0.5) + 1)
    src = vectors.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        F.sqrt(l2_norm_sq(F.col(vec_col))).alias("norm"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(blocks)).alias("blk"),
    )
    # Asymmetric replication: the A side represents its block as the ROW
    # of the triangle (keys (blk, j), j >= blk), the B side as the COLUMN
    # (keys (i, blk), i <= blk). Bucket (i, j) then holds exactly block i
    # on A and block j on B, so every unordered cross-block pair matches
    # exactly once (vs the symmetric scheme's 4x duplication) and
    # same-block pairs appear only in the diagonal bucket, deduped by
    # id ordering. Scoring is symmetric (element-wise product + same fold
    # order), so output ids canonicalize with least/greatest.
    keys_a = F.filter(
        F.array(
            *[
                F.struct(F.col("blk").alias("ki"), F.lit(j).cast("bigint").alias("kj"))
                for j in range(blocks)
            ]
        ),
        lambda s: s["kj"] >= F.col("blk"),
    )
    keys_b = F.filter(
        F.array(
            *[
                F.struct(F.lit(i).cast("bigint").alias("ki"), F.col("blk").alias("kj"))
                for i in range(blocks)
            ]
        ),
        lambda s: s["ki"] <= F.col("blk"),
    )
    # Pin the join partitioning with an explicit numbered repartition: the
    # shuffle BYTES here are tiny (ids + one vector per row) but the join
    # OUTPUT is the O(N²/B) per-bucket verify work — AQE's size-based
    # coalescing would fold these partitions into one task and serialize
    # the whole quadratic verify on a single core (observed: 20s vs 3s).
    # AQE never coalesces a user-numbered repartition.
    a = src.select(
        F.col("id").alias("id_a"), F.col("vec").alias("vec_a"),
        F.col("norm").alias("norm_a"), F.col("blk").alias("blk_a"),
        F.explode(keys_a).alias("k"),
    ).repartition(par, "k")
    b = src.select(
        F.col("id").alias("id_b"), F.col("vec").alias("vec_b"),
        F.col("norm").alias("norm_b"), F.col("blk").alias("blk_b"),
        F.explode(keys_b).alias("k"),
    ).repartition(par, "k")
    return (
        a.join(b, "k")
        # cross-block pairs match exactly once; diagonal dedup + no self
        .filter((F.col("blk_a") != F.col("blk_b")) | (F.col("id_a") < F.col("id_b")))
        .select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
            (
                dot(F.col("vec_a"), F.col("vec_b"))
                / (F.col("norm_a") * F.col("norm_b"))
            ).alias("score"),
        )
        .filter(F.col("score") >= threshold)
    )


def embed_neardup_pairs(
    vectors: DataFrame,
    threshold: float,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exact_max_rows: int = 256,
    target_miss: float = 1e-5,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-dup pairs — the DECLARED path, routed by
    regime:

    - ``threshold >= 0.6``: banded sign-LSH candidates + exact cosine
      verify, band parameters derived from the threshold
      (:func:`auto_band_params`) so recall at the boundary is
      >= 1 - target_miss per pair. This is where sign-LSH prunes: random
      pairs collide per band at 2^-r with r in {4, 8}.
    - ``threshold < 0.6``: the exact triangle block equi-join
      (:func:`triangle_neardup_pairs`). Measured honestly, sign-LSH CANNOT
      prune here — recall at θ=0.4 forces 2-bit bands, random pairs then
      collide somewhere with p≈1, and the candidate multiset (Σ per-band
      collisions ≈ 6×N²/2 rows at the fixture) exceeds the all-pairs set
      the triangle join enumerates exactly once. The triangle path is both
      faster and recall-GUARANTEED (structurally, not probabilistically —
      what an oracled query should stand on).

    Falls back to the small-corpus exact operator under ``exact_max_rows``
    (one count job; a broadcast BNLJ is fine when N is tiny).

    All paths share the (a < b, score >= threshold) contract and the same
    fixed-order double scoring as :func:`cosine_neardup_pairs`, so every
    emitted pair carries identical score bits and the outputs are
    hash-identical wherever recall is total. No O(N^2) JOIN NODE in any
    branch: candidates come from equi-joins (band bits / block pairs)."""
    if vectors.count() <= exact_max_rows:
        return cosine_neardup_pairs(vectors, threshold, id_col, vec_col)
    if threshold < 0.6:
        return triangle_neardup_pairs(vectors, threshold, id_col, vec_col)
    return banded_neardup_pairs(
        vectors, threshold, dim, id_col, vec_col, target_miss, seed
    )


def banded_neardup_pairs(
    vectors: DataFrame,
    threshold: float,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    target_miss: float = 1e-5,
    seed: int = 42,
) -> DataFrame:
    """The banded sign-LSH + exact-verify branch of
    :func:`embed_neardup_pairs`, callable at ANY threshold so the
    θ-crossover against :func:`triangle_neardup_pairs` is measurable
    (SCALE.md records it). Below θ≈0.6 this is deliberately NOT the
    routed path: band economics degrade (2-bit bands, random pairs
    collide per band at 0.25) and the candidate multiset approaches or
    exceeds all-pairs."""
    import random

    if dim is None:
        dim = _infer_dim(vectors, vec_col)
    num_planes, bands = auto_band_params(threshold, target_miss)
    rng = random.Random(seed)
    planes = [[rng.gauss(0, 1) for _ in range(dim)] for _ in range(num_planes)]

    par = vectors.sparkSession.sparkContext.defaultParallelism
    src = vectors.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec")
    ).repartition(par, "id")
    r = num_planes // bands
    if num_planes <= 64:
        # Fast path: whole signature packs into ONE long, and candidate
        # dedup needs NO distinct — a colliding pair is emitted only by
        # its FIRST colliding band, detected with a codegen'd CASE chain
        # over the XOR of the two signatures (band k collides iff chunk k
        # of the XOR is zero). The duplicate-heavy join output is filtered
        # inside the join stage and never hits a second exchange — at
        # low thresholds (bands of 2 bits, ~every pair colliding
        # somewhere) the distinct was the single costliest stage.
        mask = (1 << r) - 1
        # Band values come from ONE Arrow matmul (_band_values_arrow);
        # the packed signature derives from the band VALUES by shifting —
        # JVM-side, `bands` ops per row, not planes·dim folds.
        with_bands = src.select(
            "id", _band_values_arrow(planes, bands)(F.col("vec")).alias("bv")
        )
        sig = F.lit(0).cast("long")
        for bi in range(bands):
            sig = sig.bitwiseOR(
                F.shiftleft(F.col("bv")[bi], bi * r)
            )
        banded = with_bands.select(
            "id", sig.alias("sig"), F.posexplode("bv").alias("band", "bb")
        )
        a = banded.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a"), "band", "bb")
        b = banded.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b"), "band", "bb")
        x = F.col("sig_a").bitwiseXOR(F.col("sig_b"))
        first_match = F.lit(None).cast("int")
        chain = None
        for bi in range(bands):
            cond = (
                F.shiftright(x, bi * r).bitwiseAND(F.lit(mask).cast("long")) == 0
            )
            chain = F.when(cond, bi) if chain is None else chain.when(cond, bi)
        first_match = chain
        cand = (
            a.join(b, ["band", "bb"])
            .filter(F.col("id_a") < F.col("id_b"))
            .filter(first_match == F.col("band"))
            .select("id_a", "id_b")
        )
    else:
        # Wide high-threshold configs (r=8, many bands) exceed one long:
        # per-band packed values + ids-only distinct.
        banded = src.select(
            "id",
            F.posexplode(
                _band_values_arrow(planes, bands)(F.col("vec"))
            ).alias("band", "bb"),
        )
        a = banded.select(F.col("id").alias("id_a"), "band", "bb")
        b = banded.select(F.col("id").alias("id_b"), "band", "bb")
        cand = (
            a.join(b, ["band", "bb"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        )
    va = src.select(
        F.col("id").alias("id_a"),
        F.col("vec").alias("vec_a"),
        F.sqrt(l2_norm_sq(F.col("vec"))).alias("norm_a"),
    )
    vb = src.select(
        F.col("id").alias("id_b"),
        F.col("vec").alias("vec_b"),
        F.sqrt(l2_norm_sq(F.col("vec"))).alias("norm_b"),
    )
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                dot(F.col("vec_a"), F.col("vec_b"))
                / (F.col("norm_a") * F.col("norm_b"))
            ).alias("score"),
        )
        .filter(F.col("score") >= threshold)
    )


def lsh_neardup_pairs(
    vectors: DataFrame,
    threshold: float,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 12,
    bands: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-dup pairs at scale: random-hyperplane band
    buckets generate candidates (equi-join, shuffle-partitioned), exact
    cosine verifies. Same (a < b, score >= threshold) contract as
    `cosine_neardup_pairs` minus the O(N²) — recall is probabilistic in
    the bands (a pair colliding in no band is missed; tests measure
    recall against the exact operator).

    Shuffle discipline: the bucket join and dedup carry ONLY (id_a, id_b)
    — vectors re-attach by two narrow hash joins after the pair set is
    deduped. Carrying the float arrays through the candidate distinct
    multiplies shuffle bytes by 2·dim and dominated runtime (117s → ~4s
    at sf0.1 on local[32]).

    Parameter note: per-band bucket width is r = num_planes/bands sign
    bits; collision probability per band is (1 − θ/π)^r. Low thresholds
    (θ large) force small r for recall, which weakens pruning — LSH pays
    off at high similarity thresholds (≥0.85 with r 12-16); the defaults
    here are tuned to the synthetic corpus's low-similarity regime."""
    import random

    if num_planes % bands:
        raise ValueError("num_planes must be divisible by bands")
    if dim is None:
        dim = _infer_dim(vectors, vec_col)
    r = num_planes // bands
    rng = random.Random(seed)
    planes = [[rng.gauss(0, 1) for _ in range(dim)] for _ in range(num_planes)]
    mask = (1 << r) - 1

    sig = rhp_signature(F.col(vec_col), planes)
    banded = vectors.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.shiftright(sig, bi * r)
                        .bitwiseAND(F.lit(mask).cast("long"))
                        .alias("bb"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("s"),
    ).select("id", "s.band", "s.bb")

    a = banded.select(F.col("id").alias("id_a"), "band", "bb")
    b = banded.select(F.col("id").alias("id_b"), "band", "bb")
    cand = (
        a.join(b, ["band", "bb"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    va = vectors.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("vec_a"),
        F.sqrt(l2_norm_sq(F.col(vec_col))).alias("norm_a"),
    )
    vb = vectors.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vec_b"),
        F.sqrt(l2_norm_sq(F.col(vec_col))).alias("norm_b"),
    )
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                dot(F.col("vec_a"), F.col("vec_b"))
                / (F.col("norm_a") * F.col("norm_b"))
            ).alias("score"),
        )
        .filter(F.col("score") >= threshold)
    )


def cell_neardup_pairs(
    vectors: DataFrame,
    centroids: list[list[float]],
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    arrow_assignment: bool = False,
) -> DataFrame:
    """SemDeDup-shaped pair generation (Abbas et al., arXiv:2303.09540):
    assign every vector to its nearest k-means centroid (a pure
    projection — `operators/kmeans.py::assign_cells`, no join), then
    enumerate exact-cosine pairs WITHIN each cell only. The cell
    equi-join bounds pair generation to O(Σ |cell|²) instead of O(N²) —
    the embedding analog of the MinHash-banded candidate path: clusters
    are the candidate buckets, and semantically unrelated vectors (in
    different cells) are never scored.

    Approximation contract: a pair whose endpoints land in different
    cells is MISSED by design — that is the SemDeDup trade. The declared
    query's oracle replays the same cells, so the approximation itself is
    oracle-checked bit-for-bit.

    Scale: choose k ≈ N / target_cell_size so each cell's quadratic
    verify is a bounded task; a skewed cell can be sub-blocked with the
    `triangle_neardup_pairs` scheme inside the cell. At that k the
    literal-fold assignment's expression size explodes — pass
    ``arrow_assignment=True`` to score cells with the numpy-matmul
    variant (`assign_cells_arrow`; declared oracled queries keep the
    fold, which is bit-replayable). Scoring is the same fixed-order fold
    as every exact path (norms hoisted per row, one zip_with fold per
    pair)."""
    from food_panda_etl_spark.operators.kmeans import (
        assign_cells,
        assign_cells_arrow,
    )

    assign = assign_cells_arrow if arrow_assignment else assign_cells
    par = vectors.sparkSession.sparkContext.defaultParallelism
    # The assigned source is checkpointed lazily (r20) so the
    # interpreted k-distance assignment fold runs ONCE, not once per
    # join side.
    src = assign(vectors, centroids, vec_col=vec_col, out_col="cell").select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        F.sqrt(l2_norm_sq(F.col(vec_col))).alias("norm"),
        "cell",
    ).localCheckpoint(eager=False)
    # Explicit numbered repartition for the same reason as
    # triangle_neardup_pairs: shuffle bytes are tiny but join OUTPUT is
    # the per-cell quadratic verify — AQE must not coalesce it onto one
    # task. With k cells at most k partitions carry work; at scale k is
    # sized to the cluster, so this is the intended layout.
    a = src.select(
        F.col("id").alias("id_a"),
        F.col("vec").alias("vec_a"),
        F.col("norm").alias("norm_a"),
        "cell",
    ).repartition(par, "cell")
    b = src.select(
        F.col("id").alias("id_b"),
        F.col("vec").alias("vec_b"),
        F.col("norm").alias("norm_b"),
        "cell",
    )
    return (
        a.join(b, "cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            (
                dot(F.col("vec_a"), F.col("vec_b"))
                / (F.col("norm_a") * F.col("norm_b"))
            ).alias("score"),
        )
        .filter(F.col("score") >= threshold)
    )


def quantize_int8(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-vector symmetric int8 quantization: scale = max|x|/127,
    code_i = round(x_i/scale) ∈ [−127, 127] — the standard 4× memory
    reduction for embedding storage/ANN (float32 → int8 + one scale per
    vector; dot products then run on int8 with one final rescale).

    Pure codegen HOFs over the array column — no shuffle, no join, no
    Python: a narrow projection whose 100 TB cost is the scan plus a
    proportional write (the same shape as chunking). All-zero vectors
    quantize to all-zero codes with scale 0 (guarded — no NaN from 0/0).

    Every emitted number is engine-deterministic: max is
    order-independent, each element op is a single IEEE op on identical
    operands, and round() is half-away-from-zero in both Spark (HALF_UP
    on doubles) and DuckDB.

    Returns (id, scale, codes array<int>, sum_codes, max_err) where
    max_err = max_i |x_i − code_i·scale| is the per-vector reconstruction
    bound (≤ scale/2 by construction — asserted in tests).
    """
    x = F.col("__x")
    absmax = F.array_max(F.transform(x, lambda v: F.abs(v.cast("double"))))
    scale = absmax / F.lit(127.0)
    codes = F.when(
        scale == 0.0, F.transform(x, lambda v: F.lit(0))
    ).otherwise(
        F.transform(x, lambda v: F.round(v.cast("double") / scale).cast("int"))
    )
    staged = df.select(
        F.col(id_col), F.col(vec_col).alias("__x")
    ).select(F.col(id_col), x, scale.alias("scale"), codes.alias("codes"))
    sum_codes = F.aggregate(
        F.col("codes"), F.lit(0).cast("long"), lambda a, b: a + b.cast("long")
    )
    max_err = F.array_max(
        F.zip_with(
            x,
            F.col("codes"),
            lambda v, c: F.abs(
                v.cast("double") - (c.cast("double") * F.col("scale"))
            ),
        )
    )
    return staged.select(
        id_col,
        "scale",
        "codes",
        sum_codes.alias("sum_codes"),
        max_err.alias("max_err"),
    )
