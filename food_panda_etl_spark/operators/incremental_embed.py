"""Incremental EMBEDDING near-duplicate detection — the dense-vector
sibling of `operators/incremental_neardup.py`, completing the
incremental-refresh symmetry (exact hash: `q_incremental_dedup`;
n-gram near-dup: `incremental_neardup_pairs`; embedding cosine: THIS).
A refresh batch of vectors is checked against a standing corpus for
cosine near-duplicates without re-running any self-join family over
corpus ∪ batch.

Shape: the corpus's normalized vectors and sign-LSH band index are
MAINTAINED STATE (`build_embed_state`, computed once per corpus
version); per refresh, only the batch's band values are computed (one
Arrow matmul over batch rows — `similarity._band_values_arrow`, the
same hyperplane family on both sides by construction: planes are drawn
from the SAME seeded Gaussian stream for the same (threshold, dim,
seed, target_miss), so cross-side band values are comparable), the
candidate probe is an equi-join of batch band rows against the corpus
index on (band, bb), and the exact cosine verify first prunes the
corpus vector table to candidate ids with a broadcast semi-join
(map-only over the standing corpus — no corpus-wide exchange per
refresh). Scores are the package's fixed-order double folds
(`similarity.dot` / `l2_norm_sq`), so emitted bits are oracle-exact.

Recall: band geometry from :func:`copy_screen_band_params` — a pair
EXACTLY AT the threshold is missed with probability ≤ target_miss
(default 1e-5); pairs above it exponentially less, so the output
equals the brute-force cross-side join on the fixtures —
machine-checked, the incremental_neardup evidence pattern.

Sign-LSH economics bound the USEFUL regime more tightly than recall
does, and the cross-side shape changes the right geometry — worth
stating with numbers. A RANDOM (orthogonal) cross pair is admitted
with probability ≈ L·2^−r. `similarity.auto_band_params`' r=8
self-join geometry needs L=36 at θ=0.9 → ≈13% of the batch×corpus
product admitted — measured 208 s for a 512-row refresh at 1.28M
corpus rows, the cross product leaking through the screen. The copy
screen therefore uses 16-BIT bands (r=16, L=136 at θ=0.9 → ≈0.2%
admitted): a ~4× larger maintained index and a wider ONE-TIME state
matmul buy a per-refresh verify that tracks true-copy mass — the
maintained-state trade, paid per corpus version instead of per
refresh. This screen is the COPY / near-copy gate (θ ≥ 0.8,
enforced; the refresh-ingestion question "is this vector already in
the corpus"); for lower-threshold semantic neighbors use the IVF
path (`operators/ivf.py`, probed cells, the `q_ivf_gate` evidence
pattern) or the triangle join over corpus ∪ batch.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from food_panda_etl_spark.operators.state_geometry import (
    check_probe_geometry,
    check_state_pair,
)
from food_panda_etl_spark.operators.similarity import (
    _band_values_arrow,
    _infer_dim,
    dot,
    l2_norm_sq,
)


def copy_screen_band_params(
    threshold: float, target_miss: float = 1e-5
) -> tuple[int, int]:
    """(num_planes, bands) for the CROSS-SIDE copy screen — 16-bit
    bands, twice `auto_band_params`' widest. The batch×corpus product
    makes RANDOM-pair admission the dominant cost (a self-join near-dup
    pass amortizes it over the whole corpus; a 512-row refresh does
    not), and admission is L·2^−r: at θ=0.9, r=8 needs L=36 → ≈13%
    of the cross product admitted (measured 208 s/refresh at 1.28M
    corpus rows), while r=16 needs L=136 → ≈0.2%. The price is the
    maintained-state trade exactly: a ~4× larger band index and a
    wider one-time state matmul, paid per corpus VERSION instead of
    per refresh. Boundary miss stays ≤ target_miss by construction
    (same formula as `auto_band_params`, r=16)."""
    import math

    if threshold < 0.8:
        raise ValueError(
            "copy_screen_band_params: the copy screen is for θ ≥ 0.8 "
            f"(got {threshold}) — below that 16-bit bands need thousands "
            "of planes and sign-LSH stops pruning; use the IVF path or "
            "the triangle join over corpus ∪ batch instead"
        )
    p = min(
        1.0 - math.acos(min(max(threshold, -1.0), 1.0)) / math.pi,
        1.0 - 1e-12,
    )
    r = 16
    l = math.ceil(math.log(target_miss) / math.log(1.0 - p**r))
    l = ((l + 3) // 4) * 4
    return r * l, l


def _planes(dim: int, num_planes: int, seed: int) -> list[list[float]]:
    """The seeded Gaussian hyperplane family — ONE stream per
    (dim, num_planes, seed), drawn identically for corpus state and
    batch probe so cross-side band values are comparable."""
    rng = random.Random(seed)
    return [[rng.gauss(0, 1) for _ in range(dim)] for _ in range(num_planes)]


def _projected(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(id, vec) behind the repartition-first parallelism pattern (the
    shingle_table rationale: few input splits otherwise serialize the
    Arrow matmul onto few cores)."""
    par = df.sparkSession.sparkContext.defaultParallelism
    return df.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec")
    ).repartition(par, "id")


def build_embed_state(
    corpus: DataFrame,
    threshold: float,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    target_miss: float = 1e-5,
    seed: int = 42,
) -> tuple[DataFrame, DataFrame]:
    """(vectors, band_index) for a corpus version — the maintained
    state: ``vectors`` is (id, vec, norm) for the verify stage,
    ``band_index`` the (id, band, bb) sign-LSH rows for the candidate
    probe. A probe must use the SAME (threshold, dim, seed,
    target_miss) — the plane family is derived from them. At scale
    both persist partitioned/bucketed (vectors by id, band_index by
    (band, bb)); here they are lazy frames the caller may checkpoint."""
    if dim is None:
        dim = _infer_dim(corpus, vec_col)
    num_planes, bands = copy_screen_band_params(threshold, target_miss)
    planes = _planes(dim, num_planes, seed)
    src = _projected(corpus, id_col, vec_col)
    # the geometry rides the state as column metadata (it survives
    # select/join/checkpoint AND a parquet round-trip), so a probe
    # against state built at a different (threshold, dim, seed,
    # target_miss) fails loudly instead of silently comparing
    # incomparable band values (ADVICE r16)
    geo = {
        "threshold": float(threshold),
        "dim": int(dim),
        "seed": int(seed),
        "target_miss": float(target_miss),
    }
    vectors = src.select(
        "id", "vec", F.sqrt(l2_norm_sq(F.col("vec"))).alias("norm")
    ).withMetadata("vec", geo)
    band_index = src.select(
        "id",
        F.posexplode(_band_values_arrow(planes, bands)(F.col("vec"))).alias(
            "band", "bb"
        ),
    ).withMetadata("band", geo)
    return vectors, band_index


_GEO_KEYS = ("threshold", "dim", "seed", "target_miss")


def incremental_embed_neardup(
    corpus: DataFrame,
    batch: DataFrame,
    threshold: float = 0.9,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    target_miss: float = 1e-5,
    seed: int = 42,
    corpus_vectors: DataFrame | None = None,
    corpus_bands: DataFrame | None = None,
) -> DataFrame:
    """(``id_col``, dup_of, score double) — the (batch vector, corpus
    vector) pairs with cosine ≥ threshold: candidates from the
    cross-side band probe, exact fixed-order-double cosine verified on
    candidates only. ``id_col`` column carries the batch side,
    ``dup_of`` the corpus side.

    ``corpus_vectors``/``corpus_bands`` are the maintained state from
    :func:`build_embed_state` (same threshold/dim/seed/target_miss);
    when supplied the standing corpus is NOT rescanned. Omitted, the
    state is built here with one pass over the corpus.

    Geometry safety (ADVICE r16): state stamped by
    :func:`build_embed_state` carries its (threshold, dim, seed,
    target_miss) as column metadata and a mismatched probe raises;
    hand-built state falls back to a 1-row dim probe of the state
    itself, and a batch whose vectors differ from the state's dim
    raises instead of silently yielding incomparable band values
    (near-zero recall with no error)."""
    if (corpus_vectors is None) != (corpus_bands is None):
        raise ValueError(
            "incremental_embed_neardup: supply BOTH corpus_vectors and "
            "corpus_bands (the build_embed_state pair) or neither"
        )
    if corpus_vectors is None:
        if corpus is None:
            raise ValueError(
                "incremental_embed_neardup: need a corpus DataFrame when "
                "no prebuilt state is supplied"
            )
        if dim is None:
            dim = _infer_dim(corpus, vec_col)
    else:
        # prebuilt state: the state's geometry is the source of truth,
        # never the batch (ADVICE r16 — dim inferred from the batch
        # silently mis-probes state built at another geometry)
        geo = check_state_pair(
            "incremental_embed_neardup",
            "build_embed_state",
            _GEO_KEYS,
            ("corpus_vectors", corpus_vectors, "vec"),
            ("corpus_bands", corpus_bands, "band"),
        )
        if geo is not None:
            check_probe_geometry(
                "incremental_embed_neardup",
                {
                    "threshold": float(threshold),
                    "dim": int(dim) if dim is not None else int(geo["dim"]),
                    "seed": int(seed),
                    "target_miss": float(target_miss),
                },
                geo,
                "band values would be incomparable "
                "(rebuild the state or match the parameters)",
            )
            state_dim = int(geo["dim"])
        else:
            state_dim = _infer_dim(corpus_vectors, "vec")
            if dim is not None and dim != state_dim:
                raise ValueError(
                    f"incremental_embed_neardup: dim={dim} does not "
                    f"match the supplied state's vectors (dim="
                    f"{state_dim})"
                )
        dim = state_dim
    # batch-dim guard on BOTH branches (review r16 — the from-corpus
    # path used to die in an opaque Arrow matmul shape error instead)
    batch_dim = _infer_dim(batch, vec_col)
    if batch_dim != dim:
        raise ValueError(
            f"incremental_embed_neardup: batch vectors have dim="
            f"{batch_dim} but the corpus side is dim={dim} — the "
            "sign-LSH band values would be incomparable (near-zero "
            "recall, no error)"
        )
    # ONE plane family for corpus state and batch probe (review r16:
    # the from-corpus branch computed it separately — 2× the driver-
    # side rng.gauss work for nothing, and a drift hazard)
    num_planes, bands = copy_screen_band_params(threshold, target_miss)
    planes = _planes(dim, num_planes, seed)
    if corpus_vectors is None:
        # checkpoint the projection: vectors and band index both read
        # it, and without the pin the corpus is projected twice
        src = _projected(corpus, id_col, vec_col).localCheckpoint(
            eager=False
        )
        corpus_vectors = src.select(
            "id", "vec", F.sqrt(l2_norm_sq(F.col("vec"))).alias("norm")
        )
        corpus_bands = src.select(
            "id",
            F.posexplode(
                _band_values_arrow(planes, bands)(F.col("vec"))
            ).alias("band", "bb"),
        )
    b_src = _projected(batch, id_col, vec_col).localCheckpoint(eager=False)
    b_bands = b_src.select(
        "id",
        F.posexplode(_band_values_arrow(planes, bands)(F.col("vec"))).alias(
            "band", "bb"
        ),
    )
    bb, cb = b_bands.alias("bb"), corpus_bands.alias("cb")
    cand = (
        bb.join(
            cb,
            (F.col("bb.band") == F.col("cb.band"))
            & (F.col("bb.bb") == F.col("cb.bb")),
        )
        .select(F.col("bb.id").alias("bid"), F.col("cb.id").alias("dup_of"))
        .distinct()
        .localCheckpoint(eager=False)  # two consumers: prune + verify
    )
    # broadcast semi-join prune: the corpus vector table is scanned
    # map-only, and the verify join below moves candidate vectors only
    cand_ids = cand.select(F.col("dup_of").alias("id")).distinct()
    c_vec = corpus_vectors.join(F.broadcast(cand_ids), "id", "semi")
    bv = b_src.select(
        F.col("id").alias("bid"),
        F.col("vec").alias("vec_b"),
        F.sqrt(l2_norm_sq(F.col("vec"))).alias("norm_b"),
    )
    cv = c_vec.select(
        F.col("id").alias("dup_of"),
        F.col("vec").alias("vec_c"),
        F.col("norm").alias("norm_c"),
    )
    return (
        cand.join(bv, "bid")
        .join(cv, "dup_of")
        .select(
            F.col("bid").alias(id_col),
            "dup_of",
            (
                dot(F.col("vec_b"), F.col("vec_c"))
                / (F.col("norm_b") * F.col("norm_c"))
            ).alias("score"),
        )
        .filter(F.col("score") >= threshold)
    )
