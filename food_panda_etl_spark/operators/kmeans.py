"""Distributed k-means (Lloyd iterations) over an embedding column.

The clustering workhorse behind IVF index builds (`ivf_topk`'s centroid
refinement), clustering-based data curation, and diversity sampling.
The reference has no equivalent (its pipeline is row-at-a-time ETL,
`/root/reference/src/main.rs`); this is EXT surface mandated by the
LLM-pipeline brief.

Scale shape — the part worth copying:
- Centroids are DRIVER-SIDE literals (k·dim doubles, bounded and tiny),
  refreshed once per iteration via a k·dim-row collect. Assignment is
  therefore a PURE PROJECTION — the distance to every centroid compiles
  into the row expression; no join, no shuffle, no broadcast exchange.
- The update step is the `q_embed_centroid` reduction: posexplode → one
  hash aggregate; partial aggregation collapses each mapper to k·dim
  partial sums before the exchange, so shuffle bytes are independent of
  corpus size. ONE exchange per iteration total.
- Determinism: distances are fixed-order double folds (zip_with over the
  vector and a literal array), ties broken by cell id via lexicographic
  struct-least; centroid means quantize addends onto the 1e-9 INTEGER
  grid — round(v·1e9) as BIGINT, half-away-from-zero in both engines —
  then sum exactly. NOT a decimal cast: float32-sourced values are
  short-mantissa dyadics whose decimal expansions CAN terminate exactly
  on a ...5 at digit 10 (e.g. 0.1494140625), and Spark (HALF_UP) vs
  DuckDB (HALF_EVEN) break that decimal-cast tie differently — a real
  sf0.1 hash mismatch; round() on the identical double has identical
  tie semantics everywhere. Every iteration is bit-identical across engines
  and any partitioning, which is what lets a DuckDB oracle replay the
  same rounds and hash-match the result.
- The JVM zip_with fold is interpreted (HOFs don't codegen) — the
  deliberate price of oracle-exactness. The production variant IS
  implemented: `assign_cells_arrow` scores each Arrow batch with one
  numpy matmul (~10× the fold at small k, asymptotically required at
  SemDeDup-scale k) at the cost of summation-order float drift that
  can flip a distance tie; the declared queries keep the fold because
  bit-replayability IS the evidence.
"""

from __future__ import annotations

import pandas as pd  # module level: pandas_udf type hints resolve via globals

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dist_sq(vec_col: Column, centroid: list[float]) -> Column:
    """Fixed-order squared-L2 fold between a vector column and a literal
    centroid — identical to DuckDB's list_reduce over the same values."""
    lit = F.array(*[F.lit(float(x)) for x in centroid])
    return F.aggregate(
        F.zip_with(
            vec_col, lit, lambda x, c: (x.cast("double") - c) * (x.cast("double") - c)
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def assign_cells(
    vectors: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    out_col: str = "cell",
) -> DataFrame:
    """Nearest-centroid assignment as a projection: argmin over the k
    literal distances, ties to the smaller cell id (lexicographic least
    over (dist, cell) structs — deterministic in every engine).

    Built as ONE lambda over a k×dim literal matrix instead of k
    unrolled fold expressions (r19 optimization): the unrolled tree
    made Catalyst planning the dominant per-iteration cost of Lloyd
    rounds (the folds are interpreted either way, so tree size is pure
    overhead — measured 0.7 s → 0.4 s per assignment at sf0.01, and it
    compounds once per iteration per consumer). array_min over
    (dist, cell) structs is the same lexicographic-least tie-break as
    F.least; each element's fold reproduces `_dist_sq` bit-for-bit
    (equality property-tested in tests/test_kmeans.py)."""
    cc = F.array(*[F.array(*[F.lit(float(x)) for x in c]) for c in centroids])
    vec = F.col(vec_col)

    def _d(c):
        return F.aggregate(
            F.zip_with(
                vec, c, lambda x, cv: (x.cast("double") - cv) * (x.cast("double") - cv)
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    if not centroids:
        # ADVICE r19 item 4: F.sequence(0, -1) counts DOWN to [0, -1]
        # (the lm.py cross-engine trap), so an empty centroid list
        # would emit garbage assignments at runtime where the old
        # F.least(*[]) failed loudly at build time — keep failing here.
        raise ValueError("assign_cells: centroids must be non-empty")
    arr = F.transform(
        F.sequence(F.lit(0), F.lit(len(centroids) - 1)),
        lambda i: F.struct(
            _d(F.element_at(cc, i + 1)).alias("d"), i.cast("int").alias("c")
        ),
    )
    return vectors.withColumn(out_col, F.array_min(arr)["c"])


def assign_cells_arrow(
    vectors: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    out_col: str = "cell",
) -> DataFrame:
    """Production-scale nearest-centroid assignment: ONE numpy matmul per
    Arrow batch against the k×d centroid matrix (argmin of ‖c‖² − 2x·c —
    ‖x‖² is row-constant and drops out). This is the variant the module
    docstring promises for large k: the literal-fold projection of
    :func:`assign_cells` compiles k separate interpreted HOF folds into
    the row expression — fine for oracle-exact small k, but at k in the
    hundreds (SemDeDup cells sized ∝ N / target_cell_size) expression
    size and interpreted cost explode, while the matmul is O(b·k·d)
    vectorized flops per batch.

    numpy's summation order differs from the fixed-order fold, so a
    distance TIE at float precision could assign differently — exact
    ties are measure-zero on real-valued data (asserted equal to
    `assign_cells` on the fixtures); argmin's first-min rule matches the
    fold's smaller-cell-id tie-break."""
    import numpy as np

    C = np.asarray(centroids, dtype=np.float64)
    cnorm = (C * C).sum(axis=1)

    @F.pandas_udf("int")
    def cell_udf(s: pd.Series) -> pd.Series:
        X = np.stack(s.to_numpy()).astype(np.float64)
        return pd.Series(
            np.argmin(cnorm[None, :] - 2.0 * (X @ C.T), axis=1).astype("int32")
        )

    return vectors.withColumn(out_col, cell_udf(F.col(vec_col)))


def lloyd_refine(
    vectors: DataFrame,
    init: list[list[float]],
    iters: int,
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Run `iters` Lloyd rounds from the given centroids. A cell that
    loses all members keeps its previous centroid (cannot happen with
    min-id init on the fixtures — asserted in tests — but guarded for
    adversarial inputs at scale). Also the opt-in refinement step for
    `ivf_topk`'s sampled centroids."""
    cents = [list(map(float, c)) for c in init]
    dim = len(cents[0])
    for _ in range(iters):
        assigned = assign_cells(vectors, cents, vec_col)
        rows = (
            assigned.select("cell", F.posexplode(vec_col).alias("dim", "v"))
            .groupBy("cell", "dim")
            .agg(
                (
                    (
                        F.sum(
                            F.round(
                                F.col("v").cast("double") * 1000000000.0
                            ).cast("bigint")
                        ).cast("double")
                        / F.lit(1000000000.0)
                    )
                    / F.count("*").cast("double")
                ).alias("c")
            )
            .collect()
        )
        by_cell: dict[int, dict[int, float]] = {}
        for r in rows:
            by_cell.setdefault(r["cell"], {})[r["dim"]] = r["c"]
        cents = [
            [by_cell.get(ci, {}).get(d, cents[ci][d]) for d in range(dim)]
            for ci in range(len(cents))
        ]
    return cents


def kmeans_fit(
    vectors: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """`iters` Lloyd rounds from a deterministic init (the k vectors with
    the smallest ids — SQL-replicable, unlike a seeded sample). Returns
    the final centroids as plain lists (k·dim, driver-sized)."""
    init = (
        vectors.orderBy(id_col).limit(k).select(vec_col).collect()
    )
    if len(init) < k:
        raise ValueError(f"corpus has fewer than k={k} vectors")
    return lloyd_refine(vectors, [r[0] for r in init], iters, vec_col)


def kmeans_centroids_df(
    vectors: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Final centroids as a (cell, dim, centroid) frame — the declared-
    query surface (row-shaped so the driver's hash compare applies)."""
    cents = kmeans_fit(vectors, k, iters, id_col, vec_col)
    spark = vectors.sparkSession
    # k·dim driver-side literals as a pure-JVM VALUES relation (r19,
    # localrel.py): createDataFrame(list) routes every partition
    # compute through a pickled-Python round trip (~0.4 s of worker
    # scheduling for 240 rows at local[32]); the VALUES scan is a
    # LocalTableScan with bit-exact float round-trip.
    from food_panda_etl_spark.localrel import values_df

    rows = [
        (ci, d, float(v)) for ci, c in enumerate(cents) for d, v in enumerate(c)
    ]
    return values_df(spark, rows, "cell INT, dim INT, centroid DOUBLE")


def inertia(
    vectors: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
) -> float:
    """Sum of squared distances to the nearest centroid — the quantity
    Lloyd iterations monotonically decrease (asserted in tests)."""
    d = F.least(*[_dist_sq(F.col(vec_col), c) for c in centroids])
    return vectors.select(d.alias("d")).agg(F.sum("d")).collect()[0][0]
