"""Declared k-means query — the repo's second driver-oracled ITERATIVE
algorithm (next to connected components): DuckDB replays the identical
Lloyd rounds as chained CTEs and the centroid table must hash-match
bit-for-bit.

Why that works (operators/kmeans.py): distances are fixed-order double
folds against literal centroids, argmin ties break on cell id, centroid
means quantize addends onto the 1e-9 integer grid (round(v·1e9) as
BIGINT — identical tie semantics in both engines, unlike a decimal cast
whose HALF_UP/HALF_EVEN difference fires on float32 dyadics that
terminate on a decimal ...5) — every round's output doubles are
therefore identical in both engines, so the fixpoint-free finite
iteration is exactly replayable in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from food_panda_etl_spark.operators.kmeans import kmeans_centroids_df
from food_panda_etl_spark.queries import query
from food_panda_etl_spark.tables import load_table

_K = 8
_ITERS = 3

_DIST = """
    list_reduce(list_prepend(0.0,
      list_transform(generate_series(1, len(e.embedding)),
                     j -> (CAST(e.embedding[j] AS DOUBLE) - i.c[j])
                        * (CAST(e.embedding[j] AS DOUBLE) - i.c[j]))),
      (x, y) -> x + y)
"""


def _kmeans_ctes(k: int, iters: int) -> list[str]:
    """The shared chained-CTE k-means replay: init = k smallest ids; each
    round scores every (vector, centroid) pair with the same fixed-order
    fold, takes the (dist, cell)-min assignment, and rebuilds per-cell
    centroid arrays from decimal-quantized means. The final centroid
    table is CTE ``c{iters}``.

    Mirrors the Spark empty-cell guard (ADVICE r4): a cell that loses all
    members CARRIES ITS PREVIOUS CENTROID FORWARD — each round's c{r}
    left-joins the fresh means onto the full previous centroid table, so
    an empty cell keeps competing in later assignments and appears in the
    final output, exactly like ``lloyd_refine``."""
    ctes = [
        f"""init AS (
      SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cell,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS c
      FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT {k}))"""
    ]
    prev = "init"
    for r in range(1, iters + 1):
        ctes.append(
            f"""s{r} AS (
      SELECT e.vec_id, e.embedding, i.cell, {_DIST} AS dist
      FROM embeddings e, {prev} i)"""
        )
        ctes.append(
            f"""a{r} AS (
      SELECT vec_id, embedding, cell FROM (
        SELECT vec_id, embedding, cell,
               row_number() OVER (PARTITION BY vec_id ORDER BY dist, cell) AS rn
        FROM s{r}) WHERE rn = 1)"""
        )
        ctes.append(
            f"""e{r} AS (
      SELECT cell, unnest(generate_series(1, len(embedding))) AS j, embedding
      FROM a{r})"""
        )
        ctes.append(
            f"""m{r} AS (
      SELECT cell, CAST(j - 1 AS INT) AS dim,
             (CAST(SUM(CAST(round(CAST(embedding[j] AS DOUBLE)
                                  * CAST(1000000000 AS DOUBLE)) AS BIGINT))
                   AS DOUBLE)
              / CAST(1000000000 AS DOUBLE))
               / CAST(count(*) AS DOUBLE) AS c
      FROM e{r} GROUP BY cell, j)"""
        )
        ctes.append(
            f"""c{r} AS (
      SELECT p.cell, COALESCE(n.c, p.c) AS c
      FROM {prev} p
      LEFT JOIN (SELECT cell, list(c ORDER BY dim) AS c FROM m{r} GROUP BY cell) n
        USING (cell))"""
        )
        prev = f"c{r}"
    return ctes


def _kmeans_oracle(k: int, iters: int) -> str:
    """Final-centroid replay: unnests ``c{iters}`` (all k cells, including
    any carried-forward empty cell), not the round's means (populated
    cells only)."""
    body = ",\n    ".join(_kmeans_ctes(k, iters))
    return f"""
    WITH {body}
    SELECT cell, CAST(j - 1 AS INT) AS dim, c[j] AS centroid
    FROM (SELECT cell, unnest(generate_series(1, len(c))) AS j, c FROM c{iters})
    """


@query("q_kmeans", oracle=_kmeans_oracle(_K, _ITERS))
def q_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed k-means, k=8, 3 Lloyd rounds from the deterministic
    min-id init — `operators/kmeans.py`. Per round the Spark side is a
    pure-projection assignment (distances to k literal centroids compile
    into the row expression — no join) plus ONE posexplode aggregate
    exchange; the bounded k·dim centroid collect feeds the next round.
    The oracle replays the identical rounds in DuckDB; a hash match
    proves every distance, assignment, and mean of all three rounds
    agreed bit-for-bit."""
    e = load_table(spark, sf_dir, "embeddings")
    return kmeans_centroids_df(e, k=_K, iters=_ITERS)


_SD_K = 8
_SD_ITERS = 2
_SD_THRESHOLD = 0.4

_NORM_FOLD = """sqrt(list_reduce(list_prepend(0.0,
      list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
      (x, y) -> x + y))"""


def _semantic_dedup_oracle(k: int, iters: int, threshold: float) -> str:
    """Extend the k-means replay with the SemDeDup tail: final-centroid
    assignment (same (dist, cell)-min), within-cell exact-cosine pairs,
    and the recursive-CTE transitive closure that labels every vector
    with min(id) of its near-dup component — the same reach/min pattern
    `q_dedup_components` oracles against."""
    ctes = _kmeans_ctes(k, iters)
    ctes.append(
        f"""sfin AS (
      SELECT e.vec_id, e.embedding, i.cell, {_DIST} AS dist
      FROM embeddings e, c{iters} i)"""
    )
    ctes.append(
        """afin AS (
      SELECT vec_id, embedding, cell FROM (
        SELECT vec_id, embedding, cell,
               row_number() OVER (PARTITION BY vec_id ORDER BY dist, cell) AS rn
        FROM sfin) WHERE rn = 1)"""
    )
    ctes.append(f"""nfin AS (SELECT vec_id, cell, embedding, {_NORM_FOLD} AS nrm FROM afin)""")
    ctes.append(
        f"""pairs AS (
      SELECT a.vec_id AS pa, b.vec_id AS pb
      FROM nfin a JOIN nfin b ON a.cell = b.cell AND a.vec_id < b.vec_id
      WHERE list_reduce(list_prepend(0.0,
              list_transform(generate_series(1, len(a.embedding)),
                             q -> CAST(a.embedding[q] AS DOUBLE) * CAST(b.embedding[q] AS DOUBLE))),
              (x, y) -> x + y) / (a.nrm * b.nrm) >= {threshold})"""
    )
    ctes.append(
        """edges AS (SELECT pa AS ea, pb AS eb FROM pairs
                 UNION ALL SELECT pb, pa FROM pairs)"""
    )
    ctes.append(
        """reach(id, r) AS (
      SELECT vec_id, vec_id FROM embeddings
      UNION
      SELECT reach.id, e2.eb FROM reach JOIN edges e2 ON reach.r = e2.ea)"""
    )
    body = ",\n    ".join(ctes)
    return f"""
    WITH RECURSIVE {body}
    SELECT id AS vec_id, min(r) AS component FROM reach GROUP BY id
    """


@query(
    "q_semantic_dedup",
    oracle=_semantic_dedup_oracle(_SD_K, _SD_ITERS, _SD_THRESHOLD),
)
def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (VERDICT r4 task 4): k-means cells bound near-dup pair
    generation over embeddings — fit k=8 centroids (2 Lloyd rounds,
    deterministic min-id init), assign every vector by pure projection,
    enumerate exact-cosine-≥0.4 pairs WITHIN cells only
    (`operators/similarity.py::cell_neardup_pairs`), then label
    components with `connected_components`. Cross-cell pairs are missed
    BY DESIGN (the SemDeDup approximation); the oracle replays the
    identical cells, so the approximate pair set itself — and therefore
    the cluster labels — must match bit-for-bit. Scale shape: pair work
    is O(Σ|cell|²) with k sized to the cluster, CC shuffles 2-col edges;
    the only collects are k·dim centroids and the CC convergence scalar."""
    from food_panda_etl_spark.operators.components import connected_components
    from food_panda_etl_spark.operators.kmeans import kmeans_fit
    from food_panda_etl_spark.operators.similarity import cell_neardup_pairs

    e = load_table(spark, sf_dir, "embeddings")
    cents = kmeans_fit(e, k=_SD_K, iters=_SD_ITERS)
    pairs = cell_neardup_pairs(e, cents, threshold=_SD_THRESHOLD)
    return connected_components(
        e.select("vec_id"),
        pairs.select("id_a", "id_b"),
        id_col="vec_id",
        src_col="id_a",
        dst_col="id_b",
    )
