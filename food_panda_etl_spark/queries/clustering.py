"""Declared k-means query — the repo's second driver-oracled ITERATIVE
algorithm (next to connected components): DuckDB replays the identical
Lloyd rounds as chained CTEs and the centroid table must hash-match
bit-for-bit.

Why that works (operators/kmeans.py): distances are fixed-order double
folds against literal centroids, argmin ties break on cell id, centroid
means quantize addends to DECIMAL(18,9) — every round's output doubles
are therefore identical in both engines, so the fixpoint-free finite
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


def _kmeans_oracle(k: int, iters: int) -> str:
    """Chained-CTE replay: init = k smallest ids; each round scores
    every (vector, centroid) pair with the same fixed-order fold, takes
    the (dist, cell)-min assignment, and rebuilds per-cell centroid
    arrays from decimal-quantized means.

    Mirrors the Spark empty-cell guard (ADVICE r4): a cell that loses all
    members CARRIES ITS PREVIOUS CENTROID FORWARD — each round's c{{r}}
    left-joins the fresh means onto the full previous centroid table, so
    an empty cell keeps competing in later assignments and appears in the
    final output, exactly like ``lloyd_refine``. The final select unnests
    c{{iters}} (all k cells), not the round's means (populated cells
    only)."""
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
             CAST(SUM(CAST(CAST(embedding[j] AS DOUBLE) AS DECIMAL(18,9))) AS DOUBLE)
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
    body = ",\n    ".join(ctes)
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
