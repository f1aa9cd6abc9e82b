"""Graph queries declared after round 7 — a separate module so
`queries/graph.py` stays byte-identical to its r7 driver greens (the
`queries/selection.py` convention); the backbone fragments are imported
from there, ONE definition per side as always.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from food_panda_etl_spark.queries import query
from food_panda_etl_spark.queries.graph import _BACKBONE_SQL, _cosupply_backbone
from food_panda_etl_spark.tables import load_table

_KCORE_K = 30
_KCORE_ROUNDS = 3


def _kcore_oracle(k: int, rounds: int) -> str:
    """Round-replay oracle: the synchronous peel as chained CTEs over
    the shared co-supply backbone — each round recomputes degrees and
    keeps edges whose BOTH endpoints pass, exactly like the operator.
    ed CTEs are MATERIALIZED (each is referenced three times: the
    degree agg and both endpoint joins — the recursive-round DuckDB
    convention from the PageRank/BPE oracles)."""
    parts = [
        _BACKBONE_SQL,
        """ed0 AS MATERIALIZED (
        SELECT sa AS src, sb AS dst FROM e
        UNION ALL SELECT sb AS src, sa AS dst FROM e)""",
    ]
    for r in range(rounds):
        parts.append(
            f"""a{r} AS MATERIALIZED (
        SELECT src FROM ed{r} GROUP BY src HAVING count(*) >= {k}),
    ed{r + 1} AS MATERIALIZED (
        SELECT ed.src, ed.dst FROM ed{r} ed
        JOIN a{r} x ON ed.src = x.src
        JOIN a{r} y ON ed.dst = y.src)"""
        )
    return (
        "WITH "
        + ",\n    ".join(parts)
        + f"""
    SELECT src AS s_suppkey, CAST(count(*) AS BIGINT) AS deg
    FROM ed{rounds} GROUP BY src"""
    )


@query("q_kcore", oracle=_kcore_oracle(_KCORE_K, _KCORE_ROUNDS))
def q_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 k-core peeling (r9) — the dense core of the strong
    co-supply graph: 3 synchronous rounds dropping every supplier with
    fewer than 30 backbone ties, over the SAME symmetrized top-2000
    backbone as q_triangle_count / q_labelprop (`_cosupply_backbone`,
    one definition per side). The fifth iterative algorithm in the
    ledger (k-means, CC, BPE, PageRank/labelprop, now k-core); the
    oracle replays every peel round as chained CTEs, so a missed
    cascade anywhere is a driver hash mismatch. At sf0.01 the peel is
    real and CASCADING: degrees span 17-69, the sub-30 tail drops in
    round 1 and its removal drags borderline nodes under k in rounds
    2-3. At sf0.001 the backbone is a complete 10-clique of degree 9 <
    k, so the core is EMPTY — both engines agree on the empty set (the
    all-zero-mass sampler convention: degenerate inputs are legal, not
    errors); at sf0.1 the FIXED top-2000 cap spreads over 1000
    suppliers (mean backbone degree ~4) and the 30-core is empty again
    — the flip side of the scale-honest capped backbone (a threshold
    graph would instead go near-complete, the regime q_triangle_count's
    redesign rejected); production tunes k to the backbone's degree
    scale, the declared constants pin the oracle. Verified empty==empty
    at sf0.001/sf0.1 and 71-row cascade at sf0.01, all hash-matched.
    See `operators/kcore.py` for the synchronous-vs-sequential argument
    and the 100 TB accounting."""
    from food_panda_etl_spark.operators.kcore import kcore_peel

    li = load_table(spark, sf_dir, "lineitem")
    e = _cosupply_backbone(li)
    edges = e.select(
        F.col("sa").alias("src"), F.col("sb").alias("dst")
    ).unionAll(e.select(F.col("sb").alias("src"), F.col("sa").alias("dst")))
    return kcore_peel(edges, k=_KCORE_K, n_rounds=_KCORE_ROUNDS).select(
        F.col("src").alias("s_suppkey"), "deg"
    )
