"""k-core peeling — iterative degree-threshold graph pruning (Seidman
1983, "Network structure and minimum degree"; the dense-subgraph
primitive behind community cores, spam/bot-ring detection, and
near-dup-cluster QA: "which suppliers/documents sit in a neighborhood
where EVERYONE has ≥ k strong ties").

Synchronous, fixed-round peeling BY DESIGN (the labelprop convention):
each round computes every node's degree in the CURRENT subgraph and
drops all nodes below k simultaneously, so every round is one hash
aggregation + two node-keyed semi joins and the whole run is
SQL-replayable as chained CTEs — a single diverged degree count or a
missed cascade in any round is a driver hash mismatch. The textbook
sequential peel (pop one min-degree node at a time) is visit-order
dependent and unreplayable; the synchronous fixpoint is the same
k-core, reached in ≤ rounds needed for the longest cascade. A fixed
``n_rounds`` run under-peels a cascade longer than n_rounds (the
output is then a certified SUPERSET of the k-core, shrinking every
round) — callers wanting the exact core iterate until the survivor
count stops moving; the declared query keeps fixed rounds for the
round-replay oracle.

Engine shape (per round): one (node) hash agg over the edge list +
two semi joins keyed by node — linear in |edges|, nothing but 2×8-byte
keys ever shuffles, no payload, no windows. Edges are lazily
checkpointed every round (the PageRank lineage-truncation convention)
so round r never replays rounds 1..r−1. At 100 TB the edge list is the
only fact-sized object and it only shrinks.

Input contract: ``edges`` is the SYMMETRIZED directed edge list (both
(u,v) and (v,u) present, no duplicates, no self-loops) — the
q_labelprop caller convention — so out-degree IS undirected degree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kcore_peel(
    edges: DataFrame,
    k: int,
    n_rounds: int,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Peel nodes of degree < ``k`` for ``n_rounds`` synchronous rounds.

    Returns (src, deg bigint): every node with ≥1 edge in the final
    subgraph and its degree there. Nodes isolated by the last round's
    peel (all neighbors dropped) have no edges and thus no row — they
    would be peeled next round anyway.
    """
    if int(k) < 1:
        raise ValueError(f"kcore_peel: k must be >= 1, got {k!r}")
    if int(n_rounds) < 1:
        raise ValueError(
            f"kcore_peel: n_rounds must be >= 1, got {n_rounds!r}"
        )
    ed = edges.select(src, dst).localCheckpoint(eager=False)
    for _ in range(int(n_rounds)):
        alive = (
            ed.groupBy(src)
            .agg(F.count("*").alias("__deg"))
            .filter(F.col("__deg") >= int(k))
            .select(src)
        )
        ed = (
            ed.join(alive, src, "semi")
            .join(alive.withColumnRenamed(src, dst), dst, "semi")
            .localCheckpoint(eager=False)
        )
    return ed.groupBy(src).agg(F.count("*").cast("bigint").alias("deg"))
