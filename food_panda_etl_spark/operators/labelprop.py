"""Synchronous majority-vote label propagation over a DataFrame edge
list — the community-detection / weak-supervision spreading primitive
(Raghavan et al., arXiv:0709.2938; the label-spreading shape used to
extend a small labeled seed set over a similarity graph, e.g. spreading
curated quality labels across a near-duplicate graph instead of
training a classifier).

Semantics per round (SYNCHRONOUS — all nodes update from the previous
round's labels, which is what makes rounds replayable in SQL, unlike
the asynchronous textbook variant whose result depends on visit order):

1. votes — each directed edge carries its src's current label to dst:
   one keyed equi-join + one (dst, label) hash aggregation;
2. argmax — every node with in-neighbors adopts the most frequent
   incoming label, ties broken on the SMALLEST label (count DESC, label
   ASC — a total order, so the argmax is deterministic);
3. carry — nodes with no in-neighbors keep their current label (left
   join + coalesce), so isolated nodes and sources are stable.

Undirected graphs: pass the symmetrized edge list (src↔dst union — the
`connected_components` convention).

Determinism: labels and counts are integers end to end — no floats
anywhere — so every round is bit-identical under ANY partitioning
(property-tested against an independent Python reference), and a
chained-CTE SQL replay matches exactly (the k-means/PageRank oracle
pattern; declared-query slated for the r8 window).

Scale shape: per round ONE fact-sized exchange (the votes hash-agg on
(dst, label) — bounded by |edges|, shuffling two 8-byte columns), one
WindowGroupLimit-able argmax over the per-node vote lists (bounded by
distinct incoming labels per node), one broadcast-or-shuffle join back
to the node set. Lineage truncates each round with a lazy
localCheckpoint (the connected-components convention). Collect
inventory: NOTHING — fixed n_iter rounds need no convergence scalar;
callers wanting convergence detection can diff successive label tables
(one count aggregate — the CC checksum convention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def label_propagation(
    nodes: DataFrame,
    edges: DataFrame,
    n_iter: int = 5,
    id_col: str = "id",
    label_col: str = "label",
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Labels after ``n_iter`` synchronous majority-vote rounds.

    Returns (id_col, label_col) with the same label type as the input.
    ``edges`` is directed (votes flow src → dst); parallel edges vote
    multiply. Every edge endpoint must appear in ``nodes`` (the
    PageRank endpoint-closure contract: absent srcs vote nothing,
    absent dsts receive nothing — both silently skew the spread).
    Raises on an empty node set."""
    if not nodes.take(1):
        raise ValueError(
            "label_propagation: nodes is empty — labels are undefined"
        )
    # every round's vote join references edges — derive a (possibly
    # expensive) upstream edge lineage once, not n_iter times (the
    # pagerank convention: a window-derived edge list measured 5.5 vs
    # 4.0 s at sf0.1 there)
    edges = edges.localCheckpoint(eager=False)
    labels = nodes.select(
        F.col(id_col), F.col(label_col)
    ).localCheckpoint(eager=False)
    n_iter = int(n_iter)
    for it in range(n_iter):
        votes = (
            edges.join(labels, edges[src_col] == labels[id_col])
            .groupBy(F.col(dst_col).alias("__to"), F.col(label_col))
            .agg(F.count("*").alias("__cnt"))
        )
        w = Window.partitionBy("__to").orderBy(
            F.desc("__cnt"), F.col(label_col)
        )
        best = (
            votes.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select("__to", F.col(label_col).alias("__new"))
        )
        labels = (
            labels.join(best, labels[id_col] == best["__to"], "left")
            .select(
                F.col(id_col),
                F.coalesce(F.col("__new"), F.col(label_col)).alias(label_col),
            )
            # per-round truncation, deliberately (r20 measured the
            # 2-round cadence that pays off for pagerank: here the
            # fused two-round plans' extra codegen/JIT cost exceeded
            # the saved checkpoint boundary — 1.98 → 2.17/2.49 s
            # across two full bench runs; rejected on measurement)
            .localCheckpoint(eager=False)
        )
    return labels
