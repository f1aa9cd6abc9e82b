"""Declared graph/association queries (r7): PageRank centrality over
the supplier co-occurrence digraph, PMI collocations over the document
corpus, and triangle counting on the co-supply graph.

The graph edges derive deterministically from the relational tables —
the same "the data defines the graph" shape a curation pipeline uses
when it ranks documents by in-link mass or mines co-occurrence
structure (reference parity: /root/reference has no graph operators;
these extend SURVEY.md §2.10's LLM-pipeline inventory, where PageRank
picks cluster representatives by centrality instead of min-id and PMI
mines collocations for tokenizer/phrase vocabularies).

Determinism: PageRank rounds quantize contributions onto the 1e-12
integer grid (operators/pagerank.py — exact integer sums, identical
half-away-from-zero ties in both engines); PMI ranks by the log-free
integer-product ratio (operators/pmi.py); triangle counting is pure
integer joins. The oracles replay the identical rounds as chained CTEs
(the q_kmeans convention), so a single diverged contribution in any
round is a driver hash mismatch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from food_panda_etl_spark.queries import query
from food_panda_etl_spark.tables import load_table

_PR_DAMPING = 0.85
_PR_ITERS = 5
_PR_GRID = 1000000000000  # the operator's 1e-12 contribution grid

# Directed supplier co-occurrence edges: consecutive lineitems of the
# same order chain supplier -> supplier. (l_orderkey, l_linenumber) is
# NOT unique in the synthetic data (11,785 dup pairs at sf0.01), so the
# sort adds l_suppkey: remaining ties are then between rows with EQUAL
# suppkey, whose permutation cannot change the lagged value sequence —
# the edge multiset is total-order deterministic. MATERIALIZED: the CTE
# is scanned once per power-iteration round and DuckDB would otherwise
# re-inline it (the BPE recursive-chain lesson, queries/text.py).
_PR_EDGES_SQL = """edges AS MATERIALIZED (
      SELECT src, dst FROM (
        SELECT lag(l_suppkey) OVER (PARTITION BY l_orderkey
                                    ORDER BY l_linenumber, l_suppkey) AS src,
               l_suppkey AS dst
        FROM lineitem)
      WHERE src IS NOT NULL),
    deg AS MATERIALIZED (
      SELECT src, count(*) AS deg FROM edges GROUP BY src),
    n AS (SELECT count(*) AS n FROM supplier)"""


def _pagerank_oracle(damping: float, iters: int) -> str:
    """Chained-CTE replay of the operator's power iteration: round r
    quantizes each contribution rank/deg onto the 1e-12 integer grid
    (round → BIGINT, half-away ties — identical in both engines), sums
    exactly, then applies the damping blend with the same literal
    arithmetic ((1 - d)/n and d as DOUBLE casts, matching the Python
    driver's (1.0 - damping) / n IEEE op order)."""
    ctes = [
        _PR_EDGES_SQL,
        """r0 AS (SELECT s_suppkey AS id,
                     CAST(1 AS DOUBLE) / CAST(n.n AS DOUBLE) AS pr
          FROM supplier, n)""",
    ]
    for r in range(1, iters + 1):
        ctes.append(
            f"""c{r} AS (
          SELECT e.dst AS id,
                 SUM(CAST(round((p.pr / CAST(d.deg AS DOUBLE))
                                * CAST({_PR_GRID} AS DOUBLE)) AS BIGINT)) AS inc
          FROM edges e
          JOIN r{r - 1} p ON e.src = p.id
          JOIN deg d ON e.src = d.src
          GROUP BY e.dst)"""
        )
        ctes.append(
            f"""r{r} AS (
          SELECT p.id,
                 (CAST(1 AS DOUBLE) - CAST({damping} AS DOUBLE))
                   / CAST(n.n AS DOUBLE)
                 + CAST({damping} AS DOUBLE)
                   * (CAST(coalesce(c.inc, 0) AS DOUBLE)
                      / CAST({_PR_GRID} AS DOUBLE)) AS pr
          FROM r{r - 1} p LEFT JOIN c{r} c USING (id), n)"""
        )
    body = ",\n    ".join(ctes)
    return f"""
    WITH {body}
    SELECT id AS s_suppkey, pr AS pr_rank FROM r{iters}
    """


@query("q_pagerank", oracle=_pagerank_oracle(_PR_DAMPING, _PR_ITERS))
def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 PageRank centrality (r7; operator landed r6) — rank
    suppliers by co-occurrence in-link mass: consecutive lineitems of
    an order chain supplier→supplier, and 5 damped power-iteration
    rounds (`operators/pagerank.py`) score who gets supplied-after
    most. Per round: one keyed equi-join pair + one hash agg, lineage
    cut by a lazy localCheckpoint — linear in |edges| at fixed rounds
    (SCALE.md curve). The oracle replays all 5 rounds as chained CTEs
    on the 1e-12 integer contribution grid, so the hash match proves
    every contribution, sum, and damping blend of every round agreed
    bit-for-bit."""
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    w = Window.partitionBy("l_orderkey").orderBy("l_linenumber", "l_suppkey")
    edges = (
        li.select(
            F.lag("l_suppkey").over(w).alias("src"),
            F.col("l_suppkey").alias("dst"),
        )
        .filter(F.col("src").isNotNull())
    )
    from food_panda_etl_spark.operators.pagerank import pagerank

    nodes = sup.select(F.col("s_suppkey"))
    return pagerank(
        nodes,
        edges,
        damping=_PR_DAMPING,
        n_iter=_PR_ITERS,
        id_col="s_suppkey",
    ).select("s_suppkey", F.col("rank").alias("pr_rank"))


_PMI_WINDOW = 3
_PMI_MIN_COUNT = 5
_PMI_TOPK = 50


@query(
    "q_pmi",
    # Pair generation mirrors the operator's 0-based (i, i+j) sweep in
    # 1-based DuckDB terms: positions i in [1, len-1], offsets j in
    # [1, window], kept while i + j <= len; pairs canonicalize to
    # (least, greatest) — binary collation in both engines. The ratio
    # is ONE IEEE division of exact integer products (pair_cnt·T and
    # u1·u2 stay < 2^63 through sf0.1 by orders of magnitude).
    oracle=f"""
    WITH toks AS (SELECT string_split(text, ' ') AS t FROM documents),
    pos AS (SELECT t, unnest(generate_series(1, len(t) - 1)) AS i
            FROM toks WHERE len(t) >= 2),
    sw AS (SELECT t, i, unnest(generate_series(1, {_PMI_WINDOW})) AS j
           FROM pos),
    pg AS (SELECT least(t[i], t[i + j]) AS w1,
                  greatest(t[i], t[i + j]) AS w2
           FROM sw WHERE i + j <= len(t)),
    pc AS (SELECT w1, w2, count(*) AS pair_cnt FROM pg GROUP BY w1, w2),
    ug AS (SELECT w, CAST(sum(pair_cnt) AS BIGINT) AS u FROM (
             SELECT w1 AS w, pair_cnt FROM pc
             UNION ALL SELECT w2, pair_cnt FROM pc) GROUP BY w),
    tot AS (SELECT CAST(sum(pair_cnt) AS BIGINT) AS t FROM pc)
    SELECT pc.w1, pc.w2, pc.pair_cnt,
           CAST(pc.pair_cnt * tot.t AS DOUBLE)
             / CAST(u1.u * u2.u AS DOUBLE) AS ratio
    FROM pc
    JOIN ug u1 ON u1.w = pc.w1
    JOIN ug u2 ON u2.w = pc.w2
    CROSS JOIN tot
    WHERE pc.pair_cnt >= {_PMI_MIN_COUNT}
    ORDER BY ratio DESC, pc.w1, pc.w2
    LIMIT {_PMI_TOPK}
    """,
)
def q_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 PMI collocations (r7; operator landed r6) — top-50 token
    pairs by the log-free PMI ratio within a 3-token sliding window
    over the corpus (`operators/pmi.py`): one narrow HOF pair
    projection (no position self-join), one pair hash-agg (the only
    fact-sized exchange, checkpointed once for its three consumers),
    vocabulary-sized unigram joins, and a (ratio, w1, w2) total-order
    top-k. The oracle regenerates the identical pair space and ratio
    arithmetic, so ranking and values must match bit-for-bit."""
    from food_panda_etl_spark.operators.pmi import pmi_pairs

    d = load_table(spark, sf_dir, "documents")
    return pmi_pairs(
        d,
        text_col="text",
        window=_PMI_WINDOW,
        min_count=_PMI_MIN_COUNT,
        k=_PMI_TOPK,
    )


#: Edge budget: the backbone keeps the top-K co-occurring pairs by
#: (support DESC, sa, sb) — a total order, so the cut is deterministic.
#: A fixed min-support threshold is NOT scale-honest: co-occurrence
#: counts grow with the order count, so at sf0.1 a support>=3 graph is
#: already near-complete (214k edges over 1000 suppliers, 13.2M
#: triangles — the wedge join measured 7.5 s on rows that mean
#: nothing). The top-K backbone bounds the graph at ANY corpus size.
_TRI_TOPK_EDGES = 2000


# The shared backbone CTE fragment (os + e), reused verbatim by the
# q_triangle_count and q_labelprop oracles so the two cannot drift (the
# _DSIR_CTES convention). os feeds the pair self-join twice and e has
# multiple consumers in both oracles — MATERIALIZED, or DuckDB
# re-inlines the quadratic co-occurrence join per reference (the
# _PR_EDGES_SQL convention above).
_BACKBONE_SQL = f"""os AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
    e AS MATERIALIZED (SELECT sa, sb FROM (
            SELECT a.l_suppkey AS sa, b.l_suppkey AS sb,
                   count(*) AS support
            FROM os a JOIN os b
              ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
            GROUP BY a.l_suppkey, b.l_suppkey)
          ORDER BY support DESC, sa, sb
          LIMIT {_TRI_TOPK_EDGES})"""


def _cosupply_backbone(li: DataFrame) -> DataFrame:
    """The top-K strong co-supply edge list (sa < sb), shared by
    q_triangle_count and q_labelprop — one definition (mirrored by
    _BACKBONE_SQL on the oracle side) so the two graph queries can
    never drift. Lazily checkpointed: both callers fan it into
    multiple consumers."""
    os_ = li.select("l_orderkey", "l_suppkey").distinct()
    a, b = os_.alias("a"), os_.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_suppkey") < F.col("b.l_suppkey")),
        )
        .groupBy(
            F.col("a.l_suppkey").alias("sa"),
            F.col("b.l_suppkey").alias("sb"),
        )
        .agg(F.count("*").alias("__support"))
        .orderBy(F.desc("__support"), "sa", "sb")
        .limit(_TRI_TOPK_EDGES)
        .select("sa", "sb")
        .localCheckpoint(eager=False)
    )


@query(
    "q_triangle_count",
    oracle=f"""
    WITH {_BACKBONE_SQL}
    SELECT
      (SELECT CAST(count(*) AS BIGINT) FROM
         (SELECT sa AS s FROM e UNION SELECT sb FROM e)) AS n_nodes,
      (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_edges,
      (SELECT CAST(count(*) AS BIGINT)
       FROM e e1 JOIN e e2 ON e1.sb = e2.sa
       JOIN e e3 ON e3.sa = e1.sa AND e3.sb = e2.sb) AS n_triangles
    """,
)
def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 triangle counting (r7) — cohesion of the strong co-supply
    backbone: undirected edges are the top-2000 supplier pairs by
    distinct-order co-occurrence (total-order cut — see
    _TRI_TOPK_EDGES for why a fixed support threshold is not
    scale-honest), triangles counted by the oriented wedge-close join
    (edges stored a < b, so e1(a,b) ⋈ e2(b,c) ⋈ e3(a,c) counts each
    triangle exactly once — the standard orientation trick that caps
    wedge fan-out at web scale, where production orients by degree
    instead of id). Per-order pair generation is quadratic ONLY in
    basket size (suppliers per order — bounded by the order, not the
    corpus); the top-K cut is a TakeOrdered over the support table;
    everything downstream is integer joins on the ≤K-edge backbone.
    Output is one (n_nodes, n_edges, n_triangles) row — pure integers,
    exact in any engine."""
    li = load_table(spark, sf_dir, "lineitem")
    # five consumers (e1/e2/e3 wedge join + node/edge counts): the
    # shared backbone helper derives the edge list once (lazy — the
    # heavy_hitters convention, no executor cache pinning)
    e = _cosupply_backbone(li)
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.sb") == F.col("e2.sa"))
        .join(
            e3,
            (F.col("e3.sa") == F.col("e1.sa"))
            & (F.col("e3.sb") == F.col("e2.sb")),
        )
        .agg(F.count("*").alias("n_triangles"))
    )
    nodes = (
        e.select(F.col("sa").alias("s"))
        .union(e.select("sb"))
        .distinct()
        .agg(F.count("*").alias("n_nodes"))
    )
    edges_n = e.agg(F.count("*").alias("n_edges"))
    return (
        nodes.crossJoin(F.broadcast(edges_n))
        .crossJoin(F.broadcast(tri))
        .select("n_nodes", "n_edges", "n_triangles")
    )


_LP_ITERS = 3


def _labelprop_oracle(iters: int) -> str:
    """Chained-CTE replay of the synchronous majority-vote rounds over
    the symmetrized backbone: round r's votes join round r−1's labels,
    the argmax is the (count DESC, label ASC) row_number pick — the
    operator's total order — and isolated nodes carry their label via
    the left-join coalesce."""
    ctes = [
        _BACKBONE_SQL,
        """ed AS MATERIALIZED (
          SELECT sa AS src, sb AS dst FROM e
          UNION ALL SELECT sb, sa FROM e)""",
        """l0 AS (SELECT s_suppkey AS id, s_nationkey AS label
                  FROM supplier)""",
    ]
    for r in range(1, iters + 1):
        ctes.append(
            f"""v{r} AS (
          SELECT ed.dst AS id, l.label, count(*) AS cnt
          FROM ed JOIN l{r - 1} l ON ed.src = l.id
          GROUP BY ed.dst, l.label)"""
        )
        ctes.append(
            f"""b{r} AS (
          SELECT id, label FROM (
            SELECT id, label,
                   row_number() OVER (PARTITION BY id
                                      ORDER BY cnt DESC, label) AS rn
            FROM v{r}) WHERE rn = 1)"""
        )
        ctes.append(
            f"""l{r} AS (
          SELECT l.id, coalesce(b.label, l.label) AS label
          FROM l{r - 1} l LEFT JOIN b{r} b USING (id))"""
        )
    body = ",\n    ".join(ctes)
    return f"""
    WITH {body}
    SELECT id AS s_suppkey, label FROM l{iters}
    """


@query("q_labelprop", oracle=_labelprop_oracle(_LP_ITERS))
def q_labelprop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 label propagation (r7) — which national cluster dominates
    each supplier's strong co-supply neighborhood: seed every supplier
    with its own s_nationkey, symmetrize the top-2000 backbone
    (`_cosupply_backbone` — the q_triangle_count edge set), and run 3
    synchronous majority-vote rounds (`operators/labelprop.py`: one
    keyed equi-join + one (dst, label) hash agg + a total-order argmax
    per round; integers end to end). Synchronous BY DESIGN so the
    oracle can replay every round as chained CTEs — a single diverged
    vote, tie-break, or carry in any round is a driver hash mismatch.
    The label distribution genuinely moves (sf0.01: only 10/100
    suppliers still carry their own nation label after 3 rounds) — a
    real spread, not a fixpoint."""
    from food_panda_etl_spark.operators.labelprop import label_propagation

    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    e = _cosupply_backbone(li)
    edges = e.select(
        F.col("sa").alias("src"), F.col("sb").alias("dst")
    ).unionAll(e.select(F.col("sb").alias("src"), F.col("sa").alias("dst")))
    nodes = sup.select(
        F.col("s_suppkey"), F.col("s_nationkey").alias("label")
    )
    return label_propagation(
        nodes,
        edges,
        n_iter=_LP_ITERS,
        id_col="s_suppkey",
        label_col="label",
    )
