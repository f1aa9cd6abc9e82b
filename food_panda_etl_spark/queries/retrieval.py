"""Declared queries for the retrieval operators (SURVEY.md §2.10):
RAG-style sliding-window chunking, BM25 top-k scoring, and hybrid
BM25+dense RRF fusion over the ``documents``/``embeddings`` tables.
Extension surface — the reference stores review text opaquely
(`src/models/response.rs:25-28`) and has no retrieval; a training-data /
RAG pipeline needs all three.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from food_panda_etl_spark.queries import query
from food_panda_etl_spark.localrel import values_df
from food_panda_etl_spark.tables import load_table

CHUNK_WINDOW = 32
CHUNK_STRIDE = 16

# The fixed retrieval workload for q_bm25 / q_hybrid_rrf: three queries
# over the corpus vocabulary, one row per (query, term). Workload-sized
# → broadcast. The SQL VALUES list below is GENERATED from this table so
# the Spark workload and the oracle workload cannot diverge.
BM25_QUERIES = [
    (0, "hash"),
    (0, "join"),
    (1, "scan"),
    (1, "filter"),
    (1, "column"),
    (2, "vector"),
    (2, "batch"),
    (2, "merge"),
]

_QTERMS_VALUES = ",".join(f"({q},'{t}')" for q, t in BM25_QUERIES)

# ONE shared BM25 oracle fragment, ending at the scored per-(query, doc)
# aggregate `bagg` — q_bm25 ranks it to top-5 with the score column,
# q_hybrid_rrf ranks it to top-20 ranks-only. A single source means a
# formula tweak cannot update one oracle and silently miss the other
# (the _ANN_Q_SQL convention from queries/similarity.py).
_BM25_CTES = f"""
    qterms AS (SELECT * FROM (VALUES {_QTERMS_VALUES}) AS t(query_id, term)),
    tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
            FROM documents),
    tf AS (SELECT doc_id, term, count(*) AS tf
           FROM tok WHERE term <> '' GROUP BY doc_id, term),
    dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY doc_id),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    n AS (SELECT count(*) AS n_docs FROM documents),
    t AS (SELECT CAST(sum(dl) AS DOUBLE) / CAST((SELECT n_docs FROM n) AS DOUBLE) AS avgdl
          FROM dl),
    scored AS (
      SELECT qterms.query_id, tf.doc_id,
             CAST(
               (CAST(2 * n.n_docs - 2 * dfreq.df + 1 AS DOUBLE)
                / CAST(2 * dfreq.df + 1 AS DOUBLE))
               * ((CAST(tf.tf AS DOUBLE) * CAST(2.2 AS DOUBLE))
                  / (CAST(tf.tf AS DOUBLE)
                     + (CAST(1.2 AS DOUBLE)
                        * (CAST(0.25 AS DOUBLE)
                           + (CAST(0.75 AS DOUBLE)
                              * (CAST(dl.dl AS DOUBLE) / t.avgdl))))))
               AS DECIMAL(18,6)) AS ts
      FROM qterms
      JOIN tf USING (term)
      JOIN dfreq USING (term)
      JOIN dl ON tf.doc_id = dl.doc_id
      CROSS JOIN n CROSS JOIN t
    ),
    bagg AS (SELECT query_id, doc_id, CAST(SUM(ts) AS DOUBLE) AS score
             FROM scored GROUP BY query_id, doc_id)"""

# The exact-cosine fragment mirrors q_cosine_topk's proven fold-order SQL
# (queries/similarity.py) with this workload's parameters: queries =
# vec_id < 3, ranked to top-20 ranks-only.
_DENSE_CTES = """
    qv AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 3),
    dpairs AS (
      SELECT qv.qid, e.vec_id,
             list_reduce(list_prepend(0.0,
               list_transform(generate_series(1, len(e.embedding)),
                              i -> CAST(e.embedding[i] AS DOUBLE) * CAST(qv.qe[i] AS DOUBLE))),
               (a, b) -> a + b)
             / (sqrt(list_reduce(list_prepend(0.0, list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), (a, b) -> a + b))
              * sqrt(list_reduce(list_prepend(0.0, list_transform(qv.qe,       x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), (a, b) -> a + b))) AS score
      FROM embeddings e, qv
      WHERE e.vec_id <> qv.qid),
    dense AS (SELECT qid, vec_id, rn FROM
                (SELECT qid, vec_id,
                        row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rn
                 FROM dpairs)
              WHERE rn <= 20)"""


@query(
    "q_chunk_text",
    # Interpolated from CHUNK_WINDOW/CHUNK_STRIDE (the BM25_QUERIES→VALUES
    # convention): changing the constants can never desync the oracle.
    oracle=f"""
    WITH w AS (SELECT doc_id,
                      list_filter(string_split(text, ' '), t -> t <> '') AS words
               FROM documents),
    s AS (SELECT doc_id, words,
                 unnest(generate_series(0, len(words) - 1, {CHUNK_STRIDE})) AS start
          FROM w)
    SELECT doc_id,
           CAST(start // {CHUNK_STRIDE} AS BIGINT) AS chunk_id,
           CAST(len(words[start + 1 : start + {CHUNK_WINDOW}]) AS INT) AS n_tokens,
           array_to_string(words[start + 1 : start + {CHUNK_WINDOW}], ' ') AS chunk_text
    FROM s
    """,
)
def q_chunk_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 — RAG chunking: overlapping 32-token windows at stride 16
    (50% overlap), truncated at document end; empty tokens dropped
    before windowing (the bm25_topk tokenization). The plan is ONE
    narrow whole-stage-codegen projection (split → filter → posexplode
    (sequence) → slice → array_join): no shuffle, no join,
    embarrassingly parallel — the shape that holds at 100 TB, where
    chunking multiplies rows by ~window/stride and everything
    downstream is ordinary keyed rows."""
    from food_panda_etl_spark.operators.retrieval import chunk_sliding

    d = load_table(spark, sf_dir, "documents")
    return chunk_sliding(
        d, "doc_id", "text", window=CHUNK_WINDOW, stride=CHUNK_STRIDE
    )


@query(
    "q_bm25",
    oracle=f"""
    WITH {_BM25_CTES}
    SELECT query_id, doc_id, score, CAST(rnk AS INT) AS rnk
    FROM (SELECT *, row_number() OVER
            (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rnk
          FROM bagg)
    WHERE rnk <= 5
    """,
)
def q_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 — BM25 top-5 documents per query (k1=1.2, b=0.75), linear
    log-free idf so every factor is a single IEEE op on integer-derived
    doubles (bit-identical to the DuckDB oracle — the q_tfidf convention;
    ln()'s libm rounding is not portable). Per-term scores decimal-cast
    before the per-(query, doc) sum (order-independent, §7). Plan: two
    fact-wide hash aggs (tf, final sum), vocabulary-sized df joined
    unhinted (AQE decides), broadcast query workload, WindowGroupLimit
    top-k. At 100 TB nothing materializes beyond the aggregates."""
    from food_panda_etl_spark.operators.retrieval import bm25_topk

    d = load_table(spark, sf_dir, "documents")
    qdf = values_df(spark, BM25_QUERIES, "query_id int, term string")
    return bm25_topk(d, qdf, k1=1.2, b=0.75, k=5)


@query(
    "q_hybrid_rrf",
    oracle=f"""
    WITH {_BM25_CTES},
    lex AS (SELECT query_id, doc_id, rnk FROM
              (SELECT *, row_number() OVER
                 (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rnk
               FROM bagg)
            WHERE rnk <= 20),
    {_DENSE_CTES},
    fused AS (
      SELECT COALESCE(lex.query_id, CAST(dense.qid AS INT)) AS query_id,
             COALESCE(lex.doc_id, dense.vec_id) AS doc_id,
             (COALESCE(CAST(1.0 AS DOUBLE) / CAST(60 + lex.rnk AS DOUBLE),
                       CAST(0.0 AS DOUBLE))
              + COALESCE(CAST(1.0 AS DOUBLE) / CAST(60 + dense.rn AS DOUBLE),
                         CAST(0.0 AS DOUBLE))) AS rrf
      FROM lex FULL OUTER JOIN dense
        ON lex.query_id = CAST(dense.qid AS INT) AND lex.doc_id = dense.vec_id
    )
    SELECT query_id, doc_id, rrf, CAST(rnk AS INT) AS rnk
    FROM (SELECT *, row_number() OVER
            (PARTITION BY query_id ORDER BY rrf DESC, doc_id) AS rnk
          FROM fused)
    WHERE rnk <= 10
    """,
)
def q_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 — hybrid retrieval: BM25 top-20 (lexical) ∪ exact-cosine
    top-20 (dense, query = each doc's embedding for doc_id < 3) fused by
    reciprocal-rank fusion, rrf = Σ 1/(60 + rank) (Cormack et al. 2009).
    RRF needs only the RANKS — no cross-scorer score calibration — which
    is also why it is bit-deterministic: each term is one integer-derived
    IEEE division, summed in fixed written order. Proves the retrieval
    operators COMPOSE (the search analog of q_llm_prep). Plan: both arms
    end in WindowGroupLimit before a workload-sized full-outer join —
    at 100 TB the join touches ≤ (queries × k) rows per arm, never the
    corpus."""
    from food_panda_etl_spark.operators.retrieval import bm25_topk
    from food_panda_etl_spark.operators.similarity import brute_force_topk

    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    from pyspark.sql import functions as F

    qdf = values_df(spark, BM25_QUERIES, "query_id int, term string")
    lex = bm25_topk(d, qdf, k1=1.2, b=0.75, k=20).select(
        "query_id", "doc_id", "rnk"
    )
    qv = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    dense = brute_force_topk(e, qv, k=20).select(
        F.col("qid").cast("int").alias("d_query_id"),
        F.col("neighbor_id").alias("d_doc_id"),
        "rn",
    )
    fused = lex.join(
        dense,
        (lex["query_id"] == dense["d_query_id"]) & (lex["doc_id"] == dense["d_doc_id"]),
        "full_outer",
    ).select(
        F.coalesce(lex["query_id"], dense["d_query_id"]).alias("query_id"),
        F.coalesce(lex["doc_id"], dense["d_doc_id"]).alias("doc_id"),
        (
            F.coalesce(
                F.lit(1.0) / (F.lit(60) + F.col("rnk")).cast("double"), F.lit(0.0)
            )
            + F.coalesce(
                F.lit(1.0) / (F.lit(60) + F.col("rn")).cast("double"), F.lit(0.0)
            )
        ).alias("rrf"),
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(F.col("rrf").desc(), F.col("doc_id"))
    return (
        fused.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 10)
        .select("query_id", "doc_id", "rrf", F.col("rnk").cast("int").alias("rnk"))
    )
