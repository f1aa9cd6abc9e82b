"""Declared queries for the retrieval operators (SURVEY.md §2.10):
RAG-style sliding-window chunking and BM25 top-k scoring over the
``documents`` table. Extension surface — the reference stores review
text opaquely (`src/models/response.rs:25-28`) and has no retrieval; a
training-data / RAG pipeline needs both.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from food_panda_etl_spark.queries import query
from food_panda_etl_spark.tables import load_table

CHUNK_WINDOW = 32
CHUNK_STRIDE = 16

# The fixed retrieval workload for q_bm25: three queries over the corpus
# vocabulary, one row per (query, term). Workload-sized → broadcast.
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


@query(
    "q_chunk_text",
    oracle="""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
    s AS (SELECT doc_id, words,
                 unnest(generate_series(0, len(words) - 1, 16)) AS start
          FROM w)
    SELECT doc_id,
           CAST(start // 16 AS BIGINT) AS chunk_id,
           CAST(len(words[start + 1 : start + 32]) AS INT) AS n_tokens,
           array_to_string(words[start + 1 : start + 32], ' ') AS chunk_text
    FROM s
    """,
)
def q_chunk_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 — RAG chunking: overlapping 32-token windows at stride 16
    (50% overlap), truncated at document end. The plan is ONE narrow
    whole-stage-codegen projection (split → posexplode(sequence) → slice
    → array_join): no shuffle, no join, embarrassingly parallel — the
    shape that holds at 100 TB, where chunking multiplies rows by
    ~window/stride and everything downstream is ordinary keyed rows."""
    from food_panda_etl_spark.operators.retrieval import chunk_sliding

    d = load_table(spark, sf_dir, "documents")
    return chunk_sliding(
        d, "doc_id", "text", window=CHUNK_WINDOW, stride=CHUNK_STRIDE
    )


@query(
    "q_bm25",
    oracle="""
    WITH q AS (SELECT * FROM (VALUES
        (0,'hash'),(0,'join'),
        (1,'scan'),(1,'filter'),(1,'column'),
        (2,'vector'),(2,'batch'),(2,'merge')) AS t(query_id, term)),
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
      SELECT q.query_id, tf.doc_id,
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
      FROM q
      JOIN tf USING (term)
      JOIN dfreq USING (term)
      JOIN dl ON tf.doc_id = dl.doc_id
      CROSS JOIN n CROSS JOIN t
    ),
    agg AS (SELECT query_id, doc_id, CAST(SUM(ts) AS DOUBLE) AS score
            FROM scored GROUP BY query_id, doc_id)
    SELECT query_id, doc_id, score, CAST(rnk AS INT) AS rnk
    FROM (SELECT *, row_number() OVER
            (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rnk
          FROM agg)
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
    qdf = spark.createDataFrame(BM25_QUERIES, "query_id int, term string")
    return bm25_topk(d, qdf, k1=1.2, b=0.75, k=5)
