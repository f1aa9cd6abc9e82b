"""Retrieval-shaped operators over a text corpus: RAG-style sliding-window
chunking and BM25 top-k document scoring.

Extension surface (BASELINE.json LLM-pipeline mandate; the reference has
no text retrieval — its closest analog is the review-text payloads it
stores opaquely, `/root/reference/src/models/response.rs:25-28`). Both
operators follow the repo's §2.10 conventions: pure built-in/HOF column
expressions (no Python rows), fact-table shuffles limited to the
aggregations that need them, and bit-deterministic math so the plain-SQL
DuckDB oracle hash-matches (log-free idf, exactly-parenthesised double
expressions, decimal-cast order-independent sums).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def chunk_sliding(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    window: int = 32,
    stride: int = 16,
) -> DataFrame:
    """Split each document into overlapping token windows (RAG chunking):
    chunk i covers tokens [i*stride, i*stride + window), truncated at the
    document end; chunks start while i*stride < n_tokens, so every token
    lands in ceil(window/stride) chunks except near the boundaries.

    Plan shape: one narrow projection — split → posexplode(sequence) →
    slice/array_join, all whole-stage-codegen HOFs. NO shuffle, NO join:
    chunking is embarrassingly parallel per input partition, which is the
    property that matters at 100 TB (output is ~window/stride × the
    input rows; downstream ops see ordinary narrow rows keyed by
    (id, chunk_id)).

    Empty tokens (leading/trailing/double spaces) are dropped before
    windowing — the same tokenization ``bm25_topk`` uses — so NULL-text
    and whitespace-only rows produce no chunks (split→filter→sequence→
    posexplode propagate NULL / collapse to an empty series), identical
    to the SQL mirror.
    """
    if stride <= 0 or window <= 0:
        raise ValueError("window and stride must be positive")
    # drop empty tokens (leading/trailing/double spaces) so n_tokens
    # counts real words — the same tokenization bm25_topk uses
    words = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    # whitespace-only text filters to zero tokens; Spark's sequence(0,
    # -1, s) THROWS (unlike DuckDB's generate_series, which is empty),
    # so route the empty case to an empty starts array explicitly —
    # posexplode then emits no row, matching the oracle
    starts = F.when(
        F.size(words) > 0,
        F.sequence(F.lit(0), F.size(words) - 1, F.lit(stride)),
    ).otherwise(F.array().cast("array<integer>"))
    exploded = df.select(
        F.col(id_col),
        words.alias("__words"),
        F.posexplode(starts).alias("chunk_id", "__start"),
    )
    piece = F.slice(F.col("__words"), F.col("__start") + 1, window)
    return exploded.select(
        F.col(id_col),
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.size(piece).cast("int").alias("n_tokens"),
        F.array_join(piece, " ").alias("chunk_text"),
    )


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 5,
) -> DataFrame:
    """BM25 top-k documents per query, with a LINEAR (log-free) idf.

    score(q, d) = Σ_t  idf(t) · tf(t,d)·(k1+1) / (tf + k1·(1−b + b·dl/avgdl))
    with idf(t) = (N − df + ½)/(df + ½), i.e. Robertson's idf WITHOUT the
    ln(): like the repo's log-free TF-IDF (`queries/text.py::q_tfidf`),
    dropping the log keeps every factor a single IEEE operation on
    integer-derived doubles — bit-identical across engines — where ln()'s
    libm rounding may differ. Monotone in the same tf/df/dl directions as
    classic BM25 (idf ordering is preserved; magnitudes differ).

    ``queries`` is (query_id int, term string) — one row per DISTINCT
    query term (a duplicated (query_id, term) row would double-count
    that term's contribution; classic BM25 query-term-frequency
    weighting is out of scope); it is workload-sized, so it broadcasts.

    Per-term scores are cast to DECIMAL(18,6) before the per-(query, doc)
    SUM (order-independent, the §7 convention), then back to double.

    Oracle bit-parity caveat: ``k1``/``b`` enter the score as Python-
    computed literals (``k1 + 1.0``, ``1.0 - b``). An oracle matches
    bitwise only if its SQL constants are GENERATED from the same Python
    floats (as ``queries/retrieval.py`` generates its term VALUES) —
    hand-written decimal literals happen to coincide for the defaults
    (1.2 + 1.0 == 2.2 exactly in binary64) but are not guaranteed to for
    arbitrary ``k1``/``b``.

    Scale: the only fact-wide shuffles are the (doc, term) tf aggregation
    and the final per-(query, doc) sum; df is vocabulary-sized and joins
    unhinted (AQE broadcasts it when it fits — forcing a broadcast would
    OOM at real-vocabulary scale, same reasoning as q_tfidf); doc lengths
    derive from tf (no second text scan). Top-k per query plans as
    WindowGroupLimit — k rows per query survive before the final sort.
    """
    tok = docs.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("term")
    ).filter(F.col("term") != "")
    # tf feeds FOUR consumers (dl, df, avgdl, the scoring join); without a
    # shared materialization the tokenize+aggregate lineage re-executes per
    # consumer (~3× measured at 80k docs). Lazy localCheckpoint — not
    # cache() — per the operators/dedup.py convention: materialized once by
    # the first action, released by the ContextCleaner on GC.
    tf = (
        tok.groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=False)
    )
    dl = tf.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    # ONE 1-row stats frame carrying both constants: aggregate dl BEFORE
    # attaching n_docs (a crossJoin on the unaggregated dl would stream
    # one row per document through a BNLJ just to attach a constant),
    # and give the scoring side a single broadcast instead of two.
    stats = (
        dl.agg(F.sum("dl").cast("double").alias("__tot"))
        .crossJoin(F.broadcast(docs.agg(F.count("*").alias("n_docs"))))
        .select(
            "n_docs",
            (F.col("__tot") / F.col("n_docs").cast("double")).alias("avgdl"),
        )
    )

    tf_d = F.col("tf").cast("double")
    dl_d = F.col("dl").cast("double")
    # integer-exact numerator/denominator, ONE division each: idf =
    # (N − df + ½)/(df + ½) = (2N − 2df + 1)/(2df + 1)
    idf = (2 * F.col("n_docs") - 2 * F.col("df") + 1).cast("double") / (
        2 * F.col("df") + 1
    ).cast("double")
    # parenthesisation mirrored EXACTLY in the SQL oracle — float ops
    # must associate identically for bit equality
    denom = tf_d + (
        F.lit(float(k1))
        * (F.lit(1.0 - b) + (F.lit(float(b)) * (dl_d / F.col("avgdl"))))
    )
    term_score = (idf * ((tf_d * F.lit(k1 + 1.0)) / denom)).cast("decimal(18,6)")

    scored = (
        F.broadcast(queries)
        .join(tf, "term")
        .join(df_, "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .select("query_id", id_col, term_score.alias("__ts"))
    )
    agg = scored.groupBy("query_id", id_col).agg(
        F.sum("__ts").cast("double").alias("score")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col(id_col)
    )
    return (
        agg.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", id_col, "score", F.col("rnk").cast("int").alias("rnk"))
    )
