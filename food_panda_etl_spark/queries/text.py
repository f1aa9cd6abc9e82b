"""Text-analysis queries over ``documents`` — SURVEY.md §2.10 mandate:
token counting, quality scoring, document fingerprinting, binary metadata.

All token work uses built-in array functions (split/explode/transform/
aggregate/filter) — JVM-side, whole-stage-codegen'd, no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from food_panda_etl_spark.queries import query
from food_panda_etl_spark.tables import load_table

STOPWORDS = ["the", "a", "of", "and", "to"]

def tokens_col():
    return F.split(F.col("text"), " ")


@query(
    "q_array_explode",
    oracle="""
    SELECT token, count(*) AS cnt
    FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
    GROUP BY token
    """,
)
def q_array_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 array family — tokenize + explode + term frequency. The
    generate (explode) happens before the shuffle, so the aggregate's
    map-side partials see token-level rows but combine locally first."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(tokens_col()).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
    )


@query(
    "q_token_count",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
           n_chars
    FROM documents
    """,
)
def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 token counting — whitespace tokens per document (the cheap
    proxy for BPE token budgeting in training-data pipelines)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id", F.size(tokens_col()).alias("n_tokens"), "n_chars"
    )


@query(
    "q_quality_score",
    oracle="""
    SELECT doc_id,
           CAST(length(text) AS INT) AS text_len,
           CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
           CAST(length(text) AS DOUBLE) / CAST(len(string_split(text, ' ')) AS DOUBLE) AS avg_token_len,
           CAST(len(list_filter(string_split(text, ' '),
                                t -> t IN ('the','a','of','and','to'))) AS INT) AS stopword_cnt,
           CAST(len(list_filter(string_split(text, ' '),
                                t -> t IN ('the','a','of','and','to'))) AS DOUBLE)
             / CAST(len(string_split(text, ' ')) AS DOUBLE) AS stopword_ratio
    FROM documents
    """,
)
def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 quality scoring — length / token stats / stopword-ratio
    heuristics (the C4/Gopher-rule family) as pure column expressions."""
    d = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(tokens_col())
    stop_cnt = F.size(
        F.filter(tokens_col(), lambda t: t.isin(*STOPWORDS))
    )
    return d.select(
        "doc_id",
        F.length("text").alias("text_len"),
        n_tokens.alias("n_tokens"),
        (F.length("text").cast("double") / n_tokens.cast("double")).alias(
            "avg_token_len"
        ),
        stop_cnt.alias("stopword_cnt"),
        (stop_cnt.cast("double") / n_tokens.cast("double")).alias("stopword_ratio"),
    )


@query(
    "q_fingerprint",
    oracle="""
    SELECT doc_id,
           list_reduce(
             list_prepend(CAST(7 AS BIGINT),
               list_transform(string_split(text, ' '),
                              t -> CAST(length(t) * 131 + ascii(t) AS BIGINT))),
             (acc, x) -> (acc * 31 + x) % 1000003) AS fingerprint
    FROM documents
    """,
)
def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 document fingerprinting — order-sensitive polynomial rolling
    hash over the token stream (content-defined identity; modulus keeps the
    accumulator < 2^20 so no overflow semantics are exercised in either
    engine)."""
    d = load_table(spark, sf_dir, "documents")
    token_vals = F.transform(
        tokens_col(), lambda t: (F.length(t) * 131 + F.ascii(t)).cast("long")
    )
    fp = F.aggregate(
        token_vals,
        F.lit(7).cast("long"),
        lambda acc, x: (acc * 31 + x) % 1000003,
    )
    return d.select("doc_id", fp.alias("fingerprint"))


@query(
    "q_binary_meta",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           substring(md5(text), 1, 8) AS content_id
    FROM documents
    """,
)
def q_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 multimodal columns — opaque binary payload + typed metadata.
    Here the payload is utf-8 bytes of text (the container has no image
    libs); the schema/plumbing pattern is identical for image/audio blobs:
    byte length + content hash travel as cheap typed metadata columns."""
    d = load_table(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "UTF-8")
    return d.select(
        "doc_id",
        F.octet_length(payload).cast("long").alias("n_bytes"),
        F.substring(F.md5(payload), 1, 8).alias("content_id"),
    )


def language_id(df: DataFrame, text_col: str = "text") -> Column:
    """Marker-token language heuristic (§2.10 language-ID): argmax of
    per-language function-word hit counts, 'und' when no marker hits.
    Declared query: q_langid. NB: higher-order F.filter treats a
    two-parameter lambda as (element, index) — marker sets must bind via a
    closure, not a lambda default arg."""
    markers = {
        "en": ["the", "and", "of"],
        "es": ["el", "la", "de"],
        "de": ["der", "die", "und"],
    }
    toks = F.split(F.col(text_col), " ")

    def hits(ws: list[str]) -> Column:
        return F.size(F.filter(toks, lambda t: t.isin(*ws)))

    best = F.greatest(*[hits(ws) for ws in markers.values()])
    pred = F.when(best == 0, F.lit("und"))
    for lang, ws in markers.items():
        pred = pred.when(hits(ws) == best, F.lit(lang))
    return pred.otherwise(F.lit("und"))


@query(
    "q_langid",
    oracle="""
    WITH scored AS (
      SELECT len(list_filter(string_split(text, ' '),
                 x -> x IN ('the', 'and', 'of'))) AS s_en,
             len(list_filter(string_split(text, ' '),
                 x -> x IN ('el', 'la', 'de'))) AS s_es,
             len(list_filter(string_split(text, ' '),
                 x -> x IN ('der', 'die', 'und'))) AS s_de
      FROM documents
    )
    SELECT CASE WHEN greatest(s_en, s_es, s_de) = 0 THEN 'und'
                WHEN s_en = greatest(s_en, s_es, s_de) THEN 'en'
                WHEN s_es = greatest(s_en, s_es, s_de) THEN 'es'
                ELSE 'de' END AS lang_pred,
           count(*) AS cnt
    FROM scored
    GROUP BY 1
    """,
)
def q_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 language-ID — marker-token heuristic distribution over the
    corpus. The when-chain tie-break order (en, es, de) is mirrored in the
    oracle's CASE; 'und' when no marker hits."""
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy(language_id(d).alias("lang_pred")).agg(
        F.count("*").alias("cnt")
    )


@query(
    "q_text_clean",
    oracle="""
    SELECT doc_id,
           trim(regexp_replace(
             regexp_replace(
               regexp_replace(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
               'https?://[^ ]+', '<URL>', 'g'),
             ' +', ' ', 'g')) AS clean_text
    FROM documents
    """,
)
def q_text_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data text scrub: mask emails and URLs, collapse repeated
    spaces, trim — the standard pre-tokenization normalization pass, as a
    chain of JVM-side regexp_replace (codegen'd, zero Python). At 100 TB
    this is a pure narrow map: no shuffle, predicate/column pruning intact."""
    d = load_table(spark, sf_dir, "documents")
    cleaned = F.trim(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(
                    F.col("text"),
                    r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
                    "<EMAIL>",
                ),
                r"https?://[^ ]+",
                "<URL>",
            ),
            r" +",
            " ",
        )
    )
    return d.select("doc_id", cleaned.alias("clean_text"))
