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


@query(
    "q_tfidf",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    tf AS (
      SELECT doc_id, term, count(*) AS tf FROM tok WHERE term <> ''
      GROUP BY doc_id, term
    ),
    df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term, tf.tf, df.df,
             CAST(tf.tf AS DOUBLE) * (CAST(n.n_docs AS DOUBLE) / CAST(df.df AS DOUBLE)) AS score
      FROM tf JOIN df USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df, score
    FROM (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rn
          FROM scored)
    WHERE rn <= 3
    """,
)
def q_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 — TF-IDF top-3 terms per document, log-free variant
    (score = tf · N/df): every factor is an integer so the double math is
    a single division+multiply — bit-identical across engines, unlike
    ln() whose libm rounding may differ. Plan: token explode (narrow) →
    (doc, term) hash agg → term-level df agg → per-doc top-k via
    WindowGroupLimit. At 100 TB the only fact-wide shuffles are the two
    aggregations; the df side is vocabulary-sized, so AQE broadcasts it
    when it fits and shuffle-joins when it does not (no forced hint)."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(tokens_col()).alias("term")).filter(
        F.col("term") != ""
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = d.agg(F.count("*").alias("n_docs"))
    # no broadcast HINT on df_: it is vocabulary-sized (small at test SFs,
    # where AQE broadcasts it anyway, but potentially GBs at corpus scale
    # — a forced broadcast would OOM exactly when it matters)
    scored = (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            (
                F.col("tf").cast("double")
                * (F.col("n_docs").cast("double") / F.col("df").cast("double"))
            ).alias("score"),
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "term", "tf", "df", "score")
    )


@query(
    "q_repetition",
    oracle="""
    WITH g AS (
      SELECT doc_id,
             list_transform(
               generate_series(1, greatest(len(string_split(text,' ')) - 1, 0)),
               i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]
             ) AS grams
      FROM documents
    )
    SELECT doc_id,
           CAST(len(grams) AS INT) AS total_bigrams,
           CAST(len(list_distinct(grams)) AS INT) AS distinct_bigrams,
           CASE WHEN len(grams) = 0 THEN NULL
                ELSE CAST(len(grams) - len(list_distinct(grams)) AS DOUBLE)
                     / CAST(len(grams) AS DOUBLE) END AS dup_ratio
    FROM g
    """,
)
def q_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 — repetition quality signal (Gopher-style duplicate-bigram
    fraction): high dup_ratio flags boilerplate/spam for training-data
    filtering. Pure narrow map — per-row array ops, zero shuffle; the
    ratio is an integer-derived double (deterministic division)."""
    d = load_table(spark, sf_dir, "documents")
    # materialize the token array BEFORE the transform lambda captures it:
    # a split() expression inside the lambda re-evaluates per element
    # (the quadratic trap operators/dedup.py::_shingles documents)
    with_toks = d.select("doc_id", tokens_col().alias("__toks"))
    toks = F.col("__toks")
    k = F.size(toks) - 1
    idx = F.when(k >= 1, F.sequence(F.lit(1), k)).otherwise(
        F.array().cast("array<int>")
    )
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", F.element_at(toks, i.cast("int")), F.element_at(toks, (i + 1).cast("int"))
        ),
    )
    total = F.size(grams)
    dist = F.size(F.array_distinct(grams))
    return with_toks.select(
        "doc_id",
        total.alias("total_bigrams"),
        dist.alias("distinct_bigrams"),
        F.when(total == 0, F.lit(None).cast("double"))
        .otherwise((total - dist).cast("double") / total.cast("double"))
        .alias("dup_ratio"),
    )


@query(
    "q_heavy_hitters",
    oracle="""
    WITH tok AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
    SELECT token, count(*) AS cnt
    FROM tok
    GROUP BY token
    HAVING CAST(count(*) AS DOUBLE) > 0.01 * (SELECT count(*) FROM tok)
    """,
)
def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 frequent items — tokens exceeding 1% of the corpus stream
    (vocabulary QA: boilerplate markers, over-represented stopwords).
    NOT a groupBy-having: `operators/heavy.py::heavy_hitters` runs
    mergeable Misra-Gries summaries per partition (≤ k counters emitted,
    never the vocabulary) and exact-counts the candidate union behind a
    broadcast semi-join — output provably identical to the brute-force
    HAVING under any partitioning, which is why the exact-SQL oracle
    applies to a sketch-pruned plan."""
    from food_panda_etl_spark.operators.heavy import heavy_hitters

    d = load_table(spark, sf_dir, "documents")
    tok = d.select(F.explode(tokens_col()).alias("token"))
    return heavy_hitters(tok, "token", fraction=0.01)


@query(
    "q_lm_score",
    oracle="""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    ix AS (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 1)) AS i
           FROM w WHERE len(toks) >= 2),
    bg AS (SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2 FROM ix),
    cb AS (SELECT w1, w2, count(*) AS cbig FROM bg GROUP BY w1, w2),
    cu AS (SELECT w1, count(*) AS cctx FROM bg GROUP BY w1),
    s AS (SELECT bg.doc_id,
                 CAST(round((CAST(cbig AS DOUBLE) / CAST(cctx AS DOUBLE))
                            * CAST(1000000000000 AS DOUBLE)) AS BIGINT) AS pg
          FROM bg JOIN cb USING (w1, w2) JOIN cu USING (w1))
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           (CAST(sum(pg) AS DOUBLE) / CAST(1000000000000 AS DOUBLE))
             / CAST(count(*) AS DOUBLE) AS lm_score,
           CAST((CAST(sum(pg) AS DOUBLE) / CAST(1000000000000 AS DOUBLE))
                / CAST(count(*) AS DOUBLE) >= 0.033 AS INT) AS keep
    FROM s GROUP BY doc_id
    """,
)
def q_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 n-gram LM quality filter (VERDICT r5 task 4) — the
    CCNet/Gopher-style perplexity filter: train bigram counts on the
    corpus (two hash aggregations), score each document with the
    LOG-FREE arithmetic-mean conditional probability (libm-free — the
    q_bm25/q_tfidf determinism trick), flag the low-likelihood tail
    below 0.033 (keeps ~93% of the synthetic corpus at every SF — a
    real split, not a constant column). Sub-2-token documents have no
    bigrams and are not scored. Everything is hash-agg + unhinted
    vocabulary joins; see `operators/lm.py` for the 100 TB posture."""
    from food_panda_etl_spark.operators.lm import bigram_lm_score

    d = load_table(spark, sf_dir, "documents")
    return bigram_lm_score(d, "doc_id", "text", keep_threshold=0.033)


@query(
    "q_token_count_bpe",
    oracle=r"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS INT)
             AS n_subtokens,
           CAST(len(string_split(text, ' ')) AS INT) AS n_words,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS DOUBLE)
             / CAST(len(string_split(text, ' ')) AS DOUBLE) AS subtokens_per_word
    FROM documents
    """,
)
def q_token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 token counting, BPE-ish variant (the brief's second counting
    mode): a GPT-2-style PRE-tokenizer pass — letter runs, digit runs,
    single punctuation marks — counted via `regexp_extract_all`, plus the
    subtokens-per-word ratio (the fertility proxy that budgets real BPE
    token costs from cheap regex counts). Alternation is lookahead-free
    so Java (Spark) and RE2-style (DuckDB) engines match identically;
    pure codegen, zero Python, narrow map — same 100 TB shape as
    q_token_count."""
    d = load_table(spark, sf_dir, "documents")
    # idx=0 = the whole match (Spark defaults to capture group 1, and the
    # alternation deliberately has no groups)
    sub = F.size(
        F.regexp_extract_all(
            F.col("text"), F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), F.lit(0)
        )
    )
    words = F.size(tokens_col())
    return d.select(
        "doc_id",
        sub.alias("n_subtokens"),
        words.alias("n_words"),
        (sub.cast("double") / words.cast("double")).alias("subtokens_per_word"),
    )


_SUBSTR_N = 8  # min duplicated-substring length, in tokens


@query(
    "q_substring_dedup",
    # Interpolated from _SUBSTR_N (the CHUNK_WINDOW convention) so the
    # span arithmetic can never desync from the operator's n.
    oracle=f"""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    sh AS (SELECT doc_id, i - 1 AS pos,
                  array_to_string(toks[i : i + {_SUBSTR_N - 1}], ' ') AS gram
           FROM w, unnest(generate_series(1, len(toks) - {_SUBSTR_N - 1})) AS t(i)),
    dup AS (SELECT gram FROM sh GROUP BY gram
            HAVING count(DISTINCT doc_id) >= 2),
    hits AS (SELECT doc_id, pos FROM sh JOIN dup USING (gram)),
    g AS (SELECT doc_id, pos,
                 CASE WHEN lag(pos) OVER w IS NULL
                       OR pos > lag(pos) OVER w + {_SUBSTR_N}
                      THEN 1 ELSE 0 END AS brk
          FROM hits WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
    gi AS (SELECT doc_id, pos,
                  sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                                 ROWS UNBOUNDED PRECEDING) AS grp
           FROM g)
    SELECT doc_id,
           CAST(min(pos) AS INT) AS span_start,
           CAST(max(pos) + {_SUBSTR_N} AS INT) AS span_end,
           CAST(max(pos) + {_SUBSTR_N} - min(pos) AS INT) AS span_tokens
    FROM gi GROUP BY doc_id, grp
    """,
)
def q_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 substring-level exact dedup (VERDICT r5 task 5; Lee et al.
    2107.06499): maximal token extents covered by 8-grams shared across
    >= 2 distinct documents — the repeated-passage detector that
    doc-level `q_dedup` and `q_decontaminate` cannot see. One row per
    (doc, maximal span) with 0-based [start, end) token offsets.
    Spark-first: positioned shingle double-hash buckets + per-doc
    gaps-and-islands merge, never a suffix array; the oracle re-derives
    the same spans from the gram STRINGS, so a hash collision changing
    the answer would fail the hash-match (none can at 128 bits). See
    `operators/dedup.py::duplicated_substring_spans` for the 100 TB
    shuffle accounting."""
    from food_panda_etl_spark.operators.dedup import duplicated_substring_spans

    d = load_table(spark, sf_dir, "documents")
    return duplicated_substring_spans(d, "doc_id", "text", n=_SUBSTR_N)


@query(
    "q_decontaminate",
    oracle="""
    WITH sh AS (
      SELECT DISTINCT doc_id AS doc, shingle FROM (
        SELECT doc_id,
               unnest(list_transform(
                 generate_series(1, greatest(len(string_split(text,' ')) - 4, 0)),
                 i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1] || ' ' ||
                      string_split(text,' ')[i+2] || ' ' || string_split(text,' ')[i+3] || ' ' ||
                      string_split(text,' ')[i+4])) AS shingle
        FROM documents) WHERE shingle <> ''),
    ev AS (SELECT DISTINCT shingle FROM sh WHERE doc % 7 = 0),
    tr AS (SELECT * FROM sh WHERE doc % 7 <> 0)
    SELECT tr.doc AS doc_id, count(*) AS n_shared
    FROM tr JOIN ev ON tr.shingle = ev.shingle
    GROUP BY tr.doc
    """,
)
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 benchmark decontamination — flag every training document
    sharing a 5-gram with the held-out "benchmark" slice (doc_id % 7 = 0
    stands in for the eval corpus): `operators/dedup.py::
    ngram_contamination`. The contamination join is train-shingles ⋈
    broadcast(eval-shingles) — no self-join, no df² term — and n_shared
    is the exact distinct-overlap count, so the plain SQL oracle applies
    directly."""
    from food_panda_etl_spark.operators.dedup import ngram_contamination

    d = load_table(spark, sf_dir, "documents")
    evals = d.filter(F.col("doc_id") % 7 == 0)
    train = d.filter(F.col("doc_id") % 7 != 0)
    return ngram_contamination(train, evals, "doc_id", "text", n=5)


def _pii_oracle() -> str:
    """Compose the redaction oracle from operators/redact.py::PII_PATTERNS
    (the CHUNK_WINDOW convention — pattern edits can never desync the
    oracle). Each stage counts on, then rewrites, the previous stage's
    text, mirroring redact_pii exactly."""
    from food_panda_etl_spark.operators.redact import PII_PATTERNS

    stages = []
    prev_cte, prev_col = "inj", "t"
    carried: list[str] = []
    for i, (name, pat, repl) in enumerate(PII_PATTERNS):
        sq = pat.replace("'", "''")
        carry = (", " + ", ".join(carried)) if carried else ""
        stages.append(
            f"s{i} AS (SELECT doc_id, "
            f"CAST(len(regexp_extract_all({prev_col}, '{sq}')) AS INT) AS n_{name}, "
            f"regexp_replace({prev_col}, '{sq}', '{repl}', 'g') AS t{i}"
            f"{carry} FROM {prev_cte})"
        )
        carried.append(f"n_{name}")
        prev_cte, prev_col = f"s{i}", f"t{i}"
    names = ", ".join(carried)
    return f"""
    WITH inj AS (SELECT doc_id,
           text || CASE WHEN doc_id % 3 = 0
                        THEN ' contact user' || CAST(doc_id AS VARCHAR)
                             || '@mail.example.org now' ELSE '' END
                || CASE WHEN doc_id % 4 = 0
                        THEN ' call +1 555-010' || CAST(doc_id % 10 AS VARCHAR)
                        ELSE '' END
                || CASE WHEN doc_id % 5 = 0
                        THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR)
                             || '.77' ELSE '' END AS t
    FROM documents),
    {", ".join(stages)}
    SELECT doc_id, {names}, {prev_col} AS redacted FROM {prev_cte}
    """


@query("q_pii_redact", oracle=None)  # oracle injected below (needs import order)
def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 PII redaction (r6) — the pre-release corpus scrub: emails,
    phone numbers, and IPs (deterministically injected per doc_id so
    every pattern is exercised) masked by a chain of `regexp_replace`
    stages, with per-type match counts taken against each stage's input.
    ONE narrow codegen projection — no shuffle, no UDF; patterns use
    only the Java-regex ∩ RE2 dialect so the DuckDB oracle's 'g'
    replacement is byte-identical. See `operators/redact.py`."""
    from food_panda_etl_spark.operators.redact import PII_PATTERNS, redact_pii

    d = load_table(spark, sf_dir, "documents")
    did = F.col("doc_id")
    injected = F.concat(
        F.col("text"),
        F.when(
            did % 3 == 0,
            F.concat(
                F.lit(" contact user"),
                did.cast("string"),
                F.lit("@mail.example.org now"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            did % 4 == 0,
            F.concat(F.lit(" call +1 555-010"), (did % 10).cast("string")),
        ).otherwise(F.lit("")),
        F.when(
            did % 5 == 0,
            F.concat(
                F.lit(" from 10.0."), (did % 256).cast("string"), F.lit(".77")
            ),
        ).otherwise(F.lit("")),
    )
    redacted, counts = redact_pii(injected)
    return d.select(
        "doc_id",
        *[
            c.cast("int").alias(f"n_{name}")
            for c, (name, _, _) in zip(counts, PII_PATTERNS)
        ],
        redacted.alias("redacted"),
    )


# late-bound oracle: composed from PII_PATTERNS at import time
from food_panda_etl_spark.queries import ORACLES as _ORACLES  # noqa: E402

_ORACLES["q_pii_redact"] = _pii_oracle()


def _bpe_cte_parts(n_merges: int) -> list[str]:
    """The shared DuckDB replay chain: word-frequency + initial-symbol
    CTEs, then per round a pair-count CTE, a total-order argmax CTE,
    and the merge scan as a recursive CTE walking (remaining, emitted)
    symbol lists. Generated from the same ``n_merges`` the Spark side
    uses (the CHUNK_WINDOW convention). Non-recursive CTEs are
    MATERIALIZED — without the hint DuckDB re-inlines each round's
    recursion into the next and the plan goes exponential in rounds."""
    parts = [
        """wf AS MATERIALIZED (SELECT word, CAST(count(*) AS BIGINT) AS freq
      FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      GROUP BY word),
    r0 AS MATERIALIZED (SELECT word, freq,
                  list_append(
                    list_transform(generate_series(1, length(word)),
                                   i -> word[i:i]), '</w>') AS syms
           FROM wf)"""
    ]
    for k in range(n_merges):
        parts.append(
            f"""p{k} AS MATERIALIZED (SELECT syms[i] AS lhs, syms[i+1] AS rhs,
                  CAST(sum(freq) AS BIGINT) AS pair_freq
           FROM r{k}, unnest(generate_series(1, len(syms) - 1)) AS t(i)
           GROUP BY 1, 2),
    b{k} AS MATERIALIZED (SELECT lhs, rhs, pair_freq FROM p{k}
           ORDER BY pair_freq DESC, lhs, rhs LIMIT 1),
    s{k} AS (
      SELECT word, freq, syms AS rem, CAST([] AS VARCHAR[]) AS done FROM r{k}
      UNION ALL
      SELECT word, freq,
        CASE WHEN len(rem) >= 2 AND rem[1] = (SELECT lhs FROM b{k})
                  AND rem[2] = (SELECT rhs FROM b{k})
             THEN rem[3:] ELSE rem[2:] END,
        CASE WHEN len(rem) >= 2 AND rem[1] = (SELECT lhs FROM b{k})
                  AND rem[2] = (SELECT rhs FROM b{k})
             THEN list_append(done, (SELECT lhs FROM b{k})
                                    || (SELECT rhs FROM b{k}))
             ELSE list_append(done, rem[1]) END
      FROM s{k} WHERE len(rem) > 0),
    r{k + 1} AS MATERIALIZED (SELECT word, freq, done AS syms
           FROM s{k} WHERE len(rem) = 0)"""
        )
    return parts


def _bpe_oracle(n_merges: int) -> str:
    """Merge-table replay: one row per round from the argmax CTEs."""
    parts = _bpe_cte_parts(n_merges)
    selects = [
        f"SELECT {k} AS rank, lhs, rhs, pair_freq FROM b{k}"
        for k in range(n_merges)
    ]
    return (
        "WITH RECURSIVE "
        + ",\n    ".join(parts)
        + "\n    "
        + "\n    UNION ALL ".join(selects)
    )


def _bpe_encode_oracle(n_merges: int) -> str:
    """Encode replay: join per-doc words against the final vocabulary
    state r{n} of the same chain and sum the symbol counts."""
    parts = _bpe_cte_parts(n_merges)
    return (
        "WITH RECURSIVE "
        + ",\n    ".join(parts)
        + f"""
    SELECT d.doc_id, CAST(sum(len(r.syms)) AS BIGINT) AS n_bpe_tokens
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
          FROM documents) d
    JOIN r{n_merges} r USING (word)
    GROUP BY d.doc_id"""
    )


_BPE_MERGES = 6


@query("q_bpe_train", oracle=_bpe_oracle(_BPE_MERGES))
def q_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 BPE tokenizer training (r6) — learn the first 6 merges of
    a byte-pair-encoding vocabulary from the corpus word histogram
    (Sennrich 1508.07909), the third driver-oracled ITERATIVE algorithm
    (after k-means and connected components). The fact table is touched
    once (word histogram); each round is one vocabulary-sized pair
    hash-agg, a one-row argmax collect (total-order tie-break), and a
    pure higher-order fold applying the merge — no UDFs, no fact-wide
    iteration. The oracle replays all 6 rounds (recursive-CTE merge
    scans), so a wrong choice OR a wrong application in any round is a
    driver hash mismatch. See `operators/bpe.py` for the 100 TB
    accounting and the fold≡scan equivalence argument."""
    from food_panda_etl_spark.operators.bpe import bpe_train

    d = load_table(spark, sf_dir, "documents")
    return bpe_train(d, "text", n_merges=_BPE_MERGES)


_DSIR_BUCKETS = 1024
_DSIR_KEEP = 1.0

# The DSIR CTE chain through the per-gram ratio table `s`, shared by
# q_dsir_weight and the q_select_pipeline composite so the two oracles
# cannot drift (the q_hybrid_rrf composed-fragment convention). Bucket
# arithmetic is q_fingerprint's portable polynomial — no engine hash
# functions on either side.
_DSIR_CTES = f"""w AS (SELECT doc_id, CAST(lang = 'en' AS INT) AS tgt,
                      string_split(text, ' ') AS toks FROM documents),
    ix AS (SELECT doc_id, tgt, toks,
                  unnest(generate_series(1, len(toks) - 1)) AS i
           FROM w WHERE len(toks) >= 2),
    bg AS (SELECT doc_id, tgt,
            ((7*31 + (length(toks[i])*131 + ascii(toks[i])))*31
              + (length(toks[i+1])*131 + ascii(toks[i+1])))
             % 1000003 % {_DSIR_BUCKETS} AS b
           FROM ix),
    rc AS (SELECT b, count(*) AS rb FROM bg GROUP BY b),
    tc AS (SELECT b, count(*) AS tb FROM bg WHERE tgt = 1 GROUP BY b),
    tot AS (SELECT count(*) AS rt, CAST(sum(tgt) AS BIGINT) AS tt FROM bg),
    s AS (SELECT bg.doc_id,
            CAST(round((CAST(coalesce(tb, 0) * rt AS DOUBLE)
                        / CAST(rb * tt AS DOUBLE))
                       * CAST(10000000000 AS DOUBLE)) AS BIGINT) AS rho
          FROM bg JOIN rc USING (b) LEFT JOIN tc USING (b) CROSS JOIN tot)"""


@query(
    "q_dsir_weight",
    # Interpolated from the same constants the Spark side uses so the
    # bucket count / threshold can never desync (the CHUNK_WINDOW
    # convention).
    oracle=f"""
    WITH {_DSIR_CTES}
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
           (CAST(sum(rho) AS DOUBLE) / CAST(10000000000 AS DOUBLE))
             / CAST(count(*) AS DOUBLE) AS dsir_score,
           CAST((CAST(sum(rho) AS DOUBLE) / CAST(10000000000 AS DOUBLE))
                / CAST(count(*) AS DOUBLE) >= {_DSIR_KEEP} AS INT) AS keep
    FROM s GROUP BY doc_id
    """,
)
def q_dsir_weight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 DSIR importance weighting (r6) — data selection via hashed
    n-gram importance weights (Xie 2302.03169): fit hashed-bigram
    multinomials on the target subset (lang='en') and the raw corpus,
    weight every document by the log-free mean likelihood ratio, flag
    the target-like half (≥1.0 = "more likely under the target model
    than the corpus average"; keeps 89% of English docs vs 15-20% of
    each other language at sf0.01 — a real selection, not a constant).
    Two bucket-count tables (≤1024 rows, AQE-broadcast), totals ride
    in-plan as a broadcast 1-row aggregate, zero collects. See
    `operators/dsir.py` for the determinism and 100 TB accounting."""
    from food_panda_etl_spark.operators.dsir import dsir_weights

    d = load_table(spark, sf_dir, "documents")
    return dsir_weights(
        d,
        F.col("lang") == "en",
        buckets=_DSIR_BUCKETS,
        keep_threshold=_DSIR_KEEP,
    )


_SEL_K = 20


@query(
    "q_select_pipeline",
    # Composite oracle = the shared DSIR fragment + the PPS tail over
    # the kept subset, so the pipeline oracle can only drift if a stage
    # oracle drifts.
    oracle=f"""
    WITH {_DSIR_CTES},
    ds AS (SELECT doc_id,
                  (CAST(sum(rho) AS DOUBLE) / CAST(10000000000 AS DOUBLE))
                    / CAST(count(*) AS DOUBLE) AS dsir_score
           FROM s GROUP BY doc_id),
    sel AS (SELECT doc_id, dsir_score FROM ds
            WHERE dsir_score >= {_DSIR_KEEP}),
    sw AS (SELECT d.doc_id, CAST(d.n_chars AS BIGINT) AS wgt,
                  ((d.doc_id % 1000003) * 1315423911) % 1000003 AS h,
                  sel.dsir_score
           FROM documents d JOIN sel ON d.doc_id = sel.doc_id),
    c AS (SELECT doc_id, wgt, dsir_score,
                 sum(wgt) OVER (ORDER BY h, doc_id
                                ROWS UNBOUNDED PRECEDING) AS cum
          FROM sw),
    t AS (SELECT sum(wgt) AS tot FROM sw)
    SELECT doc_id, wgt AS weight, CAST(cum AS BIGINT) AS cum_weight,
           CAST(({_SEL_K} * cum) // tot
                - ({_SEL_K} * (cum - wgt)) // tot AS BIGINT) AS n_ticks,
           dsir_score
    FROM c CROSS JOIN t
    WHERE ({_SEL_K} * cum) // tot > ({_SEL_K} * (cum - wgt)) // tot
    """,
)
def q_select_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 data-selection composite (r6 flagship) — the DSIR paper's
    actual two-step pipeline run end to end IN ONE HASH-MATCH: score
    every document against the lang='en' target (hashed-bigram
    likelihood ratios), keep the target-like half, then draw a
    20-document systematic PPS sample from the kept subset weighted by
    n_chars. Chaining matters: the PPS grid (total weight, hash-ordered
    prefix sums) is computed over the FILTERED corpus, so a wrong keep
    decision anywhere upstream shifts every tick downstream — the
    oracle catches cross-stage wiring, not just per-stage arithmetic.
    Scale cost = DSIR (hash aggs + ≤1024-row joins) + one range
    exchange for the prefix sum; the final score join is sample-sized
    and AQE-broadcast."""
    from food_panda_etl_spark.operators.dsir import dsir_weights
    from food_panda_etl_spark.operators.sampling import pps_systematic_sample

    d = load_table(spark, sf_dir, "documents")
    kept = (
        dsir_weights(
            d,
            F.col("lang") == "en",
            buckets=_DSIR_BUCKETS,
            keep_threshold=_DSIR_KEEP,
        )
        .filter(F.col("keep") == 1)
        .select("doc_id", "dsir_score")
    )
    # dsir_score rides through the sampler as a carry column (no
    # re-join), and the seed is lazily checkpointed because the
    # sampler's prefix-sum machinery references its input three times
    # (per-partition totals, offsets, main pass) — without the
    # checkpoint the whole DSIR subtree re-executes per reference.
    seed = (
        d.select("doc_id", "n_chars")
        .join(kept, "doc_id")
        .localCheckpoint(eager=False)
    )
    samp = pps_systematic_sample(
        seed, "n_chars", k=_SEL_K, carry_cols=("dsir_score",)
    )
    return samp.select(
        "doc_id", "weight", "cum_weight", "n_ticks", "dsir_score"
    )


@query("q_bpe_encode", oracle=_bpe_encode_oracle(_BPE_MERGES))
def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 BPE encoding (r6) — tokenize every document with the
    merges learned by `q_bpe_train` and emit the per-document BPE token
    count, the number sequence packing / mixture weighting / training
    cost estimates actually budget with. Merges are never applied to
    the corpus: the fit's final word→symbols table IS the tokenizer,
    and encoding is one explode + ONE broadcast equi-join against that
    vocabulary (corpus touched exactly twice end-to-end). The oracle
    replays the full train chain and joins the final vocabulary state,
    so train and encode are hash-checked together."""
    from food_panda_etl_spark.operators.bpe import bpe_encode_counts

    d = load_table(spark, sf_dir, "documents")
    return bpe_encode_counts(d, "text", n_merges=_BPE_MERGES)


@query(
    "q_corpus_stats",
    oracle="""
    WITH t AS (
      SELECT lang, n_chars,
             len(string_split(text, ' ')) AS ntok,
             list_reduce(
               list_prepend(CAST(7 AS BIGINT),
                 list_transform(string_split(text, ' '),
                                x -> CAST(length(x) * 131 + ascii(x) AS BIGINT))),
               (acc, x) -> (acc * 31 + x) % 1000003) AS fp
      FROM documents),
    a AS (
      SELECT CAST(count(*) AS DOUBLE) AS n_docs,
             CAST(sum(ntok) AS DOUBLE) AS n_tokens,
             CAST(sum(ntok) AS DOUBLE) / CAST(count(*) AS DOUBLE)
               AS mean_tokens,
             CAST(count(DISTINCT fp) AS DOUBLE) AS n_unique_fp,
             CAST(sum(CASE WHEN n_chars < 100 THEN 1 ELSE 0 END) AS DOUBLE)
               / CAST(count(*) AS DOUBLE) AS pct_short,
             CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS DOUBLE)
               / CAST(count(*) AS DOUBLE) AS pct_en,
             CAST(sum(CASE WHEN lang = 'zh' THEN 1 ELSE 0 END) AS DOUBLE)
               / CAST(count(*) AS DOUBLE) AS pct_zh
      FROM t)
    SELECT 'n_docs' AS metric, n_docs AS value FROM a
    UNION ALL SELECT 'n_tokens', n_tokens FROM a
    UNION ALL SELECT 'mean_tokens', mean_tokens FROM a
    UNION ALL SELECT 'n_unique_fp', n_unique_fp FROM a
    UNION ALL SELECT 'pct_short', pct_short FROM a
    UNION ALL SELECT 'pct_en', pct_en FROM a
    UNION ALL SELECT 'pct_zh', pct_zh FROM a
    """,
)
def q_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 corpus statistics card (r6) — the summary a pipeline
    publishes with every dataset release (docs, token mass, mean
    length, content uniqueness, short-doc and language fractions) as
    ONE narrow scan + ONE aggregation, unpivoted to (metric, value)
    rows with `stack`. Uniqueness counts DISTINCT portable rolling-hash
    fingerprints (the q_fingerprint polynomial) rather than distinct
    text — the payload never enters the distinct shuffle, the 100 TB
    version of `count(DISTINCT text)`. Every value is an integer count
    or one IEEE division of integer-derived doubles — bit-exact with no
    decimal machinery."""
    d = load_table(spark, sf_dir, "documents")
    token_vals = F.transform(
        tokens_col(), lambda t: (F.length(t) * 131 + F.ascii(t)).cast("long")
    )
    fp = F.aggregate(
        token_vals, F.lit(7).cast("long"), lambda acc, x: (acc * 31 + x) % 1000003
    )
    a = d.select(
        F.size(tokens_col()).alias("ntok"),
        F.col("n_chars"),
        F.col("lang"),
        fp.alias("fp"),
    ).agg(
        F.count("*").cast("double").alias("n_docs"),
        F.sum("ntok").cast("double").alias("n_tokens"),
        (F.sum("ntok").cast("double") / F.count("*").cast("double")).alias(
            "mean_tokens"
        ),
        F.countDistinct("fp").cast("double").alias("n_unique_fp"),
        (
            F.sum((F.col("n_chars") < 100).cast("long")).cast("double")
            / F.count("*").cast("double")
        ).alias("pct_short"),
        (
            F.sum((F.col("lang") == "en").cast("long")).cast("double")
            / F.count("*").cast("double")
        ).alias("pct_en"),
        (
            F.sum((F.col("lang") == "zh").cast("long")).cast("double")
            / F.count("*").cast("double")
        ).alias("pct_zh"),
    )
    return a.selectExpr(
        "stack(7, 'n_docs', n_docs, 'n_tokens', n_tokens,"
        " 'mean_tokens', mean_tokens, 'n_unique_fp', n_unique_fp,"
        " 'pct_short', pct_short, 'pct_en', pct_en, 'pct_zh', pct_zh)"
        " as (metric, value)"
    )


@query(
    "q_nfc_normalize",
    # chr(769)=U+0301 combining acute, chr(233)=é composed,
    # chr(778)=U+030A combining ring — the suffix mix makes `changed`
    # a real split (decomposed suffixes normalize, the composed one
    # does not), the injected-observability convention.
    oracle="""
    WITH raw AS (
      SELECT doc_id,
             text[1:20] || CASE doc_id % 3
               WHEN 0 THEN 'e' || chr(769)
               WHEN 1 THEN chr(233)
               ELSE 'A' || chr(778) END AS s
      FROM documents)
    SELECT doc_id,
           CAST(length(s) AS INT) AS n_before,
           CAST(length(nfc_normalize(s)) AS INT) AS n_after,
           CAST(s <> nfc_normalize(s) AS INT) AS changed
    FROM raw
    """,
)
def q_nfc_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 Unicode NFC normalization (r6) — the canonicalization
    every dedup/fingerprint pipeline runs before hashing: codepoint
    variants of identical text ("é" vs "e"+U+0301) must hash the same
    or exact dedup silently misses. No JVM built-in exists, so this is
    a justified Arrow-batched pandas_udf (`functions/textnorm.py`);
    the oracle is DuckDB's independent `nfc_normalize` — the driver
    hash proves Python's unicodedata and DuckDB implement canonical
    composition identically. The corpus is ASCII, so each doc gets a
    deterministic suffix (two decomposed, one composed) making both
    the length change and the changed flag observable splits. Pure
    narrow projection — no shuffle at any scale."""
    from food_panda_etl_spark.functions.textnorm import nfc

    d = load_table(spark, sf_dir, "documents")
    suffix = F.element_at(
        F.array(F.lit("é"), F.lit("é"), F.lit("Å")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    raw = F.concat(F.substring("text", 1, 20), suffix)
    out = d.select("doc_id", raw.alias("__s"), nfc(raw).alias("__n"))
    return out.select(
        "doc_id",
        F.length("__s").cast("int").alias("n_before"),
        F.length("__n").cast("int").alias("n_after"),
        (F.col("__s") != F.col("__n")).cast("int").alias("changed"),
    )
