"""Distributed BPE tokenizer training (Sennrich et al., arXiv:1508.07909
— the byte-pair-encoding merge learner behind GPT-2/RoBERTa-family
vocabularies).

The engine-level question is the same as k-means': can an ITERATIVE
algorithm run Spark-first with bit-deterministic, oracle-replayable
rounds? Structure per merge round:

1. pair counting — explode adjacent symbol pairs of every word,
   weighted by word frequency: one vocabulary-wide hash aggregation
   (the corpus fact table is touched ONCE, up front, to build the word
   histogram; every round after that runs on the vocabulary table,
   which is orders of magnitude smaller than the corpus at any scale);
2. best pair — argmax with a total-order tie-break (max frequency,
   then lexicographically smallest pair): a ONE-ROW collect per round,
   the same documented scalar-collect budget as k-means' centroids and
   the CC convergence checksum;
3. merge application — a left-to-right non-overlapping scan replacing
   (l, r) with l||r inside every word's symbol array, as a pure
   higher-order ``aggregate`` fold (JVM-side, no UDF). The fold
   ("merge when the last emitted symbol is l and the current is r")
   is equivalent to the textbook index scan because a merged token
   l||r can never equal l (r is nonempty), so it can never trigger an
   overlapping re-merge.

Determinism: counts are integers, the argmax tie-break is total, and
the merge scan is order-insensitive to partitioning (per-word HOF).
The DuckDB oracle replays every round — pair-count CTE, argmax CTE,
and the merge scan as a recursive CTE walking (remaining, emitted)
lists — so a divergence in ANY round's choice or application is a
driver hash mismatch. Lineage is truncated each round with a lazy
localCheckpoint (the connected-components convention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from food_panda_etl_spark.localrel import values_df

#: End-of-word marker (its own symbol, per the BPE paper).
EOW = "</w>"


def _word_symbols(words: DataFrame) -> DataFrame:
    """word → initial symbol array: characters plus the EOW marker.

    Characters come from explicit substring indexing, NOT a regex `.`
    scan: `.` silently drops line terminators, and Java (Spark) and
    RE2-class (DuckDB) engines disagree on WHICH terminators (\\r,
    \\u0085, \\u2028...), so regex-split symbols diverge across engines
    on such input. substring(word, i, 1) has identical per-character
    semantics everywhere. Guard length=0: Spark sequence(1, 0) counts
    DOWN (the documented trap), so empty words map to [] + EOW."""
    chars = F.when(
        F.length("word") > 0,
        F.expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))"),
    ).otherwise(F.array().cast("array<string>"))
    return words.select(
        "word", "freq", F.concat(chars, F.array(F.lit(EOW))).alias("syms")
    )


def _pair_counts(words: DataFrame) -> DataFrame:
    pairs = F.when(
        F.size("syms") >= 2,
        F.expr(
            "transform(sequence(1, size(syms) - 1),"
            " i -> struct(syms[i-1] AS l, syms[i] AS r))"
        ),
    ).otherwise(F.array().cast("array<struct<l:string,r:string>>"))
    return (
        words.select(F.explode(pairs).alias("p"), "freq")
        .groupBy(F.col("p.l").alias("lhs"), F.col("p.r").alias("rhs"))
        .agg(F.sum("freq").alias("pair_freq"))
    )


def _apply_merge(words: DataFrame, lhs: str, rhs: str) -> DataFrame:
    """One merge round: scan-replace adjacent (lhs, rhs) with lhs||rhs."""
    merged_tok = F.lit(lhs + rhs)
    l_lit, r_lit = F.lit(lhs), F.lit(rhs)
    fold = F.aggregate(
        F.col("syms"),
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0) & (F.element_at(acc, -1) == l_lit) & (s == r_lit),
            F.concat(
                F.slice(acc, 1, F.greatest(F.size(acc) - 1, F.lit(0))),
                F.array(merged_tok),
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )
    return words.select("word", "freq", fold.alias("syms"))


def _bpe_fit(
    df: DataFrame, text_col: str, n_merges: int
) -> tuple[DataFrame, list[tuple[int, str, str, int]]]:
    """Shared fit loop: (final vocabulary DataFrame, merge list). The
    vocabulary carried through the loop ends up with every merge already
    applied, so callers that need the final word→symbols table (the
    encoder) get it without re-running a single round."""
    words = _word_symbols(
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    ).localCheckpoint(eager=False)

    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        best = (
            _pair_counts(words)
            .orderBy(F.col("pair_freq").desc(), "lhs", "rhs")
            .limit(1)
            .collect()
        )
        if not best:
            break
        b = best[0]
        merges.append((rank, b["lhs"], b["rhs"], int(b["pair_freq"])))
        words = _apply_merge(words, b["lhs"], b["rhs"]).localCheckpoint(
            eager=False
        )
    return words, merges


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 6,
) -> DataFrame:
    """Learn ``n_merges`` BPE merges from the whitespace-token word
    histogram of ``df[text_col]``. Returns the merge table
    (rank int, lhs string, rhs string, pair_freq bigint) — the
    tokenizer artifact itself; stops early if the pair table drains.

    Collect inventory: one (lhs, rhs, freq) row per round — nothing
    else leaves the cluster. At 100 TB the fact-table cost is the one
    word-histogram aggregation; each round then costs one pair
    hash-agg + one narrow HOF projection over the vocabulary table."""
    _, merges = _bpe_fit(df, text_col, n_merges)
    return values_df(
        df.sparkSession, merges,
        "rank int, lhs string, rhs string, pair_freq bigint",
    )


def bpe_vocab(df: DataFrame, text_col: str = "text", n_merges: int = 6):
    """The companion artifact: (words-with-final-symbols, merge table).
    Exposed for tests; the declared query ships the merge table."""
    words, merges = _bpe_fit(df, text_col, n_merges)
    return words, values_df(
        df.sparkSession, merges,
        "rank int, lhs string, rhs string, pair_freq bigint",
    )


def bpe_encode_counts(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 6,
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize every document with the learned merges and return the
    per-document BPE token count (id_col, n_bpe_tokens bigint) — the
    train→encode round trip, and the number an LLM data pipeline
    actually budgets with (sequence packing, mixture weighting, cost
    estimates all key off post-BPE token counts, not whitespace counts).

    The scale trick: merges are never applied to the corpus. The fit
    loop already produced the final word→symbols table, so encoding is
    one explode of the corpus into words plus ONE broadcast equi-join
    against the vocabulary (word, token_count) — the corpus is touched
    exactly twice total (histogram + encode), both times by narrow ops
    feeding hash aggregations, and the vocabulary never shuffles."""
    words, _ = _bpe_fit(df, text_col, n_merges)
    vocab = words.select("word", F.size("syms").alias("n_syms"))
    doc_words = df.select(
        id_col, F.explode(F.split(F.col(text_col), " ")).alias("word")
    )
    return (
        doc_words.join(F.broadcast(vocab), "word")
        .groupBy(id_col)
        .agg(F.sum("n_syms").alias("n_bpe_tokens"))
    )
