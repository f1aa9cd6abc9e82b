"""Edit-distance (Levenshtein) similarity self-join — the string
member of the prefix-filtering family (`prefix_join.py` relative
Jaccard, `overlap_join.py` absolute overlap, `weighted_jaccard.py`
multiset Jaccard, THIS bounded edit distance). The fuzzy-match
workhorse for titles / names / URLs / short fields where token-level
Jaccard is too coarse: find every pair within ``k`` character edits,
exactly.

Theory (Gravano et al., VLDB 2001 q-gram filters; Xiao-Wang-Lin
Ed-Join, VLDB 2008): one character edit changes at most ``q`` of a
string's q-grams, so ED(a, b) ≤ k implies the q-gram MULTISETS
overlap in ≥ max(n_a, n_b) − k·q elements (n = len − q + 1), and
lengths differ by ≤ k. Under the occurrence-indexed expansion
(`weighted_jaccard.occurrence_expand` — multiset overlap IS set
overlap of the expansion) the standard prefix lemma then says a
qualifying pair must share an element among the first k·q + 1 of each
side's expanded q-grams in ONE global canonical order — a CONSTANT
prefix length, the Ed-Join signature. So candidate generation is the
existing machinery verbatim: counted q-grams → occurrence expansion →
`prefix_join.ranked_shingles` (df ASC, element ASC — rarest first) →
keep ``__pos ≤ k·q + 1`` → prefix×prefix equi-join + integer length
filter; the verify is one `F.levenshtein` per candidate — and Spark's
and DuckDB's levenshtein are the same classic unit-cost DP over
characters, so the declared query's integer distances hash-match the
brute-force SQL exactly (the completeness theorem, machine-checked).

Short strings are the one regime the count bound cannot prune: when
n ≤ k·q (len ≤ k·q + q − 1) a pair may be within k edits while
sharing ZERO q-grams ("ab" vs "cd" at k=2). Those rows are split into
a short bucket, BROADCAST (short strings are a bounded sliver of any
realistic corpus — and at q=2, k=2 that is len ≤ 5), and verified
directly against every row within the length window — map-only on
the big side. Exactness over arbitrary inputs is property-tested.

Scale: ONE q-gram pass, the constant-length prefix keeps the
candidate join keyed on the RAREST grams (volume tracks near-match
mass, not hot-gram df²), the verify is candidate-bounded, and every
shuffle is keyed on 8-byte ids / gram structs. The honest boundary:
"rarest" only helps if rare grams EXIST — a corpus confined to a tiny
q-gram alphabet (all-digit keys, hex ids) has ~|Σ|^q distinct grams
total, every prefix gram is hot, and the candidate join degenerates
toward all-pairs (measured: digit-string corpora at q=2 filled the
shuffle disk where 26-letter corpora at q=4 scale linearly —
bench_scale.py's r16 curve note). For such corpora raise ``q`` until
|Σ|^q ≫ N, or this is not the right operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from food_panda_etl_spark.operators.prefix_join import ranked_shingles
from food_panda_etl_spark.operators.weighted_jaccard import occurrence_expand


def qgram_multiset_table(
    df: DataFrame, id_col: str, str_col: str, q: int = 2
) -> DataFrame:
    """(doc, shingle, c bigint) — character q-grams WITH multiplicities
    (named ``shingle`` so the ranked-prefix machinery applies
    verbatim). Strings shorter than q yield zero rows (the short
    bucket covers them)."""
    if q < 1:
        raise ValueError(f"qgram_multiset_table: need q >= 1, got {q}")
    par = df.sparkSession.sparkContext.defaultParallelism
    src = df.select(
        F.col(id_col).alias("doc"), F.col(str_col).alias("__s")
    ).repartition(par, "doc")
    n = F.length("__s") - (q - 1)
    idx = F.when(n >= 1, F.sequence(F.lit(1), n)).otherwise(
        F.array().cast("array<int>")
    )
    gram = F.transform(idx, lambda i: F.col("__s").substr(i, F.lit(q)))
    return (
        src.select("doc", F.explode(gram).alias("shingle"))
        .groupBy("doc", "shingle")
        .agg(F.count("*").cast("bigint").alias("c"))
    )


def edit_distance_join(
    df: DataFrame,
    id_col: str,
    str_col: str,
    k: int = 2,
    q: int = 2,
) -> DataFrame:
    """(id_a, id_b, dist int) — EXACTLY the pairs with
    levenshtein(s_a, s_b) ≤ k and id_a < id_b, equal row-for-row to
    the brute-force all-pairs join (the completeness property test /
    declared-query oracle). NULL strings never pair (no edit sequence
    reaches an unknown value)."""
    if k < 0:
        raise ValueError(f"edit_distance_join: need k >= 0, got {k}")
    if q < 1:
        raise ValueError(f"edit_distance_join: need q >= 1, got {q}")
    par = df.sparkSession.sparkContext.defaultParallelism
    strs = (
        df.select(F.col(id_col).alias("doc"), F.col(str_col).alias("__s"))
        .filter(F.col("__s").isNotNull())
        .repartition(par, "doc")
        .localCheckpoint(eager=False)  # consumers: grams, short, verify
    )
    # long strings: n = len − q + 1 > k·q, where the count bound prunes
    long_side = strs.filter(F.length("__s") - (q - 1) > k * q)
    short_side = strs.filter(F.length("__s") - (q - 1) <= k * q)

    exp = occurrence_expand(
        qgram_multiset_table(
            long_side.withColumnRenamed("__s", "s"), "doc", "s", q
        )
    )
    ranked = ranked_shingles(exp)
    prefix = ranked.filter(F.col("__pos") <= k * q + 1).select(
        "doc", "shingle", "n_sh"
    )
    a = prefix.select(
        F.col("doc").alias("id_a"), "shingle", F.col("n_sh").alias("__na")
    )
    b = prefix.select(
        F.col("doc").alias("id_b"), "shingle", F.col("n_sh").alias("__nb")
    )
    cand_long = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        # length filter on the integer gram counts: |len_a − len_b| =
        # |n_a − n_b| ≤ k for any qualifying pair
        .filter(F.abs(F.col("__na") - F.col("__nb")) <= k)
        .select("id_a", "id_b")
        .distinct()
    )
    # short bucket: the count bound cannot prune (zero shared q-grams
    # is possible within k edits), so broadcast the short sliver
    # against everything in the length window — map-only on the big
    # side, then the same exact verify
    sh = short_side.select(
        F.col("doc").alias("sid"),
        F.col("__s").alias("__ss"),
        F.length("__s").alias("__sl"),
    )
    other = strs.select(
        F.col("doc").alias("oid"),
        F.length("__s").alias("__ol"),
    )
    cand_short = (
        other.join(
            F.broadcast(sh),
            (F.abs(F.col("__ol") - F.col("__sl")) <= k)
            & (F.col("sid") != F.col("oid")),
        )
        .select(
            F.least("sid", "oid").alias("id_a"),
            F.greatest("sid", "oid").alias("id_b"),
        )
        .distinct()
    )
    cand = cand_long.unionByName(cand_short).distinct()
    sa = strs.select(F.col("doc").alias("id_a"), F.col("__s").alias("__sa"))
    sb = strs.select(F.col("doc").alias("id_b"), F.col("__s").alias("__sb"))
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.levenshtein("__sa", "__sb").cast("int").alias("dist"),
        )
        .filter(F.col("dist") <= k)
    )
