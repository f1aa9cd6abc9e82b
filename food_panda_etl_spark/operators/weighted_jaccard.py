"""Exact WEIGHTED (multiset) Jaccard join via the existing prefix
machinery — the third member of the prefix-filtering family
(`operators/prefix_join.py` relative threshold, `overlap_join.py`
absolute threshold; Chaudhuri-Ganti-Kaushik SSJoin, ICDE 2006).

Weighted Jaccard over shingle MULTISETS,
J_w(A, B) = Σ_s min(a_s, b_s) / Σ_s max(a_s, b_s), is what templated /
boilerplate-heavy corpora need: a document that repeats a 3-gram five
times and one that uses it once are much less alike than their
distinct-shingle Jaccard claims, and repetition is exactly the
structure low-quality scraped text carries (cf. q_repetition).

The reduction that makes the existing machinery EXACT here, with no
new pruning theory: expand each multiset to the occurrence-indexed SET
{(s, k) : 1 ≤ k ≤ count(s)}. Then
|exp(A) ∩ exp(B)| = Σ min(a_s, b_s) and
|exp(A) ∪ exp(B)| = Σ max(a_s, b_s), so weighted Jaccard over the
multisets IS plain Jaccard over the expanded sets — and
`prefix_join.prefix_candidates` applies verbatim to the expanded
(doc, element) table (one global canonical order df ASC / element ASC,
prefix length n − ⌈τ·n⌉ + 1 on the integer grid, integer-exact size
filter). Completeness is machine-checked against the brute-force
count-join (the declared query's oracle — no expansion needed there:
DuckDB sums least(a.c, b.c) over the count tables directly).

Determinism: counts, expanded sizes, and the threshold compare are
pure integers (wi·den ≥ num·(n_a + n_b − wi)); the output wjaccard is
ONE IEEE division of identical int64-derived doubles. Scale: identical
shape to the other prefix joins — ONE shingle pass (counted, not
distinct), the occurrence expansion grows the table by only the
repeated-shingle mass (measured ≲ 0.2 % on the fixture corpus; bounded
by total repetition, never quadratic), candidates bounded by
rare-element co-occurrence, verify joins the ≤|candidates| pair list
against the per-doc COUNT tables (smaller than the expanded table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from food_panda_etl_spark.operators.dedup import gram_table
from food_panda_etl_spark.operators.prefix_join import prefix_candidates


def shingle_multiset_cte_sql(n: int) -> str:
    """The DuckDB replay of :func:`shingle_multiset_table` — word
    n-gram shingles WITH counts (the `overlap_join.SHINGLE5_CTE_SQL`
    pattern, parameterized over n and minus the DISTINCT, plus the
    count agg). ONE definition for every oracle that replays the
    multiset table."""
    if n < 1:
        raise ValueError(f"shingle_multiset_cte_sql: need n >= 1, got {n}")
    parts = " || ' ' || ".join(
        f"string_split(text,' ')[i+{j}]" if j else "string_split(text,' ')[i]"
        for j in range(n)
    )
    return f"""shm AS (
      SELECT doc_id AS doc, shingle, CAST(count(*) AS BIGINT) AS c FROM (
        SELECT doc_id,
               unnest(list_transform(
                 generate_series(1, greatest(len(string_split(text,' ')) - {n - 1}, 0)),
                 i -> {parts})) AS shingle
        FROM documents) WHERE shingle <> '' GROUP BY 1, 2)"""


def shingle_multiset_table(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """(doc, shingle, c bigint) — word n-gram shingles WITH
    multiplicities (the multiset `operators/dedup.py::shingle_table`
    deliberately collapses), counted over the package's ONE gram
    builder (`dedup.gram_table(distinct=False)` — the r15
    consolidation: same tokenization, same repartition-first
    parallelism, same ANSI-safe short-document guard, by
    construction rather than by a behavior-pin test)."""
    return (
        gram_table(df, id_col, text_col, n, distinct=False)
        .groupBy("doc", "shingle")
        .agg(F.count("*").cast("bigint").alias("c"))
    )


def occurrence_expand(shc: DataFrame) -> DataFrame:
    """(doc, shingle struct<s,k>) — the occurrence-indexed expansion of
    a (doc, shingle, c) count table: one row per (shingle, 1..c). The
    element is a STRUCT so equality and the canonical order stay exact
    (no separator-collision risk from string encoding); named
    ``shingle`` so `prefix_candidates` applies verbatim. Public so the
    expansion factor is testable (it must track repeated-shingle mass,
    not total mass)."""
    return shc.select(
        "doc",
        "shingle",
        F.explode(F.sequence(F.lit(1).cast("bigint"), F.col("c"))).alias("__k"),
    ).select(
        "doc",
        F.struct(F.col("shingle").alias("s"), F.col("__k").alias("k")).alias(
            "shingle"
        ),
    )


def count_table_verify(
    shc: DataFrame,
    cand: DataFrame,
    threshold_num: int,
    threshold_den: int,
) -> DataFrame:
    """(doc_a, doc_b, wi bigint, wjaccard double) — the EXACT weighted
    verify stage shared by the prefix path (:func:`weighted_jaccard_join`)
    and the banded sketch path (`operators/weighted_minhash.py`), so
    the threshold algebra and output contract have ONE definition (the
    gram-builder consolidation lesson, applied before the copies could
    drift): candidate pairs (doc_a, doc_b) joined against the count
    tables, wi = Σ min(a_s, b_s), sizes = Σ c per doc, integer-exact
    threshold compare, one IEEE division for the reported similarity."""
    num, den = int(threshold_num), int(threshold_den)
    if not (0 < num <= den):
        raise ValueError(
            f"count_table_verify: need 0 < num <= den, got {num}/{den}"
        )
    tot = shc.groupBy("doc").agg(F.sum("c").cast("bigint").alias("__nw"))
    ca = shc.select(
        F.col("doc").alias("doc_a"), "shingle", F.col("c").alias("__ca")
    )
    cb = shc.select(
        F.col("doc").alias("doc_b"), "shingle", F.col("c").alias("__cb")
    )
    inter = (
        cand.select("doc_a", "doc_b")
        .join(ca, "doc_a")
        .join(cb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.least("__ca", "__cb")).cast("bigint").alias("wi"))
    )
    ta = tot.select(F.col("doc").alias("doc_a"), F.col("__nw").alias("__na"))
    tb = tot.select(F.col("doc").alias("doc_b"), F.col("__nw").alias("__nb"))
    return (
        inter.join(ta, "doc_a")
        .join(tb, "doc_b")
        .filter(
            F.col("wi") * den
            >= num * (F.col("__na") + F.col("__nb") - F.col("wi"))
        )
        .select(
            "doc_a",
            "doc_b",
            "wi",
            (
                F.col("wi").cast("double")
                / (F.col("__na") + F.col("__nb") - F.col("wi")).cast("double")
            ).alias("wjaccard"),
        )
    )


def weighted_jaccard_join(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold_num: int = 7,
    threshold_den: int = 10,
) -> DataFrame:
    """(doc_a, doc_b, wi bigint, wjaccard double) — EXACTLY the pairs
    with weighted n-gram Jaccard ≥ threshold_num/threshold_den and
    doc_a < doc_b, equal row-for-row to the brute-force count-join
    (the completeness property test / declared-query oracle). ``wi`` is
    the exact weighted intersection Σ min(a_s, b_s)."""
    num, den = int(threshold_num), int(threshold_den)
    if not (0 < num <= den):
        raise ValueError(
            f"weighted_jaccard_join: need 0 < num <= den, got {num}/{den}"
        )
    shc = shingle_multiset_table(df, id_col, text_col, n).localCheckpoint(
        eager=False
    )
    cand = prefix_candidates(occurrence_expand(shc), num, den)
    return count_table_verify(shc, cand, num, den)
