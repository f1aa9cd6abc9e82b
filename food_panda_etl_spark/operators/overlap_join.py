"""Exact set-OVERLAP join via prefix filtering — the absolute-threshold
companion to `operators/prefix_join.py` (same theorem family:
Chaudhuri-Ganti-Kaushik SSJoin, ICDE 2006). Finds every document pair
sharing at least ``c`` n-gram shingles — the contract plagiarism /
boilerplate / quotation detectors actually want (an absolute shared-
extent floor, where Jaccard's RELATIVE threshold misses a long document
quoting a short one: 40 shared shingles is Jaccard ≈ 0.02 against a
2000-shingle host, invisible at any useful τ, but |A∩B| ≥ 40 finds
it).

The theorem, absolute form: order every document's shingles by ONE
global canonical order (`prefix_join.ranked_shingles` — df ASC, shingle
ASC; ONE ranking definition shared with the Jaccard scheme, no drift
between pruning stages) and keep each document's first
p = n_sh − c + 1 shingles. If |A∩B| ≥ c and A's prefix misses all of
A∩B, then A∩B fits inside A's last c − 1 positions — impossible for
|A∩B| ≥ c. So BOTH prefixes contain an intersection element; moreover
the intersection's FIRST element in canonical order sits in both
prefixes (it cannot be preceded by c−1 intersection elements in either
document), so the prefix×prefix equi-join loses nothing — completeness
is machine-checked against the brute-force inverted-index join (the
declared query's oracle, `SHINGLE5_CTE_SQL` + pair counts).

Determinism: integer prefix arithmetic only; the output overlap count
is an exact BIGINT (no doubles anywhere). Scale: identical shape to
the Jaccard prefix join — ONE shingle pass, one df agg, one per-doc
rank window, a prefix×prefix equi-join bounded by rare-shingle
co-occurrence (candidate volume tracks shared-extent mass, not
hot-shingle df²), and a candidates-only verify join; every shuffle
keyed on doc ids / shingles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from food_panda_etl_spark.operators.dedup import shingle_table
from food_panda_etl_spark.operators.prefix_join import ranked_shingles

#: The DuckDB replay of `operators/dedup.py::shingle_table` at n=5 —
#: distinct whitespace 5-grams per document. THE one shingle-replay
#: definition (ONE definition rule, completed by the r14 similarity.py
#: rotation): every oracle that replays the shingle table builds on
#: this constant — `NGRAM_JACCARD_ORACLE_SQL` below (q_ngram_jaccard
#: AND q_jaccard_prefix_join, both decorator-direct since r15),
#: similarity.py's `_JACCARD_PAIR_CTES`, the q_overlap_join oracle
#: (queries/cross_sketches.py), and the q_decontaminate_bloom oracle
#: (queries/scale_ops.py).
SHINGLE5_CTE_SQL = """sh AS (
      SELECT DISTINCT doc_id AS doc, shingle FROM (
        SELECT doc_id,
               unnest(list_transform(
                 generate_series(1, greatest(len(string_split(text,' ')) - 4, 0)),
                 i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1] || ' ' ||
                      string_split(text,' ')[i+2] || ' ' || string_split(text,' ')[i+3] || ' ' ||
                      string_split(text,' ')[i+4])) AS shingle
        FROM documents) WHERE shingle <> '')"""

#: The brute-force exact-Jaccard pair SQL at τ=0.8 — the declared
#: oracle of BOTH q_ngram_jaccard (the inverted-index brute force it
#: literally describes) and q_jaccard_prefix_join (whose hash-match
#: against this UNPRUNED form is the prefix-filtering completeness
#: theorem). Owned here, next to the shingle replay it builds on, so
#: `queries/scale_sketches.py` needs no post-import ORACLES alias
#: (the r13 `_load_all` arrangement this retires was import-order
#: load-bearing) and the string is byte-identical to the r13-recorded
#: oracle (verified at extraction).
NGRAM_JACCARD_ORACLE_SQL = f"""
    WITH {SHINGLE5_CTE_SQL},
    sizes AS (SELECT doc, count(*) AS n_sh FROM sh GROUP BY doc),
    inter AS (SELECT a.doc AS doc_a, b.doc AS doc_b, count(*) AS inter
              FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc < b.doc
              GROUP BY 1, 2)
    SELECT doc_a, doc_b,
           CAST(inter AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - inter AS DOUBLE) AS jaccard
    FROM inter
    JOIN sizes sa ON doc_a = sa.doc
    JOIN sizes sb ON doc_b = sb.doc
    WHERE CAST(inter AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - inter AS DOUBLE) >= 0.8
    """


def overlap_candidates(sh: DataFrame, min_overlap: int) -> DataFrame:
    """(doc_a, doc_b) distinct candidate pairs from the
    prefix×prefix equi-join over a (doc, shingle) table with prefix
    length p = n_sh − c + 1, plus the size filter (a document with
    fewer than c shingles can never reach overlap c). Public so the
    pruning VOLUME is testable (the prefix_candidates lesson:
    completeness tests hold under ANY order — only candidate counts
    see destroyed pruning)."""
    c = int(min_overlap)
    if c < 1:
        raise ValueError(f"overlap_candidates: need min_overlap >= 1, got {c}")
    prefix = (
        ranked_shingles(sh)
        .filter(
            (F.col("n_sh") >= c) & (F.col("__pos") <= F.col("n_sh") - c + 1)
        )
        .select("doc", "shingle", "n_sh", "__pos")
    )
    a = prefix.select(
        F.col("doc").alias("doc_a"),
        "shingle",
        F.col("n_sh").alias("__na"),
        F.col("__pos").alias("__pa"),
    )
    b = prefix.select(
        F.col("doc").alias("doc_b"),
        "shingle",
        F.col("n_sh").alias("__nb"),
        F.col("__pos").alias("__pb"),
    )
    # PPJoin positional filter, absolute-threshold form (r20; proof in
    # prefix_join.prefix_candidates): the canonically smallest matched
    # prefix shingle is the pair's globally first common shingle, so
    # true overlap ≤ 1 + min(n_a − pa, n_b − pb) — prune pairs whose
    # bound cannot reach c. The min-position aggregate replaces the old
    # `.distinct()` on the same keys (same exchange); prunes only pairs
    # the exact verify would discard (brute-force-equality tests pin it).
    return (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b", "__na", "__nb")
        .agg(F.min("__pa").alias("__pa"), F.min("__pb").alias("__pb"))
        .filter(
            1
            + F.least(
                F.col("__na") - F.col("__pa"), F.col("__nb") - F.col("__pb")
            )
            >= c
        )
        .select("doc_a", "doc_b")
    )


def overlap_join(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
    min_overlap: int = 20,
) -> DataFrame:
    """(doc_a, doc_b, overlap bigint) — EXACTLY the pairs sharing ≥
    ``min_overlap`` distinct n-gram shingles, doc_a < doc_b, equal
    row-for-row to the brute-force inverted-index join (the
    completeness property test / declared-query oracle). Verify runs
    on candidates only."""
    c = int(min_overlap)
    if c < 1:
        raise ValueError(f"overlap_join: need min_overlap >= 1, got {c}")
    sh = shingle_table(df, id_col, text_col, n).localCheckpoint(eager=False)
    cand = overlap_candidates(sh, c)
    sa = sh.select(F.col("doc").alias("doc_a"), "shingle")
    sb = sh.select(F.col("doc").alias("doc_b"), "shingle")
    return (
        cand.join(sa, "doc_a")
        .join(sb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").cast("bigint").alias("overlap"))
        .filter(F.col("overlap") >= c)
    )
