"""Exact set-CONTAINMENT join — the ASYMMETRIC member completing the
set-similarity family (`prefix_join.py` relative Jaccard,
`overlap_join.py` absolute overlap, `weighted_jaccard.py` multiset
Jaccard, `edit_join.py` bounded edit distance, THIS directional
containment). |A ∩ B| ≥ t·|A| asks "is document A mostly inside B" —
the quotation/plagiarism/boilerplate question with its DIRECTION kept:
a short memo fully quoted by a long report has containment 1 in one
direction and near 0 in the other, which symmetric Jaccard (diluted by
the big side) and the absolute overlap floor (blind to |A|) both
erase. The training-data uses: directional decontamination ("is this
eval item contained in a train doc"), subsumed-document pruning, and
quote-graph construction.

Prefix theory (Chaudhuri-Ganti-Kaushik ICDE 2006, the containment
variant): at most |A| − ⌈t·|A|⌉ of A's shingles can miss B, so A's
prefix of length |A| − ⌈t·|A|⌉ + 1 under the ONE global canonical
order (`prefix_join.ranked_shingles` — df ASC, rarest first) must hit
B — but B is UNBOUNDED (any superset qualifies), so the probe joins
A-prefixes against B's FULL shingle index. Pruning still works
because the join keys are A's RAREST shingles: candidate volume is the
sum of the rare shingles' posting lists, not hot-shingle df². The
threshold is an integer rational (inter·den ≥ num·n_a — no float
compare), the verify counts true intersections for candidates only,
and the reported containment is ONE IEEE division of int64-derived
doubles — the declared query's oracle is the brute-force
inverted-index SQL, so the driver hash-match IS the containment
prefix-filter completeness theorem.

Scale: ONE shingle pass (checkpointed, three consumers), one df agg +
per-doc rank window for the A-prefixes, the prefix×index equi-join,
and a candidates-only verify — every shuffle keyed on doc ids /
shingles. Documents shorter than n tokens have empty shingle sets:
containment is undefined there and no row is emitted (same contract
as the oracle's shingle replay).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from food_panda_etl_spark.operators.dedup import shingle_table
from food_panda_etl_spark.operators.prefix_join import ranked_shingles


def containment_join(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
    threshold_num: int = 4,
    threshold_den: int = 5,
) -> DataFrame:
    """(doc_a, doc_b, inter bigint, containment double) — EXACTLY the
    ORDERED pairs with |A ∩ B| ≥ (threshold_num/threshold_den)·|A| and
    doc_a ≠ doc_b, equal row-for-row to the brute-force inverted-index
    join (the completeness property test / declared-query oracle).
    ``doc_a`` is the contained side; both directions of a mutual pair
    are emitted, each with its own containment."""
    num, den = int(threshold_num), int(threshold_den)
    if not (0 < num <= den):
        raise ValueError(
            f"containment_join: need 0 < num <= den, got {num}/{den}"
        )
    sh = shingle_table(df, id_col, text_col, n).localCheckpoint(eager=False)
    ranked = ranked_shingles(sh)
    # A-prefix length n_a − ⌈t·n_a⌉ + 1 on the integer grid (`div` —
    # exact integer division, identical in Spark and DuckDB)
    ceil_tn = F.expr(f"({num} * n_sh + {den - 1}) div {den}")
    pa = ranked.filter(F.col("__pos") <= F.col("n_sh") - ceil_tn + 1).select(
        F.col("doc").alias("doc_a"), "shingle", F.col("n_sh").alias("n_a")
    )
    idx = sh.select(F.col("doc").alias("doc_b"), "shingle")
    cand = (
        pa.join(idx, "shingle")
        .filter(F.col("doc_a") != F.col("doc_b"))
        .select("doc_a", "doc_b", "n_a")
        .distinct()
    )
    sa, sb = sh.alias("sa"), sh.alias("sb")
    inter = (
        cand.join(sa, cand["doc_a"] == F.col("sa.doc"))
        .join(
            sb,
            (cand["doc_b"] == F.col("sb.doc"))
            & (F.col("sa.shingle") == F.col("sb.shingle")),
        )
        .groupBy("doc_a", "doc_b", "n_a")
        .agg(F.count("*").cast("bigint").alias("inter"))
    )
    return (
        inter.filter(F.col("inter") * den >= num * F.col("n_a"))
        .select(
            "doc_a",
            "doc_b",
            "inter",
            (
                F.col("inter").cast("double") / F.col("n_a").cast("double")
            ).alias("containment"),
        )
    )
