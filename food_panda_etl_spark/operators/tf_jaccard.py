"""Exact REAL-WEIGHT (TF-normalized) Jaccard join — the fourth
threshold regime of the prefix-filtering family (`prefix_join.py`
relative distinct-set, `overlap_join.py` absolute overlap,
`weighted_jaccard.py` integer multiset, THIS normalized real weights)
and the exact counterpart of the ICWS sketch path
(`operators/icws.py`).

Why a separate regime: multiset Jaccard treats a 2000-shingle document
that repeats a boilerplate trigram 100 times as far from a 20-shingle
memo with the same trigram once — LENGTH dominates. Normalizing each
document's weights to sum 1 (term frequency: w_s = c_s / n, n = Σc)
asks about the documents' SHAPE — the mixture question retrieval and
drift pipelines ask — and its weighted Jaccard
J_tf(A, B) = Σ_s min(a_s/n_a, b_s/n_b) / Σ_s max(a_s/n_a, b_s/n_b)
needs REAL weights: no occurrence expansion can express 1/n_a.

Integer-exact reduction (what makes the oracle bit-exact): multiply
through by n_a·n_b. With wi = Σ_{s∈A∩B} min(c^A_s·n_b, c^B_s·n_a)
(int64), the scaled union mass is 2·n_a·n_b − wi (each side's weights
sum to 1), so J_tf = wi / (2·n_a·n_b − wi) and the threshold
τ = num/den is the pure-integer compare
wi·(den+num) ≥ 2·num·n_a·n_b. The reported similarity is ONE IEEE
division of int64-derived doubles — the declared query's oracle is
the brute-force count-join SQL and the driver hash-match IS the
weighted prefix-filter completeness theorem.

Weighted prefix filtering (the Chaudhuri-Ganti-Kaushik lemma, mass
form): J_tf ≥ τ ⟺ normalized intersection mass wi/(n_a·n_b) ≥
τ' = 2·num/(den+num), and min(a_s/n_a, b_s/n_b) ≤ a_s/n_a pointwise,
so a qualifying pair has ≥ τ' of EACH side's own mass on the shared
support. Under the ONE global canonical order (df ASC, shingle ASC)
take P_A = the minimal prefix with mass > 1 − τ' (integer keep rule:
cum_prev·(den+num) ≤ (den−num)·n_a, where cum_prev is the strict-
prefix cumulative count; with ≤, the excluded suffix carries mass
STRICTLY below τ', so a boundary pair at exactly τ' still surfaces).
The smallest shared-support shingle in the global order must lie in
BOTH prefixes — if it fell in A's suffix, every shared shingle would
(the order is global), putting A's whole shared mass strictly under
τ' — so the prefix×prefix equi-join is complete. Machine-checked:
the declared oracle is the UNFILTERED brute-force join.

Scale: identical shape to the sibling joins — ONE counted shingle
pass, a df agg + per-doc window for prefixes (cumulative mass, never
a global sort), candidates bounded by rare-shingle co-occurrence, and
a candidates-only verify against the count tables. Every shuffle is
keyed on doc ids / shingles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

from food_panda_etl_spark.operators.weighted_jaccard import (
    shingle_multiset_table,
)


def _validated(threshold_num: int, threshold_den: int) -> tuple[int, int]:
    num, den = int(threshold_num), int(threshold_den)
    if not (0 < num <= den):
        raise ValueError(f"tf_jaccard: need 0 < num <= den, got {num}/{den}")
    return num, den


def tf_weights(shc: DataFrame) -> DataFrame:
    """(doc, shingle, w double) TF weights w = c/n from a counted
    shingle table — ONE definition shared by the ICWS sketch path
    (`operators/icws.py`) and the incremental maintained-state face
    (`operators/incremental_icws.py`), so the two faces can never
    drift to answering different similarity questions (review r17;
    the priority_expr/guarded_weight no-drift rule)."""
    sizes = shc.groupBy("doc").agg(F.sum("c").cast("bigint").alias("__n"))
    return shc.join(sizes, "doc").select(
        "doc",
        "shingle",
        (F.col("c").cast("double") / F.col("__n").cast("double")).alias("w"),
    )


def tf_prefix_candidates(
    shc: DataFrame, threshold_num: int, threshold_den: int
) -> DataFrame:
    """(doc_a, doc_b) distinct candidate pairs (doc_a < doc_b) from the
    WEIGHTED prefix×prefix equi-join over a (doc, shingle, c) count
    table — public so candidate volume is testable (the
    prefix_candidates convention). Keep rule per doc, canonical order
    (df ASC, shingle ASC): cum_prev·(den+num) ≤ (den−num)·n, with
    cum_prev the cumulative count of STRICTLY earlier shingles."""
    num, den = _validated(threshold_num, threshold_den)
    sizes = shc.groupBy("doc").agg(F.sum("c").cast("bigint").alias("__n"))
    dfreq = shc.groupBy("shingle").agg(F.count("*").alias("__df"))
    w = (
        Window.partitionBy("doc")
        .orderBy("__df", "shingle")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # user-numbered repartition before the per-doc window (r20): AQE
    # coalesced the window exchange to ~5 tasks at sf0.1 and — every
    # downstream join being broadcast — serialized the whole
    # prefix+candidate+verify pipeline on them (the prefix_join.
    # ranked_shingles recipe; exchange count unchanged, the window
    # reuses it)
    par = shc.sparkSession.sparkContext.defaultParallelism
    prefix = (
        shc.join(dfreq, "shingle")
        .repartition(par, "doc")
        .withColumn("__cum_prev", F.coalesce(F.sum("c").over(w), F.lit(0)))
        .join(sizes, "doc")
        .filter(
            F.col("__cum_prev") * (den + num) <= (den - num) * F.col("__n")
        )
        .select("doc", "shingle")
    )
    pa = prefix.select(F.col("doc").alias("doc_a"), "shingle")
    pb = prefix.select(F.col("doc").alias("doc_b"), "shingle")
    return (
        pa.join(pb, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def tf_count_table_verify(
    shc: DataFrame,
    cand: DataFrame,
    threshold_num: int,
    threshold_den: int,
    shc_b: DataFrame | None = None,
) -> DataFrame:
    """(doc_a, doc_b, wi_scaled bigint, tf_jaccard double) — the EXACT
    TF-weighted verify stage shared by the prefix path
    (:func:`tf_jaccard_join`), the ICWS sketch path
    (`operators/icws.py`), and the incremental cross-side screen
    (`operators/incremental_icws.py`), ONE definition so the threshold
    algebra and output contract cannot drift (the `count_table_verify`
    convention). ``cand`` is (doc_a, doc_b) pairs; sizes come from the
    count table(s). SELF-JOIN mode by default (both sides of each pair
    resolve in ``shc``); pass ``shc_b`` for CROSS-SIDE mode — doc_a
    rows resolve in ``shc``, doc_b rows in ``shc_b`` (the
    incremental-refresh shape: batch counts vs the pruned standing
    corpus counts; ids may overlap across the two tables since each
    side resolves only in its own). wi_scaled = Σ min(c_a·n_b,
    c_b·n_a) over the shared support — integer end to end, one IEEE
    division for the report."""
    num, den = _validated(threshold_num, threshold_den)
    shc_right = shc_b if shc_b is not None else shc
    sizes_a = shc.groupBy("doc").agg(F.sum("c").cast("bigint").alias("__n"))
    sizes_b = (
        sizes_a
        if shc_b is None
        else shc_b.groupBy("doc").agg(
            F.sum("c").cast("bigint").alias("__n")
        )
    )
    sized = (
        cand.join(sizes_a.withColumnRenamed("doc", "doc_a"), "doc_a")
        .withColumnRenamed("__n", "n_a")
        .join(sizes_b.withColumnRenamed("doc", "doc_b"), "doc_b")
        .withColumnRenamed("__n", "n_b")
    )
    # string aliases, not frame refs: both verify sides may derive from
    # the SAME shc plan, and frame-attribute conditions (a["shingle"] ==
    # b["shingle"]) can resolve to one attribute id — trivially true,
    # a silent per-pair cartesian (caught by the brute-force equality
    # test; the incremental_neardup verify convention)
    sa, sb = shc.alias("sa"), shc_right.alias("sb")
    inter = (
        sized.join(sa, sized["doc_a"] == F.col("sa.doc"))
        .join(
            sb,
            (sized["doc_b"] == F.col("sb.doc"))
            & (F.col("sa.shingle") == F.col("sb.shingle")),
        )
        .groupBy("doc_a", "doc_b", "n_a", "n_b")
        .agg(
            F.sum(
                F.least(
                    F.col("sa.c") * F.col("n_b"),
                    F.col("sb.c") * F.col("n_a"),
                )
            )
            .cast("bigint")
            .alias("wi_scaled")
        )
    )
    union_scaled = 2 * F.col("n_a") * F.col("n_b") - F.col("wi_scaled")
    return (
        inter.filter(
            F.col("wi_scaled") * (den + num)
            >= 2 * num * F.col("n_a") * F.col("n_b")
        )
        .select(
            "doc_a",
            "doc_b",
            "wi_scaled",
            (F.col("wi_scaled").cast("double") / union_scaled.cast("double"))
            .alias("tf_jaccard"),
        )
    )


def tf_jaccard_join(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold_num: int = 7,
    threshold_den: int = 10,
) -> DataFrame:
    """(doc_a, doc_b, wi_scaled bigint, tf_jaccard double) — EXACTLY
    the pairs with TF-normalized weighted n-gram Jaccard ≥
    threshold_num/threshold_den and doc_a < doc_b, equal row-for-row
    to the brute-force count-join (the completeness property test /
    declared-query oracle)."""
    num, den = _validated(threshold_num, threshold_den)
    shc = shingle_multiset_table(df, id_col, text_col, n).localCheckpoint(
        eager=False
    )  # consumers: prefixes (df agg + window) and the verify joins
    cand = tf_prefix_candidates(shc, num, den)
    return tf_count_table_verify(shc, cand, num, den)
