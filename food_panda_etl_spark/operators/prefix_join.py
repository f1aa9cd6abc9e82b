"""Exact set-similarity join via PREFIX FILTERING — the EXACT-Jaccard
scale path (Chaudhuri-Ganti-Kaushik SSJoin, ICDE 2006; Xiao-Wang-Lin-Yu
PPJoin, WWW 2008). `operators/dedup.py::exact_jaccard_pairs` is exact
but generates a candidate for every co-occurring shingle pair —
O(Σ df(s)²) blows up on hot shingles, which is why it is documented as
the non-scale path with MinHash+LSH as the APPROXIMATE replacement.
Prefix filtering closes the gap: an EXACT join whose candidate
generation is bounded.

The theorem: order every document's shingles by ONE global canonical
order and keep only each document's first
p = |d| − ⌈τ·|d|⌉ + 1 shingles (its "prefix"). Any pair with
Jaccard ≥ τ must share at least one PREFIX shingle — if two documents
disjoint on their prefixes, their intersection is at most
min(|A|, |B|) − p < τ·|union| — so equi-joining prefixes loses NOTHING
(completeness is machine-checked: output == the brute-force join,
and the declared query's oracle IS the brute-force SQL). Ordering by
ascending document frequency puts the RAREST shingles in prefixes, so
the candidate join fans out on exactly the tokens that co-occur least
— candidate volume tracks near-duplicate mass, not hot-shingle df².
A size filter (min/|max| ≥ τ, integer-exact) prunes further before
the verify stage, which counts intersections ONLY for candidate pairs.

Determinism: the canonical order is (df ASC, shingle ASC) — a total
order, identical in any engine; the prefix length is computed on the
INTEGER grid (threshold as a num/den rational: ⌈num·n/den⌉ =
(num·n + den − 1) div den — no float ceil), and the final Jaccard
threshold compare uses the exact double num/den both engines derive
from the same integers. The whole plan is joins + hash aggs + one
per-doc window (partitioned by doc — never a global sort).

Scale: ONE shingle pass (shared, checkpointed), one df agg, one
per-doc rank window, a prefix×prefix equi-join bounded by rare-token
co-occurrence, and a candidates-only verify join — each shuffle keyed
on 8-byte ids/shingle hashes. The 100 TB shape for EXACT near-dup at
high τ; MinHash+LSH remains the choice when approximate recall is
acceptable or τ is low (prefixes grow as τ falls: p ≈ (1−τ)·|d|+1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from food_panda_etl_spark.operators.dedup import shingle_table


def ranked_shingles(sh: DataFrame) -> DataFrame:
    """(doc, shingle, n_sh, __pos) — each document's shingles under the
    ONE global canonical order (df ASC, shingle ASC: rarest first,
    total), ranked per doc by a doc-partitioned window (never a global
    sort). The shared core of every prefix-filtering scheme: Jaccard
    keeps ``__pos ≤ n_sh − ⌈τ·n_sh⌉ + 1`` (:func:`prefix_candidates`),
    absolute overlap keeps ``__pos ≤ n_sh − c + 1``
    (`operators/overlap_join.py`) — one ranking definition, no drift
    between the schemes' pruning stages."""
    sizes = sh.groupBy("doc").agg(F.count("*").alias("n_sh"))
    dfreq = sh.groupBy("shingle").agg(F.count("*").alias("__df"))
    pos = F.row_number().over(
        Window.partitionBy("doc").orderBy("__df", "shingle")
    )
    # Explicit numbered repartition before the per-doc window (r20; the
    # r19 edit_join recipe): the window's exchange carries byte-tiny
    # (doc, shingle, df) rows, so AQE coalesced it — and with every
    # downstream join broadcast, the prefix window + candidate
    # equi-join + the whole verify expansion ran as ONE 5-task stage at
    # sf0.1 while 27 cores idled. A user-specified count is AQE-exempt
    # and the window reuses the exchange (same key), so this pins the
    # entire candidate+verify pipeline at full width for free.
    par = sh.sparkSession.sparkContext.defaultParallelism
    return (
        sh.join(dfreq, "shingle")
        .repartition(par, "doc")
        .withColumn("__pos", pos)
        .join(sizes, "doc")
        .select("doc", "shingle", "n_sh", "__pos")
    )


def prefix_candidates(
    sh: DataFrame,
    threshold_num: int,
    threshold_den: int,
) -> DataFrame:
    """(doc_a, doc_b, n_a, n_b) distinct candidate pairs from the
    prefix×prefix equi-join + integer-exact size filter + the PPJoin
    POSITIONAL filter (Xiao-Wang-Lin-Yu, WWW 2008 — r20) over a
    (doc, shingle) table — the pruning stage, public so its VOLUME is
    testable (review-caught r12: completeness tests hold under ANY
    global order, so a regression that destroys pruning — df DESC, a
    widened prefix — was invisible until candidate counts were
    asserted directly).

    Positional filter, exactly: for a pair, take the canonically
    SMALLEST matched prefix shingle — per-doc positions follow the one
    global order, so min(__pos_a) and min(__pos_b) are attained at the
    same shingle, and that shingle is the pair's globally FIRST common
    shingle (any smaller common shingle would sit at smaller positions
    in BOTH docs, hence inside both prefixes, hence be a matched row —
    contradiction). Nothing before it is common, so the true overlap is
    at most 1 + min(n_a − pa, n_b − pb); Jaccard ≥ num/den needs
    overlap·(num+den) ≥ num·(n_a+n_b), all integer-exact. Measured on
    the declared weighted-Jaccard corpus (occurrence-expanded, τ=7/10,
    sf0.1): 103,949 → 32,941 candidates, verify stage 2.5 → 1.3 s,
    verified output row-identical (it prunes only pairs that CANNOT
    pass, and the brute-force-equality oracle is the completeness
    proof). The min-position aggregate replaces the old `.distinct()`
    on the same keys — same exchange, no extra shuffle."""
    num, den = int(threshold_num), int(threshold_den)
    ranked = ranked_shingles(sh)
    # p = n − ⌈τ·n⌉ + 1 on the integer grid (`div` — exact integer
    # division, identical in Spark and DuckDB on non-negative operands)
    ceil_tn = F.expr(f"({num} * n_sh + {den - 1}) div {den}")
    prefix = ranked.filter(
        F.col("__pos") <= F.col("n_sh") - ceil_tn + 1
    ).select("doc", "shingle", "n_sh", "__pos")
    a = prefix.select(
        F.col("doc").alias("doc_a"),
        F.col("shingle"),
        F.col("n_sh").alias("n_a"),
        F.col("__pos").alias("__pa"),
    )
    b = prefix.select(
        F.col("doc").alias("doc_b"),
        F.col("shingle"),
        F.col("n_sh").alias("n_b"),
        F.col("__pos").alias("__pb"),
    )
    ubound = 1 + F.least(
        F.col("n_a") - F.col("__pa"), F.col("n_b") - F.col("__pb")
    )
    return (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        # size filter, integer-exact: jaccard ≥ τ ⇒ min·den ≥ num·max
        .filter(
            (F.least("n_a", "n_b") * den)
            >= (F.greatest("n_a", "n_b") * num)
        )
        .groupBy("doc_a", "doc_b", "n_a", "n_b")
        .agg(F.min("__pa").alias("__pa"), F.min("__pb").alias("__pb"))
        .filter(ubound * (num + den) >= num * (F.col("n_a") + F.col("n_b")))
        .select("doc_a", "doc_b", "n_a", "n_b")
    )


def jaccard_prefix_join(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
    threshold_num: int = 4,
    threshold_den: int = 5,
) -> DataFrame:
    """(doc_a, doc_b, jaccard double) — EXACTLY the pairs with n-gram
    Jaccard ≥ threshold_num/threshold_den and doc_a < doc_b, equal
    row-for-row to the brute-force inverted-index join (the
    completeness property test / declared-query oracle). The threshold
    is a RATIONAL so the prefix length stays on the integer grid; the
    default 4/5 is the repo's θ=0.8 near-dup convention."""
    num, den = int(threshold_num), int(threshold_den)
    if not (0 < num <= den):
        raise ValueError(
            f"jaccard_prefix_join: need 0 < num <= den, got {num}/{den}"
        )
    tau = float(num) / float(den)
    sh = shingle_table(df, id_col, text_col, n).localCheckpoint(eager=False)
    cand = prefix_candidates(sh, num, den)
    # verify on candidates only: count the true intersection per pair
    sa = sh.select(F.col("doc").alias("doc_a"), F.col("shingle"))
    sb = sh.select(F.col("doc").alias("doc_b"), F.col("shingle"))
    inter = (
        cand.join(sa, "doc_a")
        .join(sb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b", "n_a", "n_b")
        .agg(F.count("*").alias("__inter"))
    )
    jac = F.col("__inter").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("__inter")
    ).cast("double")
    return (
        inter.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= tau)
        .select("doc_a", "doc_b", "jaccard")
    )
