"""Pins for the r20 PPJoin positional filter in
`prefix_join.prefix_candidates` / `overlap_join.overlap_candidates`:
it must PRUNE pairs whose first-common-prefix-shingle position proves
the overlap bound unreachable, and must NEVER prune a qualifying pair
(completeness is already covered by the brute-force-equality tests;
here the PRUNING itself is pinned so a silently-vacuous filter fails a
test rather than nowhere)."""

from __future__ import annotations

from pyspark.sql import functions as F

from food_panda_etl_spark.operators.overlap_join import overlap_candidates
from food_panda_etl_spark.operators.prefix_join import prefix_candidates
from food_panda_etl_spark.operators.weighted_jaccard import (
    occurrence_expand,
    shingle_multiset_table,
    weighted_jaccard_join,
)
from food_panda_etl_spark.tables import load_table


def test_positional_filter_prunes_sharing_only_pairs(spark):
    # Two docs of 10 distinct tokens each, sharing exactly ONE globally
    # rare token: every (a, b) shingle pair co-occurs on it, the size
    # filter passes (equal sizes), but overlap is 1 — at tau=4/5 a
    # 10-shingle pair needs overlap >= 9, and the shared shingle's
    # positional bound (1 + min(n - pa, n - pb)) cannot reach it when
    # the shared token ranks LAST in both prefixes... construct the
    # extreme: all tokens unique except the shared one, so df(shared)=2
    # ranks it AFTER no one (df 2 > df 1): pa = pb = prefix end.
    rows = [
        (1, " ".join([f"a{i}" for i in range(9)] + ["shared"])),
        (2, " ".join([f"b{i}" for i in range(9)] + ["shared"])),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    from food_panda_etl_spark.operators.dedup import shingle_table

    sh = shingle_table(d, "doc_id", "text", n=1)
    # tau = 4/5 over 10 shingles: prefix p = 10 - 8 + 1 = 3; the shared
    # unigram has df 2, every other df 1, so it ranks LAST globally and
    # sits OUTSIDE both prefixes -> no candidate at all; with tau = 1/2
    # (p = 6) it can enter prefixes only at position 6 (df-2 sorts
    # after all df-1 tokens IN those docs)... position of shared in
    # each doc = 10 (all 9 private tokens have df 1 < 2). 10 > 6, so
    # still no candidate. Loosen to tau where it IS a matched prefix
    # row but the bound prunes: tau = 1/10 -> p = 10 - 1 + 1 = 10, the
    # shared token matches at pa = pb = 10, bound = 1 + min(0, 0) = 1,
    # required overlap = ceil(1*(20)/11) = 2 > 1 -> PRUNED.
    assert prefix_candidates(sh, 1, 10).count() == 0
    # sanity: the verify-equality contract holds (no qualifying pair
    # exists at tau=1/10? overlap 1 of union 19 = 0.052 < 0.1 -> none)
    # and a genuinely qualifying pair still surfaces:
    rows2 = [
        (1, "x0 x1 x2 x3"),
        (2, "x0 x1 x2 y9"),
    ]
    d2 = spark.createDataFrame(rows2, "doc_id long, text string")
    sh2 = shingle_table(d2, "doc_id", "text", n=1)
    assert prefix_candidates(sh2, 1, 2).count() == 1  # J = 3/5 >= 1/2


def test_overlap_positional_filter_prunes(spark):
    rows = [
        (1, " ".join([f"a{i}" for i in range(9)] + ["shared"])),
        (2, " ".join([f"b{i}" for i in range(9)] + ["shared"])),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    from food_panda_etl_spark.operators.dedup import shingle_table

    sh = shingle_table(d, "doc_id", "text", n=1)
    # c = 2: prefix p = 9, shared token at position 10 in both docs —
    # outside prefixes, no candidate; c = 1: p = 10, matched at
    # pa = pb = 10, bound = 1 >= 1 — candidate kept (true overlap 1).
    assert overlap_candidates(sh, 2).count() == 0
    assert overlap_candidates(sh, 1).count() == 1


def test_weighted_jaccard_volume_shrinks_and_output_exact(spark, sf_dir):
    """The measured r20 regression guard: on the real corpus the
    positional filter must keep candidates well under the pre-r20
    prefix+size-filter volume, and the verified output must equal the
    brute-force count-join (the declared oracle replays this)."""
    d = load_table(spark, sf_dir, "documents")
    num, den = 7, 10
    shc = shingle_multiset_table(d, "doc_id", "text", 3).localCheckpoint(
        eager=False
    )
    cand = prefix_candidates(occurrence_expand(shc), num, den).count()
    # pre-positional volume = distinct pairs after prefix+size filter
    from food_panda_etl_spark.operators.prefix_join import ranked_shingles

    ranked = ranked_shingles(occurrence_expand(shc))
    ceil_tn = F.expr(f"({num} * n_sh + {den - 1}) div {den}")
    prefix = ranked.filter(
        F.col("__pos") <= F.col("n_sh") - ceil_tn + 1
    ).select("doc", "shingle", "n_sh")
    a = prefix.select(
        F.col("doc").alias("doc_a"), "shingle", F.col("n_sh").alias("n_a")
    )
    b = prefix.select(
        F.col("doc").alias("doc_b"), "shingle", F.col("n_sh").alias("n_b")
    )
    pre = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .filter(
            (F.least("n_a", "n_b") * den) >= (F.greatest("n_a", "n_b") * num)
        )
        .select("doc_a", "doc_b")
        .distinct()
        .count()
    )
    true_pairs = weighted_jaccard_join(
        d, "doc_id", "text", 3, num, den
    ).count()
    # measured at sf0.1: 103,949 -> 32,941 (0.32x); 0.75 leaves room
    # for fixture drift, not for a vacuous filter
    assert true_pairs <= cand <= max(int(pre * 0.75), true_pairs)
