"""Driver-side BPE fit (VERDICT r6 task 5): merge-list equality with
the distributed oracle-checked fit, encode equality through the same
broadcast join, and the incremental pair-count maintenance invariant."""

from __future__ import annotations

from pyspark.sql import functions as F


def _merges_distributed(spark, df, n):
    from food_panda_etl_spark.operators.bpe import bpe_train

    return [
        (r["rank"], r["lhs"], r["rhs"], r["pair_freq"])
        for r in bpe_train(df, "text", n_merges=n).collect()
    ]


def test_driver_fit_equals_distributed_on_fixture(spark, sf_dir):
    from food_panda_etl_spark.operators.bpe_fit import bpe_fit_driver
    from food_panda_etl_spark.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    n = 12
    got, _ = bpe_fit_driver(d, "text", n_merges=n)
    assert got == _merges_distributed(spark, d, n)


def test_driver_fit_equals_distributed_on_tie_corpus(spark):
    """Adversarial ties: equal pair frequencies must break on the same
    (lhs, rhs) lexicographic total order in both fits."""
    from food_panda_etl_spark.operators.bpe_fit import bpe_fit_driver

    rows = [(0, "ab ab ba ba"), (1, "aa bb aa bb"), (2, "abba baab")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    n = 8
    got, _ = bpe_fit_driver(df, "text", n_merges=n)
    assert got == _merges_distributed(spark, df, n)


def test_driver_fit_drains_early_like_distributed(spark):
    """Single-char words: the pair table drains (only (c, EOW) pairs
    exist, then nothing) — both fits must stop at the same round."""
    from food_panda_etl_spark.operators.bpe_fit import bpe_fit_driver

    df = spark.createDataFrame([(0, "a b a")], "doc_id long, text string")
    got, _ = bpe_fit_driver(df, "text", n_merges=10)
    want = _merges_distributed(spark, df, 10)
    assert got == want
    assert len(got) < 10  # genuinely drained


def test_driver_encode_equals_distributed_encode(spark, sf_dir):
    from food_panda_etl_spark.operators.bpe import bpe_encode_counts
    from food_panda_etl_spark.operators.bpe_fit import (
        bpe_encode_counts_driver,
    )
    from food_panda_etl_spark.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    n = 6
    a = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in bpe_encode_counts(d, "text", n_merges=n).collect()
    }
    b = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in bpe_encode_counts_driver(d, "text", n_merges=n).collect()
    }
    assert a == b


def test_heap_argmax_equals_scan_under_churn(spark):
    """ADVICE r7 regression for the lazy-invalidation heap: a long fit
    over a repetitive corpus churns pair counts (decrement, re-increment
    to old values, drain to zero — every staleness class), and each
    round's recorded merge must still equal the from-scratch argmax on
    the same (-freq, lhs, rhs) total order."""
    from collections import Counter

    from food_panda_etl_spark.operators.bpe import EOW
    from food_panda_etl_spark.operators.bpe_fit import (
        _scan_merge,
        bpe_fit_driver,
    )

    rows = [
        (0, "aaaa aaab aabb abab baba bbbb"),
        (1, "abcabc bcabca cabcab abc"),
        (2, "xyxy yxyx xyyx xxyy aaaa"),
        (3, "abcabc aaab xyxy bbbb cabcab"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    merges, _ = bpe_fit_driver(df, "text", n_merges=40)
    assert len(merges) > 20  # a genuinely long fit, then drains

    words = Counter()
    for _, text in rows:
        for w in text.split(" "):
            words[w] += 1
    vocab = {w: list(w) + [EOW] for w in words}
    for rank, lhs, rhs, freq in merges:
        counts = Counter()
        for w, syms in vocab.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += words[w]
        best = min((-c, p) for p, c in counts.items() if c > 0)
        assert best[1] == (lhs, rhs) and -best[0] == freq, rank
        vocab = {w: _scan_merge(s, lhs, rhs) for w, s in vocab.items()}


def test_incremental_counts_match_full_recount(spark):
    """After each driver-side merge, the incrementally-maintained pair
    counts must equal a from-scratch recount of the current vocabulary
    (the invariant that makes 32k-merge fits affordable)."""
    from collections import Counter

    from food_panda_etl_spark.operators.bpe import EOW
    from food_panda_etl_spark.operators.bpe_fit import (
        _scan_merge,
        bpe_fit_driver,
    )

    rows = [(0, "banana bandana"), (1, "ana banana nab")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    merges, _ = bpe_fit_driver(df, "text", n_merges=10)

    # independent replay: apply the merge list with the same fold and
    # recount from scratch; every prefix's next argmax must be the
    # recorded merge.
    words = Counter()
    for _, text in rows:
        for w in text.split(" "):
            words[w] += 1
    vocab = {w: list(w) + [EOW] for w in words}
    for rank, lhs, rhs, freq in merges:
        counts = Counter()
        for w, syms in vocab.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += words[w]
        best = min(
            ((-c, p) for p, c in counts.items() if c > 0),
            default=None,
        )
        assert best is not None
        assert best[1] == (lhs, rhs)
        assert -best[0] == freq
        vocab = {w: _scan_merge(s, lhs, rhs) for w, s in vocab.items()}
