"""BPE trainer invariants: equivalence with an independent pure-Python
reference implementation (the textbook index-scan merge, NOT the
operator's fold) on random corpora, plus merge-application semantics on
the overlap edge cases the fold≡scan argument covers."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _python_bpe(texts: list[str], n_merges: int):
    """Independent reference: word histogram, argmax with (freq DESC,
    lexicographic pair) tie-break, textbook left-to-right index scan."""
    from collections import Counter

    wf = Counter(w for t in texts for w in t.split(" "))
    words = {w: [*w, "</w>"] for w in wf}
    merges = []
    for rank in range(n_merges):
        pc: Counter = Counter()
        for w, syms in words.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += wf[w]
        if not pc:
            break
        mx = max(pc.values())
        a, b = sorted(k for k, v in pc.items() if v == mx)[0]
        merges.append((rank, a, b, mx))
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return merges, words


SET = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@SET
@given(
    texts=st.lists(
        st.lists(
            # tiny alphabet + repeated chars force merge-overlap cases
            st.sampled_from(["aa", "ab", "aab", "ba", "b", "aaa", "abab"]),
            min_size=1,
            max_size=6,
        ).map(" ".join),
        min_size=1,
        max_size=8,
    )
)
def test_bpe_matches_reference_impl(spark, texts):
    from food_panda_etl_spark.operators.bpe import bpe_train

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = [tuple(r) for r in bpe_train(df, "text", n_merges=4).collect()]
    want, _ = _python_bpe(texts, 4)
    assert got == want


def test_bpe_merge_application_overlap_cases(spark):
    """The fold must equal the index scan on runs of the merged pair:
    'aaaa' with pair (a,a) becomes [aa, aa], 'aaa' becomes [aa, a]."""
    from pyspark.sql import functions as F

    from food_panda_etl_spark.operators.bpe import _apply_merge

    words = spark.createDataFrame(
        [
            ("aaaa", 1, ["a", "a", "a", "a"]),
            ("aaa", 1, ["a", "a", "a"]),
            ("baab", 1, ["b", "a", "a", "b"]),
        ],
        "word string, freq long, syms array<string>",
    )
    got = {
        r["word"]: r["syms"]
        for r in _apply_merge(words, "a", "a").collect()
    }
    assert got == {
        "aaaa": ["aa", "aa"],
        "aaa": ["aa", "a"],
        "baab": ["b", "aa", "b"],
    }


def test_bpe_final_vocab_consistent(spark):
    """bpe_vocab's final word symbols equal the reference's final state
    (merge TABLE equality alone would miss a wrong application)."""
    from food_panda_etl_spark.operators.bpe import bpe_vocab

    texts = ["low low lower lowest new newer", "new new newer wide wider low"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    words_df, _merges = bpe_vocab(df, "text", n_merges=6)
    got = {r["word"]: list(r["syms"]) for r in words_df.collect()}
    _, want = _python_bpe(texts, 6)
    assert got == want


def test_bpe_encode_counts_match_reference(spark):
    """Per-doc BPE token counts equal summing the reference's final
    per-word symbol lengths over each document's words (with repeats)."""
    from food_panda_etl_spark.operators.bpe import bpe_encode_counts

    texts = ["low low lower lowest new newer", "new new newer wide wider low"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in bpe_encode_counts(df, "text", n_merges=6).collect()
    }
    _, words = _python_bpe(texts, 6)
    want = {
        i: sum(len(words[w]) for w in t.split(" "))
        for i, t in enumerate(texts)
    }
    assert got == want


def test_bpe_symbols_keep_line_terminators(spark):
    """Regression: characters come from substring indexing, not a regex
    '.' scan — '.' drops line terminators, and Java vs RE2 engines even
    disagree on WHICH, so words containing \\n or \\r must still match
    the pure-Python [*w] reference exactly."""
    from food_panda_etl_spark.operators.bpe import bpe_vocab

    texts = ["a\nb a\nb c\rd", "a\nb x"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    words_df, _ = bpe_vocab(df, "text", n_merges=2)
    got = {r["word"]: list(r["syms"]) for r in words_df.collect()}
    want_merges, want = _python_bpe(texts, 2)
    assert got == want
