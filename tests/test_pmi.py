"""PMI co-occurrence invariants: equivalence with an independent
pure-Python reference (windowed unordered pairs, same ratio and total
order), and the collocation sanity case (a glued bigram outranks
independent fillers)."""

from __future__ import annotations


def _python_pmi(texts, window=3, min_count=1, k=50):
    from collections import Counter

    pc: Counter = Counter()
    for t in texts:
        toks = t.split(" ")
        for i, a in enumerate(toks):
            for j in range(1, window + 1):
                if i + j < len(toks):
                    pc[tuple(sorted((a, toks[i + j])))] += 1
    uc: Counter = Counter()
    for (a, b), c in pc.items():
        uc[a] += c
        uc[b] += c
    t_tot = sum(pc.values())
    rows = [
        (a, b, c, (c * t_tot) / (uc[a] * uc[b]))
        for (a, b), c in pc.items()
        if c >= min_count
    ]
    rows.sort(key=lambda r: (-r[3], r[0], r[1]))
    return rows[:k]


def test_pmi_matches_reference(spark):
    from food_panda_etl_spark.operators.pmi import pmi_pairs

    texts = [
        "new york is a big city",
        "new york has a big port",
        "a city has a port",
        "big city big port new york",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = [
        (r["w1"], r["w2"], r["pair_cnt"], r["ratio"].hex())
        for r in pmi_pairs(df, window=3, min_count=1, k=50).collect()
    ]
    want = [
        (a, b, c, v.hex()) for a, b, c, v in _python_pmi(texts, 3, 1, 50)
    ]
    assert got == want


def test_pmi_collocation_outranks_fillers(spark):
    """'new york' always adjacent while 'a'/'the' flood the window
    stream: the glued pair's ratio must beat any pair involving a
    filler (their huge unigram masses sink the denominator)."""
    from food_panda_etl_spark.operators.pmi import pmi_pairs

    texts = [
        "the a the a the a new york a the a the a the",
        "a the a the new york the a the a the a",
        "the a the a the new york a the a the",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = pmi_pairs(df, window=2, min_count=1, k=100).collect()
    ny = next(r for r in rows if (r["w1"], r["w2"]) == ("new", "york"))
    for r in rows:
        if "a" in (r["w1"], r["w2"]) or "the" in (r["w1"], r["w2"]):
            assert ny["ratio"] > r["ratio"], (r["w1"], r["w2"])
