"""Driver-side BPE fit for production merge counts (VERDICT r6 task 5).

`operators/bpe.py::bpe_train` runs ONE Spark job per merge round
(vocabulary-sized pair agg + 1-row argmax collect). That is the right
shape for an oracle-replayable declared query — every round is
hash-checked — and its cost is flat in corpus size (SCALE.md), but a
production tokenizer fits 32k-65k merges, and 32k sequential Spark jobs
are a scheduling wall (~0.2 s/job floor → hours of pure overhead)
regardless of data size.

The production shape keeps the DISTRIBUTED parts that touch the corpus
and moves the per-round loop onto the collected word histogram:

1. word histogram — the same one distributed aggregation over the fact
   table (the corpus is touched exactly once);
2. fit — the histogram is vocabulary-sized (wordpiece-era vocabularies
   collect in MBs), so the merge loop runs driver-side with INCREMENTAL
   pair-count maintenance (only words containing the chosen pair are
   rescanned — the HuggingFace-tokenizers/fastBPE approach), not a full
   recount per round;
3. encode — the fitted word→symbol-count table ships back as a
   broadcast vocabulary join, identical to `bpe_encode_counts`.

Equivalence: the driver loop replays the operator's exact semantics —
same (freq DESC, lhs, rhs) total-order argmax, same left-to-right
non-overlapping fold ("merge when the last emitted symbol is lhs and
the current is rhs") — so the merge lists are EQUAL, asserted in
tests/test_bpe_fit.py against `bpe_train` on the same corpus. The
declared oracled query keeps the distributed fit (driver-checkable
round replay); this variant is the documented drop-in once n_merges
outgrows the job-per-round budget (SCALE.md records the crossover).

Collect inventory: the word histogram (vocabulary-sized — bounded by
distinct words, not corpus rows; the same budget class as the k-means
centroid collect, documented here because it is the variant's point).
"""

from __future__ import annotations

import heapq

from collections import Counter, defaultdict

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from food_panda_etl_spark.operators.bpe import EOW


def _scan_merge(syms: list[str], lhs: str, rhs: str) -> list[str]:
    """The operator's fold, verbatim in Python: left-to-right, merge
    when the last EMITTED symbol is lhs and the current is rhs. A
    merged token lhs+rhs can never equal lhs (rhs nonempty), so no
    overlapping re-merge can trigger."""
    out: list[str] = []
    for s in syms:
        if out and out[-1] == lhs and s == rhs:
            out[-1] = lhs + rhs
        else:
            out.append(s)
    return out


def bpe_fit_driver(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 6,
) -> tuple[list[tuple[int, str, str, int]], dict[str, tuple[int, int]]]:
    """Fit ``n_merges`` BPE merges driver-side over the distributed word
    histogram. Returns (merges, vocab) where merges is
    [(rank, lhs, rhs, pair_freq)] — element-equal to ``bpe_train``'s
    rows on the same corpus — and vocab maps word → (n_syms, freq)
    with every merge applied (the encoder's input)."""
    hist = (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
        .collect()
    )
    words: dict[str, list] = {
        r["word"]: [list(r["word"]) + [EOW], int(r["freq"])] for r in hist
    }
    pair_freq: Counter = Counter()
    occurs: defaultdict = defaultdict(set)
    for w, (syms, freq) in words.items():
        for a, b in zip(syms, syms[1:]):
            pair_freq[(a, b)] += freq
            occurs[(a, b)].add(w)

    # ADVICE r7: the per-round argmax was a full linear scan of
    # pair_freq — at 32k merges the scan, not Spark, dominated the fit.
    # Replace it with a lazy-invalidation heap on the SAME total order
    # (-freq, lhs, rhs): every count change pushes a fresh entry, pops
    # skip entries whose recorded count no longer matches the live
    # table. Invariant: every pair with a positive live count has a
    # heap entry carrying exactly that count (initial heapify; the
    # rescan loop re-pushes each touched pair's final count once per
    # round), so the first non-stale pop IS the linear scan's argmax.
    heap: list[tuple[int, str, str]] = [
        (-c, a, b) for (a, b), c in pair_freq.items() if c > 0
    ]
    heapq.heapify(heap)

    merges: list[tuple[int, str, str, int]] = []
    for rank in range(int(n_merges)):
        best = None
        while heap:
            negc, a, b = heapq.heappop(heap)
            if pair_freq.get((a, b), 0) == -negc:
                best = ((a, b), -negc)
                break
        if best is None:
            break
        (lhs, rhs), c = best
        merges.append((rank, lhs, rhs, int(c)))
        # rescan ONLY the words still containing the merged pair; after
        # the scan no (lhs, rhs) adjacency can remain (fold invariant),
        # so its count telescopes to zero via the decrements. occurs is
        # an over-approximation (a later merge may have destroyed the
        # adjacency without the word leaving the set), so stale entries
        # are SKIPPED before any Counter churn — at a 32k-merge fit the
        # stale fraction grows every round and the dead decrement/
        # re-increment work would dominate the loop.
        touched: set[tuple[str, str]] = set()
        for w in list(occurs.pop((lhs, rhs), ())):
            syms, freq = words[w]
            if not any(
                a == lhs and b == rhs for a, b in zip(syms, syms[1:])
            ):
                continue
            for a, b in zip(syms, syms[1:]):
                pair_freq[(a, b)] -= freq
                touched.add((a, b))
            new = _scan_merge(syms, lhs, rhs)
            words[w][0] = new
            for a, b in zip(new, new[1:]):
                pair_freq[(a, b)] += freq
                occurs[(a, b)].add(w)
                touched.add((a, b))
        pair_freq.pop((lhs, rhs), None)
        # one push per touched pair with its FINAL count for the round
        # (not one per intermediate +=/-=), keeping heap churn
        # proportional to genuinely-changed counts; drained pairs are
        # DELETED from the Counter (not left at <= 0) so len(pair_freq)
        # counts live pairs only — the compaction trigger below divides
        # by it, and a 32k-merge fit accumulates dead pairs every round
        for p in touched:
            cp = pair_freq.get(p, 0)
            if cp > 0:
                heapq.heappush(heap, (-cp, p[0], p[1]))
            else:
                pair_freq.pop(p, None)
        # stale-entry compaction: lazy deletion lets dead entries pile
        # up over a long fit; rebuild when they dominate (amortized
        # O(live) — the same budget class as one round's pushes)
        if len(heap) > 4 * len(pair_freq) + 64:
            heap = [(-c, a, b) for (a, b), c in pair_freq.items() if c > 0]
            heapq.heapify(heap)

    vocab = {w: (len(syms), freq) for w, (syms, freq) in words.items()}
    return merges, vocab


def bpe_encode_counts_driver(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 6,
    id_col: str = "doc_id",
) -> DataFrame:
    """`bpe_encode_counts` with the driver-side fit: the fitted
    (word, n_syms) vocabulary ships back as a broadcast equi-join — the
    corpus is still touched exactly twice (histogram + encode), both by
    narrow ops feeding hash aggregations."""
    _, vocab = bpe_fit_driver(df, text_col, n_merges)
    spark = df.sparkSession
    vdf = spark.createDataFrame(
        [(w, n) for w, (n, _) in vocab.items()], "word string, n_syms int"
    )
    doc_words = df.select(
        id_col, F.explode(F.split(F.col(text_col), " ")).alias("word")
    )
    return (
        doc_words.join(F.broadcast(vdf), "word")
        .groupBy(id_col)
        .agg(F.sum("n_syms").alias("n_bpe_tokens"))
    )
