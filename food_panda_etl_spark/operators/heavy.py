"""Exact heavy hitters at scale: mergeable Misra-Gries partition
summaries + exact verification.

The frequent-items question ("which tokens exceed 1% of the corpus
stream?") is trivially `groupBy().having()` — but that shuffles one
partial row per DISTINCT key per mapper, and at 100 TB the token
vocabulary is billions of keys, most of them singletons that cannot
possibly be heavy. The classic fix (Misra-Gries '82; mergeable-summary
form Agarwal et al., PODS'12): each partition keeps at most k counters —
any item with local frequency > n_i/k survives — so by averaging, every
item with GLOBAL frequency > N/k survives in at least one partition
summary. The union of partition summaries (≤ k·P candidate keys, tiny)
is then counted EXACTLY with a broadcast semi-join + one aggregation
over candidates only.

The intermediate summaries depend on partition layout (MG undercounts
are order-sensitive) — but the FINAL output does not: candidates are a
superset of the true heavy hitters under any layout, and the exact
recount + threshold filter makes the result identical to the brute-force
`HAVING count(*) > f·N` regardless of partitioning (asserted in
tests/test_properties.py). That is what makes the operator
oracle-checkable while the sketch itself is not.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_absorb(counters: dict, values: "pd.Series", k: int) -> dict:
    """Merge one Arrow batch's value counts into an MG summary, keeping
    ≤ k counters: add counts, then subtract the (k+1)-th largest count
    from every counter and drop the non-positive ones (the mergeable-
    summaries combine step — undercount grows by at most n/k total)."""
    for v, c in values.value_counts().items():
        counters[v] = counters.get(v, 0) + int(c)
    if len(counters) > k:
        kth = sorted(counters.values(), reverse=True)[k]
        counters = {v: c - kth for v, c in counters.items() if c > kth}
    return counters


def heavy_hitters(
    df: DataFrame,
    col: str,
    fraction: float,
    slack: float = 2.0,
) -> DataFrame:
    """All values of ``col`` with frequency > ``fraction``·N, with exact
    counts — output identical to ``GROUP BY col HAVING count > f·N``
    under any partitioning. ``slack`` widens the per-partition summary
    (k = slack/fraction counters) so boundary items are never lost to
    MG undercount; 2 is already conservative (the guarantee needs 1).

    NULL-key contract (ADVICE r6): a genuine NULL in ``col`` is
    UNREPORTABLE — NULL is reserved as the marker-row key (and pandas
    ``value_counts`` drops NaN), so a column whose heaviest value is
    NULL emits no candidate for it, while NULL rows still count in the
    N denominator. This matches the declared-query oracles (SQL
    ``count(*) ... GROUP BY col`` groups NULLs, but every declared
    caller feeds a non-nullable key); callers with nullable keys that
    need NULL reported should pre-aggregate it separately
    (``df.filter(col.isNull()).count()`` is one scan) or map NULL to a
    sentinel value before calling.

    Plan shape: one narrow mapInPandas pass emitting ≤ k+1 rows per
    partition (k candidate keys plus one NULL-keyed marker row carrying
    the partition's row count — the total rides along with the summary,
    so there is NO separate ``df.count()`` action/scan), then one
    broadcast semi-join + hash aggregate over candidate rows only, with
    the threshold joined in-plan from the summed markers. No
    full-vocabulary shuffle, no driver-side collect, ONE action."""
    if not 0.0 < fraction < 1.0:
        raise ValueError(f"fraction must be in (0, 1), got {fraction}")
    k = max(1, int(slack / fraction))

    def summarize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        counters: dict = {}
        n = 0
        for pdf in batches:
            n += len(pdf)
            counters = _mg_absorb(counters, pdf[col], k)
        vals = list(counters.keys())
        yield pd.DataFrame(
            {
                col: vals + [None],
                "__n": pd.array([None] * len(vals) + [n], dtype="Int64"),
            }
        )

    field = df.schema[col]
    # The summary is tiny (≤ (k+1)·P rows) but feeds two consumers
    # (candidate set + total); a lazy localCheckpoint keeps the fact
    # scan at one-per-consumer-job instead of re-deriving per subtree
    # (the exact_jaccard_pairs convention — no executor cache pinning).
    summary = df.select(col).mapInPandas(
        summarize, f"{col} {field.dataType.simpleString()}, __n bigint"
    ).localCheckpoint(eager=False)
    # value_counts drops nulls, so a NULL key is always a marker row;
    # N still counts every row (len(pdf) includes nulls in `col`),
    # matching the brute-force `HAVING cnt > f·N` denominator.
    cand = summary.filter(F.col(col).isNotNull()).select(col).distinct()
    total = summary.agg(F.sum("__n").alias("__total"))
    return (
        df.join(F.broadcast(cand), col, "semi")
        .groupBy(col)
        .agg(F.count("*").alias("cnt"))
        .join(F.broadcast(total))
        .filter(
            F.col("cnt").cast("double")
            > F.lit(float(fraction)) * F.col("__total").cast("double")
        )
        .drop("__total")
    )
