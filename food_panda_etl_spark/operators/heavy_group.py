"""Group-wise exact heavy hitters: per-group Misra-Gries partition
summaries + exact per-group verification — `operators/heavy.py`
stratified by a group key. The corpus-curation question it answers:
"which tokens exceed f of EACH LANGUAGE's stream?" (or per source, per
shard) — where the global operator would drown minority groups under
the majority group's vocabulary.

Same two-phase shape as the global operator, with every piece keyed by
group:

1. summaries — one narrow mapInPandas pass keeps ≤ k counters PER
   (partition, group) (k = slack/fraction); any value with in-group
   local frequency > n_pg/k survives, so by the mergeable-summaries
   argument every value with GLOBAL in-group frequency > n_g/k
   survives in at least one partition's summary for that group. Each
   (partition, group) also emits one NULL-valued marker row carrying
   its row count, so group totals ride along with the summaries — no
   separate count pass (the heavy.py single-action convention);
2. exact verify — candidates are the distinct (group, value) summary
   rows; ONE (group, value)-keyed semi join + hash agg recounts them
   exactly, and the threshold joins in-plan from the summed markers
   per group.

As with the global operator, the FINAL output is partitioning-invariant
and identical to the brute-force per-group `HAVING cnt > f·n_g`
(property-tested), which is what makes it oracle-checkable while the
sketch itself is not. NULL values in ``col`` follow the heavy.py
contract: unreportable (marker key), but counted in their group's
denominator. NULL GROUP keys are their own group (pandas groupby
dropna=False), matching SQL GROUP BY.

Integral-column bridge (ADVICE r7): Arrow→pandas converts an int64
batch CONTAINING A NULL to float64 — keys above 2^53 silently collapse
(measured: 2^53+1 and 2^53+2 merge), and the NULL group key becomes a
float NaN whose dict identity is fragile. The corruption happens inside
the serializer, BEFORE any in-pandas cast could repair it, so integral
group/value columns are bridged through exact engine-side string casts:
cast to string in the projection feeding mapInPandas (decimal digits —
bijective for every int64, NULL stays NULL), summarize over strings,
cast candidates back to the original type after. Cost is a few bytes
per row on the two shipped columns; the recount join and the output
schema keep the caller's original types. Float/decimal group keys keep
the heavy.py contract (no NaN groups) — the declared callers use
string/integral keys.

Memory: ≤ k counters per (partition, group) — bounded by
groups-per-partition · k. For high-cardinality group keys pre-salt the
partitioning by group so each partition sees few groups; the candidate
join is unhinted (AQE broadcasts the typical language/source-sized
candidate set, shuffles a genuinely huge one — forcing broadcast would
be wrong at 100 TB with millions of groups).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from food_panda_etl_spark.operators.heavy import _mg_absorb


def heavy_hitters_by_group(
    df: DataFrame,
    group_col: str,
    col: str,
    fraction: float,
    slack: float = 2.0,
) -> DataFrame:
    """All (group, value) pairs where value's frequency exceeds
    ``fraction`` of the GROUP's row count, with exact counts —
    identical to per-group ``GROUP BY value HAVING cnt > f·n_g`` under
    any partitioning. Returns (group_col, col, cnt bigint)."""
    if not 0.0 < fraction < 1.0:
        raise ValueError(f"fraction must be in (0, 1), got {fraction}")
    k = max(1, int(slack / fraction))

    def summarize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        counters: dict = {}  # group -> MG dict
        totals: dict = {}  # group -> row count
        for pdf in batches:
            for g, sub in pdf.groupby(group_col, dropna=False):
                totals[g] = totals.get(g, 0) + len(sub)
                counters[g] = _mg_absorb(counters.get(g, {}), sub[col], k)
        groups, vals, ns = [], [], []
        for g, cnts in counters.items():
            for v in cnts:
                groups.append(g)
                vals.append(v)
                ns.append(None)
            groups.append(g)
            vals.append(None)
            ns.append(totals[g])
        yield pd.DataFrame(
            {
                group_col: groups,
                col: vals,
                "__n": pd.array(ns, dtype="Int64"),
            }
        )

    _INTEGRAL = {"tinyint", "smallint", "int", "bigint"}
    gt = df.schema[group_col].dataType.simpleString()
    vt = df.schema[col].dataType.simpleString()
    g_bridge = gt in _INTEGRAL
    v_bridge = vt in _INTEGRAL

    def _out(name: str, bridged: bool):
        g = F.col(name)
        return g.cast("string") if bridged else g

    def _back(c, bridged: bool, typ: str):
        return c.cast(typ) if bridged else c

    summary = df.select(
        _out(group_col, g_bridge).alias(group_col),
        _out(col, v_bridge).alias(col),
    ).mapInPandas(
        summarize,
        f"{group_col} {'string' if g_bridge else gt}, "
        f"{col} {'string' if v_bridge else vt}, __n bigint",
    ).localCheckpoint(eager=False)
    cand = (
        summary.filter(F.col(col).isNotNull())
        .select(
            _back(F.col(group_col), g_bridge, gt).alias("__cg"),
            _back(F.col(col), v_bridge, vt).alias("__cv"),
        )
        .distinct()
    )
    totals = (
        summary.filter(F.col(col).isNull())
        .groupBy(_back(F.col(group_col), g_bridge, gt).alias("__tg"))
        .agg(F.sum("__n").alias("__total"))
    )
    # the group key can legitimately be NULL (its own group, per the
    # contract above) — both the candidate semi join and the totals
    # join must use null-safe equality or NULL-group hitters silently
    # vanish from the recount
    counted = (
        df.join(
            cand,
            df[group_col].eqNullSafe(cand["__cg"]) & (df[col] == cand["__cv"]),
            "semi",
        )
        .groupBy(group_col, col)
        .agg(F.count("*").alias("cnt"))
    )
    return (
        counted.join(
            totals, counted[group_col].eqNullSafe(totals["__tg"])
        )
        .filter(
            F.col("cnt").cast("double")
            > F.lit(float(fraction)) * F.col("__total").cast("double")
        )
        .select(group_col, col, "cnt")
    )
