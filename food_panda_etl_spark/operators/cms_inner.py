"""CMS inner product — the sketch-based equi-join SIZE estimate
(Cormode & Muthukrishnan, J. Algorithms 2005 §4.2; the AGMS/sketch
join-cardinality literature). The size of ``A ⋈ B`` on a key is the
inner product Σ_k f_A(k)·f_B(k) of the two frequency vectors; two
count-min sketches with the SAME (width, depth, hash family) estimate
it as min_d Σ_b c_A[d,b]·c_B[d,b] — per depth row, every true (k, k)
term lands in the same bucket (both sketches hash with the same h_d),
and collisions only ADD nonnegative mass, so the estimate NEVER
underestimates (one-sided, like the point query), and overshoots by
more than 2·N_A·N_B/width on a row with probability ≤ 1/2, driven down
by the min over depth.

Why it matters at 100 TB: join-size estimation from ≤ width·depth-row
summaries is the planning primitive for join ORDER and strategy —
two sketches answer "how big is this join?" without touching either
fact table again, and partial sketches merge (cells are counters), so
per-partition / per-day sketches give incremental join-size tracking
for free.

Determinism: counts are exact BIGINTs, the hash family is the portable
affine grid (`operators/cms.py::_cell`), so the estimate replays
bit-for-bit in DuckDB — the declared query (slated r14) hash-matches
the FULL replay, not just a gate verdict.

Overflow contract: Σ_b c_A·c_B ≤ N_A·N_B must stay below 2^63 — an
in-plan guard raises when N_A and N_B (cell-count totals, cheap ≤
width·depth-row aggregates of the SKETCHES, never the facts) multiply
past 4·10^18; sketch counts beyond ~2·10^9 rows per side need a
pre-scaled (sampled) build. Reference: /root/reference has no sketch
subsystem — public-literature operator, same as cms.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from food_panda_etl_spark.operators.cms import CMS_GEO_KEYS
from food_panda_etl_spark.operators.state_geometry import (
    check_uniform_geometry,
)

_MAX_PRODUCT = 4 * 10**18


def cms_inner_product(sk_a: DataFrame, sk_b: DataFrame) -> DataFrame:
    """ONE-row (est bigint) estimate of the inner product of the two
    sketched frequency vectors == the equi-join size of the sketched
    columns. Both inputs must come from `cms.cms_sketch` with the SAME
    (width, depth) — same-geometry is the caller contract (the
    cms_merge rule: bounds checks are best-effort at most; SHAPE is
    validated exactly — columns here at build time, the depth SETS
    in-plan below: unlike width, a depth mismatch is cheaply
    detectable on these ≤ width·depth-row frames, and minning over
    only sk_a's depth rows would silently answer a different
    question). The whole computation is two ≤ width·depth-row
    frames: an inner join on (d, b) (absent cells are zero counts —
    zero product mass, inner join is exact), one per-depth sum, one
    global min."""
    for name, s in (("sk_a", sk_a), ("sk_b", sk_b)):
        if sorted(s.columns) != ["b", "cnt", "d"]:
            raise ValueError(
                f"cms_inner_product: {name} has columns {list(s.columns)},"
                " expected [d, b, cnt] from cms_sketch"
            )
    # geometry stamps (VERDICT r17 task 4): with both inputs stamped
    # this is the EXACT same-(width, depth) check the in-plan depth-set
    # guard below can only approximate (depth is cheaply observable on
    # the cell rows; width is not — a NARROWER build passes every
    # bounds check, but not the stamp comparison)
    check_uniform_geometry(
        "cms_inner_product",
        CMS_GEO_KEYS,
        [("sk_a", sk_a, "cnt"), ("sk_b", sk_b, "cnt")],
        "the inner product would pair cells from different cell "
        "spaces (rebuild one side or match width/depth)",
    )
    a = sk_a.select("d", "b", F.col("cnt").alias("__ca"))
    b = sk_b.select("d", "b", F.col("cnt").alias("__cb"))
    # in-plan overflow guard: totals are per-sketch row counts N_A, N_B
    # (sum of any ONE depth row's cells; depth 0 is always present;
    # coalesce — F.sum over an EMPTY sketch is NULL, and a NULL must
    # read as 0, not trip the raise) — Σ_b c_A·c_B ≤ N_A·N_B, so
    # N_A·N_B ≤ 4e18 < 2^63 bounds every term. __ok is 1 on the happy
    # path and MULTIPLIES the result below: an unused guard column
    # would be pruned out of the plan by Catalyst, raise and all.
    tot = (
        a.filter(F.col("d") == 0)
        .agg(F.coalesce(F.sum("__ca"), F.lit(0)).alias("__na"))
        .crossJoin(
            b.filter(F.col("d") == 0).agg(
                F.coalesce(F.sum("__cb"), F.lit(0)).alias("__nb")
            )
        )
        .select(
            # division form — the guard's own product would overflow in
            # exactly the regime it protects (review r13): under
            # non-ANSI a 1.6e19 product wraps negative and PASSES the
            # <= test; na ≤ MAX div nb ⟺ na·nb ≤ MAX for nb ≥ 1
            F.when(
                (F.col("__nb") == 0)
                | (
                    F.col("__na")
                    <= F.expr(f"{_MAX_PRODUCT} div greatest(__nb, 1)")
                ),
                F.lit(1),
            )
            .otherwise(
                F.raise_error(
                    F.format_string(
                        "cms_inner_product: N_A*N_B = %s * %s exceeds the"
                        " int64 inner-product bound — pre-scale one side",
                        F.col("__na").cast("string"),
                        F.col("__nb").cast("string"),
                    )
                ).cast("int")
            )
            .alias("__ok")
        )
    )
    # depth-set guard (ADVICE r13): a geometry-contract violation where
    # the two sketches disagree on depth rows must FAIL, not silently
    # min over sk_a's depths only. Full-outer-join the two ≤ depth-row
    # distinct lists and count one-sided rows — in-plan like __ok, so
    # Catalyst cannot prune the raise away.
    dguard = (
        sk_a.select("d")
        .distinct()
        .withColumn("__ia", F.lit(1))
        .join(
            sk_b.select("d").distinct().withColumn("__ib", F.lit(1)),
            "d",
            "full",
        )
        .agg(
            F.coalesce(
                F.sum(
                    (F.col("__ia").isNull() | F.col("__ib").isNull()).cast(
                        "int"
                    )
                ),
                F.lit(0),
            ).alias("__dmis"),
            # an EMPTY sketch (zero rows == all-zero counters) is a
            # valid operand with inner product 0, not a geometry
            # violation — only flag when BOTH sides carry depth rows
            F.coalesce(F.sum(F.col("__ia")), F.lit(0)).alias("__nda"),
            F.coalesce(F.sum(F.col("__ib")), F.lit(0)).alias("__ndb"),
        )
        .select(
            F.when(
                (F.col("__dmis") == 0)
                | (F.col("__nda") == 0)
                | (F.col("__ndb") == 0),
                F.lit(1),
            )
            .otherwise(
                F.raise_error(
                    F.format_string(
                        "cms_inner_product: sketches disagree on %s depth"
                        " rows — same (width, depth) geometry is the"
                        " caller contract",
                        F.col("__dmis").cast("string"),
                    )
                ).cast("int")
            )
            .alias("__dok")
        )
    )
    per_cell = (
        a.join(b, ["d", "b"])
        .groupBy("d")
        .agg(F.sum(F.col("__ca") * F.col("__cb")).alias("__s"))
    )
    # a depth row with NO common cells has per-depth sum 0 and must
    # reach the min (its absence from the inner join would silently
    # overestimate: min over the OTHER depths only) — left-join the
    # depth list and zero-fill
    depths = sk_a.select("d").distinct()
    per_depth = depths.join(per_cell, "d", "left").select(
        F.coalesce(F.col("__s"), F.lit(0)).alias("__s")
    )
    return (
        per_depth.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(dguard))
        .agg(
            F.coalesce(
                F.min(F.col("__s") * F.col("__ok") * F.col("__dok")),
                F.lit(0),
            )
            .cast("bigint")
            .alias("est")
        )
    )
