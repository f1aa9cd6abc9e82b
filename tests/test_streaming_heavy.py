"""The FREQUENT-ITEMS family's streamed state maintenance (the r18
build-ahead faces composed, the test_streaming_sketches convention): a
per-day exact-then-truncate MG summary maintained across micro-batches
via `incremental_heavy_refresh` must equal the batch summary of the
full input whenever truncation never fires (the pure-sum identity —
counting is BAG semantics, so exactly-once delivery is the input
contract, unlike the sampler's over-SETS merge), and in the truncating
regime the maintained screen must still cover every true heavy hitter
with the exact candidates-only recount reproducing the brute-force
HAVING. The trailing-window answer derived FROM STATE ALONE
(`mg_merge_groups` across the dropped day) must match the batch
pipeline. Summary state is ≤ days·k rows + one totals row per day —
the sketch-state regime applied to exact frequent items. The state
round-trips through versioned parquet between micro-batches, so this
ALSO pins that the geometry stamp survives parquet (the refresh
validates it on every batch)."""

from __future__ import annotations

from pyspark.sql import functions as F

from food_panda_etl_spark.operators.heavy_incremental import (
    heavy_candidates,
    incremental_heavy_refresh,
    mg_merge_groups,
    mg_summary,
)
from food_panda_etl_spark.streaming.runner import EVENTS_STREAM_SCHEMA
from tests.test_streaming import _event, _write_files
from tests.test_streaming_sketches import (
    _keyed,
    _rows,
    _run_versioned_merge,
)

_K = 10  # above the 6-user vocabulary: truncation never fires


def _batches():
    return [
        [_event(1, "2024-01-01 10:00:00", user=1),
         _event(2, "2024-01-01 11:00:00", user=1),
         _event(3, "2024-01-02 09:00:00", user=2)],
        [_event(4, "2024-01-02 10:00:00", user=1),
         _event(5, "2024-01-03 10:00:00", user=3),
         _event(6, "2024-01-03 11:00:00", user=1)],
        [_event(7, "2024-01-04 08:00:00", user=4),
         _event(8, "2024-01-04 09:00:00", user=1),
         _event(9, "2024-01-04 10:00:00", user=5),
         _event(10, "2024-01-03 12:00:00", user=6)],
    ]


def test_streaming_heavy_state_equals_batch(spark, out_dir):
    src = _write_files(out_dir, _batches())

    def step(rows, prev):
        # the harness pre-applies _keyed: rows are (k, day)
        if prev is None:
            c, t = mg_summary(rows, "k", _K, group_cols=("day",))
        else:
            c, t = incremental_heavy_refresh(
                prev("counters"), prev("totals"), rows, "k", _K,
                group_cols=("day",),
            )
        return {"counters": c, "totals": t}

    final = _run_versioned_merge(spark, out_dir, src, "heavy", step)
    counters, totals = final("counters"), final("totals")

    full = _keyed(spark.read.schema(EVENTS_STREAM_SCHEMA).json(src))
    want_c, want_t = mg_summary(full, "k", _K, group_cols=("day",))
    assert _rows(counters, ["day", "k", "cnt"]) == _rows(
        want_c, ["day", "k", "cnt"]
    )
    assert _rows(totals, ["day", "n", "deficit"]) == _rows(
        want_t, ["day", "n", "deficit"]
    )

    # trailing-window heavies FROM STATE ALONE == the batch pipeline:
    # merge the last two days across the dropped day dimension, screen
    # at 1/4, recount exactly over the window rows
    win = F.col("day") >= "2024-01-03"
    mc, mt = mg_merge_groups(
        [(counters.filter(win), totals.filter(win))], "k", _K
    )
    cand = heavy_candidates(mc, mt, "k", 1, 4, _K)
    win_rows = full.filter(win)
    got = (
        win_rows.join(F.broadcast(cand), "k", "semi")
        .groupBy("k")
        .agg(F.count("*").cast("bigint").alias("cnt"))
        .crossJoin(F.broadcast(mt.select("n")))
        .filter(F.col("cnt") * 4 > F.col("n"))
        .select("k", "cnt")
    )
    n_win = win_rows.count()
    want = (
        win_rows.groupBy("k")
        .agg(F.count("*").cast("bigint").alias("cnt"))
        .filter(F.col("cnt") * 4 > F.lit(n_win))
    )
    assert _rows(got, ["k", "cnt"]) == _rows(want, ["k", "cnt"])
    assert got.count() > 0


def test_streaming_heavy_truncating_regime_screen_holds(spark, out_dir):
    """k=2 forces truncation inside every refresh: the maintained
    state is no longer equal to the one-shot summary (MG summaries are
    lossy), but the guarantee the screen rides — candidates ⊇ true
    heavies, exact recount == brute force — must hold through the
    streamed refresh chain."""
    src = _write_files(out_dir, _batches())
    k = 2

    def step(keyed, prev):
        rows = keyed.select("k")  # harness pre-applies _keyed
        if prev is None:
            c, t = mg_summary(rows, "k", k)
        else:
            c, t = incremental_heavy_refresh(
                prev("counters"), prev("totals"), rows, "k", k
            )
        return {"counters": c, "totals": t}

    final = _run_versioned_merge(spark, out_dir, src, "heavy_tr", step)
    counters, totals = final("counters"), final("totals")
    tot = totals.collect()[0]
    full = _keyed(spark.read.schema(EVENTS_STREAM_SCHEMA).json(src))
    n = full.count()
    assert tot.n == n
    assert tot.deficit <= n // (k + 1) + 1
    # the screen's own guard: k=2 genuinely CAN lose a heavy hitter
    # at 1/3 (deficit up to n/3 can zero a boundary key's counter), so
    # heavy_candidates must REFUSE rather than silently under-screen —
    # the docstring bound k >= 2·den/num as a failing test. (The
    # truncating-regime superset property itself is machine-checked on
    # random data in test_heavy_incremental.py.)
    import pytest

    with pytest.raises(ValueError, match="too small"):
        heavy_candidates(counters, totals, "k", 1, 3, k)
    # at 1/1 the bound holds (vacuously heavy-free) and the API path
    # over parquet-round-tripped, truncated state stays green
    cand = {
        r.k for r in heavy_candidates(
            counters, totals, "k", 1, 1, k
        ).collect()
    }
    brute = {
        r.k
        for r in full.groupBy("k")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") * 1 > F.lit(n) * 1)
        .collect()
    }
    assert brute <= cand
