"""The RANK/QUANTILE family's streamed state maintenance (the r18
build-ahead face composed, the test_streaming_heavy convention): a
per-day equi-width histogram maintained across micro-batches via
`incremental_hist_refresh` must equal the batch histogram of the full
input EXACTLY (linearity — histograms merge without loss, so unlike
the MG summary there is no truncating regime to screen around;
counting is BAG semantics, exactly-once delivery is the input
contract), and the trailing-window quantile read FROM STATE ALONE
(`hist_merge_groups` across the dropped day) must match the batch
pipeline. State is ≤ days·n_buckets rows and round-trips through
versioned parquet between micro-batches, so this ALSO pins that the
grid stamp survives parquet (the refresh validates it on every batch,
and a mismatched-grid probe of the reloaded state raises)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from food_panda_etl_spark.operators.histogram_state import (
    _GEO_KEYS,
    hist_merge_groups,
    hist_quantiles,
    hist_summary,
    incremental_hist_refresh,
)
from food_panda_etl_spark.operators.state_geometry import state_geometry
from food_panda_etl_spark.streaming.runner import EVENTS_STREAM_SCHEMA
from tests.test_streaming import _event, _write_files
from tests.test_streaming_sketches import (
    _keyed,
    _rows,
    _run_versioned_merge,
)

_LO, _STEP, _NB = 0, 1, 8  # one bucket per user id on the 6-user fixture


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


def test_streaming_hist_state_equals_batch(spark, out_dir):
    src = _write_files(out_dir, _batches())

    def step(rows, prev):
        # the harness pre-applies _keyed: rows are (k, day)
        if prev is None:
            h = hist_summary(rows, "k", _LO, _STEP, _NB, ("day",))
        else:
            h = incremental_hist_refresh(
                prev("hist"), rows, "k", _LO, _STEP, _NB, ("day",)
            )
        return {"hist": h}

    final = _run_versioned_merge(spark, out_dir, src, "hist", step)
    hist = final("hist")

    full = _keyed(spark.read.schema(EVENTS_STREAM_SCHEMA).json(src))
    want = hist_summary(full, "k", _LO, _STEP, _NB, ("day",))
    assert _rows(hist, ["day", "bucket", "cnt"]) == _rows(
        want, ["day", "bucket", "cnt"]
    )
    # the grid stamp survived the versioned-parquet round trips (the
    # refresh validated it on every micro-batch); a mismatched-grid
    # probe of the RELOADED state must still raise
    assert state_geometry(hist, "cnt", _GEO_KEYS) is not None
    with pytest.raises(ValueError, match="does not match the supplied"):
        hist_quantiles(hist, [(1, 2)], "k", _LO, 2, _NB, ("day",))

    # trailing-window median FROM STATE ALONE == the batch pipeline:
    # merge the last two days across the dropped day dimension
    win = F.col("day") >= "2024-01-03"
    merged = hist_merge_groups(
        [hist.filter(win)], _LO, _STEP, _NB, "k"
    )
    got = hist_quantiles(merged, [(1, 2)], "k", _LO, _STEP, _NB)
    direct = hist_summary(full.filter(win), "k", _LO, _STEP, _NB)
    want_q = hist_quantiles(direct, [(1, 2)], "k", _LO, _STEP, _NB)
    assert _rows(got, ["q_num", "q_den", "bucket", "est"]) == _rows(
        want_q, ["q_num", "q_den", "bucket", "est"]
    )
    assert got.count() == 1
