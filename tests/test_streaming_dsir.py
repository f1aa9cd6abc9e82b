"""The CLASSIFIER/score family's streamed state maintenance (the
r19 build-ahead face composed, the test_streaming_sketches
convention): the hashed-bigram DSIR count state maintained across
micro-batches via `incremental_dsir_refresh` must equal the batch
state of the full input (counts are LINEAR — the pure-sum identity,
exactly-once delivery is the input contract), and scoring a probe
against the maintained state must BIT-match `dsir_weights` over the
full replayed corpus. The state round-trips through versioned parquet
between micro-batches, so this ALSO pins that the geometry stamp
survives parquet (the refresh validates it on every batch)."""

from __future__ import annotations

from pyspark.sql import functions as F

from food_panda_etl_spark.operators.dsir import dsir_weights
from food_panda_etl_spark.operators.dsir_incremental import (
    build_dsir_state,
    dsir_score_against_state,
    incremental_dsir_refresh,
)
from food_panda_etl_spark.streaming.runner import EVENTS_STREAM_SCHEMA
from tests.test_streaming import _write_files
from tests.test_streaming_heavy import _batches
from tests.test_streaming_sketches import (
    _keyed,
    _run_versioned_merge,
)

_B = 256


def _texted(keyed):
    """(doc_id, lang-analog, text) from the harness's (k, day) rows —
    a two-token document per event ("u<k> d<day>"), target = the
    first day's traffic. ONE definition for the streaming batches and
    the batch baseline (the no-drift rule)."""
    return keyed.select(
        F.col("k").alias("doc_id"),
        F.col("day"),
        F.concat(
            F.lit("u"), F.col("k").cast("string"), F.lit(" d"), F.col("day")
        ).alias("text"),
    )


def _target():
    return F.col("day") == "2024-01-01"


def test_streaming_dsir_state_equals_batch(spark, out_dir):
    src = _write_files(out_dir, _batches())

    def step(keyed, prev):
        docs = _texted(keyed)
        if prev is None:
            return {
                "counts": build_dsir_state(
                    docs, _target(), buckets=_B
                )
            }
        return {
            "counts": incremental_dsir_refresh(
                prev("counts"), docs, _target(), buckets=_B
            )
        }

    final = _run_versioned_merge(spark, out_dir, src, "dsir", step)
    state = final("counts")

    full = _texted(
        _keyed(spark.read.schema(EVENTS_STREAM_SCHEMA).json(src))
    )
    want_state = build_dsir_state(full, _target(), buckets=_B)
    got_rows = sorted(
        tuple(r) for r in state.select("__b", "__rb", "__tb").collect()
    )
    want_rows = sorted(
        tuple(r)
        for r in want_state.select("__b", "__rb", "__tb").collect()
    )
    assert got_rows == want_rows and len(got_rows) > 0

    # scoring the full corpus against the MAINTAINED state bit-matches
    # dsir_weights over the replayed input (the declared-identity's
    # streamed form)
    got = dsir_score_against_state(full, state, buckets=_B)
    want = dsir_weights(full, _target(), buckets=_B)
    g = sorted(
        (r.doc_id, r.n_bigrams, float(r.dsir_score).hex())
        for r in got.collect()
    )
    w = sorted(
        (r.doc_id, r.n_bigrams, float(r.dsir_score).hex())
        for r in want.collect()
    )
    assert g == w and len(g) > 0
