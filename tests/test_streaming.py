"""Structured Streaming smoke tests (SURVEY.md §2.9): file-source
micro-batches, watermark late-data drop, watermarked dedup, and the
applyInPandasWithState custom stateful operator."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from food_panda_etl_spark.streaming import (
    read_events_stream,
    run_available_now,
    running_user_totals,
    streaming_dedup,
    tumbling_counts,
)


def _event(eid, ts, user=1, etype="click", value=1.0):
    return {
        "event_id": eid,
        "ts": ts,
        "user_id": user,
        "event_type": etype,
        "value": value,
        "props": "{}",
    }


def _write_files(out_dir, batches):
    """One JSONL file per micro-batch, with strictly increasing mtimes so
    the file source replays them in order."""
    src = os.path.join(out_dir, "stream_in")
    os.makedirs(src, exist_ok=True)
    for i, rows in enumerate(batches):
        p = os.path.join(src, f"batch_{i:03d}.jsonl")
        with open(p, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))
    return src


def test_tumbling_watermark_drops_late_rows(spark, out_dir):
    """Batch 0 fills the 10:00 window and advances the watermark to 11:50
    via a 12:00 event; the 10:15 straggler is behind the watermark and must
    NOT bump the 10:00 window's count. The straggler arrives two batches
    later because the late-events filter uses the previous batch's
    watermark (Spark's two-phase watermark propagation) — one batch after
    advancement it is not yet in force."""
    src = _write_files(
        out_dir,
        [
            [
                _event(1, "2024-01-01 10:00:00"),
                _event(2, "2024-01-01 10:10:00"),
                _event(3, "2024-01-01 10:20:00"),
                _event(4, "2024-01-01 12:00:00"),
            ],
            [_event(5, "2024-01-01 12:01:00")],  # watermark now in force
            [_event(6, "2024-01-01 10:15:00")],  # late — dropped
        ],
    )
    stream = read_events_stream(spark, src)
    out = run_available_now(
        tumbling_counts(stream, watermark="10 minutes"), output_mode="update"
    )
    got = (
        out.select(F.date_format("w.start", "HH:mm").alias("ws"), "cnt")
        .groupBy("ws")
        .agg(F.max("cnt").alias("cnt"))
        .collect()
    )
    by_window = {r["ws"]: r["cnt"] for r in got}
    assert by_window["10:00"] == 3  # straggler dropped; 4 would mean no watermark
    assert by_window["12:00"] == 2  # the 12:00 and 12:01 events


def test_streaming_dedup_within_watermark(spark, out_dir):
    src = _write_files(
        out_dir,
        [
            [_event(1, "2024-01-01 10:00:00", user=7), _event(1, "2024-01-01 10:00:30", user=7)],
            [_event(1, "2024-01-01 10:01:00", user=7), _event(2, "2024-01-01 10:02:00", user=8)],
        ],
    )
    stream = read_events_stream(spark, src)
    out = run_available_now(
        streaming_dedup(stream, ["event_id"], watermark="10 minutes"),
        output_mode="append",
    )
    rows = out.select("event_id").collect()
    assert sorted(r["event_id"] for r in rows) == [1, 2]


def test_streaming_dedup_batch_fallback(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c")], "event_id long, x string"
    )
    assert streaming_dedup(df, ["event_id"]).count() == 2


def test_running_user_totals_stateful(spark, out_dir):
    """applyInPandasWithState: totals accumulate across micro-batches; the
    final per-user state equals the batch groupBy over all rows."""
    src = _write_files(
        out_dir,
        [
            [_event(1, "2024-01-01 10:00:00", user=1, value=2.0),
             _event(2, "2024-01-01 10:01:00", user=2, value=5.0)],
            [_event(3, "2024-01-01 10:02:00", user=1, value=3.0)],
        ],
    )
    stream = read_events_stream(spark, src)
    out = run_available_now(running_user_totals(stream), output_mode="update")
    final = (
        out.groupBy("user_id")
        .agg(F.max("n_events").alias("n"), F.max("total_value").alias("t"))
        .collect()
    )
    got = {r["user_id"]: (r["n"], r["t"]) for r in final}
    assert got == {1: (2, 5.0), 2: (1, 5.0)}
    # intermediate state was emitted too: user 1 appears with n_events=1
    u1 = sorted(r["n_events"] for r in out.filter("user_id = 1").collect())
    assert u1 == [1, 2]


def test_session_window_streaming(spark, out_dir):
    """session_counts under readStream: two bursts for user 1 separated by
    > gap → two sessions; user 2's single event → one session."""
    from food_panda_etl_spark.streaming.ops import session_counts

    src = _write_files(
        out_dir,
        [
            [_event(1, "2024-01-01 10:00:00", user=1),
             _event(2, "2024-01-01 10:10:00", user=1),
             _event(3, "2024-01-01 10:05:00", user=2)],
            [_event(4, "2024-01-01 12:00:00", user=1)],
        ],
    )
    stream = read_events_stream(spark, src)
    # session-window streaming aggregation supports append, not update:
    # a session emits once, when the watermark passes its end
    out = run_available_now(
        session_counts(stream, gap="30 minutes", watermark="10 minutes"),
        output_mode="append",
    )
    rows = [
        (r["user_id"], r["w"]["start"].strftime("%H:%M"), r["cnt"])
        for r in out.collect()
    ]
    # the 12:00 event advances the watermark to 11:50, closing both early
    # sessions; its own session is still open at stream end → not emitted
    assert (1, "10:00", 2) in rows  # 10:00+10:10 merged (gap < 30m)
    assert (2, "10:05", 1) in rows
    assert not any(u == 1 and s == "12:00" for u, s, _ in rows)


def test_sliding_window_streaming(spark, out_dir):
    from food_panda_etl_spark.streaming.ops import sliding_counts

    src = _write_files(
        out_dir, [[_event(1, "2024-01-01 10:20:00"), _event(2, "2024-01-01 10:25:00")]]
    )
    stream = read_events_stream(spark, src)
    out = run_available_now(
        sliding_counts(stream, duration="1 hour", slide="15 minutes"),
        output_mode="update",
    )
    rows = {(r["w"]["start"].strftime("%H:%M"), r["cnt"]) for r in out.collect()}
    # each event lands in 4 hops; both events share windows 09:30..10:15
    assert ("10:15", 2) in rows and ("09:30", 2) in rows
    assert ("10:30", 0) not in {r for r in rows}


def test_stream_stream_interval_join(spark, out_dir):
    """Click→purchase attribution within 30 minutes, per user — the
    bounded stream-stream join. Result must equal the batch join over the
    same rows."""
    from food_panda_etl_spark.streaming.ops import interval_join

    batches = [
        [_event(1, "2024-01-01 10:00:00", user=1, etype="click"),
         _event(2, "2024-01-01 10:10:00", user=1, etype="purchase"),
         _event(3, "2024-01-01 10:50:00", user=1, etype="purchase")],  # > 30m after click 1
        [_event(4, "2024-01-01 11:00:00", user=2, etype="click"),
         _event(5, "2024-01-01 11:05:00", user=2, etype="purchase")],
    ]
    src = _write_files(out_dir, batches)
    stream = read_events_stream(spark, src)
    clicks = stream.filter("event_type = 'click'")
    buys = stream.filter("event_type = 'purchase'")
    out = run_available_now(
        interval_join(clicks, buys, within="30 minutes"), output_mode="append"
    )
    got = {(r["l_id"], r["r_id"]) for r in out.collect()}
    assert got == {(1, 2), (4, 5)}  # (1,3) excluded: outside the interval


def test_checkpoint_recovery_preserves_dedup_state(spark, out_dir):
    """Stop/restart against the same checkpoint: dedup state survives, so
    a key that already passed before the restart is still dropped after
    it — the exactly-once story a production stream depends on."""
    src = os.path.join(out_dir, "in")
    ckpt = os.path.join(out_dir, "ckpt")
    sink = os.path.join(out_dir, "sink")
    os.makedirs(src)

    def run_once():
        stream = read_events_stream(spark, src, max_files_per_trigger=None)
        q = (
            streaming_dedup(stream, ["event_id"], watermark="10 minutes")
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)

    def add_file(name, rows):
        p = os.path.join(src, name)
        with open(p, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

    add_file("a.jsonl", [_event(1, "2024-01-01 10:00:00"), _event(2, "2024-01-01 10:01:00")])
    run_once()
    # restart with a duplicate of event 1 plus a new event
    add_file("b.jsonl", [_event(1, "2024-01-01 10:02:00"), _event(3, "2024-01-01 10:03:00")])
    run_once()

    final = spark.read.parquet(sink)
    assert sorted(r["event_id"] for r in final.collect()) == [1, 2, 3]


def test_interval_join_streaming_equals_batch(spark, out_dir):
    """Differential evidence for the stream-stream join (VERDICT r4 task
    8): on a 48-event deterministic fixture the streaming interval_join
    (micro-batched, watermarked, state-evicting) must produce EXACTLY the
    batch interval_join's row set — same operator function, isStreaming
    branches only. Timestamps are monotone across batches so no event is
    watermark-late; every divergence would be join-state mishandling."""
    from food_panda_etl_spark.streaming.ops import interval_join

    def mk(i):
        return _event(
            i,
            f"2024-01-01 {10 + i // 60:02d}:{i % 60:02d}:00",
            user=i % 5 + 1,  # coprime with the type cycle: every user clicks AND buys
            etype="click" if i % 3 == 0 else "purchase",
            value=1.0,
        )

    rows = [mk(i) for i in range(48)]
    batches = [rows[:16], rows[16:32], rows[32:]]
    src = _write_files(out_dir, batches)

    stream = read_events_stream(spark, src)
    s_out = run_available_now(
        interval_join(
            stream.filter("event_type = 'click'"),
            stream.filter("event_type = 'purchase'"),
            within="7 minutes",
        ),
        output_mode="append",
    )
    streaming_pairs = {(r["l_id"], r["r_id"]) for r in s_out.collect()}

    batch_df = spark.read.json(
        spark.sparkContext.parallelize([json.dumps(r) for r in rows])
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    b_out = interval_join(
        batch_df.filter("event_type = 'click'"),
        batch_df.filter("event_type = 'purchase'"),
        within="7 minutes",
    )
    batch_pairs = {(r["l_id"], r["r_id"]) for r in b_out.collect()}

    assert streaming_pairs, "vacuous fixture: no pairs joined"
    assert streaming_pairs == batch_pairs


def test_running_user_totals_equals_batch_groupby(spark, out_dir):
    """Differential evidence for the custom stateful operator: the FINAL
    per-user state after all micro-batches must equal a plain batch
    groupBy(count, sum) over the same rows. Values are exact binary
    fractions (k/4) so both summation orders are exact — equality is
    bitwise, not approximate."""
    rows = [
        _event(i, f"2024-01-01 10:{i % 60:02d}:00", user=i % 5 + 1, value=(i % 8) * 0.25)
        for i in range(40)
    ]
    src = _write_files(out_dir, [rows[:13], rows[13:27], rows[27:]])
    stream = read_events_stream(spark, src)
    out = run_available_now(running_user_totals(stream), output_mode="update")
    # update mode emits one row per (user, micro-batch); the final state
    # is the row with the largest n_events per user
    final = {}
    for r in out.collect():
        if r["user_id"] not in final or r["n_events"] > final[r["user_id"]][0]:
            final[r["user_id"]] = (r["n_events"], r["total_value"])

    batch_df = spark.read.json(
        spark.sparkContext.parallelize([json.dumps(r) for r in rows])
    )
    batch = {
        r["user_id"]: (r["n"], r["t"])
        for r in batch_df.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("t"))
        .collect()
    }
    assert len(batch) == 5
    assert final == batch


def test_tumbling_append_eviction_equals_batch_analog(spark, out_dir):
    """VERDICT r5 task 8 — late-data DIFFERENTIAL evidence on the
    eviction path. A deterministic 5-micro-batch replay with known late
    rows is compared against a pure-Python watermark simulation feeding
    the BATCH twin of the same aggregation:

    - admit filter: a late row in batch i survives iff its WINDOW is
      still live — window end > the watermark committed after batch
      i-2 (two-phase propagation: the value computed from batch i-1's
      data is not yet in force in batch i; and state is dropped per
      window, not per row timestamp);
    - eviction/emission (append mode): a window is emitted exactly when
      its end <= the final horizon max(ts) - delay (availableNow keeps
      committing until the watermark stabilizes).

    Every batch-analog row (window start, cnt, decimal-summed value)
    must equal the streamed append output EXACTLY, and the
    kept/dropped arithmetic must match the hand-countable timeline
    (3 late rows behind closed windows are dropped, 5 late rows into
    still-open windows are kept)."""
    batches = [
        [_event(1, "2024-01-01 10:00:00"), _event(2, "2024-01-01 10:20:00"),
         _event(3, "2024-01-01 10:40:00")],
        [_event(4, "2024-01-01 12:00:00"),   # advancer
         _event(5, "2024-01-01 10:25:00")],  # late, no wm in force -> kept
        [_event(6, "2024-01-01 12:30:00"),
         _event(7, "2024-01-01 10:45:00"),   # w10 end 11:00 > 10:30 -> kept
         _event(8, "2024-01-01 09:55:00")],  # w09 end 10:00 < 10:30 -> DROPPED
        [_event(9, "2024-01-01 13:00:00"),
         _event(10, "2024-01-01 10:50:00"),  # w10 end 11:00 < 11:50 -> DROPPED
         _event(11, "2024-01-01 11:45:00")], # w11 end 12:00 > 11:50 -> kept
        [_event(12, "2024-01-01 14:00:00"),
         _event(13, "2024-01-01 11:30:00"),  # w11 end 12:00 < 12:20 -> DROPPED
         _event(14, "2024-01-01 12:10:00")], # w12 end 13:00 > 12:20 -> kept
    ]
    src = _write_files(out_dir, batches)
    stream = read_events_stream(spark, src)
    got = (
        run_available_now(
            tumbling_counts(stream, watermark="10 minutes"), output_mode="append"
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm").alias("ws"),
            "cnt",
            "sum_value",
        )
        .collect()
    )

    # --- the batch analog, from a pure-Python watermark simulation ---
    from datetime import datetime, timedelta

    ts = lambda r: datetime.strptime(r["ts"], "%Y-%m-%d %H:%M:%S")  # noqa: E731
    win_end = lambda t: t.replace(minute=0, second=0) + timedelta(hours=1)  # noqa: E731
    delay = timedelta(minutes=10)
    committed: list = []  # watermark committed after batch i
    admitted, dropped = [], []
    for i, rows in enumerate(batches):
        wm = committed[i - 2] if i >= 2 else None
        for r in rows:
            live = wm is None or win_end(ts(r)) > wm
            (admitted if live else dropped).append(r)
        hi = max(ts(r) for b in batches[: i + 1] for r in b)
        committed.append(hi - delay)
    assert len(dropped) == 3 and len(admitted) == 11
    horizon = committed[-1]

    batch_df = spark.createDataFrame(
        [tuple(r.values()) for r in admitted],
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    want = (
        tumbling_counts(batch_df, watermark="10 minutes")  # batch twin
        .filter(F.col("w.end") <= F.lit(horizon.strftime("%Y-%m-%d %H:%M:%S")))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm").alias("ws"),
            "cnt",
            "sum_value",
        )
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    # eviction really happened: terminal windows (13:00, 14:00) unemitted
    assert {r["ws"] for r in got} == {
        "2024-01-01 10:00", "2024-01-01 11:00", "2024-01-01 12:00"
    }
    # all admitted rows are accounted for: emitted windows hold everything
    # except the one 13:00 and one 14:00 row still in (unemitted) state
    assert sum(r["cnt"] for r in got) == len(admitted) - 2


def test_dedup_state_eviction_readmits_old_key(spark, out_dir):
    """The dropDuplicatesWithinWatermark eviction path, differentially:
    a key re-arriving INSIDE the watermark horizon is suppressed, and
    the same key re-arriving AFTER its state was evicted is emitted
    again — exactly the documented within-watermark contract (batch
    dropDuplicates would emit once; the difference IS the eviction)."""
    batches = [
        [_event(1, "2024-01-01 10:00:00", user=7)],
        [_event(1, "2024-01-01 10:01:00", user=7),   # dup within horizon
         _event(2, "2024-01-01 12:00:00", user=8)],  # advances wm to 11:50
        [_event(3, "2024-01-01 12:01:00", user=8)],  # wm now in force
        [_event(1, "2024-01-01 12:02:00", user=7)],  # state evicted -> re-emitted
    ]
    src = _write_files(out_dir, batches)
    stream = read_events_stream(spark, src)
    out = run_available_now(
        streaming_dedup(stream, ["event_id"], watermark="10 minutes"),
        output_mode="append",
    )
    emitted = sorted(r["event_id"] for r in out.collect())
    assert emitted == [1, 1, 2, 3]
    # batch analog (no lateness, no eviction) collapses the re-arrival
    batch_df = spark.createDataFrame(
        [(r["event_id"],) for b in batches for r in b], "event_id long"
    )
    assert streaming_dedup(batch_df, ["event_id"]).count() == 3


def test_stream_static_enrich_equals_batch(spark, out_dir):
    """Stream-static left enrichment must equal the batch join on the
    same fixture, keep events with unknown keys (NULL attributes), and
    run without watermarks or state."""
    from food_panda_etl_spark.streaming.ops import enrich_stream

    src = _write_files(
        out_dir,
        [
            [_event(1, "2024-01-01 10:00:00", user=1),
             _event(2, "2024-01-01 10:05:00", user=2)],
            [_event(3, "2024-01-01 10:10:00", user=3),   # no dim row
             _event(4, "2024-01-01 10:15:00", user=1)],
        ],
    )
    dim = spark.createDataFrame(
        [(1, "gold"), (2, "silver"), (9, "unused")],
        "user_id long, segment string",
    )
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    stream = spark.readStream.schema(schema).json(src)
    out = os.path.join(out_dir, "enrich_out")
    q = (
        enrich_stream(stream, dim)
        .select("event_id", "user_id", "segment")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", os.path.join(out_dir, "enrich_ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["event_id"]: (r["user_id"], r["segment"])
        for r in spark.read.parquet(out).collect()
    }
    batch = spark.read.schema(schema).json(src)
    want = {
        r["event_id"]: (r["user_id"], r["segment"])
        for r in enrich_stream(batch, dim)
        .select("event_id", "user_id", "segment")
        .collect()
    }
    assert got == want
    assert got[3] == (3, None)   # unknown key kept, attribute NULL
    assert got[1] == (1, "gold") and got[4] == (1, "gold")


def test_foreachbatch_idempotent_sink_exactly_once(spark, out_dir):
    """Exactly-once through foreachBatch (VERDICT r6 task 6): the sink
    writes each micro-batch to a batch_id-keyed partition with overwrite
    — the canonical idempotent-sink recipe — and the writer CRASHES
    after its first successful write (simulated post-write failure, the
    worst case: data landed but the offset commit didn't). The
    restarted query must replay the batch with the SAME batch_id, the
    overwrite must absorb the duplicate delivery, and the final sink
    must hold exactly the input rows. Run 3× by the suite being
    deterministic (no sleeps, availableNow triggers)."""
    src = os.path.join(out_dir, "in")
    ckpt = os.path.join(out_dir, "ckpt")
    sink = os.path.join(out_dir, "sink")
    marker = os.path.join(out_dir, "crashed_once")
    os.makedirs(src)

    seen_batch_ids = []

    def write_batch(df, batch_id):
        # idempotent: re-delivery of a batch_id lands in the same
        # partition directory and replaces it wholesale
        (df.write.mode("overwrite")
           .parquet(os.path.join(sink, f"batch_id={batch_id}")))
        seen_batch_ids.append(batch_id)
        if not os.path.exists(marker):
            with open(marker, "w") as f:
                f.write("post-write crash")
            raise RuntimeError("simulated sink failure AFTER the write")

    def run_once():
        stream = read_events_stream(spark, src, max_files_per_trigger=None)
        q = (
            stream.writeStream.foreachBatch(write_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination(120)
            return None
        except Exception as e:  # StreamingQueryException on the crash run
            return e

    def add_file(name, rows):
        with open(os.path.join(src, name), "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

    rows1 = [_event(1, "2024-01-01 10:00:00"), _event(2, "2024-01-01 10:01:00")]
    add_file("a.jsonl", rows1)
    err = run_once()
    assert err is not None and "simulated sink failure" in str(err)

    err = run_once()  # replay: same batch_id, overwrite absorbs it
    assert err is None
    assert seen_batch_ids[0] == seen_batch_ids[1]  # true REPLAY, not a new batch

    got = sorted(
        r["event_id"] for r in spark.read.parquet(os.path.join(sink)).collect()
    )
    assert got == [1, 2]  # no duplicates despite double delivery

    # progress: a later batch gets a NEW id and lands beside, not over
    rows2 = [_event(3, "2024-01-01 10:02:00")]
    add_file("b.jsonl", rows2)
    assert run_once() is None
    assert seen_batch_ids[-1] > seen_batch_ids[0]
    got = sorted(
        r["event_id"] for r in spark.read.parquet(os.path.join(sink)).collect()
    )
    assert got == [1, 2, 3]
