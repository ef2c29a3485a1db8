"""Sliding-window streaming burst detection (streaming twin of q52):
stream ≡ batch on finalized windows, hand-pinned breach windows, bounded
state, exactly-once append to a parquet sink."""

import datetime as dt
import json
import time

import pyspark.sql.functions as F

from img2table_spark.streaming.burst import batch_burst_twin, stream_burst


def _events(spark):
    rows = []
    # user 1: 6 events packed into 01:01–01:09 — a burst (threshold 5).
    for i in range(6):
        rows.append((i, dt.datetime(2024, 1, 1, 1, 1 + i), 1, "view"))
    # user 2: 3 sparse events hours apart — never a breach.
    for i in range(3):
        rows.append((10 + i, dt.datetime(2024, 1, 1, 4 + 2 * i), 2, "view"))
    # far-future flush event: advances the watermark so every real window
    # finalizes under availableNow (the suite's established idiom).
    rows.append((99, dt.datetime(2026, 1, 1), 99, "view"))
    df = spark.createDataFrame(
        rows, "event_id LONG, ts_raw TIMESTAMP, user_id LONG, event_type STRING"
    )
    return df.select(
        "event_id",
        F.col("ts_raw").cast("timestamp_ntz").alias("ts"),
        "user_id",
        "event_type",
        F.lit(1.0).alias("value"),
        F.lit("{}").alias("props"),
    )


def test_stream_burst_matches_batch_and_pins(spark, tmp_path):
    inp = str(tmp_path / "in")
    df = _events(spark).cache()
    # time-ordered source files (file source orders by mtime)
    cut = dt.datetime(2025, 1, 1)
    for lo, hi in [(None, cut), (cut, None)]:
        sl = df
        if lo is not None:
            sl = sl.filter(F.col("ts") >= lo)
        if hi is not None:
            sl = sl.filter(F.col("ts") < hi)
        sl.coalesce(1).write.mode("append").parquet(inp)
        time.sleep(1.1)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = stream_burst(
        spark, inp, out, ckpt, window="1 hour", slide="30 minutes",
        threshold=5, watermark="30 minutes", max_files_per_trigger=1,
    )
    q.awaitTermination(300)

    got = {
        (r.user_id, r.w_start, r.w_end, r.n_events)
        for r in spark.read.parquet(out).collect()
    }
    # hand pin: the 6-event burst lives entirely inside the two sliding
    # windows [00:30, 01:30) and [01:00, 02:00); no other (user, window)
    # reaches 5 events.
    w1 = (1, dt.datetime(2024, 1, 1, 0, 30), dt.datetime(2024, 1, 1, 1, 30), 6)
    w2 = (1, dt.datetime(2024, 1, 1, 1, 0), dt.datetime(2024, 1, 1, 2, 0), 6)
    assert got == {w1, w2}, got

    # stream ≡ batch: the static twin (flush user's windows are below
    # threshold, and every real window finalized) produces identical rows
    want = {
        (r.user_id, r.w_start, r.w_end, r.n_events)
        for r in batch_burst_twin(
            spark, inp, window="1 hour", slide="30 minutes", threshold=5
        ).collect()
    }
    assert got == want

    # bounded state: live (user, window) pairs only — single digits here,
    # and the watermark retired the 2024 windows before the flush batch
    progress = [json.loads(p.json) for p in q.recentProgress]
    state_rows = [
        op["numRowsTotal"] for p in progress for op in p.get("stateOperators", [])
    ]
    assert state_rows and max(state_rows) <= 20
