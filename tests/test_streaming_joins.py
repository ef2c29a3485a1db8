"""Watermarked stream-stream interval join (streaming twin of q30):
stream ≡ batch on closed intervals, hand-pinned attribution pairs, and the
boundary semantics (strictly-after, inclusive +1h) exercised exactly."""

import datetime as dt
import time

import pyspark.sql.functions as F

from img2table_spark.streaming.joins import (
    batch_attribution_twin,
    stream_attribution_join,
)


def _events(spark):
    base = dt.datetime(2024, 1, 1, 1, 0)
    rows = [
        # user 1: error at 01:00; clicks at 01:00 (excluded: not strictly
        # after), 01:30 (in), 02:00 (in: inclusive bound), 02:01 (out)
        (1, base, 1, "error"),
        (2, base, 1, "click"),
        (3, base + dt.timedelta(minutes=30), 1, "click"),
        (4, base + dt.timedelta(hours=1), 1, "click"),
        (5, base + dt.timedelta(hours=1, minutes=1), 1, "click"),
        # user 2: click precedes its error — no pair
        (6, base, 2, "click"),
        (7, base + dt.timedelta(minutes=5), 2, "error"),
        # user 3: two errors share one click (both attribute)
        (8, base, 3, "error"),
        (9, base + dt.timedelta(minutes=10), 3, "error"),
        (10, base + dt.timedelta(minutes=20), 3, "click"),
        # watermark flush on both sides
        (98, dt.datetime(2026, 1, 1), 99, "error"),
        (99, dt.datetime(2026, 1, 1), 99, "click"),
    ]
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


def test_stream_attribution_matches_batch_and_pins(spark, tmp_path):
    inp = str(tmp_path / "in")
    df = _events(spark).cache()
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
    q = stream_attribution_join(
        spark, inp, out, ckpt, watermark="30 minutes", max_files_per_trigger=1
    )
    q.awaitTermination(300)

    got = {
        (r.error_id, r.user_id, r.click_id)
        for r in spark.read.parquet(out).collect()
    }
    # hand pin: boundary semantics exactly (the 2026 flush pair joins too —
    # both flush events share user 99 but error/click at the same instant
    # fails the strictly-after bound, so no flush pair)
    assert got == {(1, 1, 3), (1, 1, 4), (8, 3, 10), (9, 3, 10)}, got

    # stream ≡ batch on closed intervals (every 2024 interval closed by
    # the flush; the flush rows themselves produce no pair)
    want = {
        (r.error_id, r.user_id, r.click_id)
        for r in batch_attribution_twin(spark, inp).collect()
    }
    assert got == want
