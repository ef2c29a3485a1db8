"""Streaming histogram quantiles (streaming twin of batch q59): stream ≡
batch bin equality on finalized windows, the quantile fold over the
stream's output pinned against an independent Python rank computation
over the raw values, and bounded state (one row per occupied unit bin,
never per event)."""

import datetime as dt
import math
import time

import pyspark.sql.functions as F

from img2table_spark.streaming.histo import (
    batch_bins_twin,
    quantiles_from_bins,
    stream_histogram_bins,
)

_W0 = dt.datetime(2024, 1, 1, 1, 0)


def _events(spark):
    rows = []
    # window [01:00, 02:00): 'view' carries values 1..100 (one each);
    # 'click' carries 2.5 ten times (all in unit bin 2)
    for v in range(1, 101):
        rows.append((v, dt.datetime(2024, 1, 1, 1, v % 60), "view", float(v)))
    for j in range(10):
        rows.append((200 + j, dt.datetime(2024, 1, 1, 1, 30), "click", 2.5))
    # watermark flush
    rows.append((999, dt.datetime(2026, 1, 1), "view", 1.0))
    df = spark.createDataFrame(
        rows, "event_id LONG, ts_raw TIMESTAMP, event_type STRING, value DOUBLE"
    )
    return df.select(
        "event_id",
        F.col("ts_raw").cast("timestamp_ntz").alias("ts"),
        F.lit(0).cast("long").alias("user_id"),
        "event_type",
        "value",
        F.lit("{}").alias("props"),
    )


def _python_quantile_bins(values, pcts=(50, 90, 99)):
    """Independent ground truth: q57's rank arithmetic applied directly to
    the sorted raw values, then unit-binned."""
    s = sorted(values)
    n = len(s)
    return {
        p: math.floor(s[(p * n + 99) // 100 - 1]) for p in pcts
    }


def test_stream_histogram_bins_and_quantiles(spark, tmp_path):
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
        time.sleep(1.1)  # file-source order is mtime — keep slices apart
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = stream_histogram_bins(
        spark, inp, out, ckpt, window="1 hour", watermark="30 minutes",
        max_files_per_trigger=1,
    )
    q.awaitTermination(300)

    got = {
        (r.w_start, r.w_end, r.event_type, r.bin, r.cnt)
        for r in spark.read.parquet(out).collect()
    }
    # stream ≡ batch on finalized (2024) windows
    want = {
        (r.w_start, r.w_end, r.event_type, r.bin, r.cnt)
        for r in batch_bins_twin(spark, inp, window="1 hour")
        .filter(F.col("w_start") < dt.datetime(2025, 1, 1))
        .collect()
    }
    assert got == want and got, got

    # bounded state: one row per occupied unit bin — 'view' occupies
    # exactly 100 bins for its 100 events, 'click' folds 10 events to 1 row
    by_type = {}
    for ws, we, et, b, c in got:
        if ws == _W0:
            by_type.setdefault(et, []).append((b, c))
    assert len(by_type["view"]) == 100
    assert by_type["click"] == [(2, 10)]

    # quantile fold over the stream's output == independent Python rank
    # arithmetic over the raw values
    qdf = quantiles_from_bins(spark.read.parquet(out))
    qrows = {
        r.event_type: r.asDict()
        for r in qdf.filter(F.col("w_start") == _W0).collect()
    }
    view_want = _python_quantile_bins([float(v) for v in range(1, 101)])
    assert qrows["view"]["n_events"] == 100
    for p, b in view_want.items():
        assert qrows["view"][f"p{p}_bin"] == b, (p, qrows["view"])
    click_want = _python_quantile_bins([2.5] * 10)
    assert qrows["click"]["n_events"] == 10
    for p, b in click_want.items():
        assert qrows["click"][f"p{p}_bin"] == b, (p, qrows["click"])

    # restart idempotency: rerunning over the same input + checkpoint
    # emits nothing new
    q2 = stream_histogram_bins(
        spark, inp, out, ckpt, window="1 hour", watermark="30 minutes",
    )
    q2.awaitTermination(300)
    again = {
        (r.w_start, r.w_end, r.event_type, r.bin, r.cnt)
        for r in spark.read.parquet(out).collect()
    }
    assert again == got
