"""Streaming LogLog distinct sketch (streaming twin of batch q56):
stream ≡ batch register equality on finalized windows, register values
cross-checked against an independent Python md5 derivation, bounded state
(≤ 64 registers per live group), and a sane folded estimate."""

import datetime as dt
import hashlib
import time

import pyspark.sql.functions as F

from img2table_spark.streaming.sketch import (
    batch_registers_twin,
    fold_registers,
    stream_distinct_sketch,
)


def _expected_register(user_ids):
    """Independent md5 register derivation (no Spark): returns
    {idx: max rho} for the given users — pins the SQL hash chain."""
    regs = {}
    for uid in user_ids:
        h = int(hashlib.md5(str(uid).encode()).hexdigest()[:15], 16)
        idx, v = h % 64, h // 64
        rho = 55 - (v.bit_length() if v else 1)
        regs[idx] = max(regs.get(idx, 0), rho)
    return regs


def _events(spark):
    rows = []
    # 30 distinct users inside [01:00, 02:00) on two event types
    for uid in range(30):
        rows.append((uid, dt.datetime(2024, 1, 1, 1, 1 + uid % 50), uid, "view"))
        if uid < 12:
            rows.append((100 + uid, dt.datetime(2024, 1, 1, 1, 30), uid, "click"))
    # watermark flush
    rows.append((999, dt.datetime(2026, 1, 1), 999, "view"))
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


def test_stream_sketch_registers_and_fold(spark, tmp_path):
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
    q = stream_distinct_sketch(
        spark, inp, out, ckpt, window="1 hour", watermark="30 minutes",
        max_files_per_trigger=1,
    )
    q.awaitTermination(300)

    got = {
        (r.w_start, r.w_end, r.event_type, r.idx, r.m)
        for r in spark.read.parquet(out).collect()
    }
    # stream ≡ batch on finalized (2024) windows
    want = {
        (r.w_start, r.w_end, r.event_type, r.idx, r.m)
        for r in batch_registers_twin(spark, inp, window="1 hour")
        .filter(F.col("w_start") < dt.datetime(2025, 1, 1))
        .collect()
    }
    assert got == want and got, got

    # register values pinned against the independent Python md5 chain
    w0 = dt.datetime(2024, 1, 1, 1, 0)
    view_regs = {
        (idx, m) for (ws, we, et, idx, m) in got if et == "view" and ws == w0
    }
    assert view_regs == set(_expected_register(range(30)).items())
    click_regs = {
        (idx, m) for (ws, we, et, idx, m) in got if et == "click"
    }
    assert click_regs == set(_expected_register(range(12)).items())

    # bounded state: at most 64 registers per (window, event_type)
    from collections import Counter
    per_group = Counter((ws, et) for (ws, we, et, idx, m) in got)
    assert max(per_group.values()) <= 64

    # folded estimate is in the right ballpark for both cardinalities
    est = {
        (r.event_type): r.est_distinct
        for r in fold_registers(spark.read.parquet(out)).collect()
        if r.w_start == w0
    }
    assert abs(est["view"] - 30) / 30 < 0.35, est
    assert abs(est["click"] - 12) / 12 < 0.35, est
