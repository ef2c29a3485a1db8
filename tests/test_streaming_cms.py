"""Streaming count-min sketch (streaming twin of batch q55): stream ≡
batch cell equality on finalized windows, cell buckets cross-checked
against an independent Python md5+affine derivation, bounded state
(≤ 4096 cells per live window), and the CMS est ≥ exact guarantee on a
probe key set."""

import datetime as dt
import hashlib
import time

import pyspark.sql.functions as F

from img2table_spark.streaming.cms import (
    batch_cells_twin,
    estimate_keys,
    stream_cms_cells,
)

_MH_P = None  # filled from queries at import time below


def _python_buckets(key: str):
    """Independent md5 + affine bucket derivation (no Spark) — pins the
    SQL hash chain for one key."""
    from img2table_spark.queries import _CMS_D, _CMS_W, _MH_AB, _MH_P

    base = int(hashlib.md5(key.encode()).hexdigest()[:15], 16)
    return [
        ((_MH_AB[r][0] * base + _MH_AB[r][1]) % _MH_P) % _CMS_W
        for r in range(_CMS_D)
    ]


def _events(spark):
    rows = []
    # skewed traffic inside [01:00, 02:00): user 0 fires 40 events,
    # users 1-9 fire 3 each
    for k in range(40):
        rows.append((k, dt.datetime(2024, 1, 1, 1, 1 + k % 50), 0, "view"))
    eid = 100
    for uid in range(1, 10):
        for j in range(3):
            rows.append((eid, dt.datetime(2024, 1, 1, 1, 5 + j), uid, "view"))
            eid += 1
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


def test_stream_cms_cells_and_estimates(spark, tmp_path):
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
    q = stream_cms_cells(
        spark, inp, out, ckpt, window="1 hour", watermark="30 minutes",
        max_files_per_trigger=1,
    )
    q.awaitTermination(300)

    got = {
        (r.w_start, r.w_end, r.r, r.bucket, r.cnt)
        for r in spark.read.parquet(out).collect()
    }
    # stream ≡ batch on finalized (2024) windows
    want = {
        (r.w_start, r.w_end, r.r, r.bucket, r.cnt)
        for r in batch_cells_twin(spark, inp, window="1 hour")
        .filter(F.col("w_start") < dt.datetime(2025, 1, 1))
        .collect()
    }
    assert got == want and got, got

    # the hot user's 4 cells pinned against the independent Python chain:
    # every one must hold at least their 40 events
    w0 = dt.datetime(2024, 1, 1, 1, 0)
    cell_cnt = {(r, b): c for (ws, we, r, b, c) in got if ws == w0}
    for r, b in enumerate(_python_buckets("0")):
        assert cell_cnt[(r, b)] >= 40, (r, b, cell_cnt.get((r, b)))

    # bounded state: ≤ d·w = 4096 cells per window (actual is tiny here)
    from collections import Counter

    per_window = Counter(ws for (ws, we, r, b, c) in got)
    assert max(per_window.values()) <= 4096

    # CMS guarantee on a probe set: est ≥ exact for every user; with 10
    # keys in 1024 buckets the skewed key is (near-)collision-free
    keys = spark.createDataFrame([(u,) for u in range(10)], "user_id LONG")
    est = {
        r.user_id: r.est
        for r in estimate_keys(spark.read.parquet(out), keys).collect()
        if r.w_start == w0
    }
    exact = {0: 40, **{u: 3 for u in range(1, 10)}}
    for u, ex in exact.items():
        assert est[u] >= ex, (u, est[u], ex)
    assert est[0] == 40  # the heavy hitter reads back exactly here
