"""Streaming rate-anomaly twin of batch q103: the watermarked hourly
count stream's emitted table equals the batch derivation on finalized
windows, the flag fold over the stream's output equals batch
q103_rate_anomaly on the same closed input (the fold is SHARED code, so
this pins the count emission, not a re-implementation), state is one
row per (hour, type), and restarts over the same checkpoint emit
nothing new."""

import datetime as dt
import time
from datetime import timedelta

import pyspark.sql.functions as F

from img2table_spark.streaming.anomaly import (
    anomalies_from_counts,
    stream_hour_counts,
)

_T0 = dt.datetime(2024, 1, 1)


def _closed_events(spark):
    """The q103 planted-spike scenario (both flag-rule boundaries) as
    full stream-schema rows, all inside closed 2024 hours."""
    rows = []
    eid = 0

    def hour(et, h, n):
        nonlocal eid
        for i in range(n):
            rows.append((eid, _T0 + timedelta(hours=h, minutes=i % 60), et))
            eid += 1

    for h in range(50):
        hour("a", h, 10)  # med = 10, mad = 0
    hour("a", 50, 25)  # ad = 15 → flagged
    hour("a", 51, 12)  # ad = 2 → NOT flagged (absolute floor)
    for h in range(4):
        hour("b", h, 10)
        hour("b", 4 + h, 11)
        hour("b", 8 + h, 12)  # med = 11, mad = 1
    hour("b", 12, 15)  # ad = 4 > 3·mad → flagged
    hour("b", 13, 14)  # ad = 3 = 3·mad → NOT flagged (strict >)
    df = spark.createDataFrame(
        rows, "event_id LONG, ts_raw TIMESTAMP, event_type STRING"
    )
    return df.select(
        "event_id",
        F.col("ts_raw").cast("timestamp_ntz").alias("ts"),
        F.lit(0).cast("long").alias("user_id"),
        "event_type",
        F.lit(1.0).alias("value"),
        F.lit("{}").alias("props"),
    )


def test_stream_hour_counts_matches_batch_q103(spark, tmp_path):
    from img2table_spark.queries import q103_rate_anomaly

    closed = _closed_events(spark).cache()
    # batch side: q103 over a dir holding ONLY the closed events
    bdir = tmp_path / "batch"
    closed.write.parquet(str(bdir / "events.parquet"))

    # stream side: the same closed events, then a far-future flush slice
    # (its own hour never closes, so the stream emits exactly the closed
    # 2024 hours) — file-source order is mtime, keep the slices apart
    inp = str(tmp_path / "in")
    closed.coalesce(1).write.mode("append").parquet(inp)
    time.sleep(1.1)
    spark.createDataFrame(
        [(999999, dt.datetime(2026, 1, 1), 0, "flush", 0.0, "{}")],
        "event_id LONG, ts_raw TIMESTAMP, user_id LONG, event_type STRING,"
        " value DOUBLE, props STRING",
    ).select(
        "event_id",
        F.col("ts_raw").cast("timestamp_ntz").alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    ).coalesce(1).write.mode("append").parquet(inp)

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = stream_hour_counts(spark, inp, out, ckpt, max_files_per_trigger=1)
    q.awaitTermination(300)

    # emitted counts == the batch hourly table (state: one row per
    # (hour, type) — hour 50 of 'a' folded 25 events into n=25)
    got = {
        (r.event_type, r.hb): r.n for r in spark.read.parquet(out).collect()
    }
    want = {
        (r.event_type, r.hb): r.n
        for r in closed.groupBy(
            "event_type",
            F.expr(
                "timestampdiff(MICROSECOND,"
                " TIMESTAMP_NTZ '2024-01-01 00:00:00', ts) div 3600000000"
            ).alias("hb"),
        )
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want and got[("a", 50)] == 25

    # flag fold over the stream's output ≡ batch q103 on the closed input
    skey = lambda r: (  # noqa: E731
        r["event_type"],
        r["hour_bucket"],
        r["n_events"],
        r["med"],
        r["mad"],
        r["abs_dev"],
    )
    sflags = sorted(
        skey(r) for r in anomalies_from_counts(spark.read.parquet(out)).collect()
    )
    bflags = sorted(
        skey(r) for r in q103_rate_anomaly(spark, str(bdir)).collect()
    )
    assert sflags == bflags
    assert {(et, hb) for et, hb, *_ in sflags} == {("a", 50), ("b", 12)}

    # restart idempotency: same input + checkpoint emits nothing new
    q2 = stream_hour_counts(spark, inp, out, ckpt)
    q2.awaitTermination(300)
    again = {
        (r.event_type, r.hb): r.n for r in spark.read.parquet(out).collect()
    }
    assert again == got
