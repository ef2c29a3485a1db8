"""Streaming dedup/windowed-stats ops: output equality vs the batch
equivalents on a drained file source."""

import datetime as dt

from pyspark.sql import functions as F

from img2table_spark.schema import TRANSCRIPT_SCHEMA
from img2table_spark.streaming.dedup import (
    stream_dedup_exact,
    stream_first_seen,
    stream_token_window,
)


def _corpus(spark):
    base = dt.datetime(2026, 1, 1)
    rows = []
    for i in range(40):
        text = f"payload {i % 7}"  # 7 distinct payloads, many dups
        rows.append((f"c{i % 5}", i, "assistant", text, "text/plain",
                     base + dt.timedelta(minutes=i)))
    return spark.createDataFrame(rows, TRANSCRIPT_SCHEMA)


def test_stream_dedup_exact(spark, tmp_path):
    df = _corpus(spark)
    inp, out, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    df.write.parquet(inp)
    q = stream_dedup_exact(spark, inp, out, ckpt)
    q.awaitTermination(300)
    got = spark.read.parquet(out)
    # 7 distinct payload hashes → 7 survivors
    assert got.count() == 7
    assert got.select("text_hash").distinct().count() == 7


def test_stream_first_seen_matches_batch_dedup(spark, tmp_path):
    df = _corpus(spark)
    inp, out, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    df.write.parquet(inp)
    q = stream_first_seen(spark, inp, out, ckpt)
    q.awaitTermination(300)
    got = spark.read.parquet(out)
    # batch oracle: min (ts, conv_id, turn_idx) per hash
    want = (
        df.withColumn("text_hash", F.md5("text"))
        .groupBy("text_hash")
        .agg(F.min(F.struct("ts", "conv_id", "turn_idx")).alias("first"))
        .select("text_hash", "first.conv_id", F.col("first.turn_idx").cast("long").alias("turn_idx"))
    )
    g = {tuple(r) for r in got.select("text_hash", "conv_id", "turn_idx").collect()}
    w = {tuple(r) for r in want.collect()}
    assert g == w

    # restart with a new file: already-seen hashes stay suppressed by state
    extra = spark.createDataFrame(
        [("late", 99, "assistant", "payload 0", "text/plain", dt.datetime(2026, 1, 2)),
         ("late", 100, "assistant", "payload NEW", "text/plain", dt.datetime(2026, 1, 2))],
        TRANSCRIPT_SCHEMA,
    )
    extra.write.mode("append").parquet(inp)
    q2 = stream_first_seen(spark, inp, out, ckpt)
    q2.awaitTermination(300)
    got2 = spark.read.parquet(out)
    assert got2.count() == 8  # only 'payload NEW' added
    assert got2.filter(F.col("conv_id") == "late").count() == 1


def test_stream_token_window(spark, tmp_path):
    df = _corpus(spark)
    inp = str(tmp_path / "in")
    df.write.parquet(inp)
    q = stream_token_window(spark, inp, "tok_win")
    q.awaitTermination(300)
    got = spark.sql("SELECT * FROM tok_win").toPandas()
    # 40 minutes of events in 10-minute windows → 4 windows of 10 turns
    assert sorted(got["n_turns"].tolist()) == [10, 10, 10, 10]
    assert int(got["n_ws_tokens"].sum()) == 80  # 2 ws-tokens per payload
