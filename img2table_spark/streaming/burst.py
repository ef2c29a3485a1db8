"""Streaming sliding-window burst detection — streaming twin of batch q52.

The one canonical Structured Streaming window shape the suite didn't yet
exercise: a SLIDING event-time window (``F.window(ts, window, slide)``).
Each event lands in window/slide overlapping windows; a (user, window)
whose event count reaches the threshold is a rate-limit breach, emitted
exactly once in append mode when the watermark passes the window end.

State is bounded by construction: live state is (active windows × users
seen within them), and the watermark retires windows as event time
advances — the production shape for abuse/rate-limit detection at any
ingest rate.

events.ts is TIMESTAMP_NTZ (repo NTZ discipline): event time is rebuilt
tz-free via the anchored integer-micros round-trip shared with the funnel
stream (pinned equal to queries' anchor in tests).
"""

from __future__ import annotations

from pyspark.sql import SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

from img2table_spark.streaming.funnel import (
    _ANCHOR_EPOCH_MS,
    _EV_US,
    EVENTS_STREAM_SCHEMA,
)


def stream_burst(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    window: str = "1 hour",
    slide: str = "30 minutes",
    threshold: int = 5,
    watermark: str = "30 minutes",
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """Emit (user_id, w_start, w_end, n_events) for every sliding window in
    which a user's event count reached ``threshold`` — append mode, parquet
    sink, exactly-once via the sink commit log."""
    reader = spark.readStream.schema(EVENTS_STREAM_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    ev = (
        reader.parquet(input_dir)
        .select("user_id", F.expr(_EV_US).alias("us"))
        .withColumn(
            "wm_ts", F.expr(f"timestamp_micros(us + {_ANCHOR_EPOCH_MS} * 1000)")
        )
        .withWatermark("wm_ts", watermark)
    )
    breaches = (
        ev.groupBy("user_id", F.window("wm_ts", window, slide).alias("w"))
        .agg(F.count("*").alias("n_events"))
        .filter(F.col("n_events") >= threshold)
        .select(
            "user_id",
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "n_events",
        )
    )
    writer = (
        breaches.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def batch_burst_twin(
    spark: SparkSession,
    input_dir: str,
    window: str = "1 hour",
    slide: str = "30 minutes",
    threshold: int = 5,
):
    """The identical aggregation on the static table — the stream must
    equal this on finalized windows (equality pinned in tests)."""
    return (
        spark.read.schema(EVENTS_STREAM_SCHEMA)
        .parquet(input_dir)
        .select("user_id", F.expr(_EV_US).alias("us"))
        .withColumn(
            "wm_ts", F.expr(f"timestamp_micros(us + {_ANCHOR_EPOCH_MS} * 1000)")
        )
        .groupBy("user_id", F.window("wm_ts", window, slide).alias("w"))
        .agg(F.count("*").alias("n_events"))
        .filter(F.col("n_events") >= threshold)
        .select(
            "user_id",
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "n_events",
        )
    )
