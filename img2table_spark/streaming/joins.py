"""Watermarked stream-stream interval join — streaming twin of batch q30.

The one Structured Streaming capability the suite didn't yet exercise:
joining TWO live streams on a key + event-time range (click attribution —
each click joined to the error it follows within one hour for the same
user). Both sides carry watermarks and the join condition bounds the
event-time distance, so Spark can evict buffered rows once the watermark
passes: state per side is the watermark horizon's worth of rows, never the
full history — the production shape for funnels/attribution at any ingest
rate. Append mode emits each matched pair exactly once.

Batch q30 buckets the same semantics for bounded fan-out at rest; the
streaming side leans on the state store's symmetric hash join instead —
same answer, different engine strategy, equality pinned in tests on
closed (watermark-finalized) intervals.

events.ts is TIMESTAMP_NTZ (repo NTZ discipline): event time is rebuilt
tz-free via the anchored integer-micros round-trip shared with the other
event streams.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

from img2table_spark.streaming.funnel import (
    _ANCHOR_EPOCH_MS,
    _EV_US,
    EVENTS_STREAM_SCHEMA,
)


def _sides(ev: DataFrame, watermark: str) -> tuple[DataFrame, DataFrame]:
    ts = F.expr(f"timestamp_micros(({_EV_US}) + {_ANCHOR_EPOCH_MS} * 1000)")
    err = (
        ev.filter(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("error_id"),
            F.col("user_id").alias("err_user"),
            ts.alias("err_ts"),
        )
        .withWatermark("err_ts", watermark)
    )
    clk = (
        ev.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("clk_user"),
            ts.alias("clk_ts"),
        )
        .withWatermark("clk_ts", watermark)
    )
    return err, clk


_JOIN_COND = (
    "err_user = clk_user AND clk_ts > err_ts "
    "AND clk_ts <= err_ts + INTERVAL 1 HOUR"
)


def stream_attribution_join(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    watermark: str = "30 minutes",
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """Emit (error_id, user_id, click_id, err_ts, clk_ts) for every click
    within one hour after an error by the same user — stream-stream inner
    join, append mode, parquet sink."""
    reader = spark.readStream.schema(EVENTS_STREAM_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    ev = reader.parquet(input_dir)
    err, clk = _sides(ev, watermark)
    pairs = err.join(clk, F.expr(_JOIN_COND), "inner").select(
        "error_id",
        F.col("err_user").alias("user_id"),
        "click_id",
        "err_ts",
        "clk_ts",
    )
    writer = (
        pairs.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def batch_attribution_twin(spark: SparkSession, input_dir: str) -> DataFrame:
    """The identical interval join on the static table — the stream must
    equal this on closed intervals (withWatermark is a no-op in batch)."""
    ev = spark.read.schema(EVENTS_STREAM_SCHEMA).parquet(input_dir)
    err, clk = _sides(ev, "30 minutes")
    return err.join(clk, F.expr(_JOIN_COND), "inner").select(
        "error_id",
        F.col("err_user").alias("user_id"),
        "click_id",
        "err_ts",
        "clk_ts",
    )
