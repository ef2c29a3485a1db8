"""Streaming sessionization + quality filtering over a transcript stream.

- ``stream_sessionize`` — Spark's native ``session_window`` (dynamic-gap
  session aggregation) with a watermark: the streaming twin of batch q22.
  A session closes when no event arrives for ``gap``; the watermark bounds
  state and decides when closed sessions become emittable (append mode).
- ``stream_quality_filter`` — stateless per-turn PII redaction + quality
  gate (the streaming twin of q25/q10's map stage): pure column
  expressions, no state, no shuffle — the shape that runs at any ingest
  rate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

from img2table_spark.schema import TRANSCRIPT_SCHEMA

_PII_EMAIL = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"


def _read_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    return spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(input_dir)


def stream_sessionize(
    spark: SparkSession,
    input_dir: str,
    query_name: str,
    watermark: str = "30 minutes",
    gap: str = "30 minutes",
    available_now: bool = True,
) -> StreamingQuery:
    """Per-conversation session windows (gap-based), emitted in append mode
    once the watermark passes the session end — bounded state, late rows
    beyond the watermark are dropped rather than reopening sessions."""
    tr = _read_stream(spark, input_dir)
    agg = (
        tr.withWatermark("ts", watermark)
        .groupBy("conv_id", F.session_window("ts", gap).alias("w"))
        .agg(
            F.count("*").alias("n_turns"),
            F.min("turn_idx").alias("first_turn"),
            F.max("turn_idx").alias("last_turn"),
        )
        .select(
            "conv_id",
            F.col("w.start").alias("s_start"),
            F.col("w.end").alias("s_end"),
            "n_turns",
            "first_turn",
            "last_turn",
        )
    )
    writer = (
        agg.writeStream.format("memory").queryName(query_name).outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_quality_filter(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    min_tokens: int = 5,
    available_now: bool = True,
) -> StreamingQuery:
    """Redact emails and drop sub-quality turns (too few whitespace tokens)
    as the stream lands. Stateless: survives any throughput, no watermark
    needed, exactly-once via the file-sink commit log."""
    tr = _read_stream(spark, input_dir)
    toks = F.size(F.split(F.coalesce("text", F.lit("")), " "))
    cleaned = (
        tr.filter(toks >= min_tokens)
        .withColumn("text", F.regexp_replace("text", _PII_EMAIL, "<EMAIL>"))
        .withColumn("n_tokens", toks.cast("long"))
    )
    writer = (
        cleaned.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
