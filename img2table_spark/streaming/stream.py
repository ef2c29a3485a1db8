"""Structured Streaming variant of the extraction job.

The reference is strictly batch (SURVEY.md §2.8: no streaming); this is an
engine capability beyond it: transcripts arriving as files (or any
streaming source) flow through the same stateless Arrow UDF —
``mapInPandas`` composes with streaming — and land in a parquet sink with
exactly-once file semantics via the streaming checkpoint. Late/ooo turns are
harmless: extraction is per-row, no watermark state is needed; downstream
aggregations would add ``withWatermark('ts', ...)``.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

from img2table_spark.operators.extract import _make_batch_extract
from img2table_spark.schema import EXTRACTED_SCHEMA, TRANSCRIPT_SCHEMA


def stream_extract(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """File-source streaming extraction. With ``available_now`` the query
    drains everything currently present and stops (used by tests/backfills);
    otherwise it runs continuously as new transcript files land."""
    reader = spark.readStream.schema(TRANSCRIPT_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    transcripts = reader.parquet(input_dir)

    extracted = transcripts.select("conv_id", "turn_idx", "text", "tool").mapInPandas(
        _make_batch_extract(False), EXTRACTED_SCHEMA
    )

    writer = (
        extracted.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
