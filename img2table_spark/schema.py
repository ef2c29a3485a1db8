"""Spark schemas for the extraction engine.

Input model mandated by BASELINE.json input_hint: Iceberg/parquet table of
multi-turn transcripts ``(conv_id, turn_idx, role, text, tool, ts)``.
Output model: one row per extracted table (FIXTURES.md §2), plus a flat
per-cell variant used by oracle-checked correctness queries.
Word-table schema matches the reference's fixed 10-column OCR schema
(reference: src/img2table/ocr/base.py:11-23).
"""

from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

TRANSCRIPT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("role", StringType(), True),
        StructField("text", StringType(), True),
        StructField("tool", StringType(), True),
        StructField("ts", TimestampType(), True),
    ]
)

CELL_STRUCT = StructType(
    [
        StructField("row", IntegerType(), False),
        StructField("col", IntegerType(), False),
        StructField("x1", IntegerType(), True),
        StructField("y1", IntegerType(), True),
        StructField("x2", IntegerType(), True),
        StructField("y2", IntegerType(), True),
        StructField("value", StringType(), True),
    ]
)

# One row per extracted table.
EXTRACTED_SCHEMA = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("table_idx", IntegerType(), False),
        StructField("x1", IntegerType(), True),
        StructField("y1", IntegerType(), True),
        StructField("x2", IntegerType(), True),
        StructField("y2", IntegerType(), True),
        StructField("title", StringType(), True),
        StructField("cells", ArrayType(CELL_STRUCT), True),
        StructField("html", StringType(), True),
        StructField("n_rows", IntegerType(), True),
        StructField("n_cols", IntegerType(), True),
    ]
)

# One row per extracted cell (flat, primitive-typed: used for the DuckDB
# oracle comparison which hashes sorted primitive columns).
EXTRACTED_FLAT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", LongType(), False),
        StructField("table_idx", LongType(), False),
        StructField("row", LongType(), False),
        StructField("col", LongType(), False),
        StructField("value", StringType(), True),
    ]
)

# Reference OCR word-table schema (src/img2table/ocr/base.py:11-23).
WORD_SCHEMA = StructType(
    [
        StructField("page", LongType(), True),
        StructField("class", StringType(), True),
        StructField("id", StringType(), True),
        StructField("parent", StringType(), True),
        StructField("value", StringType(), True),
        StructField("confidence", LongType(), True),
        StructField("x1", LongType(), True),
        StructField("y1", LongType(), True),
        StructField("x2", LongType(), True),
        StructField("y2", LongType(), True),
    ]
)
