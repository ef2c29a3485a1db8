"""Source/sink I/O: Iceberg when a catalog is configured, parquet fallback.

The north_rule input is an Iceberg table of transcripts; this sandbox has no
Iceberg catalog jars, so every entry point accepts either a catalog table
name (``cat.db.transcripts``) or a filesystem path and picks the right
reader/writer. On a real cluster the recommended layout is::

    CREATE TABLE cat.db.transcripts (...)
    PARTITIONED BY (bucket(512, conv_id))           -- co-locates turns
    -- extraction output:
    CREATE TABLE cat.db.extracted_tables (...)
    PARTITIONED BY (bucket(512, conv_id))

so the engine's salt exchange and the table's bucketing agree, and the
resume manifests (plans/checkpoints.py) map 1:1 onto partition buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _is_table_name(source: str) -> bool:
    return "/" not in source and "\\" not in source and not source.startswith("file:")


def iceberg_available(spark: SparkSession) -> bool:
    try:
        jvm = spark.sparkContext._jvm
        jvm.java.lang.Class.forName("org.apache.iceberg.spark.source.IcebergSource")
        return True
    except Exception:
        return False


def read_transcripts(spark: SparkSession, source: str) -> DataFrame:
    """Read the transcript table from an Iceberg table name or a parquet path."""
    if _is_table_name(source):
        return spark.read.table(source)
    return spark.read.parquet(source)


def write_extracted(df: DataFrame, target: str, mode: str = "append") -> None:
    """Write extracted tables to an Iceberg table (transactional append /
    dynamic overwrite) or a parquet path (dynamic partition overwrite)."""
    if _is_table_name(target):
        writer = df.writeTo(target)
        if mode == "append":
            writer.append()
        else:
            writer.overwritePartitions()
        return
    (
        df.write.mode("overwrite" if mode != "append" else "append")
        .partitionBy("bucket")
        .parquet(target)
        if "bucket" in df.columns
        else df.write.mode(mode).parquet(target)
    )
