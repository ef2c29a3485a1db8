"""Iceberg-aware IO layer: reference classification + catalog round-trip
through the pipeline surface (parquet-path branch; the catalog branch maps
to Iceberg's overwritePartitions on a cluster with the runtime jars)."""

import pytest

from img2table_spark.sources.iceberg import is_table_ref, overwrite_partitions, read_table


@pytest.mark.parametrize(
    "ref,expected",
    [
        ("db.transcripts", True),
        ("catalog.db.transcripts", True),
        ("transcripts", True),
        ("/root/testdata/sf0.01", False),
        ("s3://bucket/key", False),
        ("s3a://bucket/key", False),
        ("hdfs://nn/warehouse/tbl", False),
        ("file:/tmp/x", False),
        ("out/dir", False),
    ],
)
def test_is_table_ref(ref, expected):
    assert is_table_ref(ref) is expected


def test_catalog_table_roundtrip(spark, tmp_path):
    """A dotted reference goes through the session catalog — the same code
    path an Iceberg catalog serves."""
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    df = spark.range(10).selectExpr("id", "id % 3 AS bucket")
    df.createOrReplaceTempView("src_view")
    spark.sql("DROP TABLE IF EXISTS tio_test")
    spark.sql(
        f"CREATE TABLE tio_test (id LONG, bucket LONG) USING parquet "
        f"PARTITIONED BY (bucket) LOCATION '{tmp_path / 'tbl'}'"
    )
    overwrite_partitions(df, "tio_test", "bucket")
    got = read_table(spark, "tio_test")
    assert got.count() == 10
    # dynamic overwrite: rewriting one partition leaves the others intact
    part0 = df.filter("bucket = 0").withColumn("id", df.id + 100)
    overwrite_partitions(part0, "tio_test", "bucket")
    after = read_table(spark, "tio_test")
    assert after.count() == 10
    assert after.filter("bucket = 0 AND id >= 100").count() == 4
    spark.sql("DROP TABLE IF EXISTS tio_test")
