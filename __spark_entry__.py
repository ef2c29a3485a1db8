"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship end-to-end extraction on sf0.001.
``queries()`` / ``oracle_sql()`` — one entry per implemented operator family
(SURVEY.md §2 + training-data ops); oracles are ANSI SQL for DuckDB over the
same parquet tables.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: synthesize transcripts from sf0.001 documents, run the full
    extraction pipeline (salted repartition → Arrow UDF → explode)."""
    from img2table_spark.operators.extract import extract_tables
    from img2table_spark.sources.transcripts import transcripts_from_documents

    tr = transcripts_from_documents(spark, "/root/testdata/sf0.001")
    return extract_tables(tr, salt=True)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from img2table_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from img2table_spark.queries import ORACLES

    return dict(ORACLES)
