"""Distributed text assignment (cogrouped applyInPandas) equals the in-UDF
embedded-hOCR path on the golden image."""

import base64
import datetime as dt
import json

from pyspark.sql import functions as F

from img2table_spark.kernels.hocr import parse_hocr_pages
from img2table_spark.operators.assign_text import assign_text
from img2table_spark.operators.extract import extract_tables
from img2table_spark.schema import TRANSCRIPT_SCHEMA, WORD_SCHEMA


def test_assign_text_matches_embedded(spark, ref_tests):
    with open(ref_tests / "document/image/test_data/test.png", "rb") as f:
        png_b64 = base64.b64encode(f.read()).decode()
    with open(ref_tests / "_mock_data/tesseract_hocr.html") as f:
        hocr = f.read()
    ts = dt.datetime(2026, 1, 1)

    # path A: embedded hOCR inside the payload
    df_a = spark.createDataFrame(
        [("c0", 0, "assistant",
          json.dumps({"image": png_b64, "hocr": hocr, "implicit_rows": True}),
          "image/png", ts)],
        TRANSCRIPT_SCHEMA,
    )
    a = extract_tables(df_a).orderBy("x1").collect()

    # path B: geometry-only extraction + words as a separate Spark table
    df_b = spark.createDataFrame(
        [("c0", 0, "assistant",
          json.dumps({"image": png_b64, "implicit_rows": True}),
          "image/png", ts)],
        TRANSCRIPT_SCHEMA,
    )
    geometry = extract_tables(df_b)
    wpdf = parse_hocr_pages([hocr])
    words = spark.createDataFrame(wpdf, WORD_SCHEMA).select(
        F.lit("c0").alias("conv_id"), F.lit(0).alias("turn_idx"), "*"
    )
    b = assign_text(geometry, words).orderBy("x1").collect()

    assert len(a) == len(b) == 2
    for ra, rb in zip(a, b):
        assert (ra["x1"], ra["y1"], ra["x2"], ra["y2"]) == (rb["x1"], rb["y1"], rb["x2"], rb["y2"])
        assert (ra["n_rows"], ra["n_cols"]) == (rb["n_rows"], rb["n_cols"])
        va = [(c["row"], c["col"], c["value"]) for c in ra["cells"]]
        vb = [(c["row"], c["col"], c["value"]) for c in rb["cells"]]
        assert va == vb
