"""Spark e2e: image payloads embedded in transcripts → extracted tables with
the reference's golden bboxes/shapes/content."""

import base64
import datetime as dt
import json

from pyspark.sql import functions as F

from img2table_spark.operators.extract import extract_tables
from img2table_spark.schema import TRANSCRIPT_SCHEMA


def _rows(ref_tests):
    with open(ref_tests / "document/image/test_data/test.png", "rb") as f:
        test_b64 = base64.b64encode(f.read()).decode()
    with open(ref_tests / "document/image/test_data/dark.png", "rb") as f:
        dark_b64 = base64.b64encode(f.read()).decode()
    with open(ref_tests / "tables/image/test_data/blank.png", "rb") as f:
        blank_b64 = base64.b64encode(f.read()).decode()
    with open(ref_tests / "_mock_data/tesseract_hocr.html") as f:
        hocr = f.read()

    ts = dt.datetime(2026, 1, 1)
    return [
        # full content path: image + embedded hOCR + implicit rows
        ("conv_img", 0, "assistant",
         json.dumps({"image": test_b64, "hocr": hocr, "implicit_rows": True}),
         "image/png", ts),
        # geometry-only path
        ("conv_img", 1, "assistant",
         json.dumps({"image": dark_b64, "implicit_rows": True}), "image/png", ts),
        # negative
        ("conv_img", 2, "assistant", blank_b64, "image/png", ts),
    ]


def test_image_payloads_e2e(spark, ref_tests):
    df = spark.createDataFrame(_rows(ref_tests), TRANSCRIPT_SCHEMA)
    out = extract_tables(df, salt=True).orderBy("turn_idx", "table_idx").collect()

    by_turn = {}
    for r in out:
        by_turn.setdefault(r["turn_idx"], []).append(r)

    # turn 0: test.png with OCR → 2 tables, golden bboxes + cell text
    t0 = by_turn[0]
    assert [(r["x1"], r["y1"], r["x2"], r["y2"], r["n_rows"], r["n_cols"]) for r in t0] == [
        (36, 21, 770, 327, 6, 3),
        (962, 21, 1154, 123, 2, 2),
    ]
    big = t0[0]
    values = {(c["row"], c["col"]): c["value"] for c in big["cells"]}
    assert values[(0, 0)] == "Title" and values[(0, 2)] == "Title"  # merged
    assert values[(1, 0)] == "Line 1-Col 1"
    small = t0[1]
    assert [c["value"] for c in small["cells"]] == ["Test 1", "Test 2", "Test 3", "Test 4"]
    assert "<table>" in big["html"]

    # turn 1: dark.png, no OCR → geometry only, golden bbox
    t1 = by_turn[1]
    assert [(r["x1"], r["y1"], r["x2"], r["y2"], r["n_rows"], r["n_cols"]) for r in t1] == [
        (46, 37, 836, 529, 19, 5)
    ]
    assert all(c["value"] is None for c in t1[0]["cells"])

    # turn 2: blank.png → no tables
    assert 2 not in by_turn


def test_pdf_payload_e2e(spark, ref_tests):
    with open(ref_tests / "document/pdf/test_data/test.pdf", "rb") as f:
        pdf_b64 = base64.b64encode(f.read()).decode()
    ts = dt.datetime(2026, 1, 1)
    df = spark.createDataFrame(
        [("conv_pdf", 0, "assistant", pdf_b64, "application/pdf", ts)], TRANSCRIPT_SCHEMA
    )
    out = extract_tables(df, salt=True).orderBy("table_idx").collect()
    assert len(out) == 4
    assert [r["title"] for r in out] == [f"Example of Data Table {i}" for i in range(1, 5)]
    assert all((r["n_rows"], r["n_cols"]) == (5, 4) for r in out)
