"""S6–S11 adapter parity vs reference goldens (tests/ocr/*/test_data)."""

import json

import pandas as pd

from img2table_spark.kernels.ocr_adapters import (
    easyocr_words,
    textract_map_response,
    vision_map_response,
)

from tests.conftest import load_words_csv


def test_easyocr_adapter(ref_tests):
    """Oracle: tests/ocr/easyocr (ocr.json → ocr_df.csv)."""
    with open(ref_tests / "ocr/easyocr/test_data/ocr.json") as f:
        content = json.load(f)
    words = easyocr_words(content)
    expected = load_words_csv(ref_tests / "ocr/easyocr/test_data/ocr_df.csv")
    pd.testing.assert_frame_equal(
        words.astype(str).reset_index(drop=True),
        expected.astype(str).reset_index(drop=True),
    )


def test_textract_adapter(ref_tests):
    """Oracle: tests/ocr/aws_textract (_mock_data/textract.json → content.json)."""
    with open(ref_tests / "_mock_data/textract.json") as f:
        resp = json.load(f)
    result = textract_map_response(resp, width=1365, height=417, page=0)
    with open(ref_tests / "ocr/aws_textract/test_data/content.json") as f:
        expected = json.load(f)
    assert result == expected


def test_vision_adapter(ref_tests):
    """Oracle: tests/ocr/google_vision (_mock_data/vision.json →
    expected_content.json[0])."""
    with open(ref_tests / "_mock_data/vision.json") as f:
        resp = json.load(f)
    result = vision_map_response(resp, page=0, width=1365, height=417)
    with open(ref_tests / "ocr/google_vision/test_data/expected_content.json") as f:
        expected = json.load(f)
    assert result == expected[0]


def test_paddle_adapter(ref_tests):
    """Oracle: tests/ocr/paddle (hocr.json → ocr_df.csv)."""
    from img2table_spark.kernels.ocr_adapters import paddle_words

    with open(ref_tests / "ocr/paddle/test_data/hocr.json") as f:
        content = json.load(f)
    words = paddle_words(content)
    expected = load_words_csv(ref_tests / "ocr/paddle/test_data/ocr_df.csv")
    pd.testing.assert_frame_equal(
        words.astype(str).reset_index(drop=True),
        expected.astype(str).reset_index(drop=True),
    )
