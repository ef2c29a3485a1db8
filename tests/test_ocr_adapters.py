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


def _permissive_load(path):
    """Unpickle vendor fixtures WITHOUT the vendor packages: every non-std
    class becomes an attribute-bag stub (pydantic/msrest models pickle as
    plain state dicts; enums as cls(value) calls)."""
    import pickle

    class Stub:
        def __init__(self, *args, **kwargs):
            self._args = args
            self.__dict__.update(kwargs)

        def __setstate__(self, state):
            if isinstance(state, tuple):
                for part in state:
                    if isinstance(part, dict):
                        self.__dict__.update(part)
                return
            if isinstance(state, dict):
                inner = state.pop("__dict__", None)
                if isinstance(inner, dict):
                    self.__dict__.update(inner)
                self.__dict__.update(state)

    class U(pickle.Unpickler):
        def find_class(self, module, name):
            root = module.split(".")[0]
            if root in ("numpy", "builtins", "collections", "copyreg", "datetime", "functools"):
                return super().find_class(module, name)
            return type(name, (Stub,), {})

    with open(path, "rb") as f:
        return U(f).load()


def test_doctr_adapter(ref_tests):
    """Oracle: tests/ocr/doctr (ocr.pkl → ocr_df.csv)."""
    from img2table_spark.kernels.ocr_adapters import doctr_words

    content = _permissive_load(ref_tests / "ocr/doctr/test_data/ocr.pkl")
    words = doctr_words(content)
    expected = load_words_csv(ref_tests / "ocr/doctr/test_data/ocr_df.csv")
    pd.testing.assert_frame_equal(
        words.astype(str).reset_index(drop=True),
        expected.astype(str).reset_index(drop=True),
    )


def test_surya_adapter(ref_tests):
    """Oracle: tests/ocr/surya (_mock_data/surya.pkl → ocr_df.csv)."""
    from img2table_spark.kernels.ocr_adapters import surya_words

    content = _permissive_load(ref_tests / "_mock_data/surya.pkl")
    words = surya_words(content)
    expected = load_words_csv(ref_tests / "ocr/surya/test_data/ocr_df.csv")
    # the golden CSV holds one genuinely-empty OCR value; pandas reads it as
    # NaN while the adapter (like polars) keeps the empty string
    expected["value"] = expected["value"].fillna("")
    pd.testing.assert_frame_equal(
        words.astype(str).reset_index(drop=True),
        expected.astype(str).reset_index(drop=True),
    )


def test_azure_adapter(ref_tests):
    """Oracle: tests/ocr/azure (_mock_data/azure.pkl → ocr_df.csv; the
    reference wraps the single page result in a list)."""
    from img2table_spark.kernels.ocr_adapters import azure_words

    content = _permissive_load(ref_tests / "_mock_data/azure.pkl")
    words = azure_words([content])
    expected = load_words_csv(ref_tests / "ocr/azure/test_data/ocr_df.csv")
    pd.testing.assert_frame_equal(
        words.astype(str).reset_index(drop=True),
        expected.astype(str).reset_index(drop=True),
    )


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
