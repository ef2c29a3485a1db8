"""Document-level e2e parity: image + mocked hOCR → content-filled tables
(oracle: tests/document/image/test_image.py incl. expected.xlsx values)."""

import pytest

from img2table_spark.kernels.document import extract_image_tables
from img2table_spark.kernels.hocr import parse_hocr_pages
from img2table_spark.kernels.html_io import _group_spans
from img2table_spark.kernels.png import decode_png

from tests.xlsx_util import read_xlsx_values


@pytest.fixture(scope="module")
def hocr_words(ref_tests):
    with open(ref_tests / "_mock_data/tesseract_hocr.html") as f:
        return parse_hocr_pages([f.read()])


def _xlsx_grid(table):
    """Reproduce xlsxwriter sheet values: span anchors carry the value,
    covered positions are None (reference: extraction.py:176-206)."""
    grid = [[None] * table.nb_columns for _ in range(table.nb_rows)]
    for span in _group_spans(table):
        grid[span.top_row][span.col_left] = span.value
    return grid


def test_hocr_parse(ref_tests, hocr_words):
    words = hocr_words
    assert len(words) == 114
    assert (words["class"] == "ocrx_word").sum() == 59
    w = words[words["id"] == "word_1_1"].iloc[0]
    assert (w["value"], w["confidence"], w["x1"], w["y1"], w["x2"], w["y2"]) == (
        "Title", 88, 384, 40, 422, 55,
    )


def test_image_tables_with_ocr(ref_tests, hocr_words):
    """Oracle: tests/document/image/test_image.py:61-78 + expected.xlsx."""
    with open(ref_tests / "document/image/test_data/test.png", "rb") as f:
        img = decode_png(f.read())
    tables = extract_image_tables(
        img, words=hocr_words, implicit_rows=True, min_confidence=50
    )
    assert len(tables) == 2
    t1, t2 = sorted(tables, key=lambda t: t.x1)

    assert t1.title is None
    assert (t1.x1, t1.y1, t1.x2, t1.y2) == (36, 21, 770, 327)
    assert (t1.nb_rows, t1.nb_columns) == (6, 3)
    assert t2.title is None
    assert (t2.x1, t2.y1, t2.x2, t2.y2) == (962, 21, 1154, 123)
    assert (t2.nb_rows, t2.nb_columns) == (2, 2)

    expected = read_xlsx_values(ref_tests / "document/image/test_data/expected.xlsx")
    assert _xlsx_grid(t1) == expected["Page 1 - Table 1"]
    assert _xlsx_grid(t2) == expected["Page 1 - Table 2"]


def test_image_tables_no_ocr(ref_tests):
    """Oracle: tests/document/image/test_image.py:81-92."""
    with open(ref_tests / "document/image/test_data/dark.png", "rb") as f:
        img = decode_png(f.read())
    tables = extract_image_tables(img, words=None, implicit_rows=True)
    assert len(tables) == 1
    tb = tables[0]
    assert tb.title is None
    assert (tb.x1, tb.y1, tb.x2, tb.y2) == (46, 37, 836, 529)
    assert (tb.nb_rows, tb.nb_columns) == (19, 5)


def test_blank_image(ref_tests, hocr_words):
    """Oracle: tests/document/image/test_image.py:37-58."""
    with open(ref_tests / "tables/image/test_data/blank.png", "rb") as f:
        img = decode_png(f.read())
    assert extract_image_tables(img, words=hocr_words, implicit_rows=True,
                                borderless_tables=True) == []
    assert extract_image_tables(img, words=None, implicit_rows=True,
                                borderless_tables=True) == []


def test_to_xlsx_writer(ref_tests, hocr_words):
    """K3 writer: round-trip through the stdlib reader equals expected.xlsx
    values and sheet names (oracle: tests/document/image/test_image.py:95-107)."""
    import io

    from img2table_spark.kernels.xlsx import tables_to_xlsx_bytes

    with open(ref_tests / "document/image/test_data/test.png", "rb") as f:
        img = decode_png(f.read())
    tables = extract_image_tables(img, words=hocr_words, implicit_rows=True, min_confidence=50)
    tables = sorted(tables, key=lambda t: t.x1)
    data = tables_to_xlsx_bytes({0: tables})

    got = read_xlsx_values(io.BytesIO(data))
    expected = read_xlsx_values(ref_tests / "document/image/test_data/expected.xlsx")
    assert list(got.keys()) == list(expected.keys())
    for name in expected:
        assert got[name] == expected[name], name
