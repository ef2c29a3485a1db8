"""P1–P5 + B1 parity vs reference pixel goldens
(tests/tables/image/test_metrics.py, tests/tables/processing/bordered_tables/
lines/test_lines.py)."""

import json

import pytest

from img2table_spark.kernels.imageops import rgb2gray
from img2table_spark.kernels.lines import detect_lines
from img2table_spark.kernels.metrics import (
    compute_char_length,
    compute_img_metrics,
    compute_median_line_sep,
    threshold_dark_areas,
)
from img2table_spark.kernels.objects import Cell
from img2table_spark.kernels.png import decode_png


@pytest.fixture(scope="module")
def test_png(ref_tests):
    with open(ref_tests / "tables/image/test_data/test.png", "rb") as f:
        return decode_png(f.read())


def test_png_decode(test_png):
    assert test_png.shape == (417, 1365, 3)
    assert test_png.dtype.name == "uint8"


def test_compute_char_length(ref_tests, test_png):
    """Oracle: tests/tables/image/test_metrics.py:8-17."""
    thresh = threshold_dark_areas(test_png, char_length=11)
    char_length, thresh_chars, chars_array = compute_char_length(thresh)
    assert round(char_length, 2) == 9.0
    assert thresh_chars.shape == (417, 1365)

    with open(ref_tests / "tables/image/test_data/blank.png", "rb") as f:
        blank = 255 - rgb2gray(decode_png(f.read()))
    assert compute_char_length(blank) == (None, None, None)


def test_compute_median_line_sep(test_png):
    """Oracle: tests/tables/image/test_metrics.py:20-29."""
    thresh = threshold_dark_areas(test_png, char_length=11)
    char_length, thresh_chars, chars_array = compute_char_length(thresh)
    median_line_sep, contours = compute_median_line_sep(thresh_chars, chars_array, char_length)
    assert round(median_line_sep, 2) == 51
    assert len(contours) == 71


def test_compute_img_metrics(test_png):
    """Oracle: tests/tables/image/test_metrics.py:32-43."""
    thresh = threshold_dark_areas(test_png, char_length=11)
    char_length, median_line_sep, contours = compute_img_metrics(thresh)
    assert round(char_length, 2) == 9.0
    assert round(median_line_sep, 2) == 51
    assert len(contours) == 71


def test_detect_lines(ref_tests):
    """Oracle: tests/.../lines/test_lines.py — positions, thickness AND
    extremities all exact vs the shipped golden."""
    base = ref_tests / "tables/processing/bordered_tables/lines/test_data"
    with open(base / "test.png", "rb") as f:
        img = decode_png(f.read())
    with open(base / "contours.json") as f:
        contours = [Cell(**el) for el in json.load(f)]
    h_lines, v_lines = detect_lines(img, contours, char_length=8.85, min_line_length=10)

    with open(base / "expected.json") as f:
        exp = json.load(f)

    def hkey(ln):
        return (ln.y1, ln.x1)

    got_h = sorted(h_lines, key=hkey)
    want_h = sorted(exp["h_lines"], key=lambda e: (e["y1"], e["x1"]))
    assert len(got_h) == len(want_h)
    for g, w in zip(got_h, want_h):
        assert g.y1 == w["y1"] and g.y2 == w["y2"]
        assert g.thickness == w["thickness"]
        assert g.x1 == w["x1"] and g.x2 == w["x2"]

    got_v = sorted(v_lines, key=lambda ln: (ln.x1, ln.y1))
    want_v = sorted(exp["v_lines"], key=lambda e: (e["x1"], e["y1"]))
    assert len(got_v) == len(want_v)
    for g, w in zip(got_v, want_v):
        assert g.x1 == w["x1"] and g.x2 == w["x2"]
        assert g.thickness == w["thickness"]
        assert g.y1 == w["y1"] and g.y2 == w["y2"]
