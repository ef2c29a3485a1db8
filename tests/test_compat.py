"""Drop-in API facade parity vs the reference's document-level tests
(tests/document/image/test_image.py, tests/document/pdf/test_pdf.py)."""

import io

import pytest

from img2table_spark.compat import PDF, BBox, HocrOCR, Image

from tests.xlsx_util import read_xlsx_values


@pytest.fixture(scope="module")
def ocr(ref_tests):
    with open(ref_tests / "_mock_data/tesseract_hocr.html") as f:
        return HocrOCR([f.read()])


def test_validators():
    with pytest.raises(TypeError):
        Image(src=1)
    with pytest.raises(TypeError):
        Image(src=b"img", detect_rotation=3)
    with pytest.raises(TypeError):
        PDF(src=b"img", pages=12)
    with pytest.raises(TypeError):
        PDF(src=b"img", pages=["12"])


def test_load_image(ref_tests):
    """Oracle: tests/document/image/test_image.py:21-35."""
    p = ref_tests / "document/image/test_data/test.png"
    img_path = Image(src=str(p))
    with open(p, "rb") as f:
        raw = f.read()
    img_bytes = Image(src=raw)
    img_bytesio = Image(src=io.BytesIO(raw))
    assert img_path.bytes == img_bytes.bytes == img_bytesio.bytes
    assert list(img_path.images)[0].shape == (417, 1365, 3)


def test_image_tables(ref_tests, ocr):
    """Oracle: tests/document/image/test_image.py:61-78."""
    img = Image(src=str(ref_tests / "document/image/test_data/test.png"),
                detect_rotation=True)
    result = img.extract_tables(ocr=ocr, implicit_rows=True, min_confidence=50)
    assert len(result) == 2
    assert result[0].title is None
    assert result[0].bbox == BBox(x1=36, y1=21, x2=770, y2=327)
    assert (len(result[0].content), len(result[0].content[0])) == (6, 3)
    assert result[1].title is None
    assert result[1].bbox == BBox(x1=962, y1=21, x2=1154, y2=123)
    assert (len(result[1].content), len(result[1].content[0])) == (2, 2)
    # pandas accessor
    assert result[1].df.values.tolist() == [["Test 1", "Test 2"], ["Test 3", "Test 4"]]


def test_no_ocr(ref_tests):
    """Oracle: tests/document/image/test_image.py:81-92."""
    img = Image(src=str(ref_tests / "document/image/test_data/dark.png"),
                detect_rotation=True)
    result = img.extract_tables(implicit_rows=True, min_confidence=50)
    assert len(result) == 1
    assert result[0].bbox == BBox(x1=46, y1=37, x2=836, y2=529)
    assert (len(result[0].content), len(result[0].content[0])) == (19, 5)


def test_image_excel(ref_tests, ocr):
    """Oracle: tests/document/image/test_image.py:95-107 (values equality)."""
    img = Image(src=str(ref_tests / "document/image/test_data/test.png"))
    result = img.to_xlsx(dest=io.BytesIO(), ocr=ocr, implicit_rows=True, min_confidence=50)
    got = read_xlsx_values(result)
    expected = read_xlsx_values(ref_tests / "document/image/test_data/expected.xlsx")
    assert list(got.keys()) == list(expected.keys())
    for name in expected:
        assert got[name] == expected[name]


def test_tesseract_ocr_driver(ref_tests):
    """TesseractOCR with an injected runner (the reference's own tests mock
    the subprocess) must produce the same tables as HocrOCR on the same
    hOCR; without a binary or runner it raises OSError like the reference."""
    import pytest as _pytest

    from img2table_spark.compat import TesseractOCR

    hocr = (ref_tests / "_mock_data/tesseract_hocr.html").read_text()
    src = str(ref_tests / "document/image/test_data/test.png")
    via_driver = Image(src=src).extract_tables(
        ocr=TesseractOCR(runner=lambda img: hocr), implicit_rows=True
    )
    via_hocr = Image(src=src).extract_tables(ocr=HocrOCR([hocr]), implicit_rows=True)
    assert [(t.bbox, t.title, t.df.values.tolist()) for t in via_driver] == [
        (t.bbox, t.title, t.df.values.tolist()) for t in via_hocr
    ]

    import shutil

    if shutil.which("tesseract") is None:
        with _pytest.raises(OSError):
            TesseractOCR()


def test_pdf_tables(ref_tests):
    """Oracle: tests/document/pdf/test_pdf.py:48-72 (titles + shapes; bboxes
    are version-fragile in the reference itself → ±2px)."""
    pdf = PDF(src=str(ref_tests / "document/pdf/test_data/test.pdf"))
    result = pdf.extract_tables(implicit_rows=True, min_confidence=50)
    golden = {
        (0, 0): ("Example of Data Table 1", (235, 249, 1442, 543)),
        (0, 1): ("Example of Data Table 2", (236, 672, 1452, 972)),
        (1, 0): ("Example of Data Table 3", (235, 249, 1442, 543)),
        (1, 1): ("Example of Data Table 4", (236, 672, 1452, 972)),
    }
    for (p, i), (title, bbox) in golden.items():
        t = result[p][i]
        assert t.title == title
        assert (len(t.content), len(t.content[0])) == (5, 4)
        got = (t.bbox.x1, t.bbox.y1, t.bbox.x2, t.bbox.y2)
        assert all(abs(g - w) <= 2 for g, w in zip(got, bbox))

    # pages selection (oracle: test_pdf.py:44-46)
    only0 = PDF(src=str(ref_tests / "document/pdf/test_data/test.pdf"), pages=[0])
    assert list(only0.extract_tables(implicit_rows=True).keys()) == [0]

    # reference keys the result dict by ORDINAL of rendered pages: pages=[1]
    # → key 0, holding page 1's tables
    only1 = PDF(src=str(ref_tests / "document/pdf/test_data/test.pdf"), pages=[1])
    r1 = only1.extract_tables(implicit_rows=True)
    assert list(r1.keys()) == [0]
    assert r1[0][0].title == "Example of Data Table 3"

    # pixel-path flags on text-layer PDFs (glyph-rendered pages — reference
    # renders every page and runs the image pipeline uniformly,
    # document/pdf.py:46-67): borderless mode still finds the four BORDERED
    # tables with exact content, and detect_rotation on an unrotated
    # document is a no-op relative to the default path.
    res_bl = pdf.extract_tables(implicit_rows=True, borderless_tables=True)
    assert [t.title for t in res_bl[0]] == [
        "Example of Data Table 1", "Example of Data Table 2"
    ]
    assert [t.title for t in res_bl[1]] == [
        "Example of Data Table 3", "Example of Data Table 4"
    ]
    for page in (0, 1):
        for t_bl, t_vec in zip(res_bl[page], result[page]):
            assert t_bl.df.equals(t_vec.df)

    rot = PDF(src=str(ref_tests / "document/pdf/test_data/test.pdf"), detect_rotation=True)
    res_rot = rot.extract_tables(implicit_rows=True)
    assert [t.title for t in res_rot[0]] == [t.title for t in result[0]]
    for t_r, t_v in zip(res_rot[0], result[0]):
        assert t_r.df.equals(t_v.df)
