"""Scanned-PDF raster path: an image-only PDF page (Flate bitmap XObject)
goes through decode → pixel pipeline; golden = the embedded image's own
reference expectations (test.png 2 tables)."""

import base64
import zlib

import pytest

from img2table_spark.kernels.pdf_doc import (
    extract_pdf_payload,
    extract_scanned_pdf_tables,
)
from img2table_spark.kernels.png import decode_png


def _build_scanned_pdf(img) -> bytes:
    """Minimal one-page PDF whose content is a single RGB bitmap XObject.
    Page size is chosen so the 200-DPI page space equals image pixels."""
    h_px, w_px, _ = img.shape
    page_w = w_px * 72 / 200
    page_h = h_px * 72 / 200
    img_stream = zlib.compress(img.tobytes())

    objs: list[bytes] = []
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    objs.append(
        f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {page_w:.4f} {page_h:.4f}] "
        f"/Resources << /XObject << /Im1 4 0 R >> >> /Contents 5 0 R >>".encode()
    )
    content = f"q {page_w:.4f} 0 0 {page_h:.4f} 0 0 cm /Im1 Do Q".encode()

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for num, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"
    # image xobject (4) and content stream (5)
    offsets.append(len(out))
    out += (
        f"4 0 obj\n<< /Type /XObject /Subtype /Image /Width {w_px} /Height {h_px} "
        f"/ColorSpace /DeviceRGB /BitsPerComponent 8 /Filter /FlateDecode "
        f"/Length {len(img_stream)} >>\nstream\n".encode()
    )
    out += img_stream + b"\nendstream\nendobj\n"
    offsets.append(len(out))
    out += f"5 0 obj\n<< /Length {len(content)} >>\nstream\n".encode()
    out += content + b"\nendstream\nendobj\n"

    xref_pos = len(out)
    n = 6
    out += f"xref\n0 {n}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {n} /Root 1 0 R >>\nstartxref\n{xref_pos}\n%%EOF".encode()
    )
    return bytes(out)


@pytest.fixture(scope="module")
def scanned_pdf(ref_tests):
    with open(ref_tests / "tables/image/test_data/test.png", "rb") as f:
        img = decode_png(f.read())
    return _build_scanned_pdf(img)


def test_scanned_pdf_raster_path(scanned_pdf):
    pages = extract_scanned_pdf_tables(scanned_pdf, implicit_rows=True)
    assert len(pages) == 1
    got = sorted(
        ((tb.x1, tb.y1, tb.x2, tb.y2), (tb.nb_rows, tb.nb_columns)) for tb in pages[0]
    )
    # golden: the embedded image's own reference expectations
    assert got == [((36, 21, 770, 327), (6, 3)), ((962, 21, 1154, 123), (2, 2))]


def test_scanned_pdf_payload_fallback(scanned_pdf):
    """extract_pdf_payload auto-falls back to the raster path for image-only
    PDFs."""
    tables = extract_pdf_payload(base64.b64encode(scanned_pdf).decode())
    assert len(tables) == 2
    shapes = sorted((tb.nb_rows, tb.nb_columns) for tb in tables)
    assert shapes == [(2, 2), (6, 3)]
