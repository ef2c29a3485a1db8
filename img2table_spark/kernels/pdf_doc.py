"""PDF payload path (S2 render + S4 native-text words).

Round-1 status: payload validation only. pypdfium2 is unavailable here, so
the scale path keeps the reference's contract (200 DPI geometry, charbox →
word clustering per ocr/pdf.py:106-224) behind this entry point; a pure-
Python content-stream text extractor is planned for the native-text path.
"""

from __future__ import annotations

import base64
import binascii

from img2table_spark.kernels.objects import Table


def extract_pdf_payload(text: str) -> list[Table]:
    try:
        data = base64.b64decode(text, validate=True)
        if not data.startswith(b"%PDF"):
            raise ValueError("not a PDF header")
    except (binascii.Error, ValueError) as exc:
        from img2table_spark.operators.extract import PayloadError

        raise PayloadError(f"invalid PDF payload: {exc}") from exc
    from img2table_spark.operators.extract import PayloadError

    raise PayloadError("PDF pipeline not yet wired (kernels under construction)")
