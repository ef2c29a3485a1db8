"""Image payload path (S1 + P/B/L pipelines).

Round-1 status: payload validation only; the pure-NumPy CV pipeline
(threshold → metrics → lines → cells → tables, reference:
src/img2table/tables/image.py:32-124) is being built kernel-by-kernel against
the reference's golden fixtures. cv2/pypdfium2 are not available in this
environment, so decoding is stdlib (zlib PNG) and all morphology is NumPy.
"""

from __future__ import annotations

import base64
import binascii

from img2table_spark.kernels.objects import Table


def extract_image_payload(text: str) -> list[Table]:
    try:
        data = base64.b64decode(text, validate=True)
    except (binascii.Error, ValueError) as exc:
        from img2table_spark.operators.extract import PayloadError

        raise PayloadError(f"invalid base64 image payload: {exc}") from exc
    from img2table_spark.operators.extract import PayloadError

    raise PayloadError("image CV pipeline not yet wired (kernels under construction)")
