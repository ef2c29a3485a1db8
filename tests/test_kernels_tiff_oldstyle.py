"""Old-style JPEG-in-TIFF, tables-pointer bare-MCU variant (TIFF 6.0 §22)
— the last codec gap from SURVEY §Known gaps, closed in round 5.

The decoder synthesizes one baseline interchange stream per strip from the
JPEGQTables/JPEGDCTables/JPEGACTables tag payloads (each strip is an
independent byte-aligned scan with fresh DC predictors — the only
unambiguous reading, and what libtiff's OJPEG codec reconstructs).
Fixtures come from an independent writer pair: encode_jpeg_baseline
(SOF0, single interleaved scan) and encode_tiff_jpeg_oldstyle_tables."""

import numpy as np
import pytest

from img2table_spark.kernels.encoders import (
    encode_jpeg_baseline,
    encode_tiff_jpeg_oldstyle_tables,
)
from img2table_spark.kernels.jpeg import decode_jpeg
from img2table_spark.kernels.tiff import TIFFError, decode_tiff


def _img(h=70, w=90, seed=3):
    rng = np.random.default_rng(seed)
    noise = rng.integers(0, 256, size=(h, w, 3)).astype(float)
    return (noise * 0.3 + 120).astype(np.uint8)


def test_single_strip_equals_plain_baseline_stream():
    """The tables-pointer TIFF and the equivalent SOI..EOI baseline stream
    must decode IDENTICALLY — the synthesis is exact, not approximate."""
    img = _img()
    via_tiff = decode_tiff(encode_tiff_jpeg_oldstyle_tables(img))
    via_jpeg = decode_jpeg(encode_jpeg_baseline(img))[: img.shape[0], : img.shape[1]]
    assert np.array_equal(via_tiff, via_jpeg)


def test_multi_strip_equals_single_strip():
    """Strip boundaries on 8-px MCU rows leave every DCT block identical,
    so the multi-strip decode is pixel-equal to the single-strip one."""
    img = _img()
    single = decode_tiff(encode_tiff_jpeg_oldstyle_tables(img))
    multi = decode_tiff(encode_tiff_jpeg_oldstyle_tables(img, rows_per_strip=24))
    assert np.array_equal(single, multi)


def test_subsampled_variant_decodes():
    """2×2 chroma subsampling (the TIFF default for YCbCr when tag 530 is
    absent) with 16-px-aligned strips: luma must survive to within normal
    quantization error even though chroma is box-filtered."""
    img = _img(h=64, w=96)
    out = decode_tiff(
        encode_tiff_jpeg_oldstyle_tables(img, rows_per_strip=32, subsample=True)
    )
    assert out.shape == img.shape
    luma = lambda a: (a.astype(int) * [299, 587, 114]).sum(axis=2) // 1000
    assert np.abs(luma(out) - luma(img)).max() <= 16


def test_accuracy_vs_source():
    img = _img()
    out = decode_tiff(encode_tiff_jpeg_oldstyle_tables(img, rows_per_strip=24))
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 8


def test_missing_tables_rejected():
    data = bytearray(encode_tiff_jpeg_oldstyle_tables(_img()))
    # knock out the JPEGQTables tag (519 → an unknown tag id)
    idx = data.find((519).to_bytes(2, "little"), 8)
    data[idx : idx + 2] = (65000).to_bytes(2, "little")
    with pytest.raises(TIFFError, match="table pointers"):
        decode_tiff(bytes(data))


def test_truncated_header_or_tables_rejected():
    """Cuts inside the IFD or the table payload region fail cleanly.
    (Cuts deep inside strip entropy data are NOT errors by JPEG's nature —
    a Huffman stream pads out; the per-strip size check still guards the
    page geometry.)"""
    data = encode_tiff_jpeg_oldstyle_tables(_img())
    for cut in (6, 40, 180):  # header / mid-IFD / inside the table region
        with pytest.raises(TIFFError):
            decode_tiff(data[:cut])
