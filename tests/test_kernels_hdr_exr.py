"""Radiance HDR + OpenEXR codecs: round-trips through independently written
fixture encoders, golden-twin extraction parity with the PNG fixture, and
loud rejection of the unsupported corners (reference accepts both formats
via cv2.imdecode, document/image.py:25-32)."""

import struct

import numpy as np
import pytest

from img2table_spark.kernels.exr import EXRError, decode_exr, encode_exr
from img2table_spark.kernels.hdr import HDRError, decode_hdr, encode_hdr
from img2table_spark.kernels.image_doc import ImageDecodeError, decode_image_bytes
from img2table_spark.kernels.png import decode_png

from tests.test_kernels_codecs import GOLDEN, _golden_tables


@pytest.fixture(scope="module")
def test_img(ref_tests):
    with open(ref_tests / "tables/image/test_data/test.png", "rb") as f:
        return decode_png(f.read())


# ----------------------------------------------------------------------- HDR

def test_hdr_roundtrip_gray_exact():
    rng = np.random.default_rng(11)
    g = rng.integers(0, 256, size=(24, 40, 1), dtype=np.uint8)
    img = np.repeat(g, 3, axis=2)  # equal channels share an exact exponent
    assert np.array_equal(decode_hdr(encode_hdr(img)), img)


def test_hdr_roundtrip_color_within_one():
    rng = np.random.default_rng(12)
    img = rng.integers(0, 256, size=(16, 33, 3), dtype=np.uint8)
    out = decode_hdr(encode_hdr(img))
    # shared RGBE exponent: minority channels may land one level off
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 1


def test_hdr_flat_and_old_rle_scanlines():
    # hand-built flat file with an old-style (1,1,1,n) run
    w, h = 12, 2
    px = bytes([128, 64, 32, 129])
    row0 = px + bytes([1, 1, 1, 11])  # 1 pixel + run of 11 copies
    row1 = px * w
    data = (
        b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n"
        + f"-Y {h} +X {w}\n".encode()
        + row0
        + row1
    )
    out = decode_hdr(data)
    assert out.shape == (h, w, 3)
    assert (out == out[0, 0]).all()  # every pixel identical


def test_hdr_golden_twin_extraction(test_img):
    assert _golden_tables(decode_image_bytes(encode_hdr(test_img))) == GOLDEN


def test_hdr_rejects_xyze_and_orientation():
    with pytest.raises(HDRError):
        decode_hdr(b"#?RADIANCE\nFORMAT=32-bit_rle_xyze\n\n-Y 2 +X 8\n" + b"\x00" * 64)
    with pytest.raises(HDRError):
        decode_hdr(b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n+X 8 -Y 2\n" + b"\x00" * 64)


def test_hdr_truncated_fails_cleanly():
    data = encode_hdr(np.full((8, 16, 3), 200, np.uint8))
    with pytest.raises(HDRError):
        decode_hdr(data[: len(data) // 2])


# ----------------------------------------------------------------------- EXR

@pytest.mark.parametrize("comp", [0, 1, 2, 3], ids=["none", "rle", "zips", "zip"])
def test_exr_roundtrip_exact(comp):
    rng = np.random.default_rng(13 + comp)
    img = rng.integers(0, 256, size=(37, 53, 3), dtype=np.uint8)
    assert np.array_equal(decode_exr(encode_exr(img, compression=comp)), img)


def test_exr_zip_multiline_blocks():
    # height crossing several 16-line ZIP blocks incl. a partial tail
    rng = np.random.default_rng(17)
    img = rng.integers(0, 256, size=(50, 24, 3), dtype=np.uint8)
    assert np.array_equal(decode_exr(encode_exr(img, compression=3)), img)


def test_exr_golden_twin_extraction(test_img):
    assert _golden_tables(decode_image_bytes(encode_exr(test_img))) == GOLDEN


def test_exr_rejects_piz_tiled_uint():
    good = encode_exr(np.full((8, 8, 3), 90, np.uint8))
    # flip compression attr to PIZ (4)
    piz = good.replace(b"compression\x00compression\x00\x01\x00\x00\x00\x03",
                       b"compression\x00compression\x00\x01\x00\x00\x00\x04")
    with pytest.raises(EXRError, match="PIZ"):
        decode_exr(piz)
    # set the tiled bit in the version word
    tiled = good[:4] + struct.pack("<I", 2 | 0x200) + good[8:]
    with pytest.raises(EXRError, match="tiled"):
        decode_exr(tiled)


def test_exr_truncated_fails_cleanly():
    data = encode_exr(np.full((20, 20, 3), 50, np.uint8))
    with pytest.raises(EXRError):
        decode_exr(data[: len(data) - 40])


def test_dispatch_magic_sniffing(test_img):
    assert np.array_equal(decode_image_bytes(encode_exr(test_img)), test_img)
    hdr_out = decode_image_bytes(encode_hdr(test_img))
    assert np.abs(hdr_out.astype(int) - test_img.astype(int)).max() <= 1
    with pytest.raises(ImageDecodeError):
        decode_image_bytes(b"\x76\x2f\x31\x01" + b"\x00" * 16)
