"""CCITT G3/G4 fax codec tests (kernels/ccitt.py).

Methodology (same as webp/jpeg): hand-assembled bitstreams written straight
from the public ITU-T T.4/T.6 tables pin the decoder independently of the
fixture encoder; two-sided round-trips through the independent encoder pin
both; fuzz pins clean failure on garbage.
"""

import numpy as np
import pytest

from img2table_spark.kernels.ccitt import (
    CCITTError,
    decode_ccitt,
    decode_ccitt_pdf,
    decode_ccitt_tiff,
    encode_ccitt,
)
from img2table_spark.kernels.encoders import (
    build_ccitt_scanned_pdf,
    encode_tiff_ccitt,
)
from img2table_spark.kernels.tiff import TIFFError, decode_tiff


def _bits_to_bytes(bits: str) -> bytes:
    pad = (8 - len(bits) % 8) % 8
    return int(bits + "0" * pad, 2).to_bytes((len(bits) + pad) // 8, "big")


# ------------------------------------------------- hand-assembled vectors

def test_mh_hand_vector_simple():
    # 16 px = 8 white + 8 black: white8=10011 (T.4 tab.2), black8=000101
    row = decode_ccitt(_bits_to_bytes("10011" + "000101"), 16, 1, mode="mh")
    assert row.tolist() == [[0] * 8 + [1] * 8]


def test_mh_hand_vector_line_starts_black():
    # 12 px = 0 white + 4 black + 8 white: w0=00110101, b4=011, w8=10011
    row = decode_ccitt(
        _bits_to_bytes("00110101" + "011" + "10011"), 12, 1, mode="mh"
    )
    assert row.tolist() == [[1] * 4 + [0] * 8]


def test_mh_hand_vector_makeup_chain():
    # 2624 white = ext make-up 2560 (000000011111) + make-up 64 (11011)
    # + terminating 0 (00110101) per T.4 §4.1.3
    bits = "000000011111" + "11011" + "00110101"
    row = decode_ccitt(_bits_to_bytes(bits), 2624, 1, mode="mh")
    assert row.shape == (1, 2624) and row.sum() == 0


def test_mh_hand_vector_1728_line():
    # the classic full fax line: make-up 1728 (010011011) + term 0
    row = decode_ccitt(
        _bits_to_bytes("010011011" + "00110101"), 1728, 1, mode="mh"
    )
    assert row.sum() == 0


def test_g4_hand_vector_two_rows():
    # 8-px rows [wwbbwwww] twice. Row 0 vs all-white ref: H(001)+w2(0111)
    # +b2(11), then V0(1). Row 1 vs row 0: V0 V0 V0. Total 13 bits.
    data = _bits_to_bytes("001" + "0111" + "11" + "1" + "111")
    out = decode_ccitt(data, 8, 2, mode="g4")
    want = [0, 0, 1, 1, 0, 0, 0, 0]
    assert out.tolist() == [want, want]


def test_g3_eol_and_tag_bits():
    # G3 2-D stream: EOL(000000000001) + tag 1 (1-D line) + 8 white
    # (10011 is w8) then EOL + tag 0 (2-D line) + V0 x1 (line has no
    # transitions, one V0 at b1=8 terminates... a 2-D all-white line
    # against an all-white ref is a single V0 at position 8? No: b1=8,
    # V0 puts a transition at 8 == width -> line done, transition dropped.
    bits = "000000000001" + "1" + "10011" + "000000000001" + "0" + "1"
    out = decode_ccitt(_bits_to_bytes(bits), 8, 2, mode="g3_2d", expect_eol=True)
    assert out.sum() == 0 and out.shape == (2, 8)


# ------------------------------------------------------------ round-trips

@pytest.mark.parametrize(
    "mode,kw",
    [
        ("mh", dict(byte_align=True)),
        ("mh", dict(eol=True)),
        ("g3_2d", dict(eol=True)),
        ("g3_2d", dict(eol=False)),
        ("g4", dict()),
    ],
)
def test_round_trip_structured_and_random(mode, kw):
    rng = np.random.RandomState(11)
    imgs = [
        np.zeros((5, 64), np.uint8),
        np.ones((5, 64), np.uint8),
        (rng.rand(23, 131) < 0.4).astype(np.uint8),
    ]
    grid = np.zeros((40, 100), np.uint8)
    grid[::8, :] = 1
    grid[:, ::10] = 1
    imgs.append(grid)
    for img in imgs:
        h, w = img.shape
        enc = encode_ccitt(img, mode=mode, **kw)
        dec = decode_ccitt(
            enc, w, h, mode=mode,
            byte_align=kw.get("byte_align", False),
            expect_eol=kw.get("eol", False),
        )
        assert np.array_equal(dec, img)


def test_round_trip_single_column_and_row():
    for shape in [(1, 1), (1, 7), (9, 1)]:
        img = np.ones(shape, np.uint8)
        for mode in ("mh", "g4"):
            enc = encode_ccitt(img, mode=mode)
            assert np.array_equal(
                decode_ccitt(enc, shape[1], shape[0], mode=mode), img
            )


# ------------------------------------------------------------- TIFF layer

def _test_rgb():
    img = np.full((57, 181, 3), 255, np.uint8)
    img[5:12, :, :] = 0
    img[:, 40:43, :] = 0
    img[30:50:4, 10:170, :] = 0
    return img


@pytest.mark.parametrize(
    "comp,kw",
    [
        (2, {}),
        (3, {}),
        (3, {"two_d": True}),
        (4, {}),
        (4, {"rows_per_strip": 16}),
        (4, {"fill_order": 2}),
        (3, {"two_d": True, "rows_per_strip": 10}),
    ],
)
def test_tiff_ccitt_round_trip(comp, kw):
    img = _test_rgb()
    out = decode_tiff(encode_tiff_ccitt(img, compression=comp, **kw))
    want = np.where(img.astype(np.uint16).sum(2) // 3 < 128, 0, 255)
    assert np.array_equal(out[:, :, 0], want)
    assert np.array_equal(out[:, :, 0], out[:, :, 1])


def test_tiff_ccitt_matches_uncompressed_bilevel():
    """CCITT G4 decode must be pixel-identical to the already-proven
    bilevel tiled-TIFF decode of the same image (golden-twin check)."""
    from img2table_spark.kernels.encoders import encode_tiff_tiled_bilevel

    img = _test_rgb()
    a = decode_tiff(encode_tiff_ccitt(img, compression=4))
    b = decode_tiff(encode_tiff_tiled_bilevel(img, 16, 16))
    assert np.array_equal(a, b)


def test_tiff_ccitt_rejects_garbage_and_truncation():
    img = _test_rgb()
    data = bytearray(encode_tiff_ccitt(img, compression=4))
    with pytest.raises(TIFFError):
        decode_tiff(bytes(data[:-25]))  # lose the strip tail
    data[-40:] = b"\x00" * 40  # zeros are an invalid 2-D mode code
    with pytest.raises(TIFFError):
        decode_tiff(bytes(data))


def test_ccitt_stream_truncation_raises():
    img = np.ones((20, 64), np.uint8)
    enc = encode_ccitt(img, mode="g4")
    with pytest.raises(CCITTError):
        decode_ccitt(enc[: len(enc) // 2], 64, 20, mode="g4")
    with pytest.raises(CCITTError):
        decode_ccitt(b"\x00" * 8, 64, 2, mode="g4")
    # all-ones IS decodable (V0 at b1=width per line -> blank rows):
    # fuzz must not assert failure on it
    assert decode_ccitt(b"\xff" * 8, 64, 2, mode="g4").sum() == 0


# -------------------------------------------------------------- PDF layer

def test_pdf_ccitt_filter_core():
    img = np.zeros((9, 40), np.uint8)
    img[2:5, 10:30] = 1
    for k in (-1, 0, 4):
        if k < 0:
            enc = encode_ccitt(img, mode="g4")
        elif k == 0:
            enc = encode_ccitt(img, mode="mh")
        else:
            enc = encode_ccitt(img, mode="g3_2d", eol=True, k=k)
        out = decode_ccitt_pdf(enc, 40, 9, k=k)
        assert np.array_equal(out, img), k


@pytest.mark.parametrize("k", [-1, 0, 4])
def test_pdf_ccitt_scanned_extraction(ref_tests, k):
    """A CCITTFaxDecode scanned PDF of the reference test image extracts
    the same two tables the DCT/Flate scanned fixtures produce."""
    from img2table_spark.kernels.pdf_doc import extract_pdf_tables_auto
    from img2table_spark.kernels.png import decode_png

    img = decode_png(
        (ref_tests / "tables/image/test_data/test.png").read_bytes()
    )
    pdf = build_ccitt_scanned_pdf(img, k=k)
    per_page, _ = extract_pdf_tables_auto(pdf, implicit_rows=True)
    shapes = sorted((t.nb_rows, t.nb_columns) for t in per_page[0])
    assert shapes == [(2, 2), (6, 3)]
