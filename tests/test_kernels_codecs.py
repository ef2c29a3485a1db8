"""BMP / TIFF / progressive-JPEG codecs: round-trip the reference's test.png
pixels through hand-built encodings (kernels/encoders.py — written from the
format specs independently of the decoders) and assert (a) pixel recovery
and (b) the full pixel pipeline extracts the same golden tables as the PNG
twin (reference accepts these via cv2.imdecode, document/image.py:25-32)."""

import struct

import numpy as np
import pytest

from img2table_spark.kernels.bmp import decode_bmp
from img2table_spark.kernels.encoders import (
    encode_bmp8_gray_topdown,
    encode_bmp24,
    encode_jpeg_progressive,
    encode_tiff,
    rgb_to_quantized_blocks,
)
from img2table_spark.kernels.image_doc import decode_image_bytes
from img2table_spark.kernels.jpeg import ZIGZAG, _reconstruct, decode_jpeg
from img2table_spark.kernels.png import decode_png
from img2table_spark.kernels.tiff import decode_tiff


@pytest.fixture(scope="module")
def test_img(ref_tests):
    with open(ref_tests / "tables/image/test_data/test.png", "rb") as f:
        return decode_png(f.read())


# -------------------------------------------------------------------- pixels

def test_bmp24_roundtrip(test_img):
    assert np.array_equal(decode_bmp(encode_bmp24(test_img)), test_img)


def test_bmp8_palette_topdown_roundtrip(test_img):
    got = decode_bmp(encode_bmp8_gray_topdown(test_img))
    want = np.repeat(test_img[:, :, :1], 3, axis=2)
    assert np.array_equal(got, want)


@pytest.mark.parametrize(
    "compression,predictor,rps",
    [(1, 1, None), (5, 1, None), (5, 2, 64), (8, 2, None), (32773, 1, 100)],
    ids=["none", "lzw", "lzw-predictor-strips", "deflate-predictor", "packbits-strips"],
)
def test_tiff_roundtrip(test_img, compression, predictor, rps):
    data = encode_tiff(test_img, compression=compression, predictor=predictor,
                       rows_per_strip=rps)
    assert np.array_equal(decode_tiff(data), test_img)


def test_tiff_bilevel():
    g = np.zeros((10, 13), dtype=np.uint8)
    g[2:5, 3:9] = 1
    row_bytes = (13 + 7) // 8
    packed = np.packbits(np.pad(g, ((0, 0), (0, row_bytes * 8 - 13))), axis=1)
    out = bytearray(struct.pack("<2sHI", b"II", 42, 8))
    tags = [(256, 3, 1, 13), (257, 3, 1, 10), (258, 3, 1, 1), (259, 3, 1, 1),
            (262, 3, 1, 1), (273, 4, 1, 0), (277, 3, 1, 1), (279, 4, 1, row_bytes * 10)]
    strip_off = 8 + 2 + len(tags) * 12 + 4
    out += struct.pack("<H", len(tags))
    for tag, typ, cnt, val in tags:
        if tag == 273:
            val = strip_off
        out += struct.pack("<HHII", tag, typ, cnt, val)
    out += struct.pack("<I", 0)
    out += packed.tobytes()
    got = decode_tiff(bytes(out))
    assert got.shape == (10, 13, 3)
    assert np.array_equal(got[:, :, 0] == 255, g == 1)  # BlackIsZero: bit 1 = white


# --------------------------------------------------------- progressive JPEG

def test_progressive_jpeg_exact_coefficient_recovery(test_img):
    """Progressive decode must reproduce EXACTLY the pixels that the shared
    reconstruction tail produces from the encoder's own quantized
    coefficients — i.e. every scan mode (DC first/refine, AC first/refine
    with successive approximation) recovered every coefficient bit."""
    img = test_img[:120, :200]  # keep the pure-Python entropy loops fast
    qtable = np.full(64, 2, dtype=np.int32)
    comps_zz, geo = rgb_to_quantized_blocks(img, qtable)
    spec = [{"h": 1, "v": 1, "tq": 0} for _ in range(3)]
    want = _reconstruct(
        spec, comps_zz, {0: qtable[ZIGZAG]}, img.shape[1], img.shape[0],
        geo["mcux"], geo["mcuy"], 1, 1,
    )
    got = decode_jpeg(encode_jpeg_progressive(img, qval=2))
    assert np.array_equal(got, want)


def test_progressive_jpeg_subsampled_exact(test_img):
    """2×2-chroma-subsampled progressive (the real-world layout): exercises
    the decoder's interleaved multi-block MCU path (4 Y + Cb + Cr per MCU)
    and the per-component non-interleaved AC grids. Pixel-exact vs direct
    reconstruction of the emitted coefficients (pad blocks DC-only, as the
    scan script leaves them)."""
    from img2table_spark.kernels.encoders import zero_uncovered_ac

    img = test_img[:121, :201]  # odd sizes → pad blocks on both axes
    qtable = np.full(64, 2, dtype=np.int32)
    comps_zz, geo = rgb_to_quantized_blocks(img, qtable, subsample=True)
    spec = [
        {"h": fh, "v": fv, "tq": 0} for (fh, fv) in geo["factors"]
    ]
    want = _reconstruct(
        spec, zero_uncovered_ac(comps_zz, geo), {0: qtable[ZIGZAG]},
        img.shape[1], img.shape[0], geo["mcux"], geo["mcuy"],
        geo["hmax"], geo["vmax"],
    )
    got = decode_jpeg(encode_jpeg_progressive(img, qval=2, subsample=True))
    assert np.array_equal(got, want)


def test_progressive_jpeg_close_to_source(test_img):
    """qval=2 quantization keeps the decode within a few levels of the
    source image (sanity that the whole transform chain is coherent)."""
    img = test_img[:120, :200]
    got = decode_jpeg(encode_jpeg_progressive(img, qval=2))
    diff = np.abs(got.astype(np.int32) - img.astype(np.int32))
    assert float(np.mean(diff)) < 2.0 and int(diff.max()) <= 40


# ------------------------------------------------------- pipeline extraction

def _golden_tables(img):
    from img2table_spark.kernels.document import extract_image_tables

    return sorted(
        ((tb.x1, tb.y1, tb.x2, tb.y2), (tb.nb_rows, tb.nb_columns))
        for tb in extract_image_tables(img, implicit_rows=True)
    )


GOLDEN = [((36, 21, 770, 327), (6, 3)), ((962, 21, 1154, 123), (2, 2))]


def test_bmp_tiff_extract_same_golden_tables(test_img):
    assert _golden_tables(decode_image_bytes(encode_bmp24(test_img))) == GOLDEN
    assert _golden_tables(
        decode_image_bytes(encode_tiff(test_img, compression=5, predictor=2, rows_per_strip=64))
    ) == GOLDEN


def test_progressive_jpeg_extracts_same_golden_tables(test_img):
    data = encode_jpeg_progressive(test_img, qval=2)
    assert _golden_tables(decode_image_bytes(data)) == GOLDEN


@pytest.mark.parametrize(
    "compression,predictor",
    [(1, 1), (5, 2), (8, 2), (32773, 1)],
    ids=["none", "lzw-predictor", "deflate-predictor", "packbits"],
)
def test_tiff_tiled_roundtrip(test_img, compression, predictor):
    """TIFF 6.0 §15 tiled layout (TileWidth/TileLength/TileOffsets/
    TileByteCounts), edge tiles padded to full size."""
    from img2table_spark.kernels.encoders import encode_tiff_tiled

    data = encode_tiff_tiled(test_img, 64, 64, compression=compression,
                             predictor=predictor)
    assert np.array_equal(decode_tiff(data), test_img)


def test_tiff_tiled_edge_padding(test_img):
    crop = test_img[:101, :333]
    from img2table_spark.kernels.encoders import encode_tiff_tiled

    data = encode_tiff_tiled(crop, 48, 32, compression=5, predictor=2)
    assert np.array_equal(decode_tiff(data), crop)


@pytest.mark.parametrize("external_tables", [False, True], ids=["inline", "jpegtables"])
def test_tiff_jpeg_strips(test_img, external_tables):
    """New-style JPEG-in-TIFF (compression 7, TTN2): strips are independent
    JPEG streams, optionally abbreviated with shared DQT hoisted into the
    JPEGTables tag. Expected = per-strip JPEG decodes assembled."""
    from img2table_spark.kernels.encoders import encode_tiff_jpeg

    want = np.zeros_like(test_img)
    h, w, _ = test_img.shape
    y = 0
    while y < h:
        blk = np.ascontiguousarray(test_img[y : y + 64])
        dec = decode_jpeg(encode_jpeg_progressive(blk, qval=2))
        want[y : y + blk.shape[0]] = dec[: blk.shape[0], :w]
        y += 64
    data = encode_tiff_jpeg(test_img, rows_per_strip=64,
                            external_tables=external_tables)
    assert np.array_equal(decode_tiff(data), want)


def test_tiff_jpeg_tiled(test_img):
    from img2table_spark.kernels.encoders import encode_tiff_jpeg

    h, w, _ = test_img.shape
    want = np.zeros_like(test_img)
    for ty in range((h + 63) // 64):
        for tx in range((w + 63) // 64):
            block = np.zeros((64, 64, 3), np.uint8)
            part = test_img[ty * 64 : (ty + 1) * 64, tx * 64 : (tx + 1) * 64]
            block[: part.shape[0], : part.shape[1]] = part
            dec = decode_jpeg(encode_jpeg_progressive(block, qval=2))
            want[ty * 64 : ty * 64 + part.shape[0],
                 tx * 64 : tx * 64 + part.shape[1]] = dec[: part.shape[0],
                                                          : part.shape[1]]
    data = encode_tiff_jpeg(test_img, tile=(64, 64), external_tables=True)
    assert np.array_equal(decode_tiff(data), want)


@pytest.mark.parametrize("compression", [1, 5, 8, 32773],
                         ids=["none", "lzw", "deflate", "packbits"])
@pytest.mark.parametrize("photometric", [0, 1], ids=["white0", "black0"])
def test_tiff_tiled_bilevel_roundtrip(compression, photometric):
    from img2table_spark.kernels.encoders import encode_tiff_tiled_bilevel

    rng = np.random.RandomState(9)
    img = (rng.randint(0, 2, (70, 90, 1)) * 255).astype(np.uint8).repeat(3, axis=2)
    data = encode_tiff_tiled_bilevel(img, 64, 64, compression=compression,
                                     photometric=photometric)
    assert np.array_equal(decode_tiff(data), img)


def test_tiff_tiled_bilevel_rejects_bad_tile_width():
    from img2table_spark.kernels.encoders import encode_tiff_tiled_bilevel

    img = np.zeros((32, 32, 3), np.uint8)
    data = bytearray(encode_tiff_tiled_bilevel(img, 64, 64))
    # corrupt TileWidth (tag 322) to a non-multiple of 16
    idx = data.find(struct.pack("<HHII", 322, 3, 1, 64))
    data[idx + 8 : idx + 12] = struct.pack("<I", 60)
    with pytest.raises(Exception):
        decode_tiff(bytes(data))


def test_tiff_jpeg_oldstyle_decodes_like_bare_stream(test_img):
    from img2table_spark.kernels.encoders import encode_tiff_jpeg_oldstyle

    via_tiff = decode_tiff(encode_tiff_jpeg_oldstyle(test_img))
    direct = decode_jpeg(encode_jpeg_progressive(test_img, qval=2))
    assert np.array_equal(via_tiff, direct)


def test_tiff_jpeg_oldstyle_extracts_golden_tables(test_img):
    from img2table_spark.kernels.encoders import encode_tiff_jpeg_oldstyle

    assert _golden_tables(decode_image_bytes(encode_tiff_jpeg_oldstyle(test_img))) == GOLDEN


def test_tiff_jpeg_oldstyle_rejects_tables_pointer_variant(test_img):
    from img2table_spark.kernels.encoders import encode_tiff_jpeg_oldstyle
    from img2table_spark.kernels.tiff import TIFFError

    data = bytearray(encode_tiff_jpeg_oldstyle(test_img))
    # strip the JPEGInterchangeFormat tag (513) -> the ambiguous variant
    idx = data.find(struct.pack("<HH", 513, 4))
    del data[idx : idx + 12]
    struct.pack_into("<H", data, 8, struct.unpack_from("<H", data, 8)[0] - 1)
    with pytest.raises(TIFFError, match="old-style"):
        decode_tiff(bytes(data))
