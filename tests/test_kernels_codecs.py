"""BMP / TIFF decoders: round-trip the reference's test.png pixels through
hand-built encodings and assert (a) exact pixel recovery and (b) the full
pixel pipeline extracts the same golden tables as the PNG twin
(reference accepts these via cv2.imdecode, document/image.py:25-32)."""

import struct
import zlib

import numpy as np
import pytest

from img2table_spark.kernels.bmp import decode_bmp
from img2table_spark.kernels.image_doc import decode_image_bytes
from img2table_spark.kernels.png import decode_png
from img2table_spark.kernels.tiff import decode_tiff


@pytest.fixture(scope="module")
def test_img(ref_tests):
    with open(ref_tests / "tables/image/test_data/test.png", "rb") as f:
        return decode_png(f.read())


# ------------------------------------------------------------------ encoders

def encode_bmp24(img: np.ndarray) -> bytes:
    h, w, _ = img.shape
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    pix = rows.tobytes()
    header = struct.pack("<2sIHHI", b"BM", 54 + len(pix), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pix), 2835, 2835, 0, 0)
    return header + info + pix


def encode_bmp8_gray_topdown(img: np.ndarray) -> bytes:
    g = img[:, :, 0]
    h, w = g.shape
    stride = (w + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :w] = g  # top-down (negative height)
    pix = rows.tobytes()
    pal = b"".join(bytes([i, i, i, 0]) for i in range(256))
    off = 54 + len(pal)
    header = struct.pack("<2sIHHI", b"BM", off + len(pix), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, -h, 1, 8, 0, len(pix), 2835, 2835, 256, 0)
    return header + info + pal + pix


def _tiff_lzw_encode(data: bytes) -> bytes:
    """Minimal TIFF-LZW compressor (early-change) for test round-trips."""
    out = bytearray()
    acc = 0
    nbits = 0
    width = 9
    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    nxt = 258

    def emit(code: int):
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8

    emit(256)
    cur = b""
    for b in data:
        cand = cur + bytes([b])
        if cand in table:
            cur = cand
            continue
        emit(table[cur])
        table[cand] = nxt
        nxt += 1
        if nxt == (1 << width) - 1 and width < 12:
            width += 1
        if nxt >= 4094:
            emit(256)
            table = {bytes([i]): i for i in range(256)}
            nxt = 258
            width = 9
        cur = bytes([b])
    if cur:
        emit(table[cur])
    emit(257)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def encode_tiff(img: np.ndarray, compression: int = 1, predictor: int = 1,
                rows_per_strip: int | None = None) -> bytes:
    h, w, _ = img.shape
    rows_per_strip = rows_per_strip or h
    strips = []
    for y0 in range(0, h, rows_per_strip):
        block = img[y0 : y0 + rows_per_strip].astype(np.uint8)
        if predictor == 2:
            block = block.astype(np.int16)
            block[:, 1:, :] = block[:, 1:, :] - block[:, :-1, :]
            block = (block % 256).astype(np.uint8)
        raw = block.tobytes()
        if compression == 5:
            raw = _tiff_lzw_encode(raw)
        elif compression == 8:
            raw = zlib.compress(raw)
        elif compression == 32773:
            raw = _packbits_encode(raw)
        strips.append(raw)

    n_strips = len(strips)
    tag_list = [
        (256, 3, 1, w), (257, 3, 1, h), (258, 3, 3, None), (259, 3, 1, compression),
        (262, 3, 1, 2), (273, 4, n_strips, None), (277, 3, 1, 3),
        (278, 3, 1, rows_per_strip), (279, 4, n_strips, None), (284, 3, 1, 1),
        (317, 3, 1, predictor),
    ]
    # layout: header(8) + IFD + extra values + strip data
    ifd_size = 2 + len(tag_list) * 12 + 4
    extra = bytearray()
    extra_base = 8 + ifd_size

    def alloc(vals, fmt):
        off = extra_base + len(extra)
        extra.extend(struct.pack("<" + fmt * len(vals), *vals))
        return off

    bps_off = alloc([8, 8, 8], "H")
    strip_data_base = extra_base + len(extra) + (4 * n_strips * 2 if n_strips > 1 else 0)
    offsets = []
    pos = strip_data_base
    for s in strips:
        offsets.append(pos)
        pos += len(s)
    counts = [len(s) for s in strips]
    if n_strips > 1:
        off_off = alloc(offsets, "I")
        cnt_off = alloc(counts, "I")
    else:
        off_off, cnt_off = offsets[0], counts[0]

    out = bytearray(struct.pack("<2sHI", b"II", 42, 8))
    out += struct.pack("<H", len(tag_list))
    for tag, typ, cnt, val in tag_list:
        if tag == 258:
            val = bps_off
        elif tag == 273:
            val = off_off
        elif tag == 279:
            val = cnt_off
        out += struct.pack("<HHII", tag, typ, cnt, val)
    out += struct.pack("<I", 0)  # next IFD
    out += extra
    for s in strips:
        out += s
    return bytes(out)


def _packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 2:
            out += bytes([257 - run, data[i]])
            i += run
        else:
            j = i + 1
            while j < n and j - i < 128 and not (j + 1 < n and data[j] == data[j + 1]):
                j += 1
            out += bytes([j - i - 1]) + data[i:j]
            i = j
    return bytes(out)


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
    g[2:5, 3:9] = 1  # black run
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


# ------------------------------------------------------- pipeline extraction

def _golden_tables(img):
    from img2table_spark.kernels.document import extract_image_tables

    return sorted(
        ((tb.x1, tb.y1, tb.x2, tb.y2), (tb.nb_rows, tb.nb_columns))
        for tb in extract_image_tables(img, implicit_rows=True)
    )


def test_bmp_tiff_extract_same_golden_tables(test_img):
    want = [((36, 21, 770, 327), (6, 3)), ((962, 21, 1154, 123), (2, 2))]
    assert _golden_tables(decode_image_bytes(encode_bmp24(test_img))) == want
    assert _golden_tables(
        decode_image_bytes(encode_tiff(test_img, compression=5, predictor=2, rows_per_strip=64))
    ) == want
