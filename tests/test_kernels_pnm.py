"""PNM / PFM / Sun-raster decoders (reference README input list): pixel
round-trips through hand-built encodings + dispatch sniffing."""

import struct

import numpy as np
import pytest

from img2table_spark.kernels.image_doc import ImageDecodeError, decode_image_bytes
from img2table_spark.kernels.pnm import decode_pfm, decode_pnm, decode_sun_raster


@pytest.fixture(scope="module")
def rgb():
    rng = np.random.RandomState(7)
    return rng.randint(0, 256, size=(21, 33, 3), dtype=np.uint8)


def test_p6_binary(rgb):
    data = b"P6\n# comment\n33 21\n255\n" + rgb.tobytes()
    assert np.array_equal(decode_pnm(data), rgb)
    assert np.array_equal(decode_image_bytes(data), rgb)


def test_p5_gray_16bit(rgb):
    g16 = rgb[:, :, 0].astype(">u2") * 257
    data = b"P5 33 21 65535\n" + g16.tobytes()
    got = decode_pnm(data)
    assert np.array_equal(got[:, :, 0], rgb[:, :, 0])


def test_p3_ascii(rgb):
    body = " ".join(str(v) for v in rgb.reshape(-1))
    data = f"P3\n33 21\n255\n{body}\n".encode()
    assert np.array_equal(decode_pnm(data), rgb)


def test_p4_p1_bitmap():
    bits = np.zeros((5, 10), dtype=np.uint8)
    bits[1:4, 2:7] = 1  # 1 = black in PBM
    packed = np.packbits(np.pad(bits, ((0, 0), (0, 6))), axis=1)
    p4 = b"P4\n10 5\n" + packed.tobytes()
    p1 = ("P1\n10 5\n" + "\n".join(" ".join(str(v) for v in row) for row in bits)).encode()
    for data in (p4, p1):
        got = decode_pnm(data)
        assert np.array_equal(got[:, :, 0] == 0, bits == 1)


def test_pfm_color(rgb):
    f = (rgb.astype(np.float32) / 255.0)[::-1]  # bottom-up rows
    data = b"PF\n33 21\n-1.0\n" + f.astype("<f4").tobytes()
    got = decode_pfm(data)
    assert np.abs(got.astype(int) - rgb.astype(int)).max() <= 1
    assert np.array_equal(decode_image_bytes(data), got)


def test_sun_raster_24(rgb):
    h, w, _ = rgb.shape
    stride = ((w * 24 + 15) // 16) * 2
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = rgb[:, :, ::-1].reshape(h, w * 3)  # BGR on disk
    hdr = struct.pack(">I7i", 0x59A66A95, w, h, 24, rows.size, 1, 0, 0)
    got = decode_sun_raster(hdr + rows.tobytes())
    assert np.array_equal(got, rgb)


def test_sun_raster_8_rle_palette():
    idx = np.tile(np.arange(7, dtype=np.uint8), (4, 1))[:, :6]  # 4x6
    h, w = idx.shape
    stride = ((w * 8 + 15) // 16) * 2
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :w] = idx
    raw = rows.tobytes()
    # RLE-encode: trivial literal encoding (0x80 escaped)
    enc = bytearray()
    for b in raw:
        if b == 0x80:
            enc += b"\x80\x00"
        else:
            enc.append(b)
    pal = np.arange(21, dtype=np.uint8)  # 7 entries x 3 planes (R..G..B)
    hdr = struct.pack(">I7i", 0x59A66A95, w, h, 8, len(enc), 2, 1, 21)
    got = decode_sun_raster(hdr + pal.tobytes() + bytes(enc))
    want = pal.reshape(3, 7).T[idx]
    assert np.array_equal(got, want)


def test_unknown_magic_is_loud():
    with pytest.raises(ImageDecodeError):
        decode_image_bytes(b"RIFF....WEBPVP8 ")
