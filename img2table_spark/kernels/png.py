"""Pure-stdlib PNG decoder (S1 image decode path).

cv2 is unavailable in this environment, so payload decode is zlib + NumPy.
Supports non-interlaced 8-bit gray / gray+alpha / RGB / RGBA / palette —
the formats of the reference fixture corpus. Alpha is dropped, matching
``cv2.imread(..., IMREAD_COLOR)`` (reference loads via
src/img2table/document/image.py:25-32, cv2.imdecode + BGR→RGB).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_MAGIC = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


class PNGError(ValueError):
    pass


def _unfilter(raw: np.ndarray, height: int, stride: int, bpp: int) -> np.ndarray:
    """Undo per-scanline PNG filters. Returns (height, stride) uint8.

    Sub is vectorized per channel (mod-256 cumsum); Up/None are pure NumPy;
    Average/Paeth run as bytearray loops (sequential left-dependency) —
    plain-int arithmetic is ~4× faster than per-element ndarray indexing.
    """
    out = np.empty((height, stride), dtype=np.uint8)
    pos = 0
    prev = bytearray(stride)
    for row in range(height):
        ftype = raw[pos]
        line = raw[pos + 1 : pos + 1 + stride]
        pos += 1 + stride
        if ftype == 0:
            rec_np = line.copy()
            out[row] = rec_np
            prev = bytearray(rec_np.tobytes())
        elif ftype == 1:  # Sub: per-channel modular prefix sum
            arr = line.astype(np.uint64).reshape(-1, bpp)
            rec_np = (np.cumsum(arr, axis=0) & 0xFF).astype(np.uint8).reshape(-1)
            out[row] = rec_np
            prev = bytearray(rec_np.tobytes())
        elif ftype == 2:  # Up
            rec_np = (line.astype(np.int32) + np.frombuffer(prev, dtype=np.uint8)) & 0xFF
            rec_np = rec_np.astype(np.uint8)
            out[row] = rec_np
            prev = bytearray(rec_np.tobytes())
        elif ftype == 3:  # Average
            rec = bytearray(line.tobytes())
            p = prev
            for i in range(stride):
                left = rec[i - bpp] if i >= bpp else 0
                rec[i] = (rec[i] + ((left + p[i]) >> 1)) & 0xFF
            out[row] = np.frombuffer(rec, dtype=np.uint8)
            prev = rec
        elif ftype == 4:  # Paeth
            rec = bytearray(line.tobytes())
            p = prev
            for i in range(stride):
                if i >= bpp:
                    a = rec[i - bpp]
                    c = p[i - bpp]
                else:
                    a = c = 0
                b = p[i]
                pp = a + b - c
                pa = pp - a if pp >= a else a - pp
                pb = pp - b if pp >= b else b - pp
                pc = pp - c if pp >= c else c - pp
                if pa <= pb and pa <= pc:
                    pr = a
                elif pb <= pc:
                    pr = b
                else:
                    pr = c
                rec[i] = (rec[i] + pr) & 0xFF
            out[row] = np.frombuffer(rec, dtype=np.uint8)
            prev = rec
        else:
            raise PNGError(f"unknown filter type {ftype}")
    return out


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → RGB uint8 (H, W, 3)."""
    if data[:8] != _MAGIC:
        raise PNGError("not a PNG file")

    width = height = None
    bit_depth = color_type = interlace = None
    palette = None
    idat = bytearray()

    pos = 8
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        chunk = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", chunk
            )
        elif ctype == b"PLTE":
            palette = np.frombuffer(chunk, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.extend(chunk)
        elif ctype == b"IEND":
            break

    if width is None:
        raise PNGError("missing IHDR")
    if interlace != 0:
        raise PNGError("interlaced PNG not supported")
    if color_type not in _CHANNELS:
        raise PNGError(f"unsupported color type {color_type}")
    if bit_depth != 8 and not (color_type in (0, 3) and bit_depth in (1, 2, 4)):
        raise PNGError(f"unsupported bit depth {bit_depth}")

    channels = _CHANNELS[color_type]
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)

    if bit_depth == 8:
        stride = width * channels
        bpp = channels
        arr = _unfilter(raw, height, stride, bpp).reshape(height, width, channels)
    else:
        # sub-byte gray/palette: 1 byte-per-pixel after unpacking
        stride = (width * bit_depth + 7) // 8
        rows = _unfilter(raw, height, stride, 1)
        bits = np.unpackbits(rows, axis=1)[:, : width * bit_depth]
        bits = bits.reshape(height, width, bit_depth)
        weights = (1 << np.arange(bit_depth - 1, -1, -1)).astype(np.uint8)
        vals = (bits * weights).sum(axis=2).astype(np.uint8)
        if color_type == 0:  # scale gray to 8-bit
            vals = (vals * (255 // ((1 << bit_depth) - 1))).astype(np.uint8)
        arr = vals[:, :, None]

    if color_type == 0:
        return np.repeat(arr, 3, axis=2)
    if color_type == 2:
        return np.ascontiguousarray(arr)
    if color_type == 3:
        if palette is None:
            raise PNGError("palette image without PLTE")
        return palette[arr[:, :, 0]]
    if color_type == 4:
        return np.repeat(arr[:, :, :1], 3, axis=2)
    return np.ascontiguousarray(arr[:, :, :3])  # RGBA → RGB
