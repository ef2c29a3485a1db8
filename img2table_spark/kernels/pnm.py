"""Pure-stdlib decoders for the simple raster formats on the reference's
cv2.imdecode input list (reference README.md: pbm/pgm/ppm/pnm, *.pfm, Sun
rasters). Each is a header + raw samples — no entropy coding.
"""

from __future__ import annotations

import re
import struct

import numpy as np


class PNMError(ValueError):
    pass


def _pnm_header(data: bytes, n_fields: int) -> tuple[list[int], int]:
    """Parse whitespace/comment-separated integer header fields after the
    magic; returns (fields, offset of raster data)."""
    fields: list[int] = []
    i = 2
    n = len(data)
    while len(fields) < n_fields and i < n:
        c = data[i : i + 1]
        if c.isspace():
            i += 1
            continue
        if c == b"#":
            while i < n and data[i] not in (0x0A, 0x0D):
                i += 1
            continue
        m = re.match(rb"\d+", data[i:])
        if not m:
            raise PNMError("bad PNM header")
        fields.append(int(m.group(0)))
        i += m.end()
    if len(fields) < n_fields:
        raise PNMError("truncated PNM header")
    # exactly one whitespace byte separates header from raster
    return fields, i + 1


def decode_pnm(data: bytes) -> np.ndarray:
    """P1-P6 (bitmap/graymap/pixmap, ASCII and binary) → RGB uint8."""
    magic = data[:2]
    if magic not in (b"P1", b"P2", b"P3", b"P4", b"P5", b"P6"):
        raise PNMError("not a PNM")
    kind = magic[1] - 0x30
    bitmap = kind in (1, 4)
    n_fields = 2 if bitmap else 3
    fields, off = _pnm_header(data, n_fields)
    w, h = fields[0], fields[1]
    maxval = 1 if bitmap else fields[2]
    if w <= 0 or h <= 0 or maxval <= 0 or maxval > 65535:
        raise PNMError("bad PNM dimensions")
    channels = 3 if kind in (3, 6) else 1

    if kind in (1, 2, 3):  # ASCII
        toks = data[off - 1 :].split()
        need = w * h * channels
        if len(toks) < need:
            raise PNMError("truncated ASCII PNM")
        arr = np.array([int(t) for t in toks[:need]], dtype=np.int64)
    elif kind == 4:  # packed bits
        row_bytes = (w + 7) // 8
        raw = np.frombuffer(data[off : off + row_bytes * h], dtype=np.uint8)
        if len(raw) < row_bytes * h:
            raise PNMError("truncated P4")
        arr = np.unpackbits(raw.reshape(h, row_bytes), axis=1)[:, :w].reshape(-1).astype(np.int64)
    else:  # P5/P6 binary
        sample = np.uint8 if maxval < 256 else np.dtype(">u2")
        need = w * h * channels
        raw = np.frombuffer(data, dtype=sample, count=need, offset=off)
        if raw.size < need:
            raise PNMError("truncated binary PNM")
        arr = raw.astype(np.int64)

    if kind in (1, 4):  # bitmap: 1 = black
        px = np.where(arr == 0, 255, 0).astype(np.uint8)
    elif maxval == 255:
        px = arr.astype(np.uint8)
    else:
        px = (arr * 255 // maxval).astype(np.uint8)
    img = px.reshape(h, w, channels)
    if channels == 1:
        img = np.repeat(img, 3, axis=2)
    return np.ascontiguousarray(img)


def decode_pfm(data: bytes) -> np.ndarray:
    """PF/Pf float maps → RGB uint8 (values clipped to [0,1] then scaled,
    matching cv2's convert-on-read for display use)."""
    if data[:2] not in (b"PF", b"Pf"):
        raise PNMError("not a PFM")
    color = data[:2] == b"PF"
    parts = data.split(b"\n", 3)
    if len(parts) < 4:
        # headers may be space-separated on fewer lines
        raise PNMError("bad PFM header")
    w, h = (int(v) for v in parts[1].split())
    scale = float(parts[2])
    endian = "<" if scale < 0 else ">"
    ch = 3 if color else 1
    need = w * h * ch
    raw = np.frombuffer(parts[3], dtype=np.dtype(endian + "f4"), count=need)
    if raw.size < need:
        raise PNMError("truncated PFM")
    img = raw.reshape(h, w, ch)[::-1]  # PFM rows are bottom-up
    u8 = np.clip(np.rint(np.clip(img, 0.0, 1.0) * 255.0), 0, 255).astype(np.uint8)
    if ch == 1:
        u8 = np.repeat(u8, 3, axis=2)
    return np.ascontiguousarray(u8)


_SUN_MAGIC = 0x59A66A95


def decode_sun_raster(data: bytes) -> np.ndarray:
    """Sun raster (*.sr, *.ras): 8 big-endian int32 header words; supports
    depth 1/8/24, RT_OLD/RT_STANDARD (uncompressed) and RT_BYTE_ENCODED
    (RLE), optional RGB colormap; rows padded to 16 bits."""
    if len(data) < 32 or struct.unpack(">I", data[:4])[0] != _SUN_MAGIC:
        raise PNMError("not a Sun raster")
    w, h, depth, _length, rtype, maptype, maplen = struct.unpack(">7i", data[4:32])
    if w <= 0 or h <= 0:
        raise PNMError("bad Sun raster dimensions")
    if rtype not in (0, 1, 2):
        raise PNMError(f"unsupported Sun raster type {rtype}")
    off = 32
    cmap = None
    if maptype == 1 and maplen:
        pal = np.frombuffer(data[off : off + maplen], dtype=np.uint8)
        n = maplen // 3
        cmap = pal.reshape(3, n).T  # RGB planes
    off += maplen
    raw = data[off:]
    if rtype == 2:  # RT_BYTE_ENCODED: 0x80 <count> <value>, count 0 = literal 0x80
        out = bytearray()
        i = 0
        while i < len(raw):
            b = raw[i]
            if b == 0x80:
                cnt = raw[i + 1] if i + 1 < len(raw) else 0
                if cnt == 0:
                    out.append(0x80)
                    i += 2
                else:
                    out += bytes([raw[i + 2]]) * (cnt + 1)
                    i += 3
            else:
                out.append(b)
                i += 1
        raw = bytes(out)
    stride = ((w * depth + 15) // 16) * 2
    need = stride * h
    if len(raw) < need:
        raise PNMError("truncated Sun raster")
    rows = np.frombuffer(raw[:need], dtype=np.uint8).reshape(h, stride)
    if depth == 1:
        bits = np.unpackbits(rows, axis=1)[:, :w]
        g = np.where(bits == 0, 255, 0).astype(np.uint8)  # 1 = black
        return np.repeat(g[:, :, None], 3, axis=2)
    if depth == 8:
        idx = rows[:, :w]
        if cmap is not None:
            return np.ascontiguousarray(cmap[idx])
        return np.repeat(idx[:, :, None], 3, axis=2)
    if depth == 24:
        v = rows[:, : w * 3].reshape(h, w, 3)
        return np.ascontiguousarray(v[:, :, ::-1])  # BGR order on disk
    raise PNMError(f"unsupported Sun raster depth {depth}")
