"""Pure-stdlib BMP decoder (S1 image decode path).

The reference accepts any format cv2.imdecode reads (reference
document/image.py:25-32; README lists bmp among supported inputs). Windows
BMP: BITMAPINFOHEADER (or larger), bottom-up or top-down rows padded to 4
bytes. Supported: 1/4/8-bit palette, 16-bit (555/565 via BITFIELDS), 24-bit
BGR, 32-bit BGRA/BITFIELDS, BI_RGB and BI_BITFIELDS. RLE compression is
rejected loudly (not used by scanners/exporters for document images).
"""

from __future__ import annotations

import struct

import numpy as np


class BMPError(ValueError):
    pass


def _mask_shift(mask: int) -> tuple[int, int]:
    """(shift, width) of a contiguous channel bitmask."""
    if mask == 0:
        return 0, 0
    shift = (mask & -mask).bit_length() - 1
    width = (mask >> shift).bit_length()
    return shift, width


def decode_bmp(data: bytes) -> np.ndarray:
    """BMP bytes → RGB uint8 (H, W, 3)."""
    if data[:2] != b"BM" or len(data) < 54:
        raise BMPError("not a BMP")
    pix_off = struct.unpack_from("<I", data, 10)[0]
    hdr_size = struct.unpack_from("<I", data, 14)[0]
    if hdr_size < 40:
        raise BMPError(f"unsupported header size {hdr_size} (OS/2 core)")
    w, h_raw = struct.unpack_from("<ii", data, 18)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    compression = struct.unpack_from("<I", data, 30)[0]
    n_colors = struct.unpack_from("<I", data, 46)[0]
    if w <= 0 or h_raw == 0:
        raise BMPError("bad dimensions")
    top_down = h_raw < 0
    h = abs(h_raw)
    if compression not in (0, 3):  # BI_RGB / BI_BITFIELDS
        raise BMPError(f"unsupported BMP compression {compression}")

    masks = None
    if compression == 3:
        if bpp not in (16, 32):
            raise BMPError("BITFIELDS requires 16/32 bpp")
        masks = struct.unpack_from("<III", data, 14 + 40)

    row_bytes = (w * bpp + 7) // 8
    stride = (row_bytes + 3) & ~3
    need = stride * h
    pix = data[pix_off : pix_off + need]
    if len(pix) < need:
        raise BMPError("truncated pixel data")
    rows = np.frombuffer(pix, dtype=np.uint8).reshape(h, stride)[:, :row_bytes]
    if not top_down:
        rows = rows[::-1]

    if bpp in (1, 4, 8):
        pal_n = n_colors or (1 << bpp)
        pal_off = 14 + hdr_size
        pal = np.frombuffer(data[pal_off : pal_off + 4 * pal_n], dtype=np.uint8)
        if len(pal) < 4 * pal_n:
            raise BMPError("truncated palette")
        pal = pal.reshape(-1, 4)[:, [2, 1, 0]]  # BGRA quads → RGB
        if bpp == 8:
            idx = rows[:, :w]
        elif bpp == 4:
            hi = rows >> 4
            lo = rows & 15
            idx = np.empty((h, rows.shape[1] * 2), dtype=np.uint8)
            idx[:, 0::2] = hi
            idx[:, 1::2] = lo
            idx = idx[:, :w]
        else:  # 1-bit
            bits = np.unpackbits(rows, axis=1)
            idx = bits[:, :w]
        return np.ascontiguousarray(pal[np.clip(idx, 0, pal_n - 1)])

    if bpp == 16:
        v = rows[:, : w * 2].reshape(h, w, 2)
        u16 = v[:, :, 0].astype(np.uint32) | (v[:, :, 1].astype(np.uint32) << 8)
        rm, gm, bm = masks if masks else (0x7C00, 0x03E0, 0x001F)
        out = np.empty((h, w, 3), dtype=np.uint8)
        for ch, m in enumerate((rm, gm, bm)):
            sh, wd = _mask_shift(m)
            if wd == 0:
                out[:, :, ch] = 0
                continue
            raw = (u16 >> sh) & ((1 << wd) - 1)
            out[:, :, ch] = (raw * 255 // ((1 << wd) - 1)).astype(np.uint8)
        return out

    if bpp == 24:
        v = rows[:, : w * 3].reshape(h, w, 3)
        return np.ascontiguousarray(v[:, :, ::-1])  # BGR → RGB

    if bpp == 32:
        v = rows[:, : w * 4].reshape(h, w, 4)
        if masks:
            u32 = (
                v[:, :, 0].astype(np.uint32)
                | (v[:, :, 1].astype(np.uint32) << 8)
                | (v[:, :, 2].astype(np.uint32) << 16)
                | (v[:, :, 3].astype(np.uint32) << 24)
            )
            out = np.empty((h, w, 3), dtype=np.uint8)
            for ch, m in enumerate(masks):
                sh, wd = _mask_shift(m)
                if wd == 0:
                    out[:, :, ch] = 0
                    continue
                raw = (u32 >> sh) & ((1 << wd) - 1)
                scale = (1 << wd) - 1
                out[:, :, ch] = (raw * 255 // scale).astype(np.uint8) if wd != 8 else raw.astype(np.uint8)
            return out
        return np.ascontiguousarray(v[:, :, [2, 1, 0]])  # BGRX → RGB

    raise BMPError(f"unsupported bpp {bpp}")
