"""OpenEXR (scanline) codec — pure stdlib (zlib) + NumPy.

The reference accepts EXR via ``cv2.imdecode`` (reference
document/image.py:25-32; README input list "*.exr"). Decoded linear floats
are mapped to display uint8 the same way as the PFM/HDR paths (clip to
[0, 1], scale 255, rint).

Coverage (OpenEXR file layout docs, public):
  - single-part scanline files, little-endian, version 2;
  - compression NONE (0), RLE (1), ZIPS (2, one line/chunk) and ZIP
    (3, 16 lines/chunk); PIZ/PXR24/B44/DWA and tiled/multi-part/deep files
    are rejected loudly;
  - channel types HALF and FLOAT (UINT rejected), x/y sampling 1;
  - channels R/G/B (alphabetical B, G, R in the file) or a single
    luminance channel (replicated to RGB).

ZIP/RLE chunks apply OpenEXR's byte transform: on decompression, delta-
reconstruct (``t[i] += t[i-1] - 128``) then de-interleave the two halves
back to alternating positions. A chunk whose stored size equals the raw
size is uncompressed verbatim (the writer's "zip didn't help" fallback).

The fixture encoder (HALF × ZIP) is written from the same public docs but
independently of the decoder; uint8 images round-trip exactly because a
half-float holds v/255 to ~2^-11 relative error — far under half a gray
level (tests/test_kernels_hdr_exr.py).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


class EXRError(ValueError):
    pass


_MAGIC = b"\x76\x2f\x31\x01"
_PIX_SIZE = {1: 2, 2: 4}  # HALF, FLOAT
_PIX_DTYPE = {1: "<f2", 2: "<f4"}
_BLOCK_LINES = {0: 1, 1: 1, 2: 1, 3: 16}
_COMP_NAMES = {4: "PIZ", 5: "PXR24", 6: "B44", 7: "B44A", 8: "DWAA", 9: "DWAB"}


def _cstr(data: bytes, pos: int) -> tuple[bytes, int]:
    end = data.index(b"\x00", pos)
    return data[pos:end], end + 1


def _parse_chlist(raw: bytes) -> list[tuple[str, int]]:
    """chlist attribute → [(name, pixel_type)] in file order."""
    chans = []
    pos = 0
    while pos < len(raw) and raw[pos] != 0:
        name, pos = _cstr(raw, pos)
        ptype, xs, ys = struct.unpack_from("<i4xii", raw, pos)
        pos += 16
        if ptype not in _PIX_SIZE:
            raise EXRError(f"unsupported EXR pixel type {ptype} (HALF/FLOAT only)")
        if xs != 1 or ys != 1:
            raise EXRError("subsampled EXR channels unsupported")
        chans.append((name.decode("latin-1"), ptype))
    return chans


def _unfilter(t: bytes) -> bytes:
    """Inverse of OpenEXR's zip/rle byte transform: delta-reconstruct, then
    de-interleave the two halves to even/odd positions."""
    arr = np.frombuffer(t, dtype=np.uint8).astype(np.int64)
    if arr.size:
        arr[1:] -= 128
        arr = np.cumsum(arr) & 0xFF
    out = np.empty(arr.size, dtype=np.uint8)
    half = (arr.size + 1) // 2
    out[0::2] = arr[:half]
    out[1::2] = arr[half:]
    return out.tobytes()


def _rle_unpack(raw: bytes, expect: int) -> bytes:
    out = bytearray()
    i, n = 0, len(raw)
    while i < n and len(out) < expect:
        cnt = struct.unpack_from("<b", raw, i)[0]
        i += 1
        if cnt < 0:  # -cnt literal bytes
            out += raw[i : i - cnt]
            i -= cnt
        else:  # cnt+1 copies of next byte
            if i >= n:
                raise EXRError("truncated EXR RLE")
            out += bytes([raw[i]]) * (cnt + 1)
            i += 1
    if len(out) != expect:
        raise EXRError("EXR RLE size mismatch")
    return bytes(out)


def decode_exr(data: bytes) -> np.ndarray:
    """Scanline OpenEXR → RGB uint8 (display mapping, module docstring)."""
    if data[:4] != _MAGIC:
        raise EXRError("not an EXR file")
    version = struct.unpack_from("<I", data, 4)[0]
    if version & 0xFF != 2:
        raise EXRError(f"unsupported EXR version {version & 0xFF}")
    if version & 0x200:
        raise EXRError("tiled EXR unsupported (scanline only)")
    if version & 0x1000 or version & 0x800:
        raise EXRError("multi-part/deep EXR unsupported")

    pos = 8
    attrs: dict[str, bytes] = {}
    while True:
        name, pos = _cstr(data, pos)
        if name == b"":
            break
        _typ, pos = _cstr(data, pos)
        size = struct.unpack_from("<I", data, pos)[0]
        pos += 4
        attrs[name.decode("latin-1")] = data[pos : pos + size]
        pos += size

    for req in ("channels", "compression", "dataWindow"):
        if req not in attrs:
            raise EXRError(f"EXR header missing {req}")
    comp = attrs["compression"][0]
    if comp not in _BLOCK_LINES:
        raise EXRError(
            f"unsupported EXR compression {_COMP_NAMES.get(comp, comp)} "
            "(NONE/RLE/ZIPS/ZIP only)"
        )
    if "lineOrder" in attrs and attrs["lineOrder"][0] != 0:
        raise EXRError("only increasing-Y EXR line order supported")
    xmin, ymin, xmax, ymax = struct.unpack("<4i", attrs["dataWindow"][:16])
    w, h = xmax - xmin + 1, ymax - ymin + 1
    if w <= 0 or h <= 0 or w * h > 1 << 28:
        raise EXRError("bad EXR data window")
    chans = _parse_chlist(attrs["channels"])
    if not chans:
        raise EXRError("EXR with no channels")

    block_lines = _BLOCK_LINES[comp]
    n_blocks = (h + block_lines - 1) // block_lines
    pos += 8 * n_blocks  # skip the scanline offset table; chunks follow in order

    row_bytes = sum(w * _PIX_SIZE[pt] for _, pt in chans)
    planes = {name: np.empty((h, w), dtype=np.float32) for name, _ in chans}
    for b in range(n_blocks):
        if pos + 8 > len(data):
            raise EXRError("truncated EXR chunk table")
        y0, size = struct.unpack_from("<iI", data, pos)
        pos += 8
        y0 -= ymin
        lines = min(block_lines, h - y0)
        expect = row_bytes * lines
        raw = data[pos : pos + size]
        if len(raw) < size:
            raise EXRError("truncated EXR chunk")
        pos += size
        if size == expect:  # stored uncompressed
            block = raw
        elif comp in (2, 3):
            block = _unfilter(zlib.decompress(raw))
        elif comp == 1:
            block = _unfilter(_rle_unpack(raw, expect))
        else:  # comp == 0 with short data
            raise EXRError("EXR chunk size mismatch")
        if len(block) != expect:
            raise EXRError("EXR chunk decodes to wrong size")
        off = 0
        for ln in range(lines):
            for name, pt in chans:
                nb = w * _PIX_SIZE[pt]
                planes[name][y0 + ln] = np.frombuffer(
                    block, dtype=np.dtype(_PIX_DTYPE[pt]), count=w, offset=off
                ).astype(np.float32)
                off += nb

    names = {n for n, _ in chans}
    if {"R", "G", "B"} <= names:
        img = np.stack([planes["R"], planes["G"], planes["B"]], axis=-1)
    elif len(chans) == 1:
        only = chans[0][0]
        img = np.repeat(planes[only][:, :, None], 3, axis=2)
    else:
        raise EXRError(f"unsupported EXR channel set {sorted(names)}")
    return np.ascontiguousarray(
        np.clip(np.rint(np.clip(img, 0.0, 1.0) * 255.0), 0, 255).astype(np.uint8)
    )


# ------------------------------------------------------------- fixture side


def _filter(t: bytes) -> bytes:
    """Forward zip/rle byte transform (interleave-split, then delta)."""
    arr = np.frombuffer(t, dtype=np.uint8)
    half = (arr.size + 1) // 2
    re = np.empty(arr.size, dtype=np.uint8)
    re[:half] = arr[0::2]
    re[half:] = arr[1::2]
    d = re.astype(np.int16)
    d[1:] = d[1:] - d[:-1] + 128
    return (d & 0xFF).astype(np.uint8).tobytes()


def _attr(name: str, typ: str, payload: bytes) -> bytes:
    return name.encode() + b"\x00" + typ.encode() + b"\x00" + struct.pack("<I", len(payload)) + payload


def encode_exr(img: np.ndarray, compression: int = 3) -> bytes:
    """RGB uint8 → scanline EXR (HALF channels B/G/R, ZIP by default)."""
    if img.ndim != 3 or img.shape[2] != 3:
        raise EXRError("encode_exr expects (h, w, 3) uint8")
    if compression not in (0, 1, 2, 3):
        raise EXRError("encode_exr: NONE/RLE/ZIPS/ZIP only")
    h, w = img.shape[:2]
    half = (img.astype(np.float32) / np.float32(255.0)).astype("<f2")

    chdata = b""
    for name in ("B", "G", "R"):
        chdata += name.encode() + b"\x00" + struct.pack("<i4xii", 1, 1, 1)
    chdata += b"\x00"
    dw = struct.pack("<4i", 0, 0, w - 1, h - 1)
    header = (
        _attr("channels", "chlist", chdata)
        + _attr("compression", "compression", bytes([compression]))
        + _attr("dataWindow", "box2i", dw)
        + _attr("displayWindow", "box2i", dw)
        + _attr("lineOrder", "lineOrder", b"\x00")
        + _attr("pixelAspectRatio", "float", struct.pack("<f", 1.0))
        + _attr("screenWindowCenter", "v2f", struct.pack("<2f", 0.0, 0.0))
        + _attr("screenWindowWidth", "float", struct.pack("<f", 1.0))
        + b"\x00"
    )
    out = bytearray(_MAGIC + struct.pack("<I", 2) + header)

    block_lines = _BLOCK_LINES[compression]
    n_blocks = (h + block_lines - 1) // block_lines
    table_pos = len(out)
    out += b"\x00" * (8 * n_blocks)

    offsets = []
    for b in range(n_blocks):
        y0 = b * block_lines
        lines = min(block_lines, h - y0)
        rows = []
        for ln in range(lines):
            for c in (2, 1, 0):  # B, G, R file order
                rows.append(half[y0 + ln, :, c].tobytes())
        raw = b"".join(rows)
        if compression in (2, 3):
            comp_data = zlib.compress(_filter(raw), 6)
            payload = comp_data if len(comp_data) < len(raw) else raw
        elif compression == 1:
            payload = _rle_pack(_filter(raw))
            if len(payload) >= len(raw):
                payload = raw
        else:
            payload = raw
        offsets.append(len(out))
        out += struct.pack("<iI", y0, len(payload)) + payload
    struct.pack_into(f"<{n_blocks}Q", out, table_pos, *offsets)
    return bytes(out)


def _rle_pack(raw: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(raw)
    while i < n:
        run = 1
        while i + run < n and run < 127 and raw[i + run] == raw[i]:
            run += 1
        if run >= 3:
            out += struct.pack("<b", run - 1) + bytes([raw[i]])
            i += run
        else:
            j = i
            while (
                j < n
                and j - i < 127
                and not (j + 2 < n and raw[j] == raw[j + 1] == raw[j + 2])
            ):
                j += 1
            out += struct.pack("<b", -(j - i)) + raw[i:j]
            i = j
    return bytes(out)
