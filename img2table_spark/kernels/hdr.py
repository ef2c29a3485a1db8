"""Radiance HDR (RGBE, .hdr/.pic) codec — pure stdlib + NumPy.

The reference accepts HDR via ``cv2.imdecode`` (reference
document/image.py:25-32; README input list "*.hdr, *.pic"). Decoded
radiance floats are mapped to display uint8 exactly like the repo's PFM
path (clip to [0,1], scale by 255, banker-free rint) so all downstream CV
kernels see an ordinary RGB image.

Format (Radiance file format spec, public):
  - ASCII header: ``#?RADIANCE``/``#?RGBE`` line, ``FORMAT=32-bit_rle_rgbe``,
    blank line, then the resolution string ``-Y <h> +X <w>`` (standard
    top-down row order; other orientations are rejected loudly).
  - Each pixel is 4 bytes (r, g, b, e): value = (m + 0.5) * 2**(e - 136).
  - Scanlines are either flat RGBE pixels (with the OLD run marker
    (1, 1, 1, n) repeating the previous pixel n << (8*consecutive) times)
    or NEW-style RLE: header (2, 2, w>>8, w&255) followed by the four
    component planes, each run-length coded (count > 128: repeat next byte
    count-128 times; else copy count literal bytes).

The fixture encoder emits new-style RLE and picks mantissas by rounding at
the shared exponent. Because all three channels share one RGBE exponent, the
round trip is bit-exact only for gray/equal-channel uint8 images; color
images can come back ±1 on minority channels (the channel with the largest
value pins the exponent, the others quantize at its step). Both behaviors
are pinned in tests/test_kernels_hdr_exr.py.
"""

from __future__ import annotations

import numpy as np


class HDRError(ValueError):
    pass


def _rgbe_to_u8(rgbe: np.ndarray) -> np.ndarray:
    """(h, w, 4) uint8 RGBE → (h, w, 3) uint8 display RGB."""
    m = rgbe[..., :3].astype(np.float64)
    e = rgbe[..., 3].astype(np.int32)
    scale = np.where(e == 0, 0.0, np.ldexp(1.0, e - 136))
    f = (m + 0.5) * scale[..., None]
    return np.clip(np.rint(np.clip(f, 0.0, 1.0) * 255.0), 0, 255).astype(np.uint8)


def _decode_rle_plane(data: bytes, pos: int, w: int) -> tuple[bytearray, int]:
    out = bytearray()
    n = len(data)
    while len(out) < w:
        if pos >= n:
            raise HDRError("truncated HDR RLE plane")
        cnt = data[pos]
        pos += 1
        if cnt > 128:  # run
            if pos >= n:
                raise HDRError("truncated HDR RLE run")
            out += bytes([data[pos]]) * (cnt - 128)
            pos += 1
        else:  # literal
            if cnt == 0 or pos + cnt > n:
                raise HDRError("bad HDR RLE literal")
            out += data[pos : pos + cnt]
            pos += cnt
    if len(out) != w:
        raise HDRError("HDR RLE plane overrun")
    return out, pos


def decode_hdr(data: bytes) -> np.ndarray:
    """Radiance RGBE → RGB uint8 (display mapping, see module docstring)."""
    if not data.startswith(b"#?"):
        raise HDRError("not a Radiance HDR file")
    # header: lines to the first empty line, then the resolution string
    end = data.find(b"\n\n")
    if end < 0:
        raise HDRError("truncated HDR header")
    header = data[:end].decode("latin-1")
    fmt = next(
        (ln.split("=", 1)[1].strip() for ln in header.splitlines() if ln.startswith("FORMAT=")),
        None,
    )
    if fmt is None:
        raise HDRError("HDR header missing FORMAT")
    if fmt != "32-bit_rle_rgbe":
        raise HDRError(f"unsupported HDR format {fmt!r} (only 32-bit_rle_rgbe)")
    res_end = data.find(b"\n", end + 2)
    if res_end < 0:
        raise HDRError("truncated HDR resolution line")
    res = data[end + 2 : res_end].decode("latin-1").split()
    if len(res) != 4 or res[0] != "-Y" or res[2] != "+X":
        raise HDRError(f"unsupported HDR orientation {' '.join(res)!r} (only -Y h +X w)")
    h, w = int(res[1]), int(res[3])
    if h <= 0 or w <= 0:
        raise HDRError("bad HDR dimensions")

    pos = res_end + 1
    rows = np.empty((h, w, 4), dtype=np.uint8)
    n = len(data)
    for y in range(h):
        if pos + 4 > n:
            raise HDRError("truncated HDR scanlines")
        b0, b1, b2, b3 = data[pos : pos + 4]
        if b0 == 2 and b1 == 2 and b2 & 0x80 == 0 and 8 <= w < 32768:
            if (b2 << 8) | b3 != w:
                raise HDRError("HDR RLE width mismatch")
            pos += 4
            planes = []
            for _ in range(4):
                plane, pos = _decode_rle_plane(data, pos, w)
                planes.append(np.frombuffer(bytes(plane), dtype=np.uint8))
            rows[y] = np.stack(planes, axis=-1)
        else:
            # flat pixels with the OLD run marker (1,1,1,n)
            row = np.empty((w, 4), dtype=np.uint8)
            x = 0
            rshift = 0
            while x < w:
                if pos + 4 > n:
                    raise HDRError("truncated HDR flat scanline")
                px = data[pos : pos + 4]
                pos += 4
                if px[0] == 1 and px[1] == 1 and px[2] == 1:
                    if x == 0:
                        raise HDRError("HDR old-style run with no previous pixel")
                    cnt = px[3] << rshift
                    if x + cnt > w:
                        raise HDRError("HDR old-style run overrun")
                    row[x : x + cnt] = row[x - 1]
                    x += cnt
                    rshift += 8
                else:
                    row[x] = np.frombuffer(px, dtype=np.uint8)
                    x += 1
                    rshift = 0
            rows[y] = row
    return np.ascontiguousarray(_rgbe_to_u8(rows))


# ------------------------------------------------------------- fixture side


def _u8_to_rgbe(img: np.ndarray) -> np.ndarray:
    """(h, w, 3) uint8 → (h, w, 4) RGBE with round-at-shared-exponent
    mantissas (round-trip-exact through the display mapping)."""
    f = img.astype(np.float64) / 255.0
    mx = f.max(axis=-1)
    rgbe = np.zeros(img.shape[:2] + (4,), dtype=np.uint8)
    nz = mx > 0.0
    # smallest e with (255.5) * 2**(e-136) >= mx  ⇔  2**(e-128) > ~mx
    e = np.zeros_like(mx, dtype=np.int32)
    _, expnt = np.frexp(mx[nz])  # mx = frac * 2**expnt, frac in [0.5, 1)
    e[nz] = expnt + 128
    with np.errstate(divide="ignore", invalid="ignore"):
        m = np.rint(f / np.ldexp(1.0, e - 136)[..., None] - 0.5)
    m = np.clip(m, 0, 255)
    rgbe[..., :3] = np.where(nz[..., None], m, 0).astype(np.uint8)
    rgbe[..., 3] = np.where(nz, e, 0).astype(np.uint8)
    return rgbe


def encode_hdr(img: np.ndarray) -> bytes:
    """RGB uint8 → Radiance HDR bytes (new-style RLE scanlines)."""
    if img.ndim != 3 or img.shape[2] != 3:
        raise HDRError("encode_hdr expects (h, w, 3) uint8")
    h, w = img.shape[:2]
    if not 8 <= w < 32768:
        raise HDRError("encode_hdr: width out of new-RLE range")
    rgbe = _u8_to_rgbe(img)
    out = bytearray(b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n")
    out += f"-Y {h} +X {w}\n".encode()
    for y in range(h):
        out += bytes([2, 2, (w >> 8) & 0x7F, w & 0xFF])
        for c in range(4):
            plane = rgbe[y, :, c].tobytes()
            x = 0
            while x < w:
                run = 1
                while x + run < w and run < 127 and plane[x + run] == plane[x]:
                    run += 1
                if run >= 4:
                    out += bytes([128 + run, plane[x]])
                    x += run
                else:
                    lit_end = x + 1
                    while (
                        lit_end < w
                        and lit_end - x < 128
                        and not (
                            lit_end + 3 < w
                            and plane[lit_end] == plane[lit_end + 1] == plane[lit_end + 2] == plane[lit_end + 3]
                        )
                    ):
                        lit_end += 1
                    out += bytes([lit_end - x]) + plane[x:lit_end]
                    x = lit_end
    return bytes(out)
