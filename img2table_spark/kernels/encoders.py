"""Minimal image ENCODERS — synthetic-fixture generators only.

The decode path (png/jpeg/bmp/tiff kernels) is the product; these encoders
exist so tests and the q14 driver corpus can synthesize payloads in formats
the container has no tools for (no PIL/cv2). They are written independently
of the decoders from the format specs, so round-trip equality is a real
two-sided check (e.g. the TIFF-LZW early-change bug was caught this way).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from img2table_spark.kernels.jpeg import _C, ZIGZAG


# ----------------------------------------------------------------------- PNG


def encode_png(img: np.ndarray) -> bytes:
    """RGB uint8 → PNG (color type 2, filter 0 rows, one zlib IDAT)."""
    h, w = img.shape[:2]

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


# ----------------------------------------------------------------------- BMP

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


# ---------------------------------------------------------------------- TIFF

def tiff_lzw_encode(data: bytes) -> bytes:
    """TIFF-variant LZW compressor (early change: width bumps when the next
    free code reaches 2^w - 1)."""
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


def packbits_encode(data: bytes) -> bytes:
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


def encode_tiff(img: np.ndarray, compression: int = 1, predictor: int = 1,
                rows_per_strip: int | None = None) -> bytes:
    """RGB array → little-endian strip-based TIFF."""
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
            raw = tiff_lzw_encode(raw)
        elif compression == 8:
            raw = zlib.compress(raw)
        elif compression == 32773:
            raw = packbits_encode(raw)
        strips.append(raw)

    n_strips = len(strips)
    tag_list = [
        (256, 3, 1, w), (257, 3, 1, h), (258, 3, 3, None), (259, 3, 1, compression),
        (262, 3, 1, 2), (273, 4, n_strips, None), (277, 3, 1, 3),
        (278, 3, 1, rows_per_strip), (279, 4, n_strips, None), (284, 3, 1, 1),
        (317, 3, 1, predictor),
    ]
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


def encode_tiff_tiled(img: np.ndarray, tile_w: int = 64, tile_l: int = 64,
                      compression: int = 1, predictor: int = 1) -> bytes:
    """RGB array → little-endian TILED TIFF (TIFF 6.0 §15): tiles padded to
    full (tile_w × tile_l) at the right/bottom edges, left-to-right then
    top-to-bottom, each compressed independently."""
    h, w, _ = img.shape
    if tile_w % 16 or tile_l % 16:
        raise ValueError("TIFF tile dimensions must be multiples of 16")
    tiles_across = (w + tile_w - 1) // tile_w
    tiles_down = (h + tile_l - 1) // tile_l
    tiles = []
    for ty in range(tiles_down):
        for tx in range(tiles_across):
            block = np.zeros((tile_l, tile_w, 3), dtype=np.uint8)
            part = img[ty * tile_l : (ty + 1) * tile_l,
                       tx * tile_w : (tx + 1) * tile_w]
            block[: part.shape[0], : part.shape[1]] = part
            if predictor == 2:
                b16 = block.astype(np.int16)
                b16[:, 1:, :] = b16[:, 1:, :] - b16[:, :-1, :]
                block = (b16 % 256).astype(np.uint8)
            raw = block.tobytes()
            if compression == 5:
                raw = tiff_lzw_encode(raw)
            elif compression == 8:
                raw = zlib.compress(raw)
            elif compression == 32773:
                raw = packbits_encode(raw)
            tiles.append(raw)

    n_tiles = len(tiles)
    tag_list = [
        (256, 3, 1, w), (257, 3, 1, h), (258, 3, 3, None), (259, 3, 1, compression),
        (262, 3, 1, 2), (277, 3, 1, 3), (284, 3, 1, 1), (317, 3, 1, predictor),
        (322, 3, 1, tile_w), (323, 3, 1, tile_l),
        (324, 4, n_tiles, None), (325, 4, n_tiles, None),
    ]
    ifd_size = 2 + len(tag_list) * 12 + 4
    extra = bytearray()
    extra_base = 8 + ifd_size

    def alloc(vals, fmt):
        off = extra_base + len(extra)
        extra.extend(struct.pack("<" + fmt * len(vals), *vals))
        return off

    bps_off = alloc([8, 8, 8], "H")
    tile_data_base = extra_base + len(extra) + (4 * n_tiles * 2 if n_tiles > 1 else 0)
    offsets = []
    pos = tile_data_base
    for t in tiles:
        offsets.append(pos)
        pos += len(t)
    counts = [len(t) for t in tiles]
    if n_tiles > 1:
        off_off = alloc(offsets, "I")
        cnt_off = alloc(counts, "I")
    else:
        off_off, cnt_off = offsets[0], counts[0]

    out = bytearray(struct.pack("<2sHI", b"II", 42, 8))
    out += struct.pack("<H", len(tag_list))
    for tag, typ, cnt, val in tag_list:
        if tag == 258:
            val = bps_off
        elif tag == 324:
            val = off_off
        elif tag == 325:
            val = cnt_off
        out += struct.pack("<HHII", tag, typ, cnt, val)
    out += struct.pack("<I", 0)  # next IFD
    out += extra
    for t in tiles:
        out += t
    return bytes(out)


def encode_tiff_tiled_bilevel(img: np.ndarray, tile_w: int = 64,
                              tile_l: int = 64, compression: int = 1,
                              photometric: int = 0) -> bytes:
    """RGB uint8 → TILED bilevel TIFF (1 bit/sample, packed rows): pixels
    with gray >= 128 become white. photometric 0 = WhiteIsZero (bit 0 =
    white, the fax convention), 1 = BlackIsZero."""
    h, w, _ = img.shape
    if tile_w % 16 or tile_l % 16:
        raise ValueError("TIFF tile dimensions must be multiples of 16")
    gray = img.astype(np.uint16).sum(axis=2) // 3
    white = gray >= 128
    # bit value for a white pixel under each photometric
    bits_img = (~white if photometric == 0 else white).astype(np.uint8)
    tiles_across = (w + tile_w - 1) // tile_w
    tiles_down = (h + tile_l - 1) // tile_l
    tiles = []
    for ty in range(tiles_down):
        for tx in range(tiles_across):
            block = np.zeros((tile_l, tile_w), dtype=np.uint8)
            part = bits_img[ty * tile_l : (ty + 1) * tile_l,
                            tx * tile_w : (tx + 1) * tile_w]
            block[: part.shape[0], : part.shape[1]] = part
            raw = np.packbits(block, axis=1).tobytes()
            if compression == 5:
                raw = tiff_lzw_encode(raw)
            elif compression == 8:
                raw = zlib.compress(raw)
            elif compression == 32773:
                raw = packbits_encode(raw)
            tiles.append(raw)

    n_tiles = len(tiles)
    tag_list = [
        (256, 3, 1, w), (257, 3, 1, h), (258, 3, 1, 1),
        (259, 3, 1, compression), (262, 3, 1, photometric), (277, 3, 1, 1),
        (284, 3, 1, 1), (322, 3, 1, tile_w), (323, 3, 1, tile_l),
        (324, 4, n_tiles, None), (325, 4, n_tiles, None),
    ]
    ifd_size = 2 + len(tag_list) * 12 + 4
    extra = bytearray()
    extra_base = 8 + ifd_size
    tile_data_base = extra_base + (4 * n_tiles * 2 if n_tiles > 1 else 0)
    offsets = []
    pos = tile_data_base
    for t in tiles:
        offsets.append(pos)
        pos += len(t)
    counts = [len(t) for t in tiles]
    if n_tiles > 1:
        extra.extend(struct.pack(f"<{n_tiles}I", *offsets))
        off_off = extra_base
        extra.extend(struct.pack(f"<{n_tiles}I", *counts))
        cnt_off = extra_base + 4 * n_tiles
    else:
        off_off, cnt_off = offsets[0], counts[0]

    out = bytearray(struct.pack("<2sHI", b"II", 42, 8))
    out += struct.pack("<H", len(tag_list))
    for tag, typ, cnt, val in tag_list:
        if tag == 324:
            val = off_off
        elif tag == 325:
            val = cnt_off
        out += struct.pack("<HHII", tag, typ, cnt, val)
    out += struct.pack("<I", 0)  # next IFD
    out += extra
    for t in tiles:
        out += t
    return bytes(out)


def encode_tiff_ccitt(img: np.ndarray, compression: int = 4,
                      rows_per_strip: int | None = None,
                      two_d: bool = False, fill_order: int = 1) -> bytes:
    """RGB uint8 → CCITT fax TIFF (bilevel, threshold at gray 128).
    compression 2 = Modified Huffman RLE (byte-aligned rows, no EOL),
    3 = T.4 G3 (1-D, or 2-D with EOL+tag lines when two_d), 4 = T.6 G4 MMR.
    Strips restart the coder (TIFF 6.0 requires independently decodable
    strips). PhotometricInterpretation 0 (WhiteIsZero, the fax layout)."""
    from img2table_spark.kernels.ccitt import _REV8, encode_ccitt

    h, w, _ = img.shape
    gray = img.astype(np.uint16).sum(axis=2) // 3
    black = (gray < 128).astype(np.uint8)
    rows_per_strip = rows_per_strip or h
    strips = []
    for y0 in range(0, h, rows_per_strip):
        block = black[y0 : y0 + rows_per_strip]
        if compression == 2:
            raw = encode_ccitt(block, mode="mh", byte_align=True)
        elif compression == 3:
            raw = (encode_ccitt(block, mode="g3_2d", eol=True, k=2)
                   if two_d else encode_ccitt(block, mode="mh", eol=True))
        elif compression == 4:
            raw = encode_ccitt(block, mode="g4")
        else:
            raise ValueError(f"not a CCITT compression: {compression}")
        if fill_order == 2:
            raw = _REV8[np.frombuffer(raw, dtype=np.uint8)].tobytes()
        strips.append(raw)

    n_strips = len(strips)
    tag_list = [
        (256, 3, 1, w), (257, 3, 1, h), (258, 3, 1, 1),
        (259, 3, 1, compression), (262, 3, 1, 0), (266, 3, 1, fill_order),
        (273, 4, n_strips, None), (277, 3, 1, 1), (278, 3, 1, rows_per_strip),
        (279, 4, n_strips, None), (284, 3, 1, 1),
    ]
    if compression == 3:
        tag_list.append((292, 4, 1, 1 if two_d else 0))  # T4Options
    if compression == 4:
        tag_list.append((293, 4, 1, 0))  # T6Options
    tag_list.sort()
    ifd_size = 2 + len(tag_list) * 12 + 4
    extra = bytearray()
    extra_base = 8 + ifd_size
    strip_data_base = extra_base + (4 * n_strips * 2 if n_strips > 1 else 0)
    offsets = []
    pos = strip_data_base
    for s in strips:
        offsets.append(pos)
        pos += len(s)
    counts = [len(s) for s in strips]
    if n_strips > 1:
        extra.extend(struct.pack(f"<{n_strips}I", *offsets))
        off_off = extra_base
        extra.extend(struct.pack(f"<{n_strips}I", *counts))
        cnt_off = extra_base + 4 * n_strips
    else:
        off_off, cnt_off = offsets[0], counts[0]

    out = bytearray(struct.pack("<2sHI", b"II", 42, 8))
    out += struct.pack("<H", len(tag_list))
    for tag, typ, cnt, val in tag_list:
        if tag == 273:
            val = off_off
        elif tag == 279:
            val = cnt_off
        out += struct.pack("<HHII", tag, typ, cnt, val)
    out += struct.pack("<I", 0)  # next IFD
    out += extra
    for s in strips:
        out += s
    return bytes(out)


def encode_tiff_jpeg_oldstyle(img: np.ndarray, qval: int = 2) -> bytes:
    """RGB → old-style JPEG-in-TIFF (compression 6, the common field
    variant): one full JPEG interchange stream referenced by
    JPEGInterchangeFormat/Length; no strip offsets at all."""
    h, w, _ = img.shape
    stream = encode_jpeg_progressive(img, qval=qval)
    tag_list = [
        (256, 3, 1, w), (257, 3, 1, h), (258, 3, 3, None), (259, 3, 1, 6),
        (262, 3, 1, 6),  # PhotometricInterpretation = YCbCr
        (277, 3, 1, 3), (284, 3, 1, 1),
        (513, 4, 1, None), (514, 4, 1, len(stream)),
    ]
    ifd_size = 2 + len(tag_list) * 12 + 4
    extra = bytearray()
    extra_base = 8 + ifd_size
    bps_off = extra_base
    extra.extend(struct.pack("<3H", 8, 8, 8))
    stream_off = extra_base + len(extra)

    out = bytearray(struct.pack("<2sHI", b"II", 42, 8))
    out += struct.pack("<H", len(tag_list))
    for tag, typ, cnt, val in tag_list:
        if tag == 258:
            val = bps_off
        elif tag == 513:
            val = stream_off
        out += struct.pack("<HHII", tag, typ, cnt, val)
    out += struct.pack("<I", 0)
    out += extra
    out += stream
    return bytes(out)


def _split_jpeg_dqt(stream: bytes) -> tuple[bytes, bytes]:
    """(dqt_segments, stream_without_dqt): walk the marker segments before
    SOS and hoist the DQT segments — the JPEGTables fixture shape (TTN2
    allows any table split)."""
    assert stream[:2] == b"\xff\xd8"
    pos = 2
    dqt = bytearray()
    keep = bytearray(stream[:2])
    while pos + 4 <= len(stream):
        if stream[pos] != 0xFF:
            break
        m = stream[pos + 1]
        if m == 0xDA:  # SOS: entropy follows — keep the rest verbatim
            keep += stream[pos:]
            return bytes(dqt), bytes(keep)
        seg_len = struct.unpack(">H", stream[pos + 2 : pos + 4])[0]
        seg = stream[pos : pos + 2 + seg_len]
        if m == 0xDB:
            dqt += seg
        else:
            keep += seg
        pos += 2 + seg_len
    keep += stream[pos:]
    return bytes(dqt), bytes(keep)


def encode_tiff_jpeg(img: np.ndarray, rows_per_strip: int | None = None,
                     external_tables: bool = False, tile: tuple | None = None,
                     qval: int = 2) -> bytes:
    """RGB array → new-style JPEG-in-TIFF (compression 7, TTN2): each
    strip/tile is an independent progressive-JPEG stream; with
    ``external_tables`` the DQT segments are hoisted into a shared
    JPEGTables tag (347) and the per-strip streams are abbreviated."""
    h, w, _ = img.shape
    blocks: list[np.ndarray] = []
    if tile:
        tw, tl = tile
        if tw % 16 or tl % 16:
            raise ValueError("TIFF tile dimensions must be multiples of 16")
        tiles_across = (w + tw - 1) // tw
        tiles_down = (h + tl - 1) // tl
        for ty in range(tiles_down):
            for tx in range(tiles_across):
                block = np.zeros((tl, tw, 3), dtype=np.uint8)
                part = img[ty * tl : (ty + 1) * tl, tx * tw : (tx + 1) * tw]
                block[: part.shape[0], : part.shape[1]] = part
                blocks.append(block)
    else:
        rows_per_strip = rows_per_strip or h
        for y0 in range(0, h, rows_per_strip):
            blocks.append(np.ascontiguousarray(img[y0 : y0 + rows_per_strip]))

    streams = [encode_jpeg_progressive(b, qval=qval) for b in blocks]
    tables = b""
    if external_tables:
        stripped = []
        for s in streams:
            dqt, rest = _split_jpeg_dqt(s)
            tables = tables or (b"\xff\xd8" + dqt + b"\xff\xd9")
            stripped.append(rest)
        streams = stripped

    n = len(streams)
    tag_list = [
        (256, 3, 1, w), (257, 3, 1, h), (258, 3, 3, None), (259, 3, 1, 7),
        (262, 3, 1, 6), (277, 3, 1, 3), (284, 3, 1, 1),
    ]
    if tile:
        tag_list += [(322, 3, 1, tile[0]), (323, 3, 1, tile[1]),
                     (324, 4, n, None), (325, 4, n, None)]
    else:
        tag_list += [(273, 4, n, None), (278, 3, 1, rows_per_strip),
                     (279, 4, n, None)]
    if tables:
        tag_list.append((347, 7, len(tables), None))
    tag_list.sort()
    ifd_size = 2 + len(tag_list) * 12 + 4
    extra = bytearray()
    extra_base = 8 + ifd_size

    def alloc_bytes(bs: bytes) -> int:
        off = extra_base + len(extra)
        extra.extend(bs)
        return off

    def alloc(vals, fmt):
        return alloc_bytes(struct.pack("<" + fmt * len(vals), *vals))

    bps_off = alloc([8, 8, 8], "H")
    tables_off = alloc_bytes(tables) if tables else 0
    data_base = extra_base + len(extra) + (4 * n * 2 if n > 1 else 0)
    offsets, pos = [], data_base
    for s in streams:
        offsets.append(pos)
        pos += len(s)
    counts = [len(s) for s in streams]
    if n > 1:
        off_off = alloc(offsets, "I")
        cnt_off = alloc(counts, "I")
    else:
        off_off, cnt_off = offsets[0], counts[0]

    out = bytearray(struct.pack("<2sHI", b"II", 42, 8))
    out += struct.pack("<H", len(tag_list))
    for tag, typ, cnt, val in tag_list:
        if tag == 258:
            val = bps_off
        elif tag in (273, 324):
            val = off_off
        elif tag in (279, 325):
            val = cnt_off
        elif tag == 347:
            val = tables_off
        out += struct.pack("<HHII", tag, typ, cnt, val)
    out += struct.pack("<I", 0)
    out += extra
    for s in streams:
        out += s
    return bytes(out)


# --------------------------------------------------------- progressive JPEG

class _BitWriter:
    """MSB-first with 0xFF byte stuffing; flush pads with 1s (T.81 F.1.2.3)."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, nbits: int):
        if nbits == 0:
            return
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.n += nbits
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
            self.n -= 8
            self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)
        return bytes(self.out)


def _flat_huff(symbols: list[int]) -> tuple[bytes, dict[int, tuple[int, int]]]:
    """All symbols at code length 8 (canonical, incomplete — legal). Returns
    (DHT payload sans class/id byte, symbol → (code, length))."""
    syms = sorted(set(symbols))
    assert len(syms) <= 254, "flat table overflow"
    counts = [0] * 16
    counts[7] = len(syms)
    enc = {s: (i, 8) for i, s in enumerate(syms)}
    return bytes(counts) + bytes(syms), enc


def _mag_bits(v: int) -> tuple[int, int]:
    """(size, appended bits) for a signed coefficient (T.81 F.1.2.1)."""
    s = abs(v).bit_length()
    return s, (v if v >= 0 else v + (1 << s) - 1)


def _trunc_shift(v: int, al: int) -> int:
    """AC point transform: magnitude shift, sign preserved."""
    return (abs(v) >> al) * (1 if v >= 0 else -1)


def rgb_to_quantized_blocks(img: np.ndarray, qtable: np.ndarray, subsample: bool = False):
    """RGB → per-component zigzag-quantized coefficient grids.

    subsample=False: 3 components at 1×1. subsample=True: Y at 2×2, chroma
    box-averaged 2× (the layout real progressive encoders default to).
    Returns (comps, geo) where geo = dict(mcux, mcuy, hmax, vmax,
    factors=[(h_i, v_i)], dims=[(bw, cwb, chb)]): bw is the padded block-grid
    width (mcux·h_i), (cwb, chb) the block counts actually covered by
    non-interleaved AC scans."""
    h, w, _ = img.shape
    r = img[:, :, 0].astype(np.float64)
    g = img[:, :, 1].astype(np.float64)
    b = img[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b

    def box2(p):
        hh = (p.shape[0] + 1) // 2 * 2
        ww = (p.shape[1] + 1) // 2 * 2
        p = np.pad(p, ((0, hh - p.shape[0]), (0, ww - p.shape[1])), mode="edge")
        return (p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2]) / 4.0

    if subsample:
        factors = [(2, 2), (1, 1), (1, 1)]
        planes = [y, box2(cb), box2(cr)]
    else:
        factors = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    comps = []
    dims = []
    for p, (fh, fv) in zip(planes, factors):
        bw = mcux * fh
        bh = mcuy * fv
        cw = -(-(w * fh) // hmax)
        chh = -(-(h * fv) // vmax)
        padded = np.pad(
            p[:chh, :cw], ((0, bh * 8 - chh), (0, bw * 8 - cw)), mode="edge"
        ) - 128.0
        blocks = padded.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
        coeff = np.einsum("ux,nxy,vy->nuv", _C, blocks, _C, optimize=True)
        q = np.rint(coeff.reshape(-1, 64) / qtable[None, :]).astype(np.int32)
        comps.append(q[:, ZIGZAG])  # natural → zigzag order
        dims.append((bw, -(-cw // 8), -(-chh // 8)))
    geo = {"mcux": mcux, "mcuy": mcuy, "hmax": hmax, "vmax": vmax,
           "factors": factors, "dims": dims}
    return comps, geo


def _mcu_block_order(geo) -> list[tuple[int, int]]:
    """Interleaved (ci, block_index) sequence: MCU raster order, within each
    MCU every component's v_i×h_i blocks (T.81 A.2.3)."""
    order = []
    for my in range(geo["mcuy"]):
        for mx in range(geo["mcux"]):
            for ci, (fh, fv) in enumerate(geo["factors"]):
                bw = geo["dims"][ci][0]
                for by in range(fv):
                    for bx in range(fh):
                        order.append((ci, (my * fv + by) * bw + mx * fh + bx))
    return order


def _comp_block_order(geo, ci: int) -> list[int]:
    """Non-interleaved scan order: the component's own cwb×chb raster."""
    bw, cwb, chb = geo["dims"][ci]
    return [r * bw + c for r in range(chb) for c in range(cwb)]


def zero_uncovered_ac(comps, geo):
    """Ground-truth helper: AC scans cover only cwb×chb blocks; right/bottom
    PAD blocks of a subsampled grid receive DC only. Returns copies with
    pad-block AC zeroed — exactly the coefficient state a decoder holds."""
    out = []
    for ci, q in enumerate(comps):
        q = q.copy()
        covered = set(_comp_block_order(geo, ci))
        for bi in range(q.shape[0]):
            if bi not in covered:
                q[bi, 1:] = 0
        out.append(q)
    return out


def encode_jpeg_progressive(img: np.ndarray, qval: int = 2, subsample: bool = False) -> bytes:
    """RGB → progressive JPEG (SOF2), 3 components, optional 2×2 chroma
    subsampling (the real-world progressive layout).

    Scan script exercises all four progressive entropy modes:
      1. DC first (interleaved, Al=1)   2. AC first per comp (Ss=1..63, Al=1)
      3. DC refine (Al=0)               4. AC refine per comp (Ah=1, Al=0)
    """
    h, w, _ = img.shape
    qtable = np.full(64, qval, dtype=np.int32)
    comps, geo = rgb_to_quantized_blocks(img, qtable, subsample=subsample)
    mcu_order = _mcu_block_order(geo)

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">HB", 67, 0) + bytes(qtable[ZIGZAG].astype(np.uint8))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for cid, (fh, fv) in zip((1, 2, 3), geo["factors"]):
        sof += struct.pack("BBB", cid, (fh << 4) | fv, 0)
    out += b"\xff\xc2" + struct.pack(">H", 2 + len(sof)) + sof

    def emit_dht(cls: int, tid: int, payload: bytes):
        nonlocal out
        out += b"\xff\xc4" + struct.pack(">HB", 3 + len(payload), (cls << 4) | tid) + payload

    def emit_sos(scomps: list[tuple[int, int, int]], ss, se, ah, al, body: bytes):
        nonlocal out
        hdr = bytes([len(scomps)])
        for cid, td, ta in scomps:
            hdr += bytes([cid, (td << 4) | ta])
        hdr += bytes([ss, se, (ah << 4) | al])
        out += b"\xff\xda" + struct.pack(">H", 2 + len(hdr)) + hdr + body

    # ---- scan 1: DC first, interleaved, Al=1
    dc_syms: list[int] = []
    for _pass in range(2):
        wbits = _BitWriter()
        preds = [0, 0, 0]
        plan: list[tuple[int, int, int]] = []
        for ci, bi in mcu_order:
            dc = int(comps[ci][bi][0]) >> 1  # arithmetic shift (Al=1)
            diff = dc - preds[ci]
            preds[ci] = dc
            s, bits = _mag_bits(diff)
            plan.append((s, bits, s))
        if _pass == 0:
            dc_syms = [p[0] for p in plan]
            continue
        payload, enc = _flat_huff(dc_syms)
        emit_dht(0, 0, payload)
        for s, bits, sz in plan:
            code, ln = enc[s]
            wbits.write(code, ln)
            if sz:
                wbits.write(bits, sz)
        emit_sos([(1, 0, 0), (2, 0, 0), (3, 0, 0)], 0, 0, 0, 1, wbits.flush())

    # ---- scans 2-4: AC first per component, Ss=1..63, Al=1
    for ci, cid in enumerate((1, 2, 3)):
        events: list[tuple] = []  # ("sym", rs) | ("bits", v, n)
        for bi in _comp_block_order(geo, ci):
            coef = comps[ci][bi]
            band = [_trunc_shift(int(coef[k]), 1) for k in range(1, 64)]
            r = 0
            for v in band:
                if v == 0:
                    r += 1
                    continue
                while r >= 16:
                    events.append(("sym", 0xF0))
                    r -= 16
                s, bits = _mag_bits(v)
                events.append(("sym", (r << 4) | s))
                events.append(("bits", bits, s))
                r = 0
            if r > 0:
                events.append(("sym", 0x00))  # EOB (run of 1)
        payload, enc = _flat_huff([e[1] for e in events if e[0] == "sym"])
        emit_dht(1, 0, payload)  # table 0 redefined before each scan (legal)
        wbits = _BitWriter()
        for e in events:
            if e[0] == "sym":
                code, ln = enc[e[1]]
                wbits.write(code, ln)
            else:
                wbits.write(e[1], e[2])
        emit_sos([(cid, 0, 0)], 1, 63, 0, 1, wbits.flush())

    # ---- scan 5: DC refine (Al=0)
    wbits = _BitWriter()
    for ci, bi in mcu_order:
        wbits.write(int(comps[ci][bi][0]) & 1, 1)
    emit_sos([(1, 0, 0), (2, 0, 0), (3, 0, 0)], 0, 0, 1, 0, wbits.flush())

    # ---- scans 6-8: AC refine per component (Ah=1, Al=0),
    #      per T.81 G.1.2.3 encoder (libjpeg encode_mcu_AC_refine shape)
    for ci, cid in enumerate((1, 2, 3)):
        events = []
        for bi in _comp_block_order(geo, ci):
            coef = [int(v) for v in comps[ci][bi]]
            absv = [abs(coef[k]) for k in range(1, 64)]
            eob = -1
            for j, t in enumerate(absv):
                if t == 1:
                    eob = j
            r = 0
            br: list[int] = []
            for j, t in enumerate(absv):
                if t == 0:
                    r += 1
                    continue
                while r > 15 and j <= eob:
                    events.append(("sym", 0xF0))
                    r -= 16
                    events.extend(("bits", b2, 1) for b2 in br)
                    br = []
                if t > 1:
                    br.append(t & 1)
                    continue
                events.append(("sym", (r << 4) | 1))
                events.append(("bits", 1 if coef[j + 1] >= 0 else 0, 1))
                events.extend(("bits", b2, 1) for b2 in br)
                br = []
                r = 0
            if r > 0 or br:
                events.append(("sym", 0x00))
                events.extend(("bits", b2, 1) for b2 in br)
        payload, enc = _flat_huff([e[1] for e in events if e[0] == "sym"])
        emit_dht(1, 0, payload)
        wbits = _BitWriter()
        for e in events:
            if e[0] == "sym":
                code, ln = enc[e[1]]
                wbits.write(code, ln)
            else:
                wbits.write(e[1], e[2])
        emit_sos([(cid, 0, 0)], 1, 63, 1, 0, wbits.flush())

    out += b"\xff\xd9"
    return bytes(out)


# ----------------------------------------------------------- text-layer PDF

def build_ccitt_scanned_pdf(img: np.ndarray, k: int = -1) -> bytes:
    """Scanned-style one-page PDF whose full-page image XObject is a
    CCITTFaxDecode stream (K<0 = G4 MMR, the overwhelmingly common real
    case; K=0 = 1-D MH; K>0 = mixed 2-D). Page sized so 200-DPI page space
    equals image pixels — the same geometry contract as the DCT/Flate
    scanned fixtures. BlackIs1 false (default): black pixels decode to
    sample 0 under DeviceGray 1-bit."""
    from img2table_spark.kernels.ccitt import encode_ccitt

    h_px, w_px, _ = img.shape
    gray = img.astype(np.uint16).sum(axis=2) // 3
    black = (gray < 128).astype(np.uint8)
    if k < 0:
        stream = encode_ccitt(black, mode="g4")
    elif k == 0:
        stream = encode_ccitt(black, mode="mh")
    else:
        stream = encode_ccitt(black, mode="g3_2d", eol=True, k=k)
    page_w = w_px * 72 / 200
    page_h = h_px * 72 / 200
    content = f"q {page_w:.4f} 0 0 {page_h:.4f} 0 0 cm /Im1 Do Q".encode()

    objs: list[bytes] = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {page_w:.4f} "
            f"{page_h:.4f}] /Resources << /XObject << /Im1 4 0 R >> >> "
            f"/Contents 5 0 R >>"
        ).encode(),
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for num, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"
    offsets.append(len(out))
    out += (
        f"4 0 obj\n<< /Type /XObject /Subtype /Image /Width {w_px} "
        f"/Height {h_px} /ColorSpace /DeviceGray /BitsPerComponent 1 "
        f"/Filter /CCITTFaxDecode /DecodeParms << /K {k} /Columns {w_px} "
        f"/Rows {h_px} /BlackIs1 false >> /Length {len(stream)} >>\nstream\n"
    ).encode()
    out += stream + b"\nendstream\nendobj\n"
    offsets.append(len(out))
    out += f"5 0 obj\n<< /Length {len(content)} >>\nstream\n".encode()
    out += content + b"\nendstream\nendobj\n"
    xref_pos = len(out)
    out += b"xref\n0 6\n0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size 6 /Root 1 0 R >>\nstartxref\n{xref_pos}\n%%EOF"
    ).encode()
    return bytes(out)


def build_text_pdf(pages) -> bytes:
    """Synthetic TEXT-LAYER PDF fixture: ``pages`` is a list of
    (page_w, page_h, content_stream_bytes, images); images are RGB arrays
    registered as /Im1../ImN on that page. One shared widthless /Helvetica
    font (glyph advances fall back to FontInfo.default_width). Used by the
    pdf-rendered tests and the q14 driver corpus to exercise borderless /
    mixed-page routing on native-text documents."""
    page_entries, streams = [], []
    n_next = 4  # 1=catalog 2=pages 3=font
    for (w, h, content, images) in pages:
        img_ids = list(range(n_next, n_next + len(images)))
        n_next += len(images)
        cont_id, page_id = n_next, n_next + 1
        n_next += 2
        xent = " ".join(f"/Im{i + 1} {oid} 0 R" for i, oid in enumerate(img_ids))
        res = "/Font << /F1 3 0 R >>" + (f" /XObject << {xent} >>" if img_ids else "")
        page_entries.append(
            (page_id,
             f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {w:.4f} {h:.4f}] "
             f"/Resources << {res} >> /Contents {cont_id} 0 R >>")
        )
        streams.append((cont_id, None, content))
        for oid, img in zip(img_ids, images):
            hp, wp, _ = img.shape
            streams.append(
                (oid,
                 f"/Type /XObject /Subtype /Image /Width {wp} /Height {hp} "
                 "/ColorSpace /DeviceRGB /BitsPerComponent 8 /Filter /FlateDecode",
                 zlib.compress(img.tobytes()))
            )
    kids = " ".join(f"{pid} 0 R" for pid, _ in page_entries)
    bodies = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: f"<< /Type /Pages /Kids [{kids}] /Count {len(page_entries)} >>".encode(),
        3: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    }
    bodies.update({pid: body.encode() for pid, body in page_entries})
    stream_map = {oid: (d, data) for oid, d, data in streams}
    out = bytearray(b"%PDF-1.4\n")
    offsets = {}
    max_id = n_next - 1
    for num in range(1, max_id + 1):
        offsets[num] = len(out)
        if num in bodies:
            out += f"{num} 0 obj\n".encode() + bodies[num] + b"\nendobj\n"
        else:
            d, data = stream_map[num]
            dict_str = (f"{d} /Length {len(data)}") if d else f"/Length {len(data)}"
            out += f"{num} 0 obj\n<< {dict_str} >>\nstream\n".encode()
            out += data + b"\nendstream\nendobj\n"
    xref_pos = len(out)
    out += f"xref\n0 {max_id + 1}\n".encode() + b"0000000000 65535 f \n"
    for num in range(1, max_id + 1):
        out += f"{offsets[num]:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {max_id + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_pos}\n%%EOF".encode()
    )
    return bytes(out)


def pdf_text_op(x: float, y: float, s: str, size: float = 11) -> str:
    esc = s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
    return f"BT /F1 {size} Tf {x:.2f} {y:.2f} Td ({esc}) Tj ET"


def pdf_rect_op(x: float, y: float, w: float, h: float) -> str:
    return f"{x:.2f} {y:.2f} {w:.2f} {h:.2f} re f"


def build_borderless_text_pdf() -> bytes:
    """Letter page with a 13pt heading, a 7x4 word grid with NO rules
    (expected: one borderless 7x4 table), and a varied running-text block."""
    ops = [pdf_text_op(90, 730, "Quarterly results overview", size=13)]
    headers = ["Metric", "BaselineQ", "TreatmentQ", "DeltaPct"]
    col_x = [90, 220, 350, 480]
    rows = [headers] + [
        [f"row{r}metric", f"{100 + r}", f"{200 + r}", f"{r}.5"] for r in range(1, 7)
    ]
    for r, vals in enumerate(rows):
        for x, v in zip(col_x, vals):
            ops.append(pdf_text_op(x, 700 - r * 22, v))
    prose = [
        "Lorem ipsum dolor sit amet consectetur adipiscing elit sed do",
        "eiusmod tempor incididunt ut labore et dolore magna aliqua enim",
        "ad minim veniam quis nostrud exercitation ullamco laboris nisi",
        "ut aliquip ex ea commodo consequat duis aute irure dolor in",
    ]
    for i, line in enumerate(prose):
        ops.append(pdf_text_op(90, 480 - i * 16, line))
    return build_text_pdf([(612, 792, "\n".join(ops).encode(), [])])


# ------------------------------------------- baseline JPEG + old-style TIFF


def _baseline_symbols_and_entropy(comps, geo, enc_dc=None, enc_ac=None):
    """One pass over the interleaved MCU order (T.81 F.1.2 baseline
    sequential). With encoders: returns the stuffed entropy bytes. Without:
    returns (dc_symbols, ac_symbols) for table building."""
    dc_syms: list[int] = []
    ac_syms: list[int] = []
    w = _BitWriter() if enc_dc is not None else None
    preds = [0] * len(comps)
    for ci, bi in _mcu_block_order(geo):
        coef = comps[ci][bi]
        dc = int(coef[0])
        diff = dc - preds[ci]
        preds[ci] = dc
        s, bits = _mag_bits(diff)
        if w is None:
            dc_syms.append(s)
        else:
            code, ln = enc_dc[s]
            w.write(code, ln)
            if s:
                w.write(bits, s)
        r = 0
        for k in range(1, 64):
            v = int(coef[k])
            if v == 0:
                r += 1
                continue
            while r >= 16:
                if w is None:
                    ac_syms.append(0xF0)
                else:
                    code, ln = enc_ac[0xF0]
                    w.write(code, ln)
                r -= 16
            s, bits = _mag_bits(v)
            if w is None:
                ac_syms.append((r << 4) | s)
            else:
                code, ln = enc_ac[(r << 4) | s]
                w.write(code, ln)
                w.write(bits, s)
            r = 0
        if r:
            if w is None:
                ac_syms.append(0x00)  # EOB
            else:
                code, ln = enc_ac[0x00]
                w.write(code, ln)
    if w is None:
        return dc_syms, ac_syms
    return w.flush()


def encode_jpeg_baseline(img: np.ndarray, qval: int = 2,
                         subsample: bool = False) -> bytes:
    """RGB → baseline sequential JPEG (SOF0), one interleaved scan, flat
    self-built Huffman tables — the process old-style JPEG-in-TIFF
    (JPEGProc = 1) requires; the progressive encoder can't serve it
    because bare-MCU strips hold exactly one entropy segment."""
    h, w, _ = img.shape
    qtable = np.full(64, qval, dtype=np.int32)
    comps, geo = rgb_to_quantized_blocks(img, qtable, subsample=subsample)
    dc_syms, ac_syms = _baseline_symbols_and_entropy(comps, geo)
    dc_payload, enc_dc = _flat_huff(dc_syms)
    ac_payload, enc_ac = _flat_huff(ac_syms)
    body = _baseline_symbols_and_entropy(comps, geo, enc_dc, enc_ac)

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">HB", 67, 0) + bytes(
        qtable[ZIGZAG].astype(np.uint8)
    )
    out += b"\xff\xc4" + struct.pack(">HB", 3 + len(dc_payload), 0x00) + dc_payload
    out += b"\xff\xc4" + struct.pack(">HB", 3 + len(ac_payload), 0x10) + ac_payload
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for cid, (fh, fv) in zip((1, 2, 3), geo["factors"]):
        sof += struct.pack("BBB", cid, (fh << 4) | fv, 0)
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    sos = bytes([3])
    for cid in (1, 2, 3):
        sos += bytes([cid, 0x00])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos + body
    out += b"\xff\xd9"
    return bytes(out)


def encode_tiff_jpeg_oldstyle_tables(
    img: np.ndarray, rows_per_strip: int | None = None,
    subsample: bool = False, qval: int = 2,
) -> bytes:
    """RGB → old-style JPEG-in-TIFF (compression 6) in the TABLES-POINTER
    layout (TIFF 6.0 §22): NO JPEGInterchangeFormat — strips hold bare
    baseline entropy-coded MCU data, and JPEGQTables/JPEGDCTables/
    JPEGACTables (519/520/521) point at raw table payloads. Each strip is
    an independent scan (fresh DC predictors, byte-aligned), which is the
    only unambiguous reading of the pre-TTN2 layout and what libtiff's
    OJPEG codec reconstructs. Shared tables are built over ALL strips so
    one table set serves the whole IFD."""
    h, w, _ = img.shape
    mcu_h = 16 if subsample else 8
    rows_per_strip = rows_per_strip or h
    if rows_per_strip % mcu_h and rows_per_strip < h:
        raise ValueError(f"rows_per_strip must be a multiple of {mcu_h}")
    qtable = np.full(64, qval, dtype=np.int32)
    bands = []
    for y0 in range(0, h, rows_per_strip):
        band = np.ascontiguousarray(img[y0 : y0 + rows_per_strip])
        bands.append(rgb_to_quantized_blocks(band, qtable, subsample=subsample))
    dc_all: list[int] = []
    ac_all: list[int] = []
    for comps, geo in bands:
        d, a = _baseline_symbols_and_entropy(comps, geo)
        dc_all += d
        ac_all += a
    dc_payload, enc_dc = _flat_huff(dc_all)
    ac_payload, enc_ac = _flat_huff(ac_all)
    strips = [
        _baseline_symbols_and_entropy(comps, geo, enc_dc, enc_ac)
        for comps, geo in bands
    ]

    n = len(strips)
    sub = (2, 2) if subsample else (1, 1)
    tag_list = [
        (256, 3, 1, w), (257, 3, 1, h), (258, 3, 3, None), (259, 3, 1, 6),
        (262, 3, 1, 6),  # PhotometricInterpretation = YCbCr
        (273, 4, n, None), (277, 3, 1, 3), (278, 3, 1, rows_per_strip),
        (279, 4, n, None), (284, 3, 1, 1),
        (512, 3, 1, 1),  # JPEGProc = baseline
        (519, 4, 3, None), (520, 4, 3, None), (521, 4, 3, None),
        (530, 3, 2, None),  # YCbCrSubSampling
    ]
    tag_list.sort()
    ifd_size = 2 + len(tag_list) * 12 + 4
    extra = bytearray()
    base = 8 + ifd_size
    locs: dict[int, int] = {}

    def put(tag: int, payload: bytes):
        locs[tag] = base + len(extra)
        extra.extend(payload)

    put(258, struct.pack("<3H", 8, 8, 8))
    # 2×SHORT fits the 4-byte value field → stored INLINE per TIFF 6.0 §2
    locs[530] = sub[0] | (sub[1] << 16)
    # raw table payloads; all three components share one offset each
    qraw = bytes(qtable[ZIGZAG].astype(np.uint8))
    locs["q"] = base + len(extra)
    extra.extend(qraw)
    locs["dc"] = base + len(extra)
    extra.extend(dc_payload)
    locs["ac"] = base + len(extra)
    extra.extend(ac_payload)
    put(519, struct.pack("<3I", *([locs["q"]] * 3)))
    put(520, struct.pack("<3I", *([locs["dc"]] * 3)))
    put(521, struct.pack("<3I", *([locs["ac"]] * 3)))
    strip_base = base + len(extra) + (4 * n * 2 if n > 1 else 0)
    offsets = []
    pos = strip_base
    for s in strips:
        offsets.append(pos)
        pos += len(s)
    if n > 1:
        locs[273] = base + len(extra)
        extra.extend(struct.pack(f"<{n}I", *offsets))
        locs[279] = base + len(extra)
        extra.extend(struct.pack(f"<{n}I", *(len(s) for s in strips)))
    else:  # count-1 LONG is stored inline in the value field
        locs[273] = offsets[0]
        locs[279] = len(strips[0])

    out = bytearray(struct.pack("<2sHI", b"II", 42, 8))
    out += struct.pack("<H", len(tag_list))
    for tag, typ, cnt, val in tag_list:
        if val is None:
            val = locs[tag]
        out += struct.pack("<HHII", tag, typ, cnt, val)
    out += struct.pack("<I", 0)
    out += extra
    for s in strips:
        out += s
    return bytes(out)
