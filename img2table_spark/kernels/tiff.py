"""Pure-stdlib baseline TIFF decoder (S1 image decode path).

TIFF is the scanned-document interchange format; the reference accepts it
via cv2.imdecode (reference document/image.py:25-32, README input list).
Supported: both byte orders, strip-based baseline TIFF — bilevel (1-bit),
grayscale (8-bit, WhiteIsZero/BlackIsZero), palette, RGB(A) — plus TILED
layout (TIFF 6.0 §15, 8-bit and bilevel paths; tile width must be a
multiple of 16 per §15.2, which keeps packed 1-bit tile rows byte-aligned)
with edge-tile padding; Compression none(1) / CCITT fax (2 = Modified
Huffman RLE, 3 = T.4 G3 1-D/2-D, 4 = T.6 G4 MMR — kernels/ccitt.py, strip
layout, FillOrder 1/2) / LZW(5, with early-change and
horizontal predictor) / deflate (8/32946) / PackBits(32773) / new-style
JPEG (7, TTN2: per-strip/tile JPEG streams with optional shared
JPEGTables) / old-style JPEG (6, the common interchange-stream variant via
JPEGInterchangeFormat; the ambiguous bare-MCU tables-pointer variant is
rejected loudly).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


class TIFFError(ValueError):
    pass


_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8, 11: 4, 12: 8}


def _read_ifd(data: bytes, off: int, eb: str) -> dict[int, list[int]]:
    try:
        return _read_ifd_inner(data, off, eb)
    except struct.error as exc:
        raise TIFFError(f"truncated IFD: {exc}") from exc


def _read_ifd_inner(data: bytes, off: int, eb: str) -> dict[int, list[int]]:
    (n,) = struct.unpack_from(eb + "H", data, off)
    tags: dict[int, list[int]] = {}
    for i in range(n):
        p = off + 2 + i * 12
        tag, typ, cnt = struct.unpack_from(eb + "HHI", data, p)
        size = _TYPE_SIZE.get(typ, 1) * cnt
        if size <= 4:
            vo = p + 8
        else:
            (vo,) = struct.unpack_from(eb + "I", data, p + 8)
        if typ == 3:
            vals = list(struct.unpack_from(eb + f"{cnt}H", data, vo))
        elif typ == 4:
            vals = list(struct.unpack_from(eb + f"{cnt}I", data, vo))
        elif typ in (1, 6, 7):  # BYTE / SBYTE / UNDEFINED (e.g. JPEGTables)
            vals = list(data[vo : vo + cnt])
        elif typ == 5:
            vals = [
                struct.unpack_from(eb + "II", data, vo + 8 * k)[0] for k in range(cnt)
            ]
        else:
            continue
        tags[tag] = vals
    return tags


def _lzw_decode(data: bytes) -> bytes:
    """TIFF-variant LZW: MSB-first bit packing, ClearCode=256, EOI=257,
    EARLY code-width change (width bumps when next code == 2^w - 1)."""
    out = bytearray()
    table: list[bytes] = []

    def reset():
        nonlocal table, width
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9

    width = 9
    reset()
    acc = 0
    nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (acc >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == 256:
                reset()
                prev = None
                continue
            if code == 257:
                return bytes(out)
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise TIFFError("corrupt LZW stream")
            out += entry
            prev = entry
            # EARLY change: the decoder's table lags the encoder's by one
            # entry, so it widens at 2^w - 2 where the encoder widens at
            # 2^w - 1 (libtiff tif_lzw.c uses MAXCODE(bits)-1 the same way)
            if len(table) == (1 << width) - 2 and width < 12:
                width += 1
    return bytes(out)


def _packbits_decode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        b = data[i]
        i += 1
        if b < 128:
            out += data[i : i + b + 1]
            i += b + 1
        elif b > 128:
            if i < n:
                out += bytes([data[i]]) * (257 - b)
                i += 1
        # 128: no-op
    return bytes(out)


def _merge_jpeg_tables(stream: bytes, tables: bytes | None) -> bytes:
    """TTN2 abbreviated-stream merge: JPEGTables is `SOI <DQT/DHT...> EOI`;
    splice its segments right after the strip stream's SOI so the result is
    a complete interchange JPEG."""
    if not tables:
        return stream
    if stream[:2] != b"\xff\xd8":
        raise TIFFError("JPEG strip without SOI")
    body = tables[2:]
    if body[-2:] == b"\xff\xd9":
        body = body[:-2]
    return stream[:2] + body + stream[2:]


def _decode_jpeg_tiff(
    data: bytes, w: int, h: int, offsets, counts, jpeg_tables: bytes | None,
    tiled: bool, tile_w, tile_l, rows_per_strip: int,
) -> np.ndarray:
    """Compression 7: decode each strip/tile as a JPEG stream and assemble."""
    from img2table_spark.kernels.jpeg import JPEGError, decode_jpeg

    out = np.zeros((h, w, 3), dtype=np.uint8)
    try:
        if tiled:
            tiles_across = (w + tile_w - 1) // tile_w
            tiles_down = (h + tile_l - 1) // tile_l
            if len(offsets) < tiles_across * tiles_down:
                raise TIFFError("truncated tile offsets")
            for ti in range(tiles_across * tiles_down):
                so, sc = offsets[ti], counts[ti]
                img = decode_jpeg(_merge_jpeg_tables(data[so : so + sc], jpeg_tables))
                ty, tx = divmod(ti, tiles_across)
                y0, x0 = ty * tile_l, tx * tile_w
                part = img[: min(tile_l, h - y0), : min(tile_w, w - x0)]
                out[y0 : y0 + part.shape[0], x0 : x0 + part.shape[1]] = part
        else:
            y = 0
            for so, sc in zip(offsets, counts):
                img = decode_jpeg(_merge_jpeg_tables(data[so : so + sc], jpeg_tables))
                nrows = min(img.shape[0], h - y, rows_per_strip)
                out[y : y + nrows] = img[:nrows, :w]
                y += nrows
            if y < h:
                raise TIFFError("truncated JPEG strip data")
    except JPEGError as exc:
        raise TIFFError(f"bad JPEG-in-TIFF stream: {exc}") from exc
    return out


def decode_tiff(data: bytes) -> np.ndarray:
    """TIFF bytes → RGB uint8 (H, W, 3). First IFD only (page 1)."""
    if data[:4] == b"II*\x00":
        eb = "<"
    elif data[:4] == b"MM\x00*":
        eb = ">"
    else:
        raise TIFFError("not a TIFF")
    if len(data) < 8:
        raise TIFFError("truncated TIFF header")
    (ifd_off,) = struct.unpack_from(eb + "I", data, 4)
    tags = _read_ifd(data, ifd_off, eb)

    def one(tag: int, default=None):
        v = tags.get(tag)
        return v[0] if v else default

    w = one(256)
    h = one(257)
    if not w or not h:
        raise TIFFError("missing dimensions")
    bps = tags.get(258, [1])
    spp = one(277, 1)
    photo = one(262, 1)
    comp = one(259, 1)
    planar = one(284, 1)
    predictor = one(317, 1)
    rows_per_strip = one(278, h)
    offsets = tags.get(273)
    counts = tags.get(279)
    tile_w, tile_l = one(322), one(323)
    tiled = bool(tile_w and tile_l)
    if planar != 1:
        raise TIFFError("planar TIFF unsupported")
    if tiled:
        offsets = tags.get(324)
        counts = tags.get(325)
        if offsets is None:
            raise TIFFError("tiled TIFF without TileOffsets")
    if comp == 6:
        # old-style JPEG-in-TIFF (pre-TTN2). The dominant variant in the
        # wild embeds one complete JPEG interchange stream at
        # JPEGInterchangeFormat (513) / ...Length (514) — decode it
        # directly. The tables-pointer variant (JPEGQTables 519 etc. with
        # bare per-strip MCU data) is ambiguous by spec (why TTN2 replaced
        # it) and stays rejected.
        from img2table_spark.kernels.jpeg import JPEGError, decode_jpeg

        jif = tags.get(513)
        if jif:
            off = jif[0]
            length = (tags.get(514) or [len(data) - off])[0]
            try:
                img = decode_jpeg(data[off : off + length])
            except JPEGError as exc:
                raise TIFFError(f"old-style JPEG-in-TIFF: {exc}") from exc
            if img.shape[0] < h or img.shape[1] < w:
                raise TIFFError("old-style JPEG stream smaller than the page")
            return np.ascontiguousarray(img[:h, :w])
        # Tables-pointer variant (TIFF 6.0 §22, round-5 closure of the last
        # codec gap): strips hold bare baseline entropy-coded MCU data and
        # JPEGQTables/JPEGDCTables/JPEGACTables point at raw table
        # payloads. The only unambiguous reading (and the one libtiff's
        # OJPEG codec reconstructs) is: each strip is an independent
        # baseline scan, byte-aligned with fresh DC predictors — so we
        # synthesize one SOI..EOI interchange stream per strip from the
        # tag-held tables and hand it to the ordinary JPEG decoder. The
        # lossless process (JPEGProc 14) stays rejected.
        proc = one(512, 1)
        if proc != 1:
            raise TIFFError(f"old-style JPEG process {proc} unsupported")
        qoffs, dcoffs, acoffs = tags.get(519), tags.get(520), tags.get(521)
        if not (qoffs and dcoffs and acoffs) or offsets is None:
            raise TIFFError(
                "old-style JPEG-in-TIFF without an interchange stream or "
                "table pointers unsupported"
            )
        if counts is None:
            counts = [len(data) - offsets[0]]
        if spp not in (1, 3):
            raise TIFFError(f"old-style JPEG with {spp} components unsupported")
        subs = tags.get(530) or ([2, 2] if (photo == 6 and spp == 3) else [1, 1])
        restart = one(515, 0)

        def huff_at(off_):
            n_vals = sum(data[off_ : off_ + 16])
            t = data[off_ : off_ + 16 + n_vals]
            if len(t) < 16 + n_vals:
                raise TIFFError("truncated old-style JPEG Huffman table")
            return t

        pre = bytearray()
        for i in range(spp):
            q64 = data[qoffs[i] : qoffs[i] + 64]
            if len(q64) < 64:
                raise TIFFError("truncated old-style JPEG quant table")
            pre += b"\xff\xdb" + struct.pack(">HB", 67, i) + q64
            d = huff_at(dcoffs[i])
            pre += b"\xff\xc4" + struct.pack(">HB", 3 + len(d), i) + d
            a = huff_at(acoffs[i])
            pre += b"\xff\xc4" + struct.pack(">HB", 3 + len(a), 0x10 | i) + a
        if restart:
            pre += b"\xff\xdd" + struct.pack(">HH", 4, restart)
        sos = bytes([spp])
        for i in range(spp):
            sos += bytes([i, (i << 4) | i])
        sos += bytes([0, 63, 0])
        bands = []
        y0 = 0
        for off, cnt in zip(offsets, counts):
            strip_h = min(rows_per_strip, h - y0)
            sof = struct.pack(">BHHB", 8, strip_h, w, spp)
            for i in range(spp):
                fh, fv = (subs[0], subs[1]) if (i == 0 and spp == 3) else (1, 1)
                sof += struct.pack("BBB", i, (fh << 4) | fv, i)
            stream = (
                b"\xff\xd8" + bytes(pre)
                + b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
                + b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
                + data[off : off + cnt] + b"\xff\xd9"
            )
            try:
                img = decode_jpeg(stream)
            except JPEGError as exc:
                raise TIFFError(f"old-style JPEG strip: {exc}") from exc
            if img.ndim == 2:
                img = np.repeat(img[:, :, None], 3, axis=2)
            if img.shape[0] < strip_h or img.shape[1] < w:
                raise TIFFError("old-style JPEG strip smaller than declared")
            bands.append(img[:strip_h, :w])
            y0 += strip_h
        if y0 < h:
            raise TIFFError("old-style JPEG strips cover less than the page")
        return np.ascontiguousarray(np.concatenate(bands, axis=0))

    if offsets is None:
        raise TIFFError("missing strips")
    if counts is None:
        counts = [len(data) - offsets[0]]
    if any(b not in (1, 8) for b in bps[:spp]):
        raise TIFFError(f"unsupported BitsPerSample {bps}")
    bit1 = bps[0] == 1 and spp == 1

    if comp == 7:
        # new-style JPEG-in-TIFF (TTN2): each strip/tile is a JPEG
        # interchange stream, optionally abbreviated with the shared
        # DQT/DHT segments hoisted into the JPEGTables tag (347)
        jpeg_tables = bytes(tags.get(347, [])) or None
        return _decode_jpeg_tiff(
            data, w, h, offsets, counts, jpeg_tables,
            tiled, tile_w, tile_l, rows_per_strip,
        )

    if comp in (2, 3, 4):
        # CCITT G3/G4 fax (the dominant scanned-document compression):
        # comp 2 = Modified Huffman RLE, 3 = T.4 G3 (T4Options tag picks
        # 1-D/2-D), 4 = T.6 MMR. Bilevel only by spec; strips decode
        # independently (each starts a fresh coding state per TIFF 6.0).
        from img2table_spark.kernels.ccitt import CCITTError, decode_ccitt_tiff

        if not bit1:
            raise TIFFError("CCITT TIFF must be bilevel (1 bit, 1 sample)")
        if tiled:
            raise TIFFError("tiled CCITT TIFF unsupported")
        t4_opts = one(292, 0)
        t6_opts = one(293, 0)
        fill_order = one(266, 1)
        blocks = []
        remaining = h
        for so, sc in zip(offsets, counts):
            nrows = min(rows_per_strip, remaining)
            if nrows <= 0:
                break
            try:
                blocks.append(
                    decode_ccitt_tiff(
                        data[so : so + sc], w, nrows, comp,
                        t4_options=t4_opts, t6_options=t6_opts,
                        fill_order=fill_order,
                    )
                )
            except CCITTError as exc:
                raise TIFFError(f"CCITT strip decode failed: {exc}") from exc
            remaining -= nrows
        if remaining > 0:
            raise TIFFError("truncated CCITT strip data")
        black = np.concatenate(blocks, axis=0)
        # fax photometric: 0 (WhiteIsZero) is the colour-true layout; 1
        # inverts the stored sense, so white runs carry the ink
        if photo == 1:
            black = 1 - black
        g = np.where(black == 1, 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)

    decomp = {
        1: lambda b: b,
        5: _lzw_decode,
        8: zlib.decompress,
        32946: zlib.decompress,
        32773: _packbits_decode,
    }.get(comp)
    if decomp is None:
        raise TIFFError(f"unsupported TIFF compression {comp}")

    def _undo_predictor(block: bytes, nrows: int, rbytes: int) -> bytes:
        a = np.frombuffer(block, dtype=np.uint8).copy()
        usable = (len(a) // rbytes) * rbytes
        m = a[:usable].reshape(-1, rbytes // spp, spp) if spp > 1 else a[
            :usable
        ].reshape(-1, rbytes, 1)
        np.cumsum(m, axis=1, dtype=np.uint8, out=m)
        return m.tobytes()

    row_bytes = (w * bps[0] * spp + 7) // 8 if bit1 else w * spp
    if tiled:
        # TIFF 6.0 §15: tiles are (tile_w × tile_l) each, edge tiles padded
        # to full size, ordered left-to-right then top-to-bottom. Tile
        # dimensions must be multiples of 16 (§15.2), so bilevel tile rows
        # are always byte-aligned packed bits.
        if bit1 and (tile_w % 16 or predictor == 2):
            raise TIFFError("malformed bilevel tiled TIFF")
        tiles_across = (w + tile_w - 1) // tile_w
        tiles_down = (h + tile_l - 1) // tile_l
        if len(offsets) < tiles_across * tiles_down:
            raise TIFFError("truncated tile offsets")
        tile_row_bytes = (tile_w // 8) if bit1 else tile_w * spp
        full = np.zeros((tiles_down * tile_l, tiles_across * tile_row_bytes),
                        dtype=np.uint8)
        for ti in range(tiles_across * tiles_down):
            so, sc = offsets[ti], counts[ti]
            tile = decomp(data[so : so + sc])
            if predictor == 2 and not bit1:
                tile = _undo_predictor(tile, tile_l, tile_row_bytes)
            need = tile_l * tile_row_bytes
            if len(tile) < need:
                raise TIFFError("truncated tile data")
            ty, tx = divmod(ti, tiles_across)
            full[
                ty * tile_l : (ty + 1) * tile_l,
                tx * tile_row_bytes : (tx + 1) * tile_row_bytes,
            ] = np.frombuffer(tile[:need], dtype=np.uint8).reshape(
                tile_l, tile_row_bytes
            )
        if bit1:
            bits = np.unpackbits(full, axis=1)[:h, :w]
            if photo == 0:  # WhiteIsZero
                g = np.where(bits == 0, 255, 0).astype(np.uint8)
            else:
                g = np.where(bits == 0, 0, 255).astype(np.uint8)
            return np.repeat(g[:, :, None], 3, axis=2)
        # crop padding: reshape to pixels, cut to (h, w), back to rows
        px_full = full.reshape(tiles_down * tile_l, tiles_across * tile_w, spp)
        arr = np.ascontiguousarray(px_full[:h, :w]).reshape(h, row_bytes)
    else:
        raw = bytearray()
        remaining = h
        for so, sc in zip(offsets, counts):
            strip = decomp(data[so : so + sc])
            nrows = min(rows_per_strip, remaining)
            strip = strip[: nrows * row_bytes]
            if predictor == 2 and not bit1:
                strip = _undo_predictor(strip, nrows, row_bytes)
            raw += strip
            remaining -= nrows
        need = h * row_bytes
        if len(raw) < need:
            raise TIFFError("truncated strip data")
        arr = np.frombuffer(bytes(raw[:need]), dtype=np.uint8).reshape(h, row_bytes)

    if bit1:
        bits = np.unpackbits(arr, axis=1)[:, :w]
        if photo == 0:  # WhiteIsZero: 0 = white
            g = np.where(bits == 0, 255, 0).astype(np.uint8)
        else:
            g = np.where(bits == 0, 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)

    px = arr.reshape(h, w, spp)
    if photo == 3:  # palette: ColorMap is 3*2^bps 16-bit values
        cmap = tags.get(320)
        if not cmap:
            raise TIFFError("palette TIFF without ColorMap")
        n = len(cmap) // 3
        pal = (np.array(cmap, dtype=np.uint32).reshape(3, n).T // 257).astype(np.uint8)
        idx = np.clip(px[:, :, 0], 0, n - 1)
        return np.ascontiguousarray(pal[idx])
    if spp == 1:
        g = px[:, :, 0]
        if photo == 0:
            g = 255 - g
        return np.repeat(g[:, :, None], 3, axis=2)
    if spp >= 3:
        return np.ascontiguousarray(px[:, :, :3])
    raise TIFFError(f"unsupported SamplesPerPixel {spp}")
