"""Pure-stdlib baseline JPEG decoder (S1 image decode path, JPEG payloads).

Sequential DCT (SOF0), 8-bit, greyscale/YCbCr with arbitrary sampling
factors, restart markers. Huffman decode is a per-symbol Python loop over a
flat lookup table; the IDCT runs as one einsum over all blocks; chroma
upsampling follows libjpeg's "fancy" triangular filter so output is within
±1-2 of cv2/libjpeg (sufficient: downstream thresholds are tolerant and the
title-extraction golden asserts text, not pixels).
"""

from __future__ import annotations

import numpy as np

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
)

# IDCT basis: out = C.T @ coeff @ C with C[u, x] = s(u)·cos((2x+1)uπ/16)
_C = np.zeros((8, 8))
for _u in range(8):
    s = np.sqrt(0.125) if _u == 0 else 0.5
    for _x in range(8):
        _C[_u, _x] = s * np.cos((2 * _x + 1) * _u * np.pi / 16)


class JPEGError(ValueError):
    pass


class _Huff:
    """Canonical Huffman table with a (maxlen)-bit flat lookup."""

    def __init__(self, counts: list[int], symbols: bytes):
        self.maxlen = 0
        code = 0
        entries = []  # (code, length, symbol)
        k = 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                entries.append((code, length, symbols[k]))
                code += 1
                k += 1
            code <<= 1
        self.maxlen = max((ln for _, ln, _ in entries), default=0)
        size = 1 << self.maxlen
        self.lut_sym = np.zeros(size, dtype=np.uint8)
        self.lut_len = np.zeros(size, dtype=np.uint8)
        for c, ln, sym in entries:
            shift = self.maxlen - ln
            start = c << shift
            self.lut_sym[start : start + (1 << shift)] = sym
            self.lut_len[start : start + (1 << shift)] = ln


def _extend(v: int, n: int) -> int:
    return v - (1 << n) + 1 if n and v < (1 << (n - 1)) else v


def decode_jpeg(data: bytes) -> np.ndarray:
    """JPEG bytes → RGB uint8 (H, W, 3) (grayscale replicated). Baseline
    (SOF0/1) and progressive (SOF2) Huffman DCT."""
    if data[:2] != b"\xff\xd8":
        raise JPEGError("not a JPEG")
    if _sniff_sof(data) == 0xC2:
        return _decode_progressive(data)

    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _Huff] = {}
    huff_ac: dict[int, _Huff] = {}
    restart_interval = 0
    frame = None
    scan = None
    i = 2
    while i < len(data):
        if data[i] != 0xFF:
            i += 1
            continue
        marker = data[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xD9:
            break
        length = int.from_bytes(data[i + 2 : i + 4], "big")
        seg = data[i + 4 : i + 2 + length]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                if pq == 0:
                    tbl = np.frombuffer(seg[p + 1 : p + 65], dtype=np.uint8).astype(np.int32)
                    p += 65
                else:
                    tbl = np.frombuffer(seg[p + 1 : p + 129], dtype=">u2").astype(np.int32)
                    p += 129
                qt[tq] = tbl
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                counts = list(seg[p + 1 : p + 17])
                n = sum(counts)
                symbols = seg[p + 17 : p + 17 + n]
                (huff_dc if tc == 0 else huff_ac)[th] = _Huff(counts, symbols)
                p += 17 + n
        elif marker in (0xC0, 0xC1):  # SOF0/1 baseline
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            nc = seg[5]
            comps = []
            for c in range(nc):
                cid = seg[6 + c * 3]
                hv = seg[7 + c * 3]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": seg[8 + c * 3]})
            frame = {"w": w, "h": h, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise JPEGError(f"unsupported SOF marker {hex(marker)} (non-baseline)")
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(seg[0:2], "big")
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan_comps = []
            for c in range(ns):
                cs = seg[1 + c * 2]
                tt = seg[2 + c * 2]
                scan_comps.append({"id": cs, "dc": tt >> 4, "ac": tt & 15})
            scan = scan_comps
            i = i + 2 + length
            break
        i += 2 + length

    if frame is None or scan is None:
        raise JPEGError("missing SOF/SOS")

    # entropy-coded data: unstuff 0xFF00, note restart markers
    raw = bytearray()
    restarts = []  # byte offsets in raw where a restart occurred
    j = i
    while j < len(data) - 1:
        b = data[j]
        if b == 0xFF:
            nxt = data[j + 1]
            if nxt == 0x00:
                raw.append(0xFF)
                j += 2
                continue
            if 0xD0 <= nxt <= 0xD7:
                restarts.append(len(raw))
                j += 2
                continue
            break  # EOI or next marker
        raw.append(b)
        j += 1
    raw = bytes(raw)

    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    w, h = frame["w"], frame["h"]
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    # per-component coefficient storage
    planes_coeff = []
    for c in comps:
        bw = mcux * c["h"]
        bh = mcuy * c["v"]
        planes_coeff.append(np.zeros((bh * bw, 64), dtype=np.int32))

    sc_by_id = {s["id"]: s for s in scan}
    dc_pred = [0] * len(comps)
    mcu_done = 0

    # hot loop: all bit-reader state in locals; huffman LUTs as python lists
    acc = 0
    nbits = 0
    pos = 0
    rdata = raw
    rlen = len(raw)
    tables = {}
    for th, hh in list(huff_dc.items()):
        tables[("dc", th)] = (hh.maxlen, hh.lut_sym.tolist(), hh.lut_len.tolist())
    for th, hh in list(huff_ac.items()):
        tables[("ac", th)] = (hh.maxlen, hh.lut_sym.tolist(), hh.lut_len.tolist())
    comp_info = []
    for c in comps:
        s = sc_by_id[c["id"]]
        comp_info.append(
            (tables[("dc", s["dc"])], tables[("ac", s["ac"])], c["h"], c["v"], mcux * c["h"])
        )
    out_blocks = [pc for pc in planes_coeff]

    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_done and mcu_done % restart_interval == 0:
                consumed = pos - (nbits >> 3)
                nxt_off = None
                for off in restarts:
                    if off >= consumed:
                        nxt_off = off
                        break
                if nxt_off is not None:
                    pos = nxt_off
                acc = 0
                nbits = 0
                dc_pred = [0] * len(comps)
            for ci in range(len(comps)):
                (dmax, dsym, dlen), (amax, asym, alen), ch, cv, bw = comp_info[ci]
                for by in range(cv):
                    for bx in range(ch):
                        block = [0] * 64
                        # DC
                        while nbits < dmax:
                            acc = (acc << 8) | (rdata[pos] if pos < rlen else 0)
                            pos += 1
                            nbits += 8
                        idx = (acc >> (nbits - dmax)) & ((1 << dmax) - 1)
                        t = dsym[idx]
                        ln = dlen[idx]
                        if ln == 0:
                            raise JPEGError("bad huffman code")
                        nbits -= ln
                        acc &= (1 << nbits) - 1
                        if t:
                            while nbits < t:
                                acc = (acc << 8) | (rdata[pos] if pos < rlen else 0)
                                pos += 1
                                nbits += 8
                            v = (acc >> (nbits - t)) & ((1 << t) - 1)
                            nbits -= t
                            acc &= (1 << nbits) - 1
                            if v < (1 << (t - 1)):
                                v = v - (1 << t) + 1
                            dc_pred[ci] += v
                        block[0] = dc_pred[ci]
                        # AC
                        k = 1
                        while k < 64:
                            while nbits < amax:
                                acc = (acc << 8) | (rdata[pos] if pos < rlen else 0)
                                pos += 1
                                nbits += 8
                            idx = (acc >> (nbits - amax)) & ((1 << amax) - 1)
                            rs = asym[idx]
                            ln = alen[idx]
                            if ln == 0:
                                raise JPEGError("bad huffman code")
                            nbits -= ln
                            acc &= (1 << nbits) - 1
                            size = rs & 15
                            if size == 0:
                                if rs == 0xF0:
                                    k += 16
                                    continue
                                break  # EOB
                            k += rs >> 4
                            if k > 63:
                                break
                            while nbits < size:
                                acc = (acc << 8) | (rdata[pos] if pos < rlen else 0)
                                pos += 1
                                nbits += 8
                            v = (acc >> (nbits - size)) & ((1 << size) - 1)
                            nbits -= size
                            acc &= (1 << nbits) - 1
                            if v < (1 << (size - 1)):
                                v = v - (1 << size) + 1
                            block[k] = v
                            k += 1
                        row = my * cv + by
                        col = mx * ch + bx
                        out_blocks[ci][row * bw + col] = block
            mcu_done += 1

    return _reconstruct(comps, planes_coeff, qt, w, h, mcux, mcuy, hmax, vmax)


def _reconstruct(comps, planes_coeff, qt, w, h, mcux, mcuy, hmax, vmax) -> np.ndarray:
    """Zigzag coefficient planes → RGB: dequantize + IDCT (one einsum over
    all blocks), fancy chroma upsampling, YCbCr→RGB. Shared by the baseline
    and progressive paths."""
    planes = []
    for ci, c in enumerate(comps):
        bw = mcux * c["h"]
        bh = mcuy * c["v"]
        coeff = planes_coeff[ci] * qt[c["tq"]][None, :]
        blocks = np.zeros((coeff.shape[0], 64), dtype=np.float64)
        blocks[:, ZIGZAG] = coeff
        blocks = blocks.reshape(-1, 8, 8)
        spatial = np.einsum("ux,nuv,vy->nxy", _C, blocks, _C, optimize=True) + 128.0
        plane = (
            spatial.reshape(bh, bw, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(bh * 8, bw * 8)
        )
        planes.append(np.clip(np.rint(plane), 0, 255).astype(np.uint8))

    # upsample to full resolution (libjpeg fancy/triangular for 2x factors)
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        fx = hmax // c["h"]
        fy = vmax // c["v"]
        if fx == 1 and fy == 1:
            up = p
        else:
            up = p
            if fx == 2:
                up = _fancy_upsample_axis(up, axis=1)
            elif fx > 1:
                up = np.repeat(up, fx, axis=1)
            if fy == 2:
                up = _fancy_upsample_axis(up, axis=0)
            elif fy > 1:
                up = np.repeat(up, fy, axis=0)
        full.append(up[: mcuy * vmax * 8, : mcux * hmax * 8])

    if len(comps) == 1:
        y = full[0][:h, :w]
        return np.repeat(y[:, :, None], 3, axis=2)
    if len(comps) != 3:
        raise JPEGError(f"unsupported component count {len(comps)}")

    y = full[0][:h, :w].astype(np.float64)
    cb = full[1][:h, :w].astype(np.float64) - 128.0
    cr = full[2][:h, :w].astype(np.float64) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


# ------------------------------------------------------ progressive (SOF2)

def _sniff_sof(data: bytes) -> int | None:
    """First SOF marker in the stream (header-only walk, no entropy data)."""
    i = 2
    n = len(data)
    while i < n - 1:
        if data[i] != 0xFF:
            i += 1
            continue
        m = data[i + 1]
        if m in (0xD8, 0x01) or 0xD0 <= m <= 0xD7:
            i += 2
            continue
        if m == 0xD9:
            return None
        if m in (0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            return m
        if m == 0xDA:  # SOS before SOF: malformed; let main parser complain
            return None
        i += 2 + int.from_bytes(data[i + 2 : i + 4], "big")
    return None


class _Bits:
    """MSB-first bit reader over unstuffed entropy bytes (zero-padded at the
    end, as libjpeg does for truncated streams)."""

    __slots__ = ("d", "n_total", "pos", "acc", "n")

    def __init__(self, d: bytes):
        self.d = d
        self.n_total = len(d)
        self.pos = 0
        self.acc = 0
        self.n = 0

    def read(self, k: int) -> int:
        if k == 0:
            return 0
        while self.n < k:
            self.acc = (self.acc << 8) | (self.d[self.pos] if self.pos < self.n_total else 0)
            self.pos += 1
            self.n += 8
        v = (self.acc >> (self.n - k)) & ((1 << k) - 1)
        self.n -= k
        self.acc &= (1 << self.n) - 1
        return v

    def huff(self, table: "_Huff") -> int:
        maxlen = table.maxlen
        while self.n < maxlen:
            self.acc = (self.acc << 8) | (self.d[self.pos] if self.pos < self.n_total else 0)
            self.pos += 1
            self.n += 8
        idx = (self.acc >> (self.n - maxlen)) & ((1 << maxlen) - 1)
        ln = int(table.lut_len[idx])
        if ln == 0:
            raise JPEGError("bad huffman code")
        self.n -= ln
        self.acc &= (1 << self.n) - 1
        return int(table.lut_sym[idx])


def _split_restarts(data: bytes, start: int) -> tuple[list[bytes], int]:
    """Entropy-coded span from `start` to the next non-RST marker: unstuff
    0xFF00 and split at RSTn. Returns (chunks, index of terminating marker)."""
    chunks: list[bytes] = []
    cur = bytearray()
    j = start
    n = len(data)
    while j < n:
        b = data[j]
        if b != 0xFF:
            cur.append(b)
            j += 1
            continue
        nxt = data[j + 1] if j + 1 < n else 0xD9
        if nxt == 0x00:
            cur.append(0xFF)
            j += 2
            continue
        if 0xD0 <= nxt <= 0xD7:
            chunks.append(bytes(cur))
            cur = bytearray()
            j += 2
            continue
        break
    chunks.append(bytes(cur))
    return chunks, j


def _decode_progressive(data: bytes) -> np.ndarray:
    """Progressive JPEG: coefficients accumulate over multiple scans with
    spectral selection (Ss..Se) and successive approximation (Ah, Al);
    the refinement algorithms follow ITU-T T.81 §G.1.2 (same semantics as
    libjpeg jdphuff.c). Coefficients are stored in zigzag order and
    reconstructed by the shared baseline tail."""
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _Huff] = {}
    huff_ac: dict[int, _Huff] = {}
    restart_interval = 0
    frame = None
    comps = None
    planes_coeff = None
    geo = None  # (mcux, mcuy, hmax, vmax, per-comp block dims)

    i = 2
    n = len(data)
    while i < n - 1:
        if data[i] != 0xFF:
            i += 1
            continue
        marker = data[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xD9:
            break
        length = int.from_bytes(data[i + 2 : i + 4], "big")
        seg = data[i + 4 : i + 2 + length]
        if marker == 0xDB:
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                if pq == 0:
                    qt[tq] = np.frombuffer(seg[p + 1 : p + 65], dtype=np.uint8).astype(np.int32)
                    p += 65
                else:
                    qt[tq] = np.frombuffer(seg[p + 1 : p + 129], dtype=">u2").astype(np.int32)
                    p += 129
        elif marker == 0xC4:
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                counts = list(seg[p + 1 : p + 17])
                nsym = sum(counts)
                (huff_dc if tc == 0 else huff_ac)[th] = _Huff(counts, seg[p + 17 : p + 17 + nsym])
                p += 17 + nsym
        elif marker == 0xC2:
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            nc = seg[5]
            comps = []
            for c in range(nc):
                hv = seg[7 + c * 3]
                comps.append({"id": seg[6 + c * 3], "h": hv >> 4, "v": hv & 15, "tq": seg[8 + c * 3]})
            frame = {"w": w, "h": h}
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcux = -(-w // (8 * hmax))
            mcuy = -(-h // (8 * vmax))
            planes_coeff = []
            dims = []
            for c in comps:
                bw = mcux * c["h"]
                bh = mcuy * c["v"]
                planes_coeff.append(np.zeros((bh * bw, 64), dtype=np.int32))
                # non-interleaved scans cover only ceil(comp_size/8) blocks
                cw = -(-(w * c["h"]) // hmax)
                chh = -(-(h * c["v"]) // vmax)
                dims.append((bw, -(-cw // 8), -(-chh // 8)))
            geo = (mcux, mcuy, hmax, vmax, dims)
        elif marker in (0xC0, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise JPEGError(f"mixed/unsupported SOF {hex(marker)} in progressive stream")
        elif marker == 0xDD:
            restart_interval = int.from_bytes(seg[0:2], "big")
        elif marker == 0xDA:
            if frame is None:
                raise JPEGError("SOS before SOF2")
            ns = seg[0]
            scomps = []
            for c in range(ns):
                cid = seg[1 + c * 2]
                tt = seg[2 + c * 2]
                ci = next(k for k, fc in enumerate(comps) if fc["id"] == cid)
                scomps.append((ci, tt >> 4, tt & 15))
            ss, se = seg[1 + ns * 2], seg[2 + ns * 2]
            ahl = seg[3 + ns * 2]
            ah, al = ahl >> 4, ahl & 15
            chunks, i = _split_restarts(data, i + 2 + length)
            _decode_progressive_scan(
                chunks, scomps, ss, se, ah, al, comps, geo,
                huff_dc, huff_ac, planes_coeff, restart_interval,
            )
            continue
        i += 2 + length

    if frame is None or planes_coeff is None:
        raise JPEGError("missing SOF2/SOS")
    mcux, mcuy, hmax, vmax, _ = geo
    return _reconstruct(
        comps, planes_coeff, qt, frame["w"], frame["h"], mcux, mcuy, hmax, vmax
    )


def _decode_progressive_scan(
    chunks, scomps, ss, se, ah, al, comps, geo, huff_dc, huff_ac,
    planes_coeff, restart_interval,
) -> None:
    mcux, mcuy, hmax, vmax, dims = geo
    dc_scan = ss == 0
    p1 = 1 << al
    m1 = -p1

    # iteration order: interleaved (MCU) for multi-component DC scans,
    # component raster order for single-component scans (T.81 §G.1)
    if len(scomps) > 1:
        units = []  # each unit = list of (ci, block_index)
        for my in range(mcuy):
            for mx in range(mcux):
                blocks = []
                for ci, _, _ in scomps:
                    c = comps[ci]
                    bw = dims[ci][0]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            blocks.append((ci, (my * c["v"] + by) * bw + mx * c["h"] + bx))
                units.append(blocks)
    else:
        ci = scomps[0][0]
        bw, cwb, chb = dims[ci]
        units = [[(ci, r * bw + col)] for r in range(chb) for col in range(cwb)]

    chunk_iter = iter(chunks)
    bits = _Bits(next(chunk_iter))
    dc_pred = [0] * len(comps)
    eobrun = 0
    done = 0
    for unit in units:
        if restart_interval and done and done % restart_interval == 0:
            nxt = next(chunk_iter, None)
            if nxt is not None:
                bits = _Bits(nxt)
                dc_pred = [0] * len(comps)
                eobrun = 0
        for ci, bi in unit:
            coef = planes_coeff[ci][bi]
            if dc_scan:
                tdc = next(t for c2, t, _ in scomps if c2 == ci)
                if ah == 0:  # DC first
                    t = bits.huff(huff_dc[tdc])
                    diff = _extend(bits.read(t), t) if t else 0
                    dc_pred[ci] += diff
                    coef[0] = dc_pred[ci] << al
                else:  # DC refine
                    if bits.read(1):
                        coef[0] = int(coef[0]) | p1
            elif ah == 0:  # AC first
                tac = scomps[0][2]
                if eobrun > 0:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    rs = bits.huff(huff_ac[tac])
                    r, s = rs >> 4, rs & 15
                    if s == 0:
                        if r != 15:
                            eobrun = (1 << r) - 1
                            if r:
                                eobrun += bits.read(r)
                            break
                        k += 16
                        continue
                    k += r
                    if k > se:
                        break
                    coef[k] = _extend(bits.read(s), s) << al
                    k += 1
            else:  # AC refine (T.81 §G.1.2.3 / libjpeg decode_mcu_AC_refine)
                tac = scomps[0][2]
                k = ss
                if eobrun == 0:
                    while k <= se:
                        rs = bits.huff(huff_ac[tac])
                        r, s = rs >> 4, rs & 15
                        val = 0
                        if s == 0:
                            if r != 15:
                                eobrun = 1 << r
                                if r:
                                    eobrun += bits.read(r)
                                break
                        else:
                            val = p1 if bits.read(1) else m1
                        while k <= se:
                            cv = int(coef[k])
                            if cv != 0:
                                if bits.read(1) and (cv & p1) == 0:
                                    coef[k] = cv + (p1 if cv >= 0 else m1)
                            else:
                                r -= 1
                                if r < 0:
                                    break
                            k += 1
                        if val and k <= se:
                            coef[k] = val
                        k += 1
                if eobrun > 0:
                    while k <= se:
                        cv = int(coef[k])
                        if cv != 0:
                            if bits.read(1) and (cv & p1) == 0:
                                coef[k] = cv + (p1 if cv >= 0 else m1)
                        k += 1
                    eobrun -= 1
        done += 1


def _fancy_upsample_axis(p: np.ndarray, axis: int) -> np.ndarray:
    """libjpeg h2v1-style triangular upsampling along one axis:
    out[2i] = (3·p[i] + p[i-1] + 2) >> 2, out[2i+1] = (3·p[i] + p[i+1] + 1) >> 2
    with edge replication."""
    a = np.moveaxis(p, axis, -1).astype(np.int32)
    left = np.concatenate([a[..., :1], a[..., :-1]], axis=-1)
    right = np.concatenate([a[..., 1:], a[..., -1:]], axis=-1)
    even = (3 * a + left + 2) >> 2
    odd = (3 * a + right + 1) >> 2
    out = np.empty(a.shape[:-1] + (a.shape[-1] * 2,), dtype=np.int32)
    out[..., 0::2] = even
    out[..., 1::2] = odd
    return np.moveaxis(out, -1, axis).astype(np.uint8)
