"""ITU-T T.4 (Group 3) / T.6 (Group 4 MMR) bilevel fax codecs.

CCITT G3/G4 is the dominant compression of real scanned-document corpora:
TIFF compressions 2 (Modified Huffman RLE), 3 (T.4 G3, 1-D or 2-D per
T4Options) and 4 (T.6 MMR), plus the PDF ``CCITTFaxDecode`` stream filter.
The reference accepts all of them through compiled binaries
(cv2.imdecode: /root/reference/src/img2table/document/image.py:25-32;
pdfium: /root/reference/src/img2table/document/pdf.py:46-67); this module
re-implements them from the public ITU-T Recommendation T.4 (code tables
2/3/4: terminating, make-up, extended make-up) and T.6 §2 (pass /
horizontal / vertical mode codes).

Verification strategy (same as webp/jpeg/exr): the code tables are checked
prefix-free at import; tests pin HAND-ASSEMBLED bitstreams written straight
from the spec tables (independent of the encoder below), plus two-sided
round-trips through the independent fixture encoders, plus fuzz on
truncated/corrupt streams.

Conventions: a decoded line is a black-run mask (1 = black ink). Lines are
represented during 2-D coding as sorted "changing element" positions; the
element at even index is a white→black transition (T.4 §4.2.1.3.1 coding
starts each line with an imaginary white element before pixel 0).
"""

from __future__ import annotations

from bisect import bisect_right

import numpy as np


class CCITTError(ValueError):
    pass


# ------------------------------------------------------------- code tables
# ITU-T T.4 Table 2 (terminating) / Table 3 (make-up) / Table 4 (extended
# make-up, shared by both colours). Strings are MSB-first bit patterns.

_WHITE_CODES = {
    0: "00110101", 1: "000111", 2: "0111", 3: "1000", 4: "1011", 5: "1100",
    6: "1110", 7: "1111", 8: "10011", 9: "10100", 10: "00111", 11: "01000",
    12: "001000", 13: "000011", 14: "110100", 15: "110101", 16: "101010",
    17: "101011", 18: "0100111", 19: "0001100", 20: "0001000", 21: "0010111",
    22: "0000011", 23: "0000100", 24: "0101000", 25: "0101011", 26: "0010011",
    27: "0100100", 28: "0011000", 29: "00000010", 30: "00000011",
    31: "00011010", 32: "00011011", 33: "00010010", 34: "00010011",
    35: "00010100", 36: "00010101", 37: "00010110", 38: "00010111",
    39: "00101000", 40: "00101001", 41: "00101010", 42: "00101011",
    43: "00101100", 44: "00101101", 45: "00000100", 46: "00000101",
    47: "00001010", 48: "00001011", 49: "01010010", 50: "01010011",
    51: "01010100", 52: "01010101", 53: "00100100", 54: "00100101",
    55: "01011000", 56: "01011001", 57: "01011010", 58: "01011011",
    59: "01001010", 60: "01001011", 61: "00110010", 62: "00110011",
    63: "00110100",
    # make-up
    64: "11011", 128: "10010", 192: "010111", 256: "0110111",
    320: "00110110", 384: "00110111", 448: "01100100", 512: "01100101",
    576: "01101000", 640: "01100111", 704: "011001100", 768: "011001101",
    832: "011010010", 896: "011010011", 960: "011010100", 1024: "011010101",
    1088: "011010110", 1152: "011010111", 1216: "011011000",
    1280: "011011001", 1344: "011011010", 1408: "011011011",
    1472: "010011000", 1536: "010011001", 1600: "010011010", 1664: "011000",
    1728: "010011011",
}

_BLACK_CODES = {
    0: "0000110111", 1: "010", 2: "11", 3: "10", 4: "011", 5: "0011",
    6: "0010", 7: "00011", 8: "000101", 9: "000100", 10: "0000100",
    11: "0000101", 12: "0000111", 13: "00000100", 14: "00000111",
    15: "000011000", 16: "0000010111", 17: "0000011000", 18: "0000001000",
    19: "00001100111", 20: "00001101000", 21: "00001101100",
    22: "00000110111", 23: "00000101000", 24: "00000010111",
    25: "00000011000", 26: "000011001010", 27: "000011001011",
    28: "000011001100", 29: "000011001101", 30: "000001101000",
    31: "000001101001", 32: "000001101010", 33: "000001101011",
    34: "000011010010", 35: "000011010011", 36: "000011010100",
    37: "000011010101", 38: "000011010110", 39: "000011010111",
    40: "000001101100", 41: "000001101101", 42: "000011011010",
    43: "000011011011", 44: "000001010100", 45: "000001010101",
    46: "000001010110", 47: "000001010111", 48: "000001100100",
    49: "000001100101", 50: "000001010010", 51: "000001010011",
    52: "000000100100", 53: "000000110111", 54: "000000111000",
    55: "000000100111", 56: "000000101000", 57: "000001011000",
    58: "000001011001", 59: "000000101011", 60: "000000101100",
    61: "000001011010", 62: "000001100110", 63: "000001100111",
    # make-up
    64: "0000001111", 128: "000011001000", 192: "000011001001",
    256: "000001011011", 320: "000000110011", 384: "000000110100",
    448: "000000110101", 512: "0000001101100", 576: "0000001101101",
    640: "0000001001010", 704: "0000001001011", 768: "0000001001100",
    832: "0000001001101", 896: "0000001110010", 960: "0000001110011",
    1024: "0000001110100", 1088: "0000001110101", 1152: "0000001110110",
    1216: "0000001110111", 1280: "0000001010010", 1344: "0000001010011",
    1408: "0000001010100", 1472: "0000001010101", 1536: "0000001011010",
    1600: "0000001011011", 1664: "0000001100100", 1728: "0000001100101",
}

_EXT_CODES = {  # T.4 Table 4 — shared by both colours
    1792: "00000001000", 1856: "00000001100", 1920: "00000001101",
    1984: "000000010010", 2048: "000000010011", 2112: "000000010100",
    2176: "000000010101", 2240: "000000010110", 2304: "000000010111",
    2368: "000000011100", 2432: "000000011101", 2496: "000000011110",
    2560: "000000011111",
}

_EOL = "000000000001"  # 11 zeros + 1


def _build_decode(codes: dict[int, str]) -> dict[tuple[int, int], int]:
    full = dict(codes)
    full.update(_EXT_CODES)
    out: dict[tuple[int, int], int] = {}
    for run, bits in full.items():
        key = (len(bits), int(bits, 2))
        if key in out:
            raise AssertionError(f"duplicate CCITT code {bits}")
        out[key] = run
    return out


def _check_prefix_free(codes: dict[int, str], name: str) -> None:
    """Import-time sanity: the table (plus EOL) must be prefix-free."""
    allc = list(codes.values()) + list(_EXT_CODES.values()) + [_EOL]
    allc.sort()
    for a, b in zip(allc, allc[1:]):
        if b.startswith(a):
            raise AssertionError(f"CCITT {name} table not prefix-free: {a} / {b}")


_check_prefix_free(_WHITE_CODES, "white")
_check_prefix_free(_BLACK_CODES, "black")

_W_DEC = _build_decode(_WHITE_CODES)
_B_DEC = _build_decode(_BLACK_CODES)
_MAX_CODE_LEN = 13

_REV8 = np.array(
    [int(f"{i:08b}"[::-1], 2) for i in range(256)], dtype=np.uint8
)  # FillOrder 2 → 1


# ---------------------------------------------------------------- bit I/O

class _BitReader:
    __slots__ = ("data", "pos", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.nbits = len(data) * 8

    def peek(self, k: int) -> int:
        """Next k bits MSB-first (zero-padded past end of data)."""
        byte = self.pos >> 3
        chunk = int.from_bytes(self.data[byte : byte + 4].ljust(4, b"\0"), "big")
        return (chunk >> (32 - (self.pos & 7) - k)) & ((1 << k) - 1)

    def skip(self, k: int) -> None:
        self.pos += k

    def byte_align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def exhausted(self) -> bool:
        return self.pos >= self.nbits


class _BitWriter:
    __slots__ = ("buf", "acc", "n")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, bits: str) -> None:
        for b in bits:
            self.acc = (self.acc << 1) | (b == "1")
            self.n += 1
            if self.n == 8:
                self.buf.append(self.acc)
                self.acc = 0
                self.n = 0

    def byte_align(self) -> None:
        if self.n:
            self.buf.append(self.acc << (8 - self.n))
            self.acc = 0
            self.n = 0

    def getvalue(self) -> bytes:
        self.byte_align()
        return bytes(self.buf)


# ----------------------------------------------------------------- decode

def _read_run(br: _BitReader, dec: dict[tuple[int, int], int]) -> int:
    """One total run length: make-up codes accumulate until a terminating
    code (< 64) arrives (T.4 §4.1.3; runs ≥ 2624 chain 2560-makeups)."""
    total = 0
    while True:
        for n in range(2, _MAX_CODE_LEN + 1):
            run = dec.get((n, br.peek(n)))
            if run is not None:
                br.skip(n)
                break
        else:
            raise CCITTError("invalid run-length code")
        total += run
        if run < 64:
            return total
        if br.exhausted():
            raise CCITTError("truncated after make-up code")


def _decode_1d_line(br: _BitReader, width: int) -> list[int]:
    """One MH-coded line → changing-element positions (even idx = w→b)."""
    trans: list[int] = []
    pos = 0
    white = True
    while pos < width:
        if br.exhausted():
            raise CCITTError("truncated 1-D line")
        run = _read_run(br, _W_DEC if white else _B_DEC)
        pos += run
        if pos > width:
            raise CCITTError("1-D run overruns the line")
        trans.append(pos)
        white = not white
    if trans and trans[-1] == width:
        trans.pop()
    return trans


def _b1_b2(ref: list[int], a0: int, white: bool, width: int) -> tuple[int, int]:
    """b1 = first ref changing element > a0 whose pixel colour is opposite
    a0's colour; b2 = the next one (T.4 §4.2.1.3.2)."""
    i = bisect_right(ref, a0)
    if (i & 1) != (0 if white else 1):
        i += 1
    b1 = ref[i] if i < len(ref) else width
    b2 = ref[i + 1] if i + 1 < len(ref) else width
    return b1, b2


def _decode_2d_line(br: _BitReader, width: int, ref: list[int]) -> list[int]:
    """One MR/MMR-coded line against reference transitions → transitions."""
    trans: list[int] = []
    a0 = -1
    white = True
    while True:
        a0pos = 0 if a0 < 0 else a0
        if br.exhausted():
            raise CCITTError("truncated 2-D line")
        b1, b2 = _b1_b2(ref, a0, white, width)
        # mode code (prefix-free): V0=1, VR1=011, VL1=010, H=001, P=0001,
        # VR2=000011, VL2=000010, VR3=0000011, VL3=0000010
        if br.peek(1) == 1:
            br.skip(1)
            mode, d = "v", 0
        else:
            c3 = br.peek(3)
            if c3 == 0b011:
                br.skip(3); mode, d = "v", 1
            elif c3 == 0b010:
                br.skip(3); mode, d = "v", -1
            elif c3 == 0b001:
                br.skip(3); mode, d = "h", 0
            elif br.peek(4) == 0b0001:
                br.skip(4); mode, d = "p", 0
            elif br.peek(6) == 0b000011:
                br.skip(6); mode, d = "v", 2
            elif br.peek(6) == 0b000010:
                br.skip(6); mode, d = "v", -2
            elif br.peek(7) == 0b0000011:
                br.skip(7); mode, d = "v", 3
            elif br.peek(7) == 0b0000010:
                br.skip(7); mode, d = "v", -3
            else:
                raise CCITTError("invalid 2-D mode code")
        if mode == "p":
            a0 = b2  # current run passes under the ref pair
        elif mode == "v":
            a1 = b1 + d
            if a1 < a0pos or a1 > width:
                raise CCITTError("vertical mode out of range")
            trans.append(a1)
            a0 = a1
            white = not white
        else:  # horizontal: two MH runs, colour unchanged after both
            r1 = _read_run(br, _W_DEC if white else _B_DEC)
            r2 = _read_run(br, _B_DEC if white else _W_DEC)
            a1 = a0pos + r1
            a2 = a1 + r2
            if a2 > width:
                raise CCITTError("horizontal mode overruns the line")
            trans.extend((a1, a2))
            a0 = a2
        if a0 >= width:
            break
    while trans and trans[-1] >= width:
        trans.pop()
    return trans


def _trans_to_row(trans: list[int], width: int) -> np.ndarray:
    row = np.zeros(width, dtype=np.uint8)
    for j in range(0, len(trans), 2):
        start = trans[j]
        end = trans[j + 1] if j + 1 < len(trans) else width
        row[start:end] = 1
    return row


def _try_consume_eol(br: _BitReader) -> bool:
    """Consume fill bits + EOL (≥11 zeros then a 1) if present at pos."""
    save = br.pos
    zeros = 0
    while not br.exhausted() and br.peek(1) == 0:
        br.skip(1)
        zeros += 1
        if zeros > 64:  # fill is bounded; don't scan forever on garbage
            br.pos = save
            return False
    if zeros >= 11 and not br.exhausted() and br.peek(1) == 1:
        br.skip(1)
        return True
    br.pos = save
    return False


def decode_ccitt(
    data: bytes,
    width: int,
    height: int,
    *,
    mode: str,
    byte_align: bool = False,
    expect_eol: bool = False,
) -> np.ndarray:
    """Decode a CCITT bitstream → (height, width) uint8 black mask (1=ink).

    mode: "mh"   — pure 1-D modified Huffman lines (TIFF comp 2 uses
                   byte_align=True; PDF K=0 uses byte_align per filter parm)
          "g3_2d"— T.4 2-D: each line tagged 1-D/2-D (TIFF comp 3 with
                   T4Options bit 0; PDF K>0). The tag bit follows each EOL
                   when EOLs are present, else directly precedes the line.
          "g4"   — T.6 MMR (TIFF comp 4; PDF K<0). No EOLs; EOFB ignored.
    """
    br = _BitReader(data)
    rows: list[np.ndarray] = []
    # imaginary all-white reference line above the page (T.6 §2.2.1)
    ref: list[int] = []
    while len(rows) < height:
        if byte_align:
            br.byte_align()
        saw_eol = False
        if mode != "g4":
            saw_eol = _try_consume_eol(br)
            if expect_eol and not saw_eol and not rows:
                # T.4 data "begins with an EOL" but real writers differ;
                # tolerate a missing leading EOL.
                pass
        if br.exhausted():
            raise CCITTError(
                f"truncated CCITT stream: {len(rows)}/{height} rows decoded"
            )
        if mode == "mh":
            trans = _decode_1d_line(br, width)
        elif mode == "g4":
            trans = _decode_2d_line(br, width, ref)
        elif mode == "g3_2d":
            one_d = br.peek(1) == 1
            br.skip(1)
            trans = (
                _decode_1d_line(br, width)
                if one_d
                else _decode_2d_line(br, width, ref)
            )
        else:
            raise CCITTError(f"unknown CCITT mode {mode!r}")
        rows.append(_trans_to_row(trans, width))
        ref = trans
    return np.stack(rows)


def decode_ccitt_tiff(
    data: bytes,
    width: int,
    height: int,
    compression: int,
    *,
    t4_options: int = 0,
    t6_options: int = 0,
    fill_order: int = 1,
) -> np.ndarray:
    """TIFF compressions 2/3/4 → black mask. One strip's worth of rows."""
    if fill_order == 2:
        data = _REV8[np.frombuffer(data, dtype=np.uint8)].tobytes()
    if compression == 2:
        # Modified Huffman RLE: no EOLs, every line starts byte-aligned
        return decode_ccitt(data, width, height, mode="mh", byte_align=True)
    if compression == 3:
        if t4_options & 2:
            raise CCITTError("T.4 uncompressed mode unsupported")
        mode = "g3_2d" if (t4_options & 1) else "mh"
        return decode_ccitt(data, width, height, mode=mode, expect_eol=True)
    if compression == 4:
        if t6_options & 2:
            raise CCITTError("T.6 uncompressed mode unsupported")
        return decode_ccitt(data, width, height, mode="g4")
    raise CCITTError(f"not a CCITT compression: {compression}")


def decode_ccitt_pdf(
    data: bytes,
    columns: int,
    rows: int,
    *,
    k: int = 0,
    byte_align: bool = False,
) -> np.ndarray:
    """PDF CCITTFaxDecode filter core → black mask. K<0 = G4, K=0 = pure
    1-D, K>0 = mixed 2-D (tag bit per line). BlackIs1/Decode mapping is the
    caller's job — the mask is colour-true (1 = black ink)."""
    if k < 0:
        mode = "g4"
    elif k == 0:
        mode = "mh"
    else:
        mode = "g3_2d"
    return decode_ccitt(
        data, columns, rows, mode=mode, byte_align=byte_align,
        expect_eol=(k >= 0),
    )


# ----------------------------------------------------------------- encode
# Independent fixture generators (tests + q14 corpus) — written from the
# same public tables but structurally separate from the decoder, so a
# round-trip is a two-sided check.

def _encode_run(bw: _BitWriter, run: int, white: bool) -> None:
    codes = _WHITE_CODES if white else _BLACK_CODES
    while run >= 2624:
        bw.write(_EXT_CODES[2560])
        run -= 2560
    if run >= 64:
        makeup = (run // 64) * 64
        bw.write(_EXT_CODES[makeup] if makeup >= 1792 else codes[makeup])
        run -= makeup
    bw.write(codes[run])


def _line_trans(row: np.ndarray) -> list[int]:
    """Black-mask row → changing element positions (even idx = w→b)."""
    d = np.flatnonzero(np.diff(row.astype(np.int8)))
    trans = (d + 1).tolist()
    if row[0]:
        trans.insert(0, 0)
    return trans


def _encode_1d_line(bw: _BitWriter, row: np.ndarray, width: int) -> None:
    trans = _line_trans(row)
    prev = 0
    white = True
    for t in trans:
        _encode_run(bw, t - prev, white)
        prev = t
        white = not white
    _encode_run(bw, width - prev, white)


def _encode_2d_line(
    bw: _BitWriter, trans: list[int], ref: list[int], width: int
) -> None:
    a0 = -1
    white = True
    while True:
        a0pos = 0 if a0 < 0 else a0
        i = bisect_right(trans, a0)
        if (i & 1) != (0 if white else 1):
            i += 1
        a1 = trans[i] if i < len(trans) else width
        a2 = trans[i + 1] if i + 1 < len(trans) else width
        b1, b2 = _b1_b2(ref, a0, white, width)
        if b2 < a1:
            bw.write("0001")  # pass
            a0 = b2
        elif abs(a1 - b1) <= 3:
            bw.write({0: "1", 1: "011", 2: "000011", 3: "0000011",
                      -1: "010", -2: "000010", -3: "0000010"}[a1 - b1])
            a0 = a1
            white = not white
        else:
            bw.write("001")  # horizontal
            _encode_run(bw, a1 - a0pos, white)
            _encode_run(bw, a2 - a1, not white)
            a0 = a2
        if a0 >= width:
            break


def encode_ccitt(
    black: np.ndarray,
    *,
    mode: str,
    byte_align: bool = False,
    eol: bool = False,
    k: int = 2,
) -> bytes:
    """Black mask (h, w) → CCITT bitstream.

    mode "mh": 1-D lines (byte_align=True gives TIFF comp-2 layout);
    mode "g3_2d": EOL+tag per line when eol=True (TIFF comp 3), bare tag
    bit otherwise (PDF EndOfLine=false); every k-th line is coded 1-D;
    mode "g4": T.6 MMR.
    """
    black = np.asarray(black).astype(np.uint8)
    h, w = black.shape
    bw = _BitWriter()
    ref: list[int] = []
    for y in range(h):
        if byte_align:
            bw.byte_align()
        trans = _line_trans(black[y])
        if mode == "mh":
            if eol:
                bw.write(_EOL)
            _encode_1d_line(bw, black[y], w)
        elif mode == "g3_2d":
            one_d = (y % k) == 0
            if eol:
                bw.write(_EOL)
            bw.write("1" if one_d else "0")
            if one_d:
                _encode_1d_line(bw, black[y], w)
            else:
                _encode_2d_line(bw, trans, ref, w)
        elif mode == "g4":
            _encode_2d_line(bw, trans, ref, w)
        else:
            raise ValueError(f"unknown CCITT mode {mode!r}")
        ref = trans
    return bw.getvalue()
