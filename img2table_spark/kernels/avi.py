"""RIFF/AVI (uncompressed BI_RGB) video decode + deterministic features.

Closes the last multimodal stub the same way kernels/wav.py closed audio:
uncompressed AVI is fully decodable from the public RIFF layout (MSDN "AVI
RIFF File Reference") with NumPy alone, so ``kind="video"`` payloads that
are BI_RGB AVI now produce REAL frame/fps/duration metadata, real sampled
frames, and a real content fingerprint. Compressed video (MJPG/cvid/H.264
fourccs) still needs codec libraries this container lacks and stays behind
the honest stub — rejected loudly with the fourcc named.

Format notes (public Microsoft spec):
- RIFF('AVI ' LIST('hdrl' 'avih' LIST('strl' 'strh' 'strf' ...)+)
  LIST('movi' chunks...) ['idx1']); chunks are word-aligned (odd payload →
  1 pad byte), same rule as WAVE.
- 'avih' = 14 little-endian DWORDs: µs/frame, max bytes/s, padding, flags,
  total frames, initial frames, stream count, suggested buffer, width,
  height, reserved×4.
- 'strh' fccType 'vids' carries dwScale/dwRate → fps = rate/scale.
- 'strf' for 'vids' is a BITMAPINFOHEADER; only biCompression == 0
  (BI_RGB) is decodable without codecs: 24-bit BGR or 32-bit BGRX rows,
  bottom-up when biHeight > 0, each row padded to a 4-byte multiple —
  the exact row algebra of kernels/bmp.py, reused conceptually (not
  imported: AVI frames have no per-frame file header).
- frame chunks in 'movi' are 'NNdb' (uncompressed DIB) or 'NNdc'
  (compressed — also used by BI_RGB writers; accepted when the stream's
  biCompression is 0), NN = zero-padded stream index.

The fixture encoder (``encode_avi``) lives here too so tests round-trip
through an independent writer, same policy as kernels/wav.py.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np


class AVIError(ValueError):
    pass


@dataclass
class AviVideo:
    width: int
    height: int
    scale: int   # fps = rate / scale
    rate: int
    frames: "np.ndarray"  # (n, h, w, 3) uint8 RGB


def _chunks(data: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_size) over a RIFF chunk run,
    honoring word alignment."""
    while pos + 8 <= end:
        cid = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = pos + 8
        if body + size > end:
            raise AVIError(f"truncated chunk {cid!r}")
        yield cid, body, size
        pos = body + size + (size & 1)


def decode_avi(data: bytes) -> AviVideo:
    """AVI bytes → AviVideo with all frames decoded to (n, h, w, 3) RGB."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise AVIError("not a RIFF/AVI stream")
    (riff_size,) = struct.unpack_from("<I", data, 4)
    end = min(len(data), 8 + riff_size)

    vids_stream = None  # index of the first video stream
    scale = rate = None
    width = height = None
    bitcount = None
    compression = None
    bottom_up = True
    movi = None
    stream_idx = -1

    def walk(pos: int, stop: int) -> None:
        nonlocal vids_stream, scale, rate, width, height, bitcount
        nonlocal compression, bottom_up, movi, stream_idx
        pending_vids = False
        for cid, body, size in _chunks(data, pos, stop):
            if cid == b"LIST":
                ltype = data[body : body + 4]
                if ltype == b"movi":
                    movi = (body + 4, body + size)
                elif ltype in (b"hdrl", b"strl"):
                    if ltype == b"strl":
                        stream_idx += 1
                    walk(body + 4, body + size)
            elif cid == b"strh":
                if size < 48:
                    raise AVIError("strh too short")
                fcc_type = data[body : body + 4]
                pending_vids = fcc_type == b"vids" and vids_stream is None
                if pending_vids:
                    vids_stream = stream_idx
                    scale, rate = struct.unpack_from("<II", data, body + 20)
            elif cid == b"strf" and pending_vids and bitcount is None:
                if size < 40:
                    raise AVIError("strf BITMAPINFOHEADER too short")
                (_bisize, w, h, _planes, bc, comp) = struct.unpack_from(
                    "<IiiHHI", data, body
                )
                width, height = int(w), abs(int(h))
                bottom_up = h > 0
                bitcount = int(bc)
                compression = int(comp)

    walk(12, end)

    if vids_stream is None or bitcount is None:
        raise AVIError("no video stream (vids strh/strf) found")
    if compression != 0:
        fourcc = struct.pack("<I", compression)
        raise AVIError(
            f"compressed AVI video (biCompression={fourcc!r}) requires codec"
            " libraries this environment lacks"
        )
    if bitcount not in (24, 32):
        raise AVIError(f"unsupported BI_RGB bit depth {bitcount}")
    if movi is None:
        raise AVIError("no movi list")
    if not scale or not rate:
        raise AVIError("invalid strh scale/rate")

    prefix = b"%02d" % vids_stream
    bpp = bitcount // 8
    stride = (width * bpp + 3) & ~3
    frames = []
    for cid, body, size in _chunks(data, movi[0], movi[1]):
        if cid == b"LIST":  # 'rec ' grouping — recurse one level
            for cid2, body2, size2 in _chunks(data, body + 4, body + size):
                if cid2[:2] == prefix and cid2[2:4] in (b"db", b"dc"):
                    frames.append((body2, size2))
            continue
        if cid[:2] == prefix and cid[2:4] in (b"db", b"dc"):
            frames.append((body, size))
    if not frames:
        raise AVIError("no frame chunks in movi")

    out = np.empty((len(frames), height, width, 3), dtype=np.uint8)
    for n, (body, size) in enumerate(frames):
        if size < stride * height:
            raise AVIError(f"frame {n} short: {size} < {stride * height}")
        raw = np.frombuffer(data, dtype=np.uint8, count=stride * height, offset=body)
        rows = raw.reshape(height, stride)[:, : width * bpp].reshape(
            height, width, bpp
        )
        if bottom_up:
            rows = rows[::-1]
        out[n] = rows[:, :, 2::-1]  # BGR(X) → RGB, alpha/pad byte dropped
    return AviVideo(width=width, height=height, scale=int(scale), rate=int(rate), frames=out)


def video_features(video: AviVideo, max_frames: int = 16) -> list[float]:
    """Deterministic feature vector: [n_frames, fps_milli, mean luma/255 of
    up to ``max_frames`` evenly sampled frames]. fps is carried as integer
    millifps so the vector stays reproducible across float libms. Bounded
    work per payload regardless of duration (only sampled frames touched)."""
    n = video.frames.shape[0]
    k = min(max_frames, n)
    idx = [(i * n) // k for i in range(k)]
    feats = [float(n), float((1000 * video.rate) // video.scale)]
    for i in idx:
        # ITU-R BT.601 integer luma, same weights as kernels/phash.py
        f = video.frames[i].astype(np.uint32)
        luma = (299 * f[:, :, 0] + 587 * f[:, :, 1] + 114 * f[:, :, 2]) // 1000
        feats.append(float(luma.mean()) / 255.0)
    return feats


def video_fingerprint(data: bytes) -> int:
    """64-bit content fingerprint of an AVI payload: md5 of (scale, rate,
    decoded RGB frame stream), low 8 bytes as a signed long (the streaming
    dedup key type). Collapses every re-encode that preserves pixels:
    container rewrites (chunk padding, idx1 present/absent, 'db' vs 'dc'
    ids) and 24 ↔ 32-bit BI_RGB rewrites (the X byte is dropped before
    hashing). Actual recompression is lossy and falls back to the
    feature/per-frame-dHash near-dup path — same honesty contract as
    kernels/wav.audio_fingerprint."""
    import hashlib

    v = decode_avi(data)
    h = hashlib.md5(
        struct.pack("<II", v.scale, v.rate) + v.frames.tobytes()
    ).digest()
    return int.from_bytes(h[:8], "little", signed=True)


def encode_avi(
    frames: "np.ndarray",
    rate: int = 10,
    scale: int = 1,
    bitcount: int = 24,
    chunk_id: bytes = b"00db",
    with_idx1: bool = True,
) -> bytes:
    """Independent fixture encoder: (n, h, w, 3) uint8 RGB → BI_RGB AVI."""
    frames = np.asarray(frames, dtype=np.uint8)
    if frames.ndim != 4 or frames.shape[3] != 3:
        raise AVIError("frames must be (n, h, w, 3) uint8")
    if bitcount not in (24, 32):
        raise AVIError("encoder supports 24/32-bit BI_RGB only")
    n, h, w, _ = frames.shape
    bpp = bitcount // 8
    stride = (w * bpp + 3) & ~3

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (b"\0" if len(body) & 1 else b"")

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    frame_blobs = []
    for f in frames:
        rows = f[::-1, :, ::-1]  # top-down RGB → bottom-up BGR
        if bpp == 4:
            rows = np.concatenate(
                [rows, np.zeros((h, w, 1), dtype=np.uint8)], axis=2
            )
        buf = np.zeros((h, stride), dtype=np.uint8)
        buf[:, : w * bpp] = rows.reshape(h, w * bpp)
        frame_blobs.append(buf.tobytes())

    avih = struct.pack(
        "<14I",
        (1_000_000 * scale) // rate,  # µs per frame
        0, 0, 0x10,                   # maxbytes, padding, AVIF_HASINDEX
        n, 0, 1, stride * h, w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"\0" * 4
        + struct.pack("<IHHIIIIIIiI", 0, 0, 0, 0, scale, rate, 0, n, stride * h, -1, 0)
        + struct.pack("<4h", 0, 0, w, h)
    )
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, bitcount, 0, stride * h, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))

    movi_body = b"".join(chunk(chunk_id, blob) for blob in frame_blobs)
    movi = lst(b"movi", movi_body)

    idx1 = b""
    if with_idx1:
        entries = []
        off = 4  # offsets are relative to the 'movi' fourcc
        for blob in frame_blobs:
            entries.append(chunk_id + struct.pack("<III", 0x10, off, len(blob)))
            off += 8 + len(blob) + (len(blob) & 1)
        idx1 = chunk(b"idx1", b"".join(entries))

    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body
