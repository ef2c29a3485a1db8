"""RIFF/AVI decode + features + fingerprint (kernels/avi.py).

Round-trips go through the module's own independent encoder (the image/WAV
codec policy: encoder and decoder are separate code paths pinned against
each other), plus container corners the spec allows (32-bit BI_RGB, 'dc'
chunk ids, missing idx1, odd-width row padding, top-down frames via a
hand-patched header) and fuzz on corrupt/truncated streams.
"""

import struct

import numpy as np
import pytest

from img2table_spark.kernels.avi import (
    AVIError,
    AviVideo,
    decode_avi,
    encode_avi,
    video_features,
    video_fingerprint,
)


def _frames(n=5, h=7, w=9, seed=3):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(n, h, w, 3), dtype=np.uint8)


def test_round_trip_24bit_exact():
    f = _frames()
    v = decode_avi(encode_avi(f, rate=12, scale=1))
    assert (v.width, v.height, v.scale, v.rate) == (9, 7, 1, 12)
    assert np.array_equal(v.frames, f)


def test_round_trip_32bit_exact_and_fingerprint_collapses_depth():
    f = _frames(n=3, w=8)  # w*4 already aligned
    b24 = encode_avi(f, rate=10, bitcount=24)
    b32 = encode_avi(f, rate=10, bitcount=32)
    assert np.array_equal(decode_avi(b32).frames, f)
    # 24 vs 32-bit BI_RGB and idx1 present/absent are container detail:
    # the content fingerprint must collapse them (wav depth-widening analog)
    assert video_fingerprint(b24) == video_fingerprint(b32)
    assert video_fingerprint(b24) == video_fingerprint(
        encode_avi(f, rate=10, with_idx1=False)
    )
    assert video_fingerprint(b24) == video_fingerprint(
        encode_avi(f, rate=10, chunk_id=b"00dc")
    )


def test_fingerprint_sensitive_to_pixels_and_rate():
    f = _frames(n=2)
    base = video_fingerprint(encode_avi(f, rate=10))
    g = f.copy()
    g[1, 0, 0, 0] ^= 1
    assert video_fingerprint(encode_avi(g, rate=10)) != base
    assert video_fingerprint(encode_avi(f, rate=20)) != base


def test_odd_width_row_padding():
    # w=5, 24-bit → 15-byte rows padded to 16: the stride algebra must hold
    f = _frames(n=2, h=3, w=5)
    assert np.array_equal(decode_avi(encode_avi(f)).frames, f)


def test_top_down_frames():
    """biHeight < 0 = top-down rows. Encoder always writes bottom-up, so
    build the variant by patching strf's biHeight and re-flipping rows."""
    f = _frames(n=1, h=4, w=4)
    data = bytearray(encode_avi(f))
    i = data.index(b"strf")
    # strf body: biSize(4) biWidth(4) biHeight(4) at body+8
    (h,) = struct.unpack_from("<i", data, i + 8 + 8)
    assert h == 4
    struct.pack_into("<i", data, i + 8 + 8, -4)
    v = decode_avi(bytes(data))
    assert np.array_equal(v.frames[0], f[0][::-1])


def test_features_shape_and_values():
    f = np.zeros((4, 4, 4, 3), dtype=np.uint8)
    f[2] = 255  # one all-white frame
    v = decode_avi(encode_avi(f, rate=8, scale=1))
    feats = video_features(v, max_frames=4)
    assert feats[0] == 4.0            # n_frames
    assert feats[1] == 8000.0         # millifps
    assert feats[2:] == [0.0, 0.0, 1.0, 0.0]


def test_features_bounded_sampling():
    f = _frames(n=40)
    v = AviVideo(width=9, height=7, scale=1, rate=10, frames=f)
    assert len(video_features(v, max_frames=16)) == 2 + 16


def test_compressed_fourcc_rejected_loudly():
    data = bytearray(encode_avi(_frames(n=1)))
    i = data.index(b"strf")
    struct.pack_into("<4s", data, i + 8 + 16, b"MJPG")  # biCompression
    with pytest.raises(AVIError, match="MJPG"):
        decode_avi(bytes(data))


@pytest.mark.parametrize("mutate", ["not_riff", "not_avi", "truncate", "no_movi"])
def test_corrupt_streams_fail_cleanly(mutate):
    data = bytearray(encode_avi(_frames(n=2)))
    if mutate == "not_riff":
        data[:4] = b"JUNK"
    elif mutate == "not_avi":
        data[8:12] = b"WAVE"
    elif mutate == "truncate":
        data = data[: len(data) // 2]
        # keep the RIFF size honest so the failure is the truncated chunk
        struct.pack_into("<I", data, 4, len(data) - 8)
    elif mutate == "no_movi":
        i = bytes(data).index(b"movi")
        data[i : i + 4] = b"xxxx"
    with pytest.raises((AVIError, ValueError)):
        decode_avi(bytes(data))


def test_multimodal_video_real_decode(spark):
    """kind='video' AVI payloads produce REAL metadata through the Arrow
    path with fake_features OFF — the stub is gone for this container."""
    from img2table_spark.operators.multimodal import decode_media

    f = _frames(n=6, h=8, w=10)
    payload = encode_avi(f, rate=12, scale=1)
    df = spark.createDataFrame(
        [(1, "video", bytearray(payload)), (2, "video", bytearray(b"\x00\x00\x00\x18ftypmp42"))],
        "media_id LONG, kind STRING, payload BINARY",
    )
    out = {r["media_id"]: r for r in decode_media(df, fake_features=False).collect()}
    r = out[1]
    assert (r["mime"], r["width"], r["height"]) == ("video/x-msvideo", 10, 8)
    assert r["duration_ms"] == 500  # 6 frames @ 12 fps
    assert r["error"] is None
    assert len(r["features"]) == 2 + 6 and r["features"][0] == 6.0
    # non-AVI video still refuses honestly (error row, not fake features)
    assert out[2]["error"] is not None and "NotImplementedError" in out[2]["error"]
