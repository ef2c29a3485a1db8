"""FLAC decode (kernels/flac.py): round-trips through the independent
fixture encoder across every subframe type, channel mode, residual coding
and bit depth; a hand-built bitstream pins the wasted-bits path; corrupt
and truncated streams fail cleanly; and a lossless WAV↔FLAC transcode
fingerprints identically (the dedup collapse contract)."""

import numpy as np
import pytest

from img2table_spark.kernels import wav
from img2table_spark.kernels.flac import (
    FLACError,
    _BitWriter,
    _crc8,
    _crc16,
    audio_fingerprint,
    decode_flac,
    encode_flac,
)


def _signal(n=9000, rate=8000, seed=7, stereo=True):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / rate
    a = 0.4 * np.sin(2 * np.pi * 440 * t) + 0.05 * rng.standard_normal(n)
    if not stereo:
        return a[:, None]
    b = 0.3 * np.sin(2 * np.pi * 220 * t) + 0.02 * rng.standard_normal(n)
    return np.stack([a, b], axis=1)


def _quantized(x, bits):
    full = float(1 << (bits - 1))
    return np.clip(np.round(np.clip(x, -1, 1) * full), -full, full - 1) / full


@pytest.mark.parametrize(
    "stereo_mode", ["independent", "left_side", "right_side", "mid_side"]
)
@pytest.mark.parametrize("subframe_mode", ["verbatim", "fixed"])
def test_stereo_modes_round_trip(stereo_mode, subframe_mode):
    x = _signal()
    data = encode_flac(
        x, 8000, bits=16, block_size=4096,
        stereo_mode=stereo_mode, subframe_mode=subframe_mode, fixed_order=2,
    )
    rate, ch, out = decode_flac(data)
    assert (rate, ch) == (8000, 2)
    assert np.array_equal(out, _quantized(x, 16))


@pytest.mark.parametrize("bits", [8, 16, 24, 32])
def test_bit_depths_round_trip(bits):
    x = _signal(n=3000, stereo=False)
    data = encode_flac(x, 44100, bits=bits, block_size=1024)
    rate, ch, out = decode_flac(data)
    assert (rate, ch) == (44100, 1)
    assert np.array_equal(out, _quantized(x, bits))


@pytest.mark.parametrize("order", [0, 1, 2, 3, 4])
def test_fixed_orders_round_trip(order):
    x = _signal(n=2000, stereo=False)
    data = encode_flac(x, 8000, subframe_mode="fixed", fixed_order=order)
    assert np.array_equal(decode_flac(data)[2], _quantized(x, 16))


def test_constant_subframe():
    x = np.full((5000, 1), 0.25)
    data = encode_flac(x, 44100, subframe_mode="constant", block_size=1000)
    rate, ch, out = decode_flac(data)
    assert len(data) < 200  # 5 constant frames, no residual payload
    assert np.array_equal(out, _quantized(x, 16))


def test_lpc_subframe_round_trip():
    x = _signal()
    # order-2 quantized coefficients (2, -1) << 4 with shift 4 — a real
    # LPC stream equal in prediction to fixed order 2
    data = encode_flac(x, 8000, subframe_mode="lpc", lpc=([2 << 4, -1 << 4], 8, 4))
    assert np.array_equal(decode_flac(data)[2], _quantized(x, 16))


def test_partitioned_rice2_round_trip():
    x = _signal()
    data = encode_flac(
        x, 8000, subframe_mode="fixed", fixed_order=1,
        partition_order=3, rice_method=1,
    )
    assert np.array_equal(decode_flac(data)[2], _quantized(x, 16))


def test_escape_partitions_round_trip():
    x = _signal()
    data = encode_flac(x, 8000, subframe_mode="fixed", fixed_order=2, escape_bits=18)
    assert np.array_equal(decode_flac(data)[2], _quantized(x, 16))
    # zero-bit escape: constant signal, order-1 residuals are all zero
    c = np.full((1000, 1), -0.5)
    data0 = encode_flac(
        c, 8000, subframe_mode="fixed", fixed_order=1,
        escape_bits=0, block_size=1000,
    )
    assert np.array_equal(decode_flac(data0)[2], _quantized(c, 16))


def test_multi_frame_and_odd_tail_block():
    x = _signal(n=10_000)  # 2 full 4096 frames + a 1808-sample tail
    data = encode_flac(x, 8000, block_size=4096)
    assert np.array_equal(decode_flac(data)[2], _quantized(x, 16))


def test_wasted_bits_hand_built_stream():
    """Hand-assembled mono 8-bit stream: one CONSTANT subframe with 1
    wasted bit — value 1 in 7 effective bits decodes to 2 after the
    wasted-bit shift (the one decoder path the encoder never emits)."""
    n, bps = 4, 8
    si = _BitWriter()
    si.write(n, 16); si.write(n, 16); si.write(0, 24); si.write(0, 24)
    si.write(8000, 20); si.write(0, 3); si.write(bps - 1, 5); si.write(n, 36)
    body = si.bytes() + b"\0" * 16  # md5 unset → check skipped
    stream = bytearray(b"fLaC")
    stream += (0x80 << 24 | len(body)).to_bytes(4, "big") + body
    w = _BitWriter()
    w.write(0b11111111111110, 14); w.write(0, 1); w.write(0, 1)
    w.write(7, 4)   # 16-bit blocksize-1 follows
    w.write(0, 4)   # rate from STREAMINFO
    w.write(0, 4)   # 1 channel
    w.write(0, 3); w.write(0, 1)
    w.write(0, 8)   # frame number 0 (utf8 short form)
    w.write(n - 1, 16)
    w.write(_crc8(bytes(w.buf)), 8)
    w.write(0, 1)        # subframe pad
    w.write(0, 6)        # CONSTANT
    w.write(1, 1)        # wasted-bits flag
    w.write(1, 1)        # unary 0 → wasted = 1
    w.write(1, bps - 1)  # constant value 1 in 7 effective bits
    w.align()
    frame = w.bytes()
    w2 = _BitWriter(); w2.write(_crc16(frame), 16); w2.align()
    stream += frame + w2.bytes()
    rate, ch, out = decode_flac(bytes(stream))
    assert (rate, ch) == (8000, 1)
    assert np.array_equal(out[:, 0], np.full(n, 2 / 128.0))


def test_md5_and_crc_catch_corruption():
    data = bytearray(encode_flac(_signal(n=2000, stereo=False), 8000))
    data[-40] ^= 0x10  # flip a residual bit near the end
    with pytest.raises(FLACError):
        decode_flac(bytes(data))


def test_truncation_and_garbage_fail_cleanly():
    data = encode_flac(_signal(n=2000, stereo=False), 8000)
    for cut in (3, 10, 40, len(data) // 2, len(data) - 3):
        with pytest.raises(FLACError):
            decode_flac(data[:cut])
    with pytest.raises(FLACError):
        decode_flac(b"NotAFlacStreamAtAll" * 4)


def test_wav_flac_fingerprint_collapse():
    """The dedup contract: the same PCM in WAV and FLAC containers
    fingerprints identically (both decode to the same float64 stream),
    and different audio does not."""
    x = _signal()
    fp_wav = wav.audio_fingerprint(wav.encode_wav(x, 8000, bits=16))
    fp_flac = audio_fingerprint(encode_flac(x, 8000, bits=16))
    assert fp_wav == fp_flac
    other = audio_fingerprint(encode_flac(_signal(seed=8), 8000, bits=16))
    assert other != fp_flac


def test_multimodal_routes_flac_without_fake_features():
    from img2table_spark.operators.multimodal import _decode_one

    x = _signal()
    out = _decode_one(encode_flac(x, 8000, bits=16), "audio", fake_features=False)
    assert out["mime"] == "audio/flac"
    assert out["duration_ms"] == round(len(x) * 1000 / 8000)
    wav_out = _decode_one(
        wav.encode_wav(x, 8000, bits=16), "audio", fake_features=False
    )
    # same decoded stream → identical features across containers
    assert out["features"] == wav_out["features"]
