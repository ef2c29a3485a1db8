"""RIFF/WAVE decode + features + fingerprint (kernels/wav.py).

Round-trips go through the module's own independent encoder (same policy as
the image codecs: encoder and decoder are separate code paths pinned against
each other), plus hand-built buffers for the container corners the encoder
never writes (WAVE_FORMAT_EXTENSIBLE, odd-size chunk padding) and fuzz on
corrupt/truncated streams.
"""

import struct

import numpy as np
import pytest

from img2table_spark.kernels.wav import (
    WAVError,
    audio_fingerprint,
    decode_wav,
    encode_wav,
    wav_features,
)


def _sine(freq=440.0, rate=8000, secs=0.5, ch=1):
    t = np.arange(int(rate * secs)) / rate
    s = 0.5 * np.sin(2 * np.pi * freq * t)
    return np.stack([s] * ch, axis=1)


@pytest.mark.parametrize("bits,tol", [(8, 1 / 127), (16, 1 / 32767), (24, 2 / (1 << 23)), (32, 1e-9)])
def test_pcm_round_trip(bits, tol):
    s = _sine(ch=2)
    rate, ch, out = decode_wav(encode_wav(s, 8000, bits=bits))
    assert (rate, ch) == (8000, 2)
    assert out.shape == s.shape
    assert np.abs(out - s).max() <= tol + 1e-12


def test_float32_round_trip():
    s = _sine()
    rate, ch, out = decode_wav(encode_wav(s, 44100, float_fmt=True))
    assert (rate, ch) == (44100, 1)
    assert np.abs(out - s).max() < 1e-7


def test_odd_data_chunk_is_padded():
    # 3 samples of 8-bit mono = odd data size → encoder pads; a trailing
    # chunk after the pad must still parse (word alignment per RIFF)
    s = np.array([[0.0], [0.25], [-0.25]])
    buf = encode_wav(s, 8000, bits=8)
    assert len(buf) % 2 == 0
    rate, ch, out = decode_wav(buf + b"LIST\x04\x00\x00\x00INFO")
    assert out.shape == (3, 1)


def test_extensible_format_tag():
    # hand-built WAVE_FORMAT_EXTENSIBLE wrapping 16-bit PCM — the encoder
    # never writes this, so build the fmt chunk from the spec layout
    s = _sine(secs=0.05)
    raw = np.round(np.clip(s[:, 0], -1, 1) * 32767.0).astype("<i2").tobytes()
    # layout after the 16 common bytes: cbSize(22) | validBits |
    # channelMask | SubFormat GUID (tag in the first two GUID bytes)
    fmt = struct.pack("<HHIIHH", 0xFFFE, 1, 8000, 16000, 2, 16)
    fmt += struct.pack("<HHI", 22, 16, 1) + struct.pack("<H", 1) + bytes(14)
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(raw)) + raw
    buf = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    rate, ch, out = decode_wav(buf)
    assert (rate, ch) == (8000, 1)
    assert np.abs(out[:, 0] - s[:, 0]).max() <= 1 / 32767 + 1e-12


def test_features_spectral_peak_lands_in_right_band():
    rate = 8000
    # band edges are linear slices of [0, rate/2]: band i covers
    # ~[i, i+1)·500 Hz — a 2.2 kHz sine must put its energy in band 4
    s = _sine(freq=2200.0, rate=rate, secs=2.0)
    feats = wav_features(rate, s)
    assert len(feats) == 11
    rms, peak, zcr = feats[:3]
    assert abs(rms - 0.5 / np.sqrt(2)) < 0.01
    assert 0.49 < peak <= 0.5001
    assert abs(zcr - 2 * 2200.0 / rate) < 0.02
    bands = feats[3:]
    assert np.argmax(bands) == 4 and bands[4] > 0.9


def test_fingerprint_collapses_lossless_reencodes_and_separates_content():
    src = encode_wav(_sine(freq=440.0), 8000, bits=16)
    _rate, _ch, s16 = decode_wav(src)
    fp = audio_fingerprint(src)
    # re-encodes that do NOT re-quantize hash identically: byte-identical
    # container rewrite, and depth WIDENING of the decoded signal (all
    # power-of-two scale factors → bit-exact decode)
    assert audio_fingerprint(encode_wav(s16, 8000, bits=16)) == fp
    assert audio_fingerprint(encode_wav(s16, 8000, bits=24)) == fp
    assert audio_fingerprint(encode_wav(s16, 8000, bits=32)) == fp
    assert audio_fingerprint(encode_wav(s16, 8000, float_fmt=True)) == fp
    # different content separates
    assert audio_fingerprint(encode_wav(_sine(freq=441.0), 8000, bits=16)) != fp
    # depth NARROWING re-quantizes (lossy) → out of equality range by
    # design: those near-dups belong to the feature near-dup path
    assert audio_fingerprint(encode_wav(s16, 8000, bits=8)) != fp
    # same samples at a different declared rate = different content
    assert audio_fingerprint(encode_wav(s16, 16000, bits=16)) != fp


@pytest.mark.parametrize(
    "buf",
    [
        b"",
        b"RIFX" + bytes(20),
        b"RIFF\x10\x00\x00\x00WAVF" + bytes(8),
        # fmt but no data
        b"RIFF\x18\x00\x00\x00WAVEfmt \x10\x00\x00\x00" + struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8),
        # data but no fmt
        b"RIFF\x10\x00\x00\x00WAVEdata\x04\x00\x00\x00abcd",
        # unsupported codec tag (mu-law = 7)
        b"RIFF\x24\x00\x00\x00WAVEfmt \x10\x00\x00\x00"
        + struct.pack("<HHIIHH", 7, 1, 8000, 8000, 1, 8)
        + b"data\x04\x00\x00\x00abcd",
        # zero channels
        b"RIFF\x24\x00\x00\x00WAVEfmt \x10\x00\x00\x00"
        + struct.pack("<HHIIHH", 1, 0, 8000, 8000, 1, 8)
        + b"data\x04\x00\x00\x00abcd",
        # empty data chunk
        b"RIFF\x24\x00\x00\x00WAVEfmt \x10\x00\x00\x00"
        + struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
        + b"data\x00\x00\x00\x00",
    ],
)
def test_corrupt_streams_fail_cleanly(buf):
    with pytest.raises(WAVError):
        decode_wav(buf)


def test_truncation_fuzz():
    full = encode_wav(_sine(secs=0.1), 8000, bits=16)
    for cut in range(0, 40, 7):
        trunc = full[:cut]
        try:
            decode_wav(trunc)
        except WAVError:
            pass  # clean, typed failure — never a crash or hang
