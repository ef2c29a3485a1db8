"""Multimodal binary-column plumbing: real PNG decode, stubbed audio/video,
error rows, schema and plan shape."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, LongType, StringType, StructField, StructType

from img2table_spark.operators.multimodal import decode_media

SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("payload", BinaryType(), True),
    ]
)


def test_decode_media(spark, ref_tests):
    import numpy as np

    from img2table_spark.kernels.wav import encode_wav, wav_features

    with open(ref_tests / "document/image/test_data/test.png", "rb") as f:
        png = f.read()
    t = np.arange(1600) / 8000.0
    tone = 0.5 * np.sin(2 * np.pi * 440.0 * t)[:, None]
    wav = encode_wav(tone, 8000, bits=16)
    rows = [
        (0, "image", bytearray(png)),
        (1, "audio", bytearray(b"\x01\x02" * 500)),  # non-WAV: stub path
        (2, "video", bytearray(b"\x03\x04" * 2000)),
        (3, "image", bytearray(b"not a png")),
        (4, "audio", bytearray(wav)),  # RIFF/WAVE: REAL decode path
        (5, "audio", bytearray(b"RIFF\x04\x00\x00\x00WAVE")),  # corrupt WAV
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    out = decode_media(df).orderBy("media_id").collect()

    img = out[0]
    assert (img["width"], img["height"], img["mime"]) == (1365, 417, "image/png")
    assert len(img["features"]) == 64 and img["error"] is None

    audio = out[1]
    assert audio["duration_ms"] == 8000 and len(audio["features"]) == 16

    video = out[2]
    assert video["mime"] == "video/unknown"

    bad = out[3]
    assert bad["error"] is not None and bad["features"] is None

    real = out[4]
    assert real["mime"] == "audio/wav" and real["error"] is None
    assert real["duration_ms"] == 200  # 1600 samples @ 8 kHz
    from img2table_spark.kernels.wav import decode_wav

    rate, _ch, samples = decode_wav(wav)
    assert real["features"] == pytest.approx(wav_features(rate, samples))

    corrupt = out[5]
    assert corrupt["error"] is not None and corrupt["features"] is None

    # deterministic stub: same payload → same features
    out2 = decode_media(df).orderBy("media_id").collect()
    assert out2[1]["features"] == audio["features"]


def test_decode_media_wav_real_even_without_fake_features(spark):
    """kind='audio' no longer needs fake_features when the payload is WAV."""
    import numpy as np

    from img2table_spark.kernels.wav import encode_wav

    tone = 0.25 * np.sin(np.arange(800) / 8000.0 * 2 * np.pi * 440.0)[:, None]
    df = spark.createDataFrame(
        [(7, "audio", bytearray(encode_wav(tone, 8000, bits=24)))], SCHEMA
    )
    row = decode_media(df, fake_features=False).collect()[0]
    assert row["error"] is None and row["mime"] == "audio/wav"
    assert row["duration_ms"] == 100 and len(row["features"]) == 11


def test_decode_media_real_stub_raises(spark):
    df = spark.createDataFrame([(1, "audio", bytearray(b"x"))], SCHEMA)
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        # fake_features=False surfaces the stub boundary explicitly
        rows = decode_media(df, fake_features=False).collect()
        errs = [r for r in rows if r["error"]]
        assert errs and "NotImplementedError" in errs[0]["error"]
        raise RuntimeError("codec: " + errs[0]["error"])
