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
    with open(ref_tests / "document/image/test_data/test.png", "rb") as f:
        png = f.read()
    rows = [
        (0, "image", bytearray(png)),
        (1, "audio", bytearray(b"\x01\x02" * 500)),
        (2, "video", bytearray(b"\x03\x04" * 2000)),
        (3, "image", bytearray(b"not a png")),
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

    # deterministic stub: same payload → same features
    out2 = decode_media(df).orderBy("media_id").collect()
    assert out2[1]["features"] == audio["features"]


def test_decode_media_real_stub_raises(spark):
    df = spark.createDataFrame([(1, "audio", bytearray(b"x"))], SCHEMA)
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        # fake_features=False surfaces the stub boundary explicitly
        rows = decode_media(df, fake_features=False).collect()
        errs = [r for r in rows if r["error"]]
        assert errs and "NotImplementedError" in errs[0]["error"]
        raise RuntimeError("codec: " + errs[0]["error"])
