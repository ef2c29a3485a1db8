"""Streaming sessionization (native session_window + watermark) and the
stateless quality/PII filter: output equality vs batch on a drained file
source."""

import datetime as dt

from pyspark.sql import functions as F

from img2table_spark.schema import TRANSCRIPT_SCHEMA
from img2table_spark.streaming.sessions import (
    stream_quality_filter,
    stream_sessionize,
)


def _session_corpus(spark):
    """Two conversations, each with two bursts separated by > gap, plus a
    far-future flush turn that pushes the watermark past every session."""
    base = dt.datetime(2026, 1, 1)
    rows = []
    for c in range(2):
        for i in range(4):  # burst 1: minutes 0..3
            rows.append((f"c{c}", i, "user", f"hello {c} {i} a b c",
                         "text/plain", base + dt.timedelta(minutes=i)))
        for i in range(3):  # burst 2: minutes 120..122 (gap 30m closes #1)
            rows.append((f"c{c}", 10 + i, "user", f"again {c} {i} x y z",
                         "text/plain", base + dt.timedelta(minutes=120 + i)))
    rows.append(("flush", 0, "user", "flush turn far in the future a b",
                 "text/plain", base + dt.timedelta(days=7)))
    return spark.createDataFrame(rows, TRANSCRIPT_SCHEMA)


def test_stream_sessionize(spark, tmp_path):
    df = _session_corpus(spark)
    inp = str(tmp_path / "in")
    df.write.parquet(inp)
    q = stream_sessionize(spark, inp, "sess_test", watermark="30 minutes",
                          gap="30 minutes")
    q.awaitTermination(300)
    got = {
        (r.conv_id, r.n_turns, r.first_turn, r.last_turn)
        for r in spark.sql("SELECT * FROM sess_test").collect()
    }
    # each conversation closed two sessions before the flush watermark
    for c in range(2):
        assert (f"c{c}", 4, 0, 3) in got, got
        assert (f"c{c}", 3, 10, 12) in got, got


def test_stream_quality_filter_matches_batch(spark, tmp_path):
    base = dt.datetime(2026, 1, 1)
    rows = [
        ("c0", 0, "user", "short text", "text/plain", base),  # 2 tokens: dropped
        ("c0", 1, "user", "mail me at bob@example.com for the data set",
         "text/plain", base),
        ("c1", 0, "user", "one two three four five six", "text/plain", base),
    ]
    df = spark.createDataFrame(rows, TRANSCRIPT_SCHEMA)
    inp, out, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    df.write.parquet(inp)
    q = stream_quality_filter(spark, inp, out, ckpt, min_tokens=5)
    q.awaitTermination(300)
    got = spark.read.parquet(out)
    assert got.count() == 2
    texts = {r.text for r in got.select("text").collect()}
    assert "mail me at <EMAIL> for the data set" in texts
    assert all("@" not in t for t in texts)

    # restart with no new files: nothing reprocessed (exactly-once sink)
    q2 = stream_quality_filter(spark, inp, out, ckpt, min_tokens=5)
    q2.awaitTermination(300)
    assert spark.read.parquet(out).count() == 2


def test_stream_image_dedup(spark, tmp_path):
    import numpy as np

    from img2table_spark.kernels.encoders import encode_bmp24, encode_png
    from img2table_spark.streaming.sessions import stream_image_dedup

    base = dt.datetime(2026, 1, 1)

    def img(seed):
        small = np.random.RandomState(seed).randint(0, 256, (8, 8, 3))
        return np.repeat(np.repeat(small, 8, 0), 8, 1).astype(np.uint8)

    rows = [
        (0, base, bytearray(encode_png(img(1)))),
        (1, base + dt.timedelta(minutes=1), bytearray(encode_bmp24(img(1)))),  # re-encode dup
        (2, base + dt.timedelta(minutes=2), bytearray(encode_png(img(2)))),
        (3, base + dt.timedelta(minutes=3), bytearray(b"not an image at all")),  # null hash
    ]
    df = spark.createDataFrame(rows, "media_id long, ts timestamp, payload binary")
    inp, out, ckpt = (str(tmp_path / d) for d in ("min", "mout", "mckpt"))
    df.write.parquet(inp)
    q = stream_image_dedup(spark, inp, out, ckpt)
    q.awaitTermination(300)
    got = spark.read.parquet(out)
    ids = {r.media_id for r in got.collect()}
    assert 2 in ids
    assert len(ids & {0, 1}) == 1  # the re-encoded twin collapsed
    assert 3 not in ids


def test_stream_media_dedup_accepts_audio_rows(spark, tmp_path):
    """WAV payloads flow through the same dedup stream as images (r3
    verdict #5): non-re-quantizing re-encodes collapse, distinct audio
    survives, and audio/image fingerprints coexist in one stream."""
    import numpy as np

    from img2table_spark.kernels.encoders import encode_png
    from img2table_spark.kernels.wav import decode_wav, encode_wav
    from img2table_spark.streaming.sessions import stream_image_dedup

    base = dt.datetime(2026, 1, 1)
    t = np.arange(4000) / 8000.0
    tone_a = 0.5 * np.sin(2 * np.pi * 440.0 * t)[:, None]
    tone_b = 0.25 * np.sin(2 * np.pi * 2200.0 * t)[:, None]
    src = encode_wav(tone_a, 8000, bits=16)
    widened = encode_wav(decode_wav(src)[2], 8000, float_fmt=True)  # lossless re-encode
    img = np.repeat(
        np.repeat(np.random.RandomState(5).randint(0, 256, (8, 8, 3)), 8, 0), 8, 1
    ).astype(np.uint8)

    rows = [
        (0, base, bytearray(src)),
        (1, base + dt.timedelta(minutes=1), bytearray(widened)),  # dup of 0
        (2, base + dt.timedelta(minutes=2), bytearray(encode_wav(tone_b, 8000, bits=16))),
        (3, base + dt.timedelta(minutes=3), bytearray(encode_png(img))),
        (4, base + dt.timedelta(minutes=4), bytearray(b"RIFF\x04\x00\x00\x00WAVE")),  # corrupt
    ]
    df = spark.createDataFrame(rows, "media_id long, ts timestamp, payload binary")
    inp, out, ckpt = (str(tmp_path / d) for d in ("ain", "aout", "ackpt"))
    df.write.parquet(inp)
    q = stream_image_dedup(spark, inp, out, ckpt)
    q.awaitTermination(300)
    ids = {r.media_id for r in spark.read.parquet(out).collect()}
    assert len(ids & {0, 1}) == 1  # widened re-encode collapsed
    assert {2, 3} <= ids           # distinct audio + the image both survive
    assert 4 not in ids            # corrupt WAV -> null hash, filtered


def test_stream_sessionize_file_sink_bounded_batches(spark, tmp_path):
    """The file-sink + maxFilesPerTrigger variant (r3 verdict #7): same
    sessions as the memory sink, ingested one source file per micro-batch
    (bounded per-batch work at any backlog size), exactly-once via the
    parquet sink commit log, watermark-bounded session state."""
    import json

    df = _session_corpus(spark).cache()
    inp = str(tmp_path / "fin")
    # several source files → several micro-batches under maxFilesPerTrigger=1.
    # The file source orders files by MODIFICATION time, so append each time
    # slice sequentially (a real ingest feed lands time-ordered files): the
    # watermark must see the bursts in event order or it would correctly
    # DROP turns arriving behind the far-future flush turn.
    cut1, cut2 = dt.datetime(2026, 1, 1, 1), dt.datetime(2026, 1, 2)
    for lo, hi in [(None, cut1), (cut1, cut2), (cut2, None)]:
        sl = df
        if lo is not None:
            sl = sl.filter(F.col("ts") >= lo)
        if hi is not None:
            sl = sl.filter(F.col("ts") < hi)
        sl.coalesce(1).write.mode("append").parquet(inp)
        import time

        time.sleep(1.1)  # distinct mtimes at any fs timestamp resolution
    out, ckpt = str(tmp_path / "fout"), str(tmp_path / "fckpt")
    q = stream_sessionize(
        spark, inp, "unused", watermark="30 minutes", gap="30 minutes",
        output_dir=out, checkpoint_dir=ckpt, max_files_per_trigger=1,
    )
    q.awaitTermination(300)
    progress = [json.loads(p.json) for p in q.recentProgress]
    # one micro-batch per source file (+ the final watermark-flush batch)
    assert len(progress) >= 4
    # session state is bounded: rows in state never exceed the live session
    # count (5 conversations incl. flush → a handful, nowhere near n_rows)
    state_rows = [
        op["numRowsTotal"] for p in progress for op in p.get("stateOperators", [])
    ]
    assert state_rows and max(state_rows) <= 10
    got = {
        (r.conv_id, r.n_turns, r.first_turn, r.last_turn)
        for r in spark.read.parquet(out).collect()
    }
    for c in range(2):
        assert (f"c{c}", 4, 0, 3) in got, got
        assert (f"c{c}", 3, 10, 12) in got, got


def test_stream_media_dedup_accepts_video_rows(spark, tmp_path):
    """AVI payloads flow through the same dedup stream as images and audio:
    pixel-preserving re-encodes (32-bit BI_RGB rewrite of a 24-bit source)
    collapse via kernels/avi.video_fingerprint, distinct videos survive,
    compressed video yields a null hash (filtered, not fatal)."""
    import struct

    import numpy as np

    from img2table_spark.kernels.avi import encode_avi
    from img2table_spark.streaming.sessions import stream_image_dedup

    base = dt.datetime(2026, 1, 1)
    rng = np.random.default_rng(11)
    clip_a = rng.integers(0, 256, size=(4, 6, 8, 3), dtype=np.uint8)
    clip_b = rng.integers(0, 256, size=(4, 6, 8, 3), dtype=np.uint8)
    src = encode_avi(clip_a, rate=10)
    rewrapped = encode_avi(clip_a, rate=10, bitcount=32, with_idx1=False)
    compressed = bytearray(encode_avi(clip_a, rate=10))
    i = compressed.index(b"strf")
    struct.pack_into("<4s", compressed, i + 8 + 16, b"MJPG")

    rows = [
        (0, base, bytearray(src)),
        (1, base + dt.timedelta(minutes=1), bytearray(rewrapped)),   # dup of 0
        (2, base + dt.timedelta(minutes=2), bytearray(encode_avi(clip_b, rate=10))),
        (3, base + dt.timedelta(minutes=3), bytearray(bytes(compressed))),  # null hash
    ]
    df = spark.createDataFrame(rows, "media_id long, ts timestamp, payload binary")
    inp, out, ckpt = (str(tmp_path / d) for d in ("vin", "vout", "vckpt"))
    df.write.parquet(inp)
    q = stream_image_dedup(spark, inp, out, ckpt)
    q.awaitTermination(300)
    ids = {r.media_id for r in spark.read.parquet(out).collect()}
    assert len(ids & {0, 1}) == 1  # pixel-preserving rewrite collapsed
    assert 2 in ids                # distinct clip survives
    assert 3 not in ids            # compressed AVI -> null hash, filtered
