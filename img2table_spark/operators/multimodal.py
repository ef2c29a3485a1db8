"""Multimodal column plumbing: opaque binary payloads with typed metadata.

Training-data pipelines carry image/audio/video as ``binary`` columns.
Images decode for real through the full codec matrix
(kernels/image_doc.decode_image_bytes: PNG/JPEG/BMP/TIFF incl. CCITT/WebP/
PNM/HDR/EXR), RIFF/WAVE audio decodes for real (kernels/wav.py: PCM
8/16/24/32 + IEEE float → duration/rate plus an 11-float RMS/ZCR/
spectral-band feature vector), FLAC audio decodes for real too
(kernels/flac.py — Rice + fixed/LPC predictors are fully structural, no
measured spec tables), and RIFF/AVI uncompressed BI_RGB video decodes
for real (kernels/avi.py: frames/fps/duration plus sampled per-frame
luma features). Only perceptually-coded audio (mp3/ogg/aac) and
compressed video (MJPG/H.264/...) need codec libraries this environment
lacks; those stay STUBBED behind a deterministic fake
(`fake_features=True`, default in tests) or `NotImplementedError` — the
Spark-side plumbing (schema, partitioning, Arrow batch shape, UDF
signatures) is real and tested either way.
Perceptual near-dup detection (dHash + banded Hamming LSH) runs entirely
on the real image path — the image twin of the SimHash text operator.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),        # image | audio | video
        StructField("mime", StringType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("width", IntegerType(), True),        # images/video
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),     # audio/video
        StructField("features", ArrayType(FloatType()), True),
        StructField("error", StringType(), True),
    ]
)


_MAGIC_MIME = [
    (b"\x89PNG\r\n\x1a\n", "image/png"),
    (b"\xff\xd8", "image/jpeg"),
    (b"BM", "image/bmp"),
    (b"II*\x00", "image/tiff"),
    (b"MM\x00*", "image/tiff"),
    (b"#?", "image/vnd.radiance"),
    (b"\x76\x2f\x31\x01", "image/x-exr"),
    (b"fLaC", "audio/flac"),
]


def _sniff_mime(payload: bytes) -> str:
    # RIFF containers disambiguate on the form type at bytes 8:12
    if payload[:4] == b"RIFF":
        if payload[8:12] == b"WAVE":
            return "audio/wav"
        if payload[8:12] == b"AVI ":
            return "video/x-msvideo"
        return "image/webp"
    for magic, mime in _MAGIC_MIME:
        if payload[: len(magic)] == magic:
            return mime
    return "image/unknown"


def _decode_one(payload: bytes, kind: str, fake_features: bool) -> dict:
    out = {
        "mime": None, "n_bytes": len(payload), "width": None, "height": None,
        "duration_ms": None, "features": None, "error": None,
    }
    if kind == "image":
        # full codec dispatch (PNG/JPEG/BMP/TIFF/WebP/PNM/HDR/EXR/...)
        from img2table_spark.kernels.image_doc import decode_image_bytes

        img = decode_image_bytes(payload)
        out["mime"] = _sniff_mime(payload)
        out["height"], out["width"] = int(img.shape[0]), int(img.shape[1])
        # 8×8 grayscale thumbnail as a real feature vector
        g = img.mean(axis=2)
        ys = np.linspace(0, g.shape[0], 9).astype(int)
        xs = np.linspace(0, g.shape[1], 9).astype(int)
        feats = [
            float(g[ys[i] : ys[i + 1], xs[j] : xs[j + 1]].mean()) / 255.0
            for i in range(8)
            for j in range(8)
        ]
        out["features"] = feats
        return out
    if kind == "audio" and payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        # REAL decode: PCM/float WAV needs no codec library (kernels/wav.py)
        from img2table_spark.kernels.wav import decode_wav, wav_features

        rate, _ch, samples = decode_wav(payload)
        out["mime"] = "audio/wav"
        out["duration_ms"] = int(round(len(samples) * 1000 / rate))
        out["features"] = wav_features(rate, samples)
        return out
    if kind == "audio" and payload[:4] == b"fLaC":
        # REAL decode: FLAC is fully structural (kernels/flac.py — Rice +
        # fixed/LPC predictors, no measured spec tables); features come
        # from the same wav_features chain since decode_flac matches
        # decode_wav's (rate, channels, ±1 float64) contract.
        from img2table_spark.kernels.flac import decode_flac
        from img2table_spark.kernels.wav import wav_features

        rate, _ch, samples = decode_flac(payload)
        out["mime"] = "audio/flac"
        out["duration_ms"] = int(round(len(samples) * 1000 / rate))
        out["features"] = wav_features(rate, samples)
        return out
    if kind == "video" and payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        # REAL decode: uncompressed BI_RGB AVI needs no codec library
        # (kernels/avi.py); compressed fourccs raise AVIError → error row.
        from img2table_spark.kernels.avi import decode_avi, video_features

        v = decode_avi(payload)
        out["mime"] = "video/x-msvideo"
        out["width"], out["height"] = v.width, v.height
        out["duration_ms"] = int(v.frames.shape[0] * 1000 * v.scale // v.rate)
        out["features"] = video_features(v)
        return out
    if kind in ("audio", "video"):
        # STUB: compressed audio/video needs codec libraries this
        # container lacks — deterministic fake keeps the batch shape and
        # downstream schema real for tests; a real kernel (ffmpeg/soundfile)
        # slots in here unchanged.
        if not fake_features:
            raise NotImplementedError(f"{kind} decode requires codec libraries")
        h = int.from_bytes(payload[:8].ljust(8, b"\0"), "little")
        rng = np.random.default_rng(h % (2**32))
        out["mime"] = f"{kind}/unknown"
        out["duration_ms"] = int(len(payload)) * 8
        out["features"] = [float(x) for x in rng.random(16, dtype=np.float32)]
        return out
    raise ValueError(f"unsupported media payload (kind={kind})")


def decode_media(
    df: DataFrame,
    payload_col: str = "payload",
    kind_col: str = "kind",
    id_col: str = "media_id",
    fake_features: bool = True,
    num_partitions: int | None = None,
) -> DataFrame:
    """binary column → typed metadata + feature vector, Arrow-batched.

    Same scale rules as extraction: explicit CPU-derived partition count
    (payloads are byte-heavy AND CPU-heavy — never let AQE size-coalesce),
    errors become rows, not job failures.
    """
    if num_partitions is None:
        num_partitions = df.sparkSession.sparkContext.defaultParallelism * 2
    slim = df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.col(kind_col).alias("kind"),
        F.col(payload_col).alias("payload"),
    ).repartition(num_partitions, "media_id")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = MEDIA_META_SCHEMA.fieldNames()
        for pdf in batches:
            rows = []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                rec = {"media_id": int(mid), "kind": kind}
                try:
                    rec.update(_decode_one(bytes(payload), kind, fake_features))
                except Exception as exc:
                    rec.update(
                        {"mime": None, "n_bytes": len(payload or b""), "width": None,
                         "height": None, "duration_ms": None, "features": None,
                         "error": repr(exc)[:200]}
                    )
                rows.append(rec)
            yield pd.DataFrame(rows, columns=cols) if rows else pd.DataFrame(
                {c: pd.Series(dtype="object") for c in cols}
            )

    return slim.mapInPandas(gen, MEDIA_META_SCHEMA)


# ---------------------------------------------------------- perceptual dedup

_DHASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("dhash", LongType(), True),   # signed two's-complement view
        StructField("error", StringType(), True),
    ]
)


def image_dhash(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """(media_id, 64-bit dHash) over an image binary column — Arrow-batched,
    any supported codec (kernels/phash.py). Decode errors become rows."""
    if num_partitions is None:
        num_partitions = df.sparkSession.sparkContext.defaultParallelism * 2
    slim = df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.col(payload_col).alias("payload"),
    ).repartition(num_partitions, "media_id")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from img2table_spark.kernels.image_doc import decode_image_bytes
        from img2table_spark.kernels.phash import dhash64

        for pdf in batches:
            ids, hashes, errs = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                ids.append(int(mid))
                try:
                    v = dhash64(decode_image_bytes(bytes(payload)))
                    hashes.append(v - (1 << 64) if v >= (1 << 63) else v)
                    errs.append(None)
                except Exception as exc:
                    hashes.append(None)
                    errs.append(repr(exc)[:200])
            yield pd.DataFrame({"media_id": ids, "dhash": pd.array(hashes, dtype="Int64"), "error": errs})

    return slim.mapInPandas(gen, _DHASH_SCHEMA)


def dhash_neardup_pairs(hashes: DataFrame, max_dist: int = 6) -> DataFrame:
    """Near-dup image pairs: band the 64-bit dHash into 8×8-bit LSH keys,
    equi-join on (band, value), verify Hamming ≤ max_dist JVM-side
    (bit_count over xor). Pigeonhole: any pair within 7 bits shares a clean
    band, so recall is exact for max_dist ≤ 7 — same shape as the SimHash
    text path, no all-pairs scan at any corpus size."""
    if not 0 <= max_dist <= 7:
        raise ValueError("banded recall guarantee holds for max_dist <= 7")
    h = hashes.filter(F.col("dhash").isNotNull()).select("media_id", "dhash")
    bands = h.select(
        "media_id",
        "dhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.expr(f"shiftrightunsigned(dhash, {8 * i}) & 255").alias("val"),
                    )
                    for i in range(8)
                ]
            )
        ).alias("b"),
    ).select("media_id", "dhash", F.col("b.band").alias("band"), F.col("b.val").alias("val"))
    pairs = (
        bands.alias("a")
        .join(bands.alias("b"), on=["band", "val"])
        .filter(F.col("a.media_id") < F.col("b.media_id"))
        .select(
            F.col("a.media_id").alias("id_a"),
            F.col("b.media_id").alias("id_b"),
            F.col("a.dhash").alias("h_a"),
            F.col("b.dhash").alias("h_b"),
        )
        .distinct()
    )
    return (
        pairs.withColumn("dist", F.expr("bit_count(h_a ^ h_b)").cast("long"))
        .filter(F.col("dist") <= max_dist)
        .select("id_a", "id_b", "dist")
    )
