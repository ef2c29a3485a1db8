"""Multimodal column plumbing: opaque binary payloads with typed metadata.

Training-data pipelines carry image/audio/video as ``binary`` columns. The
decode/feature steps for audio/video need codec libraries that are not in
this environment, so those kernels are STUBBED behind a deterministic fake
(`fake_features=True`, default in tests) or `NotImplementedError` — but the
Spark-side plumbing is real and tested: schema, partitioning, Arrow batch
shape, and the UDF signatures are exactly what a codec-backed kernel would
drop into. PNG images decode for real (kernels/png.py).
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


def _decode_one(payload: bytes, kind: str, fake_features: bool) -> dict:
    out = {
        "mime": None, "n_bytes": len(payload), "width": None, "height": None,
        "duration_ms": None, "features": None, "error": None,
    }
    if kind == "image" and payload[:8] == b"\x89PNG\r\n\x1a\n":
        from img2table_spark.kernels.png import decode_png

        img = decode_png(payload)
        out["mime"] = "image/png"
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
    if kind in ("audio", "video"):
        # STUB: codec libraries unavailable — deterministic fake keeps the
        # batch shape and downstream schema real for tests; a real kernel
        # (ffmpeg/soundfile) slots in here unchanged.
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
