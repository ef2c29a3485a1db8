"""Streaming lang-ID serve path (train-batch → serve-stream twin of
q101): the stream's per-doc classifications over closed windows equal
the identical static derivation, and their confusion rollup equals
batch q101's matrix exactly (the derivation is SHARED code, so this
pins the stream plumbing — broadcast model join, windowed score fold,
watermark semantics — not a re-implementation)."""

import datetime as dt
import time

import pyspark.sql.functions as F

from img2table_spark.streaming.classify import (
    batch_classify_twin,
    stream_classify_langs,
)

_SF = "/root/testdata/sf0.001"
_T0 = dt.datetime(2024, 1, 1, 0, 5)


def test_stream_classify_matches_batch_q101(spark, tmp_path):
    from img2table_spark.queries import _lid_profiles, q101_lang_id

    docs = spark.read.parquet(f"{_SF}/documents.parquet").select(
        "doc_id", "lang", "text"
    )
    # carve-out precondition: every doc produces trigrams (see module doc)
    assert docs.filter(F.length("text") < 3).count() == 0
    profiles = _lid_profiles(spark, _SF).cache()
    profiles.count()

    inp = str(tmp_path / "in")
    docs.select(
        "doc_id", F.lit(_T0).alias("ts"), "lang", "text"
    ).coalesce(2).write.mode("append").parquet(inp)
    time.sleep(1.1)  # file-source order is mtime — keep slices apart
    spark.createDataFrame(
        [(-1, dt.datetime(2026, 1, 1), "en", "zzz")],
        "doc_id LONG, ts TIMESTAMP, lang STRING, text STRING",
    ).coalesce(1).write.mode("append").parquet(inp)

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = stream_classify_langs(
        spark, inp, out, ckpt, profiles, max_files_per_trigger=1
    )
    q.awaitTermination(300)

    key = lambda r: (  # noqa: E731
        r["w_start"],
        r["doc_id"],
        r["true_lang"],
        r["pred_lang"],
    )
    got = sorted(key(r) for r in spark.read.parquet(out).collect())
    want = sorted(
        key(r)
        for r in batch_classify_twin(spark, inp, profiles)
        .filter(F.col("w_start") < dt.datetime(2025, 1, 1))
        .collect()
    )
    assert got == want and len(got) == docs.count()

    # confusion rollup of the streamed classifications == batch q101
    rolled = {}
    for _, doc_id, true_lang, pred_lang in got:
        k = ("train" if doc_id % 10 < 8 else "heldout", true_lang, pred_lang)
        rolled[k] = rolled.get(k, 0) + 1
    batch = {
        (r["split"], r["true_lang"], r["pred_lang"]): r["n_docs"]
        for r in q101_lang_id(spark, _SF).collect()
    }
    assert rolled == batch

    # restart idempotency: same input + checkpoint emits nothing new
    q2 = stream_classify_langs(spark, inp, out, ckpt, profiles)
    q2.awaitTermination(300)
    assert spark.read.parquet(out).count() == len(got)
