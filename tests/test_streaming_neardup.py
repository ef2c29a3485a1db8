"""Streaming MinHash near-dup dedup (streaming twin of batch q58):
stream ≡ batch verdicts on a corpus exercising all three outcomes
(dup_corpus / dup_batch / new), with the dup_batch claim spanning
micro-batches, plus a pin that the per-row band computation matches the
batch explode→groupBy construction exactly."""

import datetime as dt
import time

import pyspark.sql.functions as F

from img2table_spark import queries as Q
from img2table_spark.streaming.neardup import (
    _with_bands,
    neardup_verdicts,
    stream_neardup_dedup,
)

_T0 = dt.datetime(2024, 1, 1, 1, 0)

# batch docs are doc_id % 10 == 7 (q58's modulus split)
_DOCS = [
    # corpus (ids not ≡ 7 mod 10)
    (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (2, "one two three four five six seven eight nine ten eleven"),
    (3, "shared corpus sentence body with many stable words inside here"),
    (4, "red orange yellow green blue indigo violet ultraviolet infrared"),
    (5, "north south east west up down left right forward backward"),
    # batch (ids ≡ 7 mod 10)
    (7, "first streaming claimer of this exact sentence wins the key"),
    (17, "first streaming claimer of this exact sentence wins the key"),
    (27, "shared corpus sentence body with many stable words inside here"),
    (37, "completely novel document payload nothing matches anything else"),
    (47, "another fresh unique text with its own vocabulary entirely new"),
]
_EXPECTED = {7: "new", 17: "dup_batch", 27: "dup_corpus", 37: "new", 47: "new"}


def _docs_df(spark):
    return spark.createDataFrame(
        [(i, t, "en", "synthetic", len(t)) for i, t in _DOCS],
        "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG",
    )


def test_row_bands_match_batch_construction(spark, tmp_path):
    """_with_bands (per-row array_min, zero shuffles) ≡ _minhash_bands
    (explode → distinct → groupBy) on identical input."""
    docs = _docs_df(spark).select(
        "doc_id", F.lit(_T0).cast("timestamp").alias("ts"), "text"
    )
    got = {
        (r.doc_id, r.band, r.sig)
        for r in _with_bands(docs).collect()
    }
    sh = _docs_df(spark).select(
        "doc_id", F.split("text", " ").alias("t")
    ).select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, size(t) - 3),"
                " i -> array_join(slice(t, i + 1, 3), ' '))"
            )
        ).alias("s"),
    ).distinct()
    want = {
        (r.doc_id, r.band, r.sig) for r in Q._minhash_bands(sh).collect()
    }
    assert got == want


def test_stream_matches_batch_q58(spark, tmp_path):
    sf_dir = str(tmp_path / "sf")
    _docs_df(spark).coalesce(1).write.parquet(f"{sf_dir}/documents.parquet")

    # batch q58 on the combined table is the oracle
    want = {
        r.doc_id: r.verdict
        for r in Q.QUERIES["q58_incremental_dedup"](spark, sf_dir).collect()
    }
    assert want == _EXPECTED  # the fixture really covers all three verdicts

    # stream input: the batch docs, doc 17 arriving in a LATER micro-batch
    # than doc 7 (its claimer) — the cross-batch state transition
    inp = str(tmp_path / "in")
    batch_rows = [(i, t) for i, t in _DOCS if i % 10 == 7]
    for slice_ids in ([7, 27, 37], [17, 47]):
        spark.createDataFrame(
            [
                (i, _T0 + dt.timedelta(seconds=i), t)
                for i, t in batch_rows
                if i in slice_ids
            ],
            "doc_id LONG, ts TIMESTAMP, text STRING",
        ).coalesce(1).write.mode("append").parquet(inp)
        time.sleep(1.1)

    corpus_bands = Q._bands_table(spark, sf_dir).filter(
        ~F.expr(f"doc_id % {Q._Q58_BATCH_MOD} = {Q._Q58_BATCH_REM}")
    )
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = stream_neardup_dedup(
        spark, inp, corpus_bands, out, ckpt, max_files_per_trigger=1
    )
    q.awaitTermination(300)

    got = {r.doc_id: r.verdict for r in neardup_verdicts(spark, out).collect()}
    assert got == want
