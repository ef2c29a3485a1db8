"""Semantic pins for q92 (content-defined chunking) and q87/q93 (k-means):
not just oracle parity, but the PROPERTY each operator exists for.

q92: content-defined boundaries survive an insertion — a token inserted
near the front of a copied document must not destroy chunk-level dup
detection in the untouched tail (fixed-size chunking loses every chunk
after the edit because all boundaries shift).

q87/q93: on well-separated blobs, full-corpus Lloyd's recovers the blob
structure — every cluster is PURE (its members share one blob label),
even with k > #blobs (excess centroids split a blob; they never straddle
two).
"""

import numpy as np
from pyspark.sql import functions as F

from img2table_spark import queries as Q


def _write_documents(spark, path, rows):
    spark.createDataFrame(
        [
            (i, text, "en", "src", len(text))
            for i, text in enumerate(rows)
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(f"{path}/documents.parquet")


def test_cdc_chunking_survives_insertion(spark, tmp_path):
    rng = np.random.RandomState(7)
    vocab = [f"w{j}" for j in range(50)]
    body = [vocab[rng.randint(50)] for _ in range(400)]
    original = " ".join(body)
    # copy with ONE token inserted at position 3 — everything after the
    # edit is an exact duplicate at shifted offsets
    edited = " ".join(body[:3] + ["INSERTED"] + body[3:])
    fillers = [
        " ".join(vocab[rng2.randint(50)] for rng2 in [rng] for _ in range(60))
        for _ in range(6)
    ]
    sf = str(tmp_path / "sf")
    _write_documents(spark, sf, [original, edited] + fillers)

    out = {
        r["doc_id"]: r.asDict()
        for r in Q.QUERIES["q92_cdc_chunk_dedup"](spark, sf).collect()
    }
    # the pair shares most of its chunk mass despite the shifted offsets
    for d in (0, 1):
        assert out[d]["dup_chunks"] >= 1
        assert out[d]["dup_tok_ppm"] > 800_000, out[d]
    # fixed-size chunking (q34's shape, replayed locally) loses the tail:
    # no 32-token-aligned chunk after the edit can match
    tok_o = original.split(" ")
    tok_e = edited.split(" ")
    fixed_o = {
        " ".join(tok_o[i : i + 32]) for i in range(0, len(tok_o) - 31, 32)
    }
    fixed_e = {
        " ".join(tok_e[i : i + 32]) for i in range(0, len(tok_e) - 31, 32)
    }
    assert len(fixed_o & fixed_e) == 0  # fixed chunking finds NOTHING


def test_kmeans_recovers_separated_blobs(spark, tmp_path):
    rng = np.random.RandomState(11)
    rows = []
    centers = [rng.uniform(-0.5, 0.5, 64) + blob * 10.0 for blob in range(3)]
    # interleave vec_ids across blobs: q87 seeds = the first k rows, and
    # Lloyd's (any Lloyd's) cannot split a blob no seed ever lands in —
    # the classic seeding sensitivity, not a defect under test here
    for i in range(60):
        for blob in range(3):
            v = centers[blob] + rng.uniform(-0.01, 0.01, 64)
            rows.append((i * 3 + blob, [float(x) for x in v], blob))
    sf = str(tmp_path / "sf")
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.parquet(f"{sf}/embeddings.parquet")

    purity = Q.QUERIES["q93_cluster_purity"](spark, sf).collect()
    # every non-degenerate cluster is 100% pure: no centroid straddles blobs
    assert all(r["purity_ppm"] == 1_000_000 for r in purity)
    # all three blobs are represented among the top labels
    assert {r["top_label"] for r in purity} == {0, 1, 2}
    # and the assignment covers every vector exactly once
    final, _ = Q._km_final(spark, sf)
    assert final.count() == 180
    assert final.select("vec_id").distinct().count() == 180
