"""Streaming drift monitor (twin of batch q108's TVD audit): the
stream's windowed token-bucket histograms equal the static derivation
on closed windows, state is one row per occupied bucket, the TVD fold
against a reference distribution matches an INDEPENDENT Python md5
replication (both |0−sr| and |sw−0| arms exercised), and restarts emit
nothing new."""

import datetime as dt
import hashlib
import time

import pyspark.sql.functions as F

from img2table_spark.streaming.drift import (
    batch_bins_twin,
    stream_drift_bins,
    tvd_from_bins,
)

_W1 = dt.datetime(2024, 1, 1, 0, 0)
_W2 = dt.datetime(2024, 1, 1, 0, 10)


def _py_bkt(tok: str) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:4], 16) % 256


def _py_tvd(window_toks, ref_toks):
    cw, cr = {}, {}
    for t in window_toks:
        cw[_py_bkt(t)] = cw.get(_py_bkt(t), 0) + 1
    for t in ref_toks:
        cr[_py_bkt(t)] = cr.get(_py_bkt(t), 0) + 1
    tw, tr = len(window_toks), len(ref_toks)
    tot = 0
    for b in set(cw) | set(cr):
        tot += abs(
            10**6 * cw.get(b, 0) // tw - 10**6 * cr.get(b, 0) // tr
        )
    return tot // 2


def test_stream_drift_monitor(spark, tmp_path):
    # window 1 matches the reference mix; window 2 drifts (adds 'dd',
    # which the reference lacks, and drops 'aa'/'cc')
    w1 = ["aa bb aa", "cc aa"]
    w2 = ["bb bb bb dd"]
    ref = ["aa", "bb", "cc", "aa"]

    inp = str(tmp_path / "in")
    rows = [(i, _W1 + dt.timedelta(minutes=5), "en", t) for i, t in enumerate(w1)]
    rows += [
        (10 + i, _W2 + dt.timedelta(minutes=5), "en", t)
        for i, t in enumerate(w2)
    ]
    schema = "doc_id LONG, ts TIMESTAMP, lang STRING, text STRING"
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(inp)
    time.sleep(1.1)  # file-source order is mtime
    spark.createDataFrame(
        [(99, dt.datetime(2026, 1, 1), "en", "flush")], schema
    ).coalesce(1).write.mode("append").parquet(inp)

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = stream_drift_bins(spark, inp, out, ckpt, max_files_per_trigger=1)
    q.awaitTermination(300)

    got = {
        (r.w_start, r.bkt): r.cnt for r in spark.read.parquet(out).collect()
    }
    want = {
        (r.w_start, r.bkt): r.cnt
        for r in batch_bins_twin(spark, inp)
        .filter(F.col("w_start") < dt.datetime(2025, 1, 1))
        .collect()
    }
    assert got == want and got
    # bounded state: one row per occupied bucket per window
    w1_toks = " ".join(w1).split()
    w2_toks = " ".join(w2).split()
    assert len([k for k in got if k[0] == _W1]) == len(
        {_py_bkt(t) for t in w1_toks}
    )

    # TVD fold vs the reference == independent Python md5 replication
    ref_df = spark.createDataFrame(
        [(b, sum(1 for t in ref if _py_bkt(t) == b)) for b in {_py_bkt(t) for t in ref}],
        "bkt LONG, cref LONG",
    )
    tvd = {
        r["w_start"]: (r["tvd_ppm"], r["n_toks"])
        for r in tvd_from_bins(spark.read.parquet(out), ref_df).collect()
    }
    assert tvd[_W1] == (_py_tvd(w1_toks, ref), len(w1_toks))
    assert tvd[_W2] == (_py_tvd(w2_toks, ref), len(w2_toks))
    assert tvd[_W2][0] > tvd[_W1][0]  # the drifted window alarms louder

    # restart idempotency
    q2 = stream_drift_bins(spark, inp, out, ckpt)
    q2.awaitTermination(300)
    assert {
        (r.w_start, r.bkt): r.cnt for r in spark.read.parquet(out).collect()
    } == got
