"""Streaming SFT-pair assembly (applyInPandasWithState) vs batch q44.

The final-answer turn arrives in a LATER micro-batch than its context turns
(slice boundaries cut each conversation mid-window), so the test proves the
cross-batch turn buffer; a far-future flush turn advances the watermark so
conversation eviction fires — pinned via the state-store metrics.
"""

import datetime as dt
import json
import time

from img2table_spark.queries import _SFT_CTX as _BATCH_CTX, _transcripts, q44_sft_pairs
from img2table_spark.streaming.sft import _SFT_CTX, stream_sft_pairs

BASE = dt.datetime(2024, 1, 1)
SF = "/root/testdata/sf0.001"


def test_ctx_constants_agree():
    assert _SFT_CTX == _BATCH_CTX


def _transcript_rows(spark):
    """The deterministic q43-q45 synthesis + a ts column (one minute per
    turn) — the full north-rule input shape."""
    rows = []
    for r in _transcripts(spark, SF).collect():
        rows.append(
            (
                r["conv_id"],
                int(r["turn_idx"]),
                r["role"],
                r["text"],
                r["tool"],
                BASE + dt.timedelta(minutes=int(r["turn_idx"])),
            )
        )
    return rows


SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, "
    "ts timestamp_ntz"
)


def test_stream_sft_matches_batch_and_bounds_state(spark, tmp_path):
    rows = _transcript_rows(spark)
    # slice so every conversation's final-answer turn 3 arrives one batch
    # AFTER its context turns 0-2 (and turn 7 after 4-6)
    slices = [
        [r for r in rows if r[1] in (0, 1, 2)],
        [r for r in rows if r[1] in (3, 4, 5, 6)],
        [r for r in rows if r[1] == 7]
        + [
            (
                "flush",
                0,
                "user",
                "flush",
                None,
                BASE + dt.timedelta(days=40),
            )
        ],
    ]
    inp = str(tmp_path / "tin")
    for sl in slices:
        spark.createDataFrame(sl, SCHEMA).coalesce(1).write.mode("append").parquet(inp)
        time.sleep(1.1)  # distinct mtimes → deterministic file order
    out, ckpt = str(tmp_path / "tout"), str(tmp_path / "tckpt")
    q = stream_sft_pairs(spark, inp, out, ckpt)
    q.awaitTermination(300)

    got = {
        (r.conv_id, int(r.turn_idx)): (int(r.n_ctx_turns), r.prompt, r.response)
        for r in spark.read.parquet(out).collect()
    }
    want = {
        (r.conv_id, int(r.turn_idx)): (int(r.n_ctx_turns), r.prompt, r.response)
        for r in q44_sft_pairs(spark, SF).collect()
    }
    assert got == want
    assert len(got) >= 100  # sf0.001 yields 125 pairs — non-vacuous

    # bounded state: the 40-day flush pushed the watermark past every
    # (last turn + 1 day) timeout — only the flush conversation may remain
    progress = [json.loads(p.json) for p in q.recentProgress]
    finals = [
        op["numRowsTotal"]
        for p in progress[-1:]
        for op in p.get("stateOperators", [])
    ]
    assert finals and finals[0] <= 1, progress[-1].get("stateOperators")
