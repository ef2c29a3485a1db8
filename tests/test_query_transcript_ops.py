"""Edge-case pins for the round-4 transcript / semantic-dedup operators
(q42–q46): keeper semantics, prompt assembly, transition counts, and the
integer-exact temperature-mix rates — each on a synthetic corpus where the
expected output is hand-computable, plus DuckDB parity on the same files.
"""

import math

import duckdb
import numpy as np
import pandas as pd

from img2table_spark import queries as Q


def _write_docs(tmp_path, rows):
    pd.DataFrame(
        rows,
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    ).to_parquet(tmp_path / "documents.parquet", index=False)
    return str(tmp_path)


def _docs_view(sf_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS "
        f"SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    return con


def test_q44_prompt_assembly_exact(spark, tmp_path):
    """One 8-turn conv + one truncated 4-turn conv: the SFT pairs are the
    final-answer turns (turn_idx % 4 == 3) and each prompt is EXACTLY the
    previous three turns rendered 'role: text' — pinned by hand."""
    rows = [(i, f"t{i}", "en", "src0", 2) for i in range(12)]
    sf = _write_docs(tmp_path, rows)
    out = {
        (r["conv_id"], r["turn_idx"]): r
        for r in Q.q44_sft_pairs(spark, sf).collect()
    }
    assert set(out) == {("c0", 3), ("c0", 7), ("c1", 3)}
    assert out[("c0", 3)]["prompt"] == "user: t0\nassistant: t1\ntool: t2"
    assert out[("c0", 3)]["response"] == "t3"
    assert out[("c0", 7)]["prompt"] == "user: t4\nassistant: t5\ntool: t6"
    assert out[("c1", 3)]["prompt"] == "user: t8\nassistant: t9\ntool: t10"
    assert all(r["n_ctx_turns"] == 3 for r in out.values())
    # DuckDB twin enumerates the identical pairs
    con = _docs_view(sf)
    want = {
        (cid, ti): (n, p, resp)
        for cid, ti, n, p, resp in con.execute(Q.Q44_SQL).fetchall()
    }
    got = {
        k: (r["n_ctx_turns"], r["prompt"], r["response"]) for k, r in out.items()
    }
    assert got == want


def test_q45_transition_matrix_by_hand(spark, tmp_path):
    """Tool-call turns are turn_idx 1 and 5; tool names follow
    (doc_id // 4) % 3 → conv c0 calls search (doc 1) then code (doc 5),
    conv c1 calls browse (doc 9): matrix = {START→search, search→code,
    START→browse}, one conv each."""
    rows = [(i, f"t{i}", "en", "src0", 2) for i in range(12)]
    sf = _write_docs(tmp_path, rows)
    got = {
        (r["from_tool"], r["to_tool"]): (r["n_transitions"], r["n_convs"])
        for r in Q.q45_tool_transitions(spark, sf).collect()
    }
    assert got == {
        ("START", "search"): (1, 1),
        ("search", "code"): (1, 1),
        ("START", "browse"): (1, 1),
    }


def test_q42_keeper_is_lowest_id(spark, tmp_path):
    """Three identical vectors + three mutually-orthogonal ones (all
    orthogonal to the trio): the trio collapses to one semantic group —
    keeper = lowest vec_id, the other two dropped with n_dups_earlier
    counting their earlier twins; the orthogonals all survive. DuckDB
    replays the identical verdicts."""
    d = 8
    trio = np.zeros(d, dtype=np.float32)
    trio[7] = 1.0
    vecs = [trio, trio, trio]
    for i in range(3):
        e = np.zeros(d, dtype=np.float32)
        e[i] = 1.0
        vecs.append(e)
    sf_dir = str(tmp_path)
    pd.DataFrame(
        {
            "vec_id": np.arange(len(vecs), dtype=np.int64),
            "embedding": vecs,
        }
    ).to_parquet(tmp_path / "embeddings.parquet", index=False)
    got = {
        r["vec_id"]: (r["kept"], r["n_dups_earlier"])
        for r in Q.q42_semdedup(spark, sf_dir).collect()
    }
    assert got[0] == (1, 0)  # keeper: no earlier twin
    assert got[1] == (0, 1)
    assert got[2] == (0, 2)
    assert all(got[v] == (1, 0) for v in (3, 4, 5))

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS "
        f"SELECT * FROM read_parquet('{sf_dir}/embeddings.parquet')"
    )
    oracle = {
        v: (k, n)
        for v, _b, n, k in con.execute(Q.Q42_SQL).fetchall()
    }
    assert oracle == got


def test_q46_rates_integer_exact_and_flattening(spark, tmp_path):
    """p_ppm must equal the hand-computed integer formula
    least(1e6, (1e6 · (total div 3) · isqrt(cnt)) div (Σisqrt · cnt)) and
    α = 0.5 must FLATTEN the distribution: the minority language gets a
    strictly higher keep rate than the majority."""
    rows = []
    i = 0
    for lang, cnt in (("en", 300), ("fr", 50), ("zh", 12)):
        for _ in range(cnt):
            rows.append((i, f"w{i}", lang, "src0", 3))
            i += 1
    sf = _write_docs(tmp_path, rows)
    total = 362
    sumisq = sum(math.isqrt(c) for c in (300, 50, 12))
    expect = {
        lang: min(
            1_000_000,
            (1_000_000 * (total // 3) * math.isqrt(cnt)) // (sumisq * cnt),
        )
        for lang, cnt in (("en", 300), ("fr", 50), ("zh", 12))
    }
    out = {r["lang"]: r for r in Q.q46_temperature_mix(spark, sf).collect()}
    assert {k: v["p_ppm"] for k, v in out.items()} == expect
    assert expect["zh"] > expect["fr"] > expect["en"]  # flattening
    # kept counts match DuckDB bit-for-bit (same md5 gate)
    con = _docs_view(sf)
    want = {
        lang: (tot, ppm, kept)
        for lang, tot, ppm, kept in con.execute(Q.Q46_SQL).fetchall()
    }
    got = {k: (v["n_total"], v["p_ppm"], v["n_kept"]) for k, v in out.items()}
    assert got == want


# ---------------------------------------------------------------------------
# Round-4 late additions: q48–q52 pins
# ---------------------------------------------------------------------------


def _write_events(spark, tmp_path, rows):
    """rows: (event_id, ts_str, user_id, event_type). Written via Spark with
    TIMESTAMP_NTZ (pandas to_parquet writes NANOS Spark refuses to read)."""
    import pyspark.sql.functions as F

    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type"])
    pdf["value"] = 1.0
    pdf["props"] = "{}"
    (
        spark.createDataFrame(pdf)
        .withColumn("ts", F.expr("to_timestamp_ntz(ts)"))
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.parquet(str(tmp_path / "events.parquet"))
    )
    return str(tmp_path)


def _events_view(sf_dir):
    con = duckdb.connect()
    # Spark writes a directory of part files — glob it for DuckDB
    con.execute(
        f"CREATE VIEW events AS "
        f"SELECT * FROM read_parquet('{sf_dir}/events.parquet/*.parquet')"
    )
    return con


def test_q48_shared_prefix_pairs_and_df_cap(spark, tmp_path):
    """35 conversations all share one boilerplate turn (df = 35 > cap 32, so
    that fingerprint is DROPPED from the inverted index); convs c0 and c1
    additionally share two 40-char turn prefixes with different tails. The
    only emitted pair is (c0, c1) with n_common = 2 and
    jaccard_ppm = 2_000_000 // 14 — and DuckDB agrees on the same file."""
    rows = []
    shared = ["P" * 40 + "-tailA", "Q" * 40 + "-tailB"]
    for conv in range(35):
        for t in range(8):
            doc_id = conv * 8 + t
            if t == 7:
                text = "B" * 40 + f" boiler tail {conv}"  # shared 40-char prefix
            elif conv in (0, 1) and t in (0, 1):
                text = shared[t] + f" conv{conv}"
            else:
                text = f"unique-{conv}-{t} " + "x" * 40
            rows.append((doc_id, text, "en", "src0", len(text)))
    sf = _write_docs(tmp_path, rows)
    got = [tuple(r) for r in Q.q48_conv_neardup(spark, sf).collect()]
    assert got == [("c0", "c1", 2, 2_000_000 // 14)]
    con = _docs_view(sf)
    assert [tuple(r) for r in con.execute(Q.Q48_SQL).fetchall()] == got


def test_q49_runs_and_tiebreak(spark, tmp_path):
    """User 7 emits error,error,error,click,click,error → longest run is the
    3-error island (n_runs = 3); user 8's a,a,b,b ties at 2 — the EARLIER
    island wins deterministically."""
    rows = [
        (0, "2024-01-01 00:00:00", 7, "error"),
        (1, "2024-01-01 00:01:00", 7, "error"),
        (2, "2024-01-01 00:02:00", 7, "error"),
        (3, "2024-01-01 00:03:00", 7, "click"),
        (4, "2024-01-01 00:04:00", 7, "click"),
        (5, "2024-01-01 00:05:00", 7, "error"),
        (10, "2024-01-01 00:00:00", 8, "a"),
        (11, "2024-01-01 00:01:00", 8, "a"),
        (12, "2024-01-01 00:02:00", 8, "b"),
        (13, "2024-01-01 00:03:00", 8, "b"),
    ]
    sf = _write_events(spark, tmp_path, rows)
    got = {r["user_id"]: tuple(r)[1:] for r in Q.q49_event_runs(spark, sf).collect()}
    assert got[7] == ("error", 3, 0, 3)
    assert got[8] == ("a", 2, 10, 2)
    con = _events_view(sf)
    want = {u: rest for u, *rest in con.execute(Q.Q49_SQL).fetchall()}
    assert {u: list(v) for u, v in got.items()} == want


def test_q50_suffix_budget_and_oversize_drop(spark, tmp_path):
    """c0's turns are 100 tokens each → budget 256 keeps exactly the last
    two (200 tokens, first_kept_idx 6). c1's FINAL turn alone is 300 tokens
    → the monotone reverse cumsum exceeds the budget at the very first row
    and the conversation drops out entirely."""
    rows = []
    for t in range(8):
        rows.append((t, " ".join(["w"] * 100), "en", "src0", 100))
    for t in range(8):
        n = 300 if t == 7 else 5
        rows.append((8 + t, " ".join(["w"] * n), "en", "src0", n))
    sf = _write_docs(tmp_path, rows)
    got = {r["conv_id"]: tuple(r)[1:] for r in Q.q50_context_truncate(spark, sf).collect()}
    assert got == {"c0": (2, 6, 200)}
    con = _docs_view(sf)
    want = {c: rest for c, *rest in con.execute(Q.Q50_SQL).fetchall()}
    assert {c: list(v) for c, v in got.items()} == want


def test_q51_quality_keeper_and_tiebreak(spark, tmp_path):
    """c0: answer turn 7 has more tokens than turn 3 → chosen. c1: equal
    token counts → the EARLIER turn (3) is chosen deterministically."""
    rows = []
    for t in range(8):
        n = {3: 5, 7: 9}.get(t, 2)
        rows.append((t, " ".join(["w"] * n), "en", "src0", n))
    for t in range(8):
        n = 4 if t in (3, 7) else 2
        rows.append((8 + t, " ".join(["w"] * n), "en", "src0", n))
    sf = _write_docs(tmp_path, rows)
    got = {r["conv_id"]: tuple(r)[1:] for r in Q.q51_dpo_pairs(spark, sf).collect()}
    assert got == {"c0": (7, 3, 9, 5), "c1": (3, 7, 4, 4)}


def test_q52_range_frame_inclusive_boundary(spark, tmp_path):
    """Trailing-hour RANGE frame: user 1's events at 0, 30 and 61 minutes —
    the 61-minute event's window [1 min, 61 min] sees the 30-minute event
    but NOT the one at 0 (burst 2). User 2's pair exactly one hour apart IS
    counted together (frame boundary inclusive)."""
    rows = [
        (0, "2024-01-01 00:00:00", 1, "view"),
        (1, "2024-01-01 00:30:00", 1, "view"),
        (2, "2024-01-01 01:01:00", 1, "view"),
        (3, "2024-01-01 03:20:00", 1, "view"),
        (10, "2024-01-02 00:00:00", 2, "view"),
        (11, "2024-01-02 01:00:00", 2, "view"),
    ]
    sf = _write_events(spark, tmp_path, rows)
    got = {r["user_id"]: tuple(r)[1:] for r in Q.q52_rolling_burst(spark, sf).collect()}
    assert got == {1: (2, 4), 2: (2, 2)}
    con = _events_view(sf)
    want = {u: rest for u, *rest in con.execute(Q.Q52_SQL).fetchall()}
    assert {u: list(v) for u, v in got.items()} == want
