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
