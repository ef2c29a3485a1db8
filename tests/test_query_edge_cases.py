"""ANSI-mode edge-case regressions for the oracle queries.

Spark 4's `sequence(a, b)` counts DOWN when a > b (CLAUDE.md gotcha), so a
transform over `sequence(0, size(t) - 2)` on a 1-token doc yields indices
[0, -1] and `t[-1]` throws INVALID_ARRAY_INDEX under ANSI unless predicate
pushdown happens to reorder evaluation. q27 guards the projection with an
explicit CASE; this test pins the guard against a corpus that would trip it.
"""

import pandas as pd

from img2table_spark.queries import q27_repetition


def test_q27_survives_one_token_doc(spark, tmp_path):
    pdf = pd.DataFrame(
        {
            "doc_id": ["solo", "pair", "rep"],
            "text": ["single", "two tokens", "a a a a"],
        }
    )
    spark.createDataFrame(pdf).write.parquet(str(tmp_path / "documents.parquet"))
    out = (
        q27_repetition(spark, str(tmp_path))
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    # The 1-token doc is dropped by the n_bi >= 1 filter WITHOUT throwing.
    assert list(out.index) == ["pair", "rep"]
    assert out.loc["rep", "top_w"] == "a"
    assert out.loc["rep", "dup_bi_pct"] == 66  # 3 bigrams, 1 distinct


def test_q26_decontam_green_at_both_widths(spark):
    """The decontamination width is a policy knob (r3 verdict #6):
    production-style 13-gram and the gate's 3-gram must BOTH match their
    DuckDB oracle. sf0.001 has real hits at both widths (13-gram flags the
    planted near-verbatim dups only — 3-gram also flags incidental
    phrase overlap), so this is a non-vacuous check."""
    import duckdb

    from img2table_spark.queries import decontam_sql, q26_decontam

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    for width in (3, 13):
        got = sorted(
            tuple(r) for r in q26_decontam(spark, sf, width=width).collect()
        )
        want = sorted(tuple(r) for r in con.execute(decontam_sql(width)).fetchall())
        assert got == want, f"width {width} mismatch"
        assert got, f"width {width} produced no rows — vacuous fixture"
    # and the wider policy is strictly more conservative on this corpus
    assert len({r[0] for r in con.execute(decontam_sql(13)).fetchall()}) < len(
        {r[0] for r in con.execute(decontam_sql(3)).fetchall()}
    )


def test_q53_merges_role_islands_exactly(spark, tmp_path):
    """Gaps-and-islands semantics pinned by hand: doc_ids 0-7 form one conv
    whose derived raw roles are u,u,a,a,t,u,u,a (((d*3) div 5) % 3), so the
    merge must yield 5 segments with n_merged 2,2,1,2,1 and '\n'-joined
    text in turn order."""
    pdf = pd.DataFrame(
        {
            "doc_id": list(range(8)),
            "text": [f"t{i}" for i in range(8)],
            "lang": ["en"] * 8,
            "n_chars": [2] * 8,
        }
    )
    spark.createDataFrame(pdf).write.parquet(str(tmp_path / "documents.parquet"))
    from img2table_spark.queries import q53_merge_turns

    out = (
        q53_merge_turns(spark, str(tmp_path))
        .toPandas()
        .sort_values("seg_idx")
        .reset_index(drop=True)
    )
    assert list(out["conv_id"].unique()) == ["c0"]
    assert list(out["n_merged"]) == [2, 2, 1, 2, 1]
    assert list(out["role"]) == ["user", "assistant", "tool", "user", "assistant"]
    assert list(out["text"]) == ["t0\nt1", "t2\nt3", "t4", "t5\nt6", "t7"]
    assert list(out["first_turn"]) == [0, 2, 4, 5, 7]


def test_q54_guard_and_benchmark_hit(spark, tmp_path):
    """q54's 8-gram transform must survive assistant turns with < 8 tokens
    (the ANSI sequence-counts-down gotcha) and flag exactly the turn that
    quotes the benchmark doc verbatim."""
    bench_text = "alpha beta gamma delta epsilon zeta eta theta iota"
    quoting = "intro alpha beta gamma delta epsilon zeta eta theta outro"
    pdf = pd.DataFrame(
        {
            "doc_id": list(range(8)),
            "text": [
                bench_text,          # doc 0: benchmark member (0 % 97 == 0), user turn
                quoting,             # doc 1: assistant, shares an 8-gram -> tainted
                "w x y z " * 3,      # doc 2: tool
                "one two three four five six seven eight nine",  # doc 3: assistant, clean
                "u turn text here again and again ok",           # doc 4: user
                "too short",         # doc 5: assistant, < 8 tokens (guard)
                "tool result body with enough words to shingle", # doc 6: tool
                "closing remark",    # doc 7: assistant, < 8 tokens (guard)
            ],
            "lang": ["en"] * 8,
            "n_chars": [10] * 8,
        }
    )
    spark.createDataFrame(pdf).write.parquet(str(tmp_path / "documents.parquet"))
    from img2table_spark.queries import q54_transcript_contam

    out = q54_transcript_contam(spark, str(tmp_path)).collect()
    assert len(out) == 1
    row = out[0]
    assert (row["conv_id"], row["n_tainted"], row["n_assistant"]) == ("c0", 1, 4)


def test_q55_cms_overestimates_only(spark):
    """Count-min sketch invariant: the estimate can only overcount (cell
    sums are supersets of each token's stream), never undercount."""
    from img2table_spark.queries import q55_cms_heavy_hitters

    out = q55_cms_heavy_hitters(spark, "/root/testdata/sf0.001").toPandas()
    assert len(out) > 0
    assert (out["est"] >= out["exact"]).all()


def test_q56_loglog_error_bound(spark):
    """LogLog with m=64 registers has a ~1.3/sqrt(64) = 16% standard error;
    assert the estimate lands within 35% of the exact distinct count for
    every event type (deterministic hashes make this a fixed outcome, not a
    flaky statistical test)."""
    from img2table_spark.queries import q56_distinct_sketch

    out = q56_distinct_sketch(spark, "/root/testdata/sf0.001").toPandas()
    assert len(out) > 0
    err = (out["est_distinct"] - out["exact_distinct"]).abs() / out["exact_distinct"]
    assert (err < 0.35).all(), out.to_dict("records")


def test_q58_verdict_precedence(spark, tmp_path):
    """Incremental dedup verdicts pinned by hand: identical texts collide on
    every band, so a batch doc matching the corpus index is 'dup_corpus', a
    batch doc whose only collision is a lower-id batch sibling is
    'dup_batch', and the lowest sibling (plus any unmatched doc) is 'new'.
    dup_batch is vacuous at gate scale (no planted intra-batch near-dups),
    so this pins that branch."""
    a = "the quick brown fox jumps over the lazy dog today"
    b = "completely different second document with many more words here"
    c = "yet another unrelated third document text goes right here now"
    pdf = pd.DataFrame(
        {
            # 3 is corpus; 7, 17, 27, 37 are the batch (% 10 == 7)
            "doc_id": [3, 7, 17, 27, 37],
            "text": [a, b, b, a, c],
            "lang": ["en"] * 5,
            "n_chars": [len(t) for t in [a, b, b, a, c]],
        }
    )
    spark.createDataFrame(pdf).write.parquet(str(tmp_path / "documents.parquet"))
    from img2table_spark.queries import q58_incremental_dedup

    out = {r["doc_id"]: r["verdict"] for r in q58_incremental_dedup(spark, str(tmp_path)).collect()}
    assert out == {7: "new", 17: "dup_batch", 27: "dup_corpus", 37: "new"}, out


def test_q59_brackets_q57_exact_percentiles(spark):
    """The histogram quantile must land in the unit bin containing the
    exact percentile: p_bin == floor(p_exact) for every type/percentile
    (same rank arithmetic, bin width 1)."""
    import math

    from img2table_spark.queries import q57_value_percentiles, q59_histogram_quantiles

    sf = "/root/testdata/sf0.001"
    exact = {r["event_type"]: r for r in q57_value_percentiles(spark, sf).collect()}
    hist = {r["event_type"]: r for r in q59_histogram_quantiles(spark, sf).collect()}
    assert exact.keys() == hist.keys() and exact
    for et in exact:
        for p in (50, 90, 99):
            assert hist[et][f"p{p}_bin"] == math.floor(exact[et][f"p{p}"]), (
                et, p, hist[et][f"p{p}_bin"], exact[et][f"p{p}"],
            )


def test_q60_bm25_integer_scores_by_hand(spark, tmp_path):
    """Okapi arithmetic pinned end-to-end on a 3-doc corpus: for the q1
    term 'join' (df=2, idf_pct=(100*3) div 2=150, AV=12, ND=3) the fixed
    k1=6/5, b=3/4 formula gives floor scores 235714 (tf=3) and 150000
    (tf=1); the no-hit queries 2/3 must produce NO rows, not zero rows."""
    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": [
                "join join join filler",
                "join filler filler filler",
                "filler filler filler filler",
            ],
            "lang": ["en"] * 3,
            "n_chars": [22, 25, 27],
        }
    )
    spark.createDataFrame(pdf).write.parquet(str(tmp_path / "documents.parquet"))
    from img2table_spark.queries import q60_bm25_topk

    rows = sorted(
        tuple(r) for r in q60_bm25_topk(spark, str(tmp_path)).collect()
    )
    assert rows == [
        (1, 0, 235714, 1, 1),
        (1, 1, 150000, 1, 2),
    ], rows


def test_q61_pmi_survives_one_token_doc_and_scores_exactly(spark, tmp_path):
    """The bigram projection is CASE-guarded against Spark 4's descending
    sequence() on 1-token docs (same ANSI trap as q27); and the integer
    PMI score is pinned by hand: T=11, B=9, c_xy=5, c_x=c_y=5 →
    (10^6*5*11*11) div (9*5*5) = 2688888."""
    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1],
            "text": ["solo", "x y x y x y x y x y"],
            "lang": ["en"] * 2,
            "n_chars": [4, 19],
        }
    )
    spark.createDataFrame(pdf).write.parquet(str(tmp_path / "documents.parquet"))
    from img2table_spark.queries import q61_pmi_collocations

    rows = [tuple(r) for r in q61_pmi_collocations(spark, str(tmp_path)).collect()]
    assert rows == [("x", "y", 5, 5, 5, 2688888, 1)], rows


def test_q62_url_canonical_variants(spark, tmp_path):
    """The four messy variants per target must collapse 3+1: mixed-case
    host/scheme + :443 + utm + #fragment, the already-clean form, and the
    http://...:80/...// + utm form all canonicalize identically (scheme
    folded to https, default port and trailing slash stripped, utm_*
    dropped); the ref=home variant must NOT collapse with them and its
    query params come back sorted."""
    pdf = pd.DataFrame(
        {
            "doc_id": list(range(8)),
            "text": ["t"] * 8,
            "lang": ["en"] * 8,
            "n_chars": [1] * 8,
        }
    )
    spark.createDataFrame(pdf).write.parquet(str(tmp_path / "documents.parquet"))
    from img2table_spark.queries import q62_url_canonical_dedup

    out = {
        r["canon_url"]: (r["n_docs"], r["keeper"])
        for r in q62_url_canonical_dedup(spark, str(tmp_path)).collect()
    }
    assert out == {
        "https://site0.example.com/page/0?id=0": (3, 0),
        "https://site0.example.com/page/0?id=0&ref=home": (1, 3),
        "https://site1.example.com/page/1?id=1": (3, 4),
        "https://site1.example.com/page/1?id=1&ref=home": (1, 7),
    }, out
