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


def test_q63_line_dedup_first_occurrence_wins(spark, tmp_path):
    """C4-style line dedup keeps exactly the globally FIRST instance of a
    repeated 5-token line — earliest doc_id, then earliest position, and a
    within-doc repeat loses to its own doc's first instance. Rebuilt text
    is the kept lines in document order (hash pinned against a Python
    recompute); a fully-deduped doc reports md5('')."""
    import hashlib

    A = "a b c d e"  # appears in doc 0 (twice), doc 1, doc 2
    B = "p q r s t"
    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": [f"{A} {A}", f"{B} {A}", A],
            "lang": ["en"] * 3,
            "n_chars": [21, 21, 9],
        }
    )
    spark.createDataFrame(pdf).write.parquet(str(tmp_path / "documents.parquet"))
    from img2table_spark.queries import q63_line_dedup

    out = {
        r["doc_id"]: (r["n_lines"], r["n_kept"], r["text_md5"])
        for r in q63_line_dedup(spark, str(tmp_path)).collect()
    }
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()
    # doc 0: first A kept, second (same doc, later seg) dropped
    assert out[0] == (2, 1, md5(A))
    # doc 1: B is novel, its A lost to doc 0
    assert out[1] == (2, 1, md5(B))
    # doc 2: everything deduped away -> empty rebuild
    assert out[2] == (1, 0, md5(""))


def test_q64_bigram_lm_hand_arithmetic(spark, tmp_path):
    """Add-one smoothing on a 2-doc corpus, checked by hand: vocabulary
    V={a,b,c}=3; bigrams: 'a b'x2, 'b a'x1, 'a c'x1; c(a)=3, c(b)=1.
    p_ppm('a b') = 10^6*(2+1) div (3+3) = 500000;
    p_ppm('b a') = 10^6*2 div 4 = 500000;
    p_ppm('a c') = 10^6*2 div 6 = 333333.
    Doc 10 = [a b a b] -> bigrams ab,ba,ab -> mean 500000;
    doc 11 = [a c] -> 333333. A 1-token doc is dropped without ANSI
    sequence() underflow (the CASE-free filter-first guard)."""
    pdf = pd.DataFrame(
        {
            "doc_id": [10, 11, 12],
            "text": ["a b a b", "a c", "solo"],
            "lang": ["en"] * 3,
            "n_chars": [7, 3, 4],
        }
    )
    spark.createDataFrame(pdf).write.parquet(str(tmp_path / "documents.parquet"))
    from img2table_spark.queries import q64_bigram_lm_score

    out = {
        r["doc_id"]: (r["n_bi"], r["bigram_ppm"])
        for r in q64_bigram_lm_score(spark, str(tmp_path)).collect()
    }
    assert out == {10: (3, 500000), 11: (1, 333333)}, out


def test_q65_gini_extremes(spark, tmp_path):
    """Rank-formula Gini: perfectly equal source masses -> 0 ppm; a
    two-source 1-vs-9 split -> G = (2*(1*1+2*9) - 3*10) / (2*10) = 0.4
    exactly (400000 ppm)."""
    from img2table_spark.queries import q65_source_gini

    eq = pd.DataFrame(
        {
            "doc_id": [0, 1],
            "text": ["a b c", "d e f"],
            "lang": ["en"] * 2,
            "source": ["s1", "s2"],
            "n_chars": [5, 5],
        }
    )
    spark.createDataFrame(eq).write.parquet(str(tmp_path / "eq" / "documents.parquet"))
    row = q65_source_gini(spark, str(tmp_path / "eq")).collect()[0]
    assert (row["n_sources"], row["total_toks"], row["gini_ppm"]) == (2, 6, 0)

    skew = pd.DataFrame(
        {
            "doc_id": [0, 1],
            "text": ["a", "b " * 8 + "b"],
            "lang": ["en"] * 2,
            "source": ["tiny", "big"],
            "n_chars": [1, 17],
        }
    )
    spark.createDataFrame(skew).write.parquet(
        str(tmp_path / "sk" / "documents.parquet")
    )
    row = q65_source_gini(spark, str(tmp_path / "sk")).collect()[0]
    assert (row["n_sources"], row["total_toks"], row["gini_ppm"]) == (2, 10, 400000)


def test_q66_split_leakage_cross_split_only(spark, tmp_path):
    """Two near-identical docs forced into different md5 splits must show
    up as exactly one cross-split pair; two near-identical docs in the
    SAME split must not appear. Split assignment is pinned to the q21 md5
    gate so the test picks ids by computing the gate in Python."""
    import hashlib

    def gate(doc_id: int) -> int:
        return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:4], 16) % 10

    train = [i for i in range(200) if gate(i) < 8]
    test = [i for i in range(200) if gate(i) == 9]
    base = "w" + " x y z".join(str(k) for k in range(12))  # >=3 tokens, shared
    near = base + " tail"
    pdf = pd.DataFrame(
        {
            # leak pair: one train doc + one test doc sharing all shingles;
            # control pair: two train docs sharing all shingles
            "doc_id": [train[0], test[0], train[1], train[2]],
            "text": [base, near, base + " t2", base + " t3"],
            "lang": ["en"] * 4,
            "n_chars": [len(base)] * 4,
        }
    )
    spark.createDataFrame(pdf).write.parquet(str(tmp_path / "documents.parquet"))
    from img2table_spark.queries import q66_split_leakage

    rows = [tuple(r) for r in q66_split_leakage(spark, str(tmp_path)).collect()]
    lo, hi = sorted((train[0], test[0]))
    want_lo = "train" if lo in train else "test"
    want_hi = "test" if want_lo == "train" else "train"
    # only the cross-split pairs survive; the train/train control pair is gone
    assert all(r[0] != r[1] for r in rows)
    assert any(r[:2] == (want_lo, want_hi) for r in rows), rows


def test_q67_blocks_cross_doc_boundaries(spark, tmp_path):
    """Two-level prefix sum: doc offsets must equal the naive global
    running total even when docs straddle the bucket boundary (doc_id 63 |
    64), and a block spanning two docs reports both. 3 docs of 100 tokens:
    offsets 0/100/200; 128-token blocks -> block 0 holds docs {0,63},
    block 1 holds {63,64}, block 2 holds {64} (300 toks = blocks 0,1 full
    + block 2 with 44)."""
    mk = lambda: " ".join(f"w{i}" for i in range(100))
    pdf = pd.DataFrame(
        {
            "doc_id": [0, 63, 64],  # 64 lands in the second 64-doc bucket
            "text": [mk(), mk(), mk()],
            "lang": ["en"] * 3,
            "n_chars": [len(mk())] * 3,
        }
    )
    spark.createDataFrame(pdf).write.parquet(str(tmp_path / "documents.parquet"))
    from img2table_spark.queries import q67_token_blocks

    out = {
        r["block_id"]: (r["n_docs"], r["first_doc"], r["last_doc"], r["n_toks"])
        for r in q67_token_blocks(spark, str(tmp_path)).collect()
    }
    assert out == {
        0: (2, 0, 63, 128),
        1: (2, 63, 64, 128),
        2: (1, 64, 64, 44),
    }, out


def test_q68_dsir_target_enrichment(spark, tmp_path):
    """A token that only the en (target) subset uses must score its docs
    above 10^6 ppm (target-enriched), a token only the non-target subset
    uses scores below, and every ratio matches a hand recompute of the
    add-one smoothed integer formula."""
    import hashlib

    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1],
            "text": ["enword enword enword", "deword deword deword"],
            "lang": ["en", "de"],
            "n_chars": [20, 20],
        }
    )
    spark.createDataFrame(pdf).write.parquet(str(tmp_path / "documents.parquet"))
    from img2table_spark.queries import q68_dsir_weights

    out = {
        r["doc_id"]: r["dsir_ppm"]
        for r in q68_dsir_weights(spark, str(tmp_path)).collect()
    }
    # hand recompute (buckets don't collide for these two tokens unless
    # md5 prefixes agree mod 256 — then both docs score 10^6 and the
    # strict inequality below would fail loudly)
    b_en = int(hashlib.md5(b"enword").hexdigest()[:4], 16) % 256
    b_de = int(hashlib.md5(b"deword").hexdigest()[:4], 16) % 256
    assert b_en != b_de
    R, T = 6, 3
    ratio = lambda ct, cr: (10**6 * (ct + 1) * (R + 256)) // ((cr + 1) * (T + 256))
    assert out == {0: ratio(3, 3), 1: ratio(0, 3)}, out
    assert out[0] > 10**6 > out[1]


def test_q69_loss_mask_density(spark, tmp_path):
    """Block loss-mask density hand-check: roles derive from doc_id
    ((id%8)%4: 0=user, 2=tool, else assistant). Docs 0..2 of 100 tokens
    give roles user/assistant/tool; 300 tokens -> blocks 0,1 full + block
    2 (44 toks). Block 0 = 100 user + 28 assistant -> 218750 ppm; block 1
    = 72 assistant + 56 tool -> 562500 ppm; block 2 = 44 tool -> 0."""
    mk = lambda: " ".join(f"w{i}" for i in range(100))
    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": [mk(), mk(), mk()],
            "lang": ["en"] * 3,
            "n_chars": [len(mk())] * 3,
        }
    )
    spark.createDataFrame(pdf).write.parquet(str(tmp_path / "documents.parquet"))
    from img2table_spark.queries import q69_block_loss_mask

    out = {
        r["block_id"]: (r["n_turns"], r["n_toks"], r["a_toks"], r["loss_ppm"])
        for r in q69_block_loss_mask(spark, str(tmp_path)).collect()
    }
    assert out == {
        0: (2, 128, 28, 10**6 * 28 // 128),
        1: (2, 128, 72, 562500),
        2: (1, 44, 0, 0),
    }, out


def test_q70_epoch_order_checksum(spark, tmp_path):
    """The shard manifest must match an independent Python recompute of
    the md5 epoch order exactly — shard split, within-shard (key, doc_id)
    rank, and the order-SENSITIVE checksum Σ rank·doc_id."""
    import hashlib
    from collections import defaultdict

    ids = list(range(40))
    pdf = pd.DataFrame(
        {
            "doc_id": ids,
            "text": ["a b c"] * 40,
            "lang": ["en"] * 40,
            "n_chars": [5] * 40,
        }
    )
    spark.createDataFrame(pdf).write.parquet(str(tmp_path / "documents.parquet"))
    from img2table_spark.queries import _EPOCH_SEED, _EPOCH_SHARDS, q70_epoch_shuffle

    shards = defaultdict(list)
    for d in ids:
        k = hashlib.md5((_EPOCH_SEED + str(d)).encode()).hexdigest()
        shards[int(k[:4], 16) % _EPOCH_SHARDS].append((k, d))
    want = {}
    for s, lst in shards.items():
        lst.sort()
        want[s] = (
            len(lst),
            3 * len(lst),
            sum((i + 1) * d for i, (k, d) in enumerate(lst)),
            lst[0][0],
        )
    got = {
        r["shard"]: (r["n_docs"], r["sum_toks"], r["order_checksum"], r["first_key"])
        for r in q70_epoch_shuffle(spark, str(tmp_path)).collect()
    }
    assert got == want, (got, want)


def test_q71_rule_boundaries(spark, tmp_path):
    """Each rule flips at its documented integer boundary: 14 vs 15
    tokens (R1), mean word length exactly 4.5 passes and 4.4 fails (R2),
    exactly 2% stopwords passes (R3), exactly 12% repetition passes and
    just above fails (R4)."""
    rows = {
        # 14 tokens (fails R1 low), all len-5, has 'theee'? keep stopword+rep sane
        100: " ".join(f"ab{i:02d}e" for i in range(13)) + " the",
        # 15 tokens (passes R1), same shape
        101: " ".join(f"ab{i:02d}e" for i in range(14)) + " the",
        # mean word len 4.4 (<4.5): 20 tokens: 12 of len 5, 8 of len 4, incl 'the'?
        # 12*5+8*4=92, 92/20=4.6 — recompute: want chars < 4.5n = 90 -> use 10*5+10*4=90 exactly passes (9n<=2chars: 180<=180)
        102: " ".join(["abcde"] * 10 + ["abcd"] * 9) + " the",  # chars=5*10+4*9+3=89 <90 fails R2
        103: " ".join(["abcde"] * 10 + ["abcd"] * 8) + " the " + "abcd",  # same count? recomputed below
    }
    pdf = pd.DataFrame(
        {
            "doc_id": list(rows),
            "text": list(rows.values()),
            "lang": ["en"] * len(rows),
            "n_chars": [len(v) for v in rows.values()],
        }
    )
    spark.createDataFrame(pdf).write.parquet(str(tmp_path / "documents.parquet"))
    from img2table_spark.queries import q71_quality_filter

    out = {
        r["doc_id"]: dict(
            r_len=r["r_len"], r_wordlen=r["r_wordlen"], r_stopword=r["r_stopword"],
            r_repetition=r["r_repetition"], keep=r["keep"],
        )
        for r in q71_quality_filter(spark, str(tmp_path)).collect()
    }
    # recompute every expected flag in Python from the same integer rules
    for doc_id, text in rows.items():
        t = text.split(" ")
        n, chars = len(t), sum(len(x) for x in t)
        stop = sum(1 for x in t if x in ("the", "a"))
        ctop = max(t.count(x) for x in set(t))
        want = dict(
            r_len=int(15 <= n <= 80),
            r_wordlen=int(9 * n <= 2 * chars and chars <= 5 * n),
            r_stopword=int(50 * stop >= n),
            r_repetition=int(25 * ctop <= 3 * n),
        )
        want["keep"] = int(all(want.values()))
        assert out[doc_id] == want, (doc_id, out[doc_id], want)
    # and the R1 boundary actually flips between the two fixtures
    assert out[100]["r_len"] == 0 and out[101]["r_len"] == 1


def test_q72_snapshot_statuses(spark, tmp_path):
    """Hand-pinned diff classification: doc 2 (…%13==2) is removed, doc 1
    (…%7==1) is changed, doc 3 (…%17==3) stays same AND spawns an added
    twin at +10^6, doc 0 is same."""
    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": ["t zero", "t one", "t two", "t three"],
            "lang": ["en"] * 4,
            "n_chars": [6, 5, 5, 7],
        }
    )
    spark.createDataFrame(pdf).write.parquet(str(tmp_path / "documents.parquet"))
    from img2table_spark.queries import q72_snapshot_diff

    out = {r["status"]: r["n_docs"] for r in q72_snapshot_diff(spark, str(tmp_path)).collect()}
    assert out == {"same": 2, "changed": 1, "removed": 1, "added": 1}, out


def test_q99_equi_depth_guarantee(spark):
    """The property q99 exists to provide: the realized bucket masses are
    balanced to within one bin's mass (|mass_i − n/B| < max bin count),
    the final boundary's cumulative mass is exactly n, and boundaries are
    nondecreasing — checked on the real sf0.001 events table."""
    from img2table_spark.queries import (
        _Q99_BUCKETS,
        q99_range_split_points,
    )

    sf = "/root/testdata/sf0.001"
    rows = q99_range_split_points(spark, sf).collect()
    ev = spark.read.parquet(f"{sf}/events.parquet")
    import pyspark.sql.functions as F

    max_bin = (
        ev.groupBy("event_type", F.floor("value").alias("b"))
        .count()
        .groupBy("event_type")
        .agg(F.max("count").alias("m"))
        .collect()
    )
    max_bin = {r["event_type"]: r["m"] for r in max_bin}
    by_type = {}
    for r in rows:
        by_type.setdefault(r["event_type"], {})[r["bucket_no"]] = r
    for et, buckets in by_type.items():
        assert sorted(buckets) == list(range(1, _Q99_BUCKETS + 1))
        n = buckets[1]["n_events"]
        assert buckets[_Q99_BUCKETS]["cum_at_split"] == n
        prev_cum, prev_bin = 0, None
        for i in range(1, _Q99_BUCKETS + 1):
            b = buckets[i]
            if prev_bin is not None:
                assert b["split_bin"] >= prev_bin
            mass = b["cum_at_split"] - prev_cum
            assert abs(mass - n / _Q99_BUCKETS) < max_bin[et], (et, i, mass)
            prev_cum, prev_bin = b["cum_at_split"], b["split_bin"]


def test_q100_exact_quota_realization(spark):
    """The two properties q100 exists to provide, on real sf0.001 data:
    (1) largest-remainder apportionment — per-lang quotas sum to exactly
    N div 10 and differ from the floor share by at most 1; (2) the
    histogram-CDF threshold selection realizes each quota EXACTLY
    (n_selected == quota, every lang)."""
    from img2table_spark.queries import _Q100_FRAC, q100_quota_split

    rows = q100_quota_split(spark, "/root/testdata/sf0.001").collect()
    n = sum(r["n_docs"] for r in rows)
    assert sum(r["quota"] for r in rows) == n // _Q100_FRAC
    for r in rows:
        assert r["quota"] - r["floor_share"] in (0, 1), r
        assert r["n_selected"] == r["quota"], r
    # remainder ranks are a permutation (ties broken deterministically)
    assert sorted(r["remainder_rank"] for r in rows) == list(
        range(1, len(rows) + 1)
    )


def test_ann_recall_ladder(spark):
    """The dial the q95/q96/q97 family documents, pinned on real data:
    multi-probe strictly beats nprobe=1 (q96 > q95), and the
    SQ8-compressed multi-probe store still beats uncompressed
    single-probe (q97 >= q95) — quantization loss must stay far smaller
    than the routing gain."""
    from img2table_spark.queries import QUERIES

    sf = "/root/testdata/sf0.001"

    def mean_recall(name):
        return QUERIES[name](spark, sf).collect()[0]["mean_recall_ppm"]

    r95 = mean_recall("q95_ann_recall")
    r96 = mean_recall("q96_ann_multiprobe")
    r97 = mean_recall("q97_sq8_recall")
    assert r96 > r95, (r95, r96)
    assert r97 >= r95, (r95, r97)
    # q96 re-ranks the shared candidate set at FULL precision, so its
    # overlap with exact ground truth is provably maximal for that set —
    # every compressed re-scoring (SQ8 q97, PQ q102) can only tie or lose.
    r102 = mean_recall("q102_pq_adc_recall")
    assert r97 <= r96, (r97, r96)
    assert r102 <= r96, (r102, r96)
    assert r102 > 0, r102
    # q106 exact-re-ranks the top-4k ADC shortlist: a GT hit can only be
    # displaced by another GT hit (any vector exactly-scoring above a GT
    # member is itself GT), so the refine rung never loses to raw ADC.
    r106 = mean_recall("q106_pq_rerank")
    assert r106 >= r102, (r102, r106)
    assert r106 <= r96, (r106, r96)


def test_q103_planted_spikes_and_boundaries(spark, tmp_path):
    """Planted event streams pin BOTH flag-rule boundaries:
    type 'a' (mad = 0): a 25-event spike flags, but a 12-event hour does
    NOT — |n−med| = 2 fails the ≥3 absolute floor that keeps mad=0 types
    from flagging jitter. type 'b' (mad = 1): ad = 4 > 3·mad flags,
    ad = 3 does NOT — the comparison is strictly greater-than."""
    from datetime import datetime, timedelta

    from img2table_spark.queries import q103_rate_anomaly

    t0 = datetime(2024, 1, 1)
    rows = []

    def hour(et, h, n):
        for i in range(n):
            rows.append((et, t0 + timedelta(hours=h, minutes=i)))

    for h in range(50):
        hour("a", h, 10)  # med = 10, mad = 0
    hour("a", 50, 25)  # ad = 15 → flagged
    hour("a", 51, 12)  # ad = 2 → NOT flagged (absolute floor)
    for h in range(4):
        hour("b", h, 10)
        hour("b", 4 + h, 11)
        hour("b", 8 + h, 12)  # med = 11, mad = 1
    hour("b", 12, 15)  # ad = 4 > 3·mad → flagged
    hour("b", 13, 14)  # ad = 3 = 3·mad → NOT flagged (strict >)

    spark.createDataFrame(
        rows, "event_type string, ts timestamp_ntz"
    ).write.parquet(str(tmp_path / "events.parquet"))
    out = {
        (r["event_type"], r["hour_bucket"]): r
        for r in q103_rate_anomaly(spark, str(tmp_path)).collect()
    }
    assert set(out) == {("a", 50), ("b", 12)}, sorted(out)
    assert out[("a", 50)]["med"] == 10 and out[("a", 50)]["mad"] == 0
    assert out[("b", 12)]["med"] == 11 and out[("b", 12)]["mad"] == 1
    assert out[("b", 12)]["abs_dev"] == 4


def test_q101_confusion_matrix_is_a_partition(spark):
    """The confusion matrix partitions the corpus: row sums equal the
    per-(split, lang) doc counts, and every prediction stays inside the
    model's closed label set."""
    from img2table_spark.queries import _LID_LANGS, _t, q101_lang_id

    sf = "/root/testdata/sf0.001"
    out = q101_lang_id(spark, sf).collect()
    assert all(r["pred_lang"] in _LID_LANGS for r in out)
    got = {}
    for r in out:
        k = (r["split"], r["true_lang"])
        got[k] = got.get(k, 0) + r["n_docs"]
    import pyspark.sql.functions as SF

    exp = {
        (r["split"], r["lang"]): r["n"]
        for r in _t(spark, sf, "documents")
        .groupBy(
            SF.expr(
                "CASE WHEN doc_id % 10 < 8 THEN 'train' ELSE 'heldout' END"
            ).alias("split"),
            "lang",
        )
        .agg(SF.count("*").alias("n"))
        .collect()
    }
    assert got == exp


def test_q104_mass_conservation(spark):
    """Dedup-aware weights conserve probability mass exactly: the global
    effective doc mass equals 10⁶ per singleton plus size·(10⁶ div size)
    per q16 cluster (the floor-division remainder is the only loss), and
    per-lang bounds hold."""
    from img2table_spark.queries import q16_dedup_clusters, q104_dedup_weights

    sf = "/root/testdata/sf0.001"
    rows = q104_dedup_weights(spark, sf).collect()
    clusters = q16_dedup_clusters(spark, sf).collect()
    n_docs = sum(r["n_docs"] for r in rows)
    n_down = sum(r["n_downweighted"] for r in rows)
    assert n_down == sum(c["cluster_size"] for c in clusters)
    expected_mass = 1_000_000 * (n_docs - n_down) + sum(
        c["cluster_size"] * (1_000_000 // c["cluster_size"])
        for c in clusters
    )
    assert sum(r["eff_docs_ppm"] for r in rows) == expected_mass
    for r in rows:
        assert r["n_downweighted"] <= r["n_docs"], r
        assert r["eff_docs_ppm"] <= 1_000_000 * r["n_docs"], r
        assert r["eff_chars_ppm"] <= 1_000_000 * r["n_chars_total"], r


def test_q105_oov_fallback_accounting(spark, tmp_path):
    """Planted train/heldout corpus with a hand-computable merge chain:
    train = {ab×6, abc×3, efgh×2} → merges (a,b), (ab,c), then the
    (e,f)/(f,g)/(g,h) tie breaks lexicographically to (e,f) — final
    vocab ab=1, abc=1, efgh=3 symbols. The heldout doc's unseen word
    'zzzz' must be counted OOV and charged len(word)=4 fallback tokens;
    train-side OOV is 0 by construction."""
    from img2table_spark.queries import q105_tokenizer_equity

    rows = [
        (0, "en", "ab ab ab ab ab ab abc abc abc efgh efgh"),
        (8, "en", "ab efgh zzzz abc"),
    ]
    spark.createDataFrame(
        rows, "doc_id long, lang string, text string"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    out = {
        r["split"]: r
        for r in q105_tokenizer_equity(spark, str(tmp_path)).collect()
    }
    tr, ho = out["train"], out["heldout"]
    assert (tr["n_words"], tr["n_oov_words"], tr["n_bpe_tokens"]) == (11, 0, 15)
    assert (ho["n_words"], ho["n_oov_words"], ho["n_bpe_tokens"]) == (4, 1, 9)
    assert ho["n_chars"] == 13
    assert ho["fertility_ppm"] == 9_000_000 // 4
    assert ho["oov_ppm"] == 1_000_000 // 4
    assert ho["chars_per_token_ppm"] == 13_000_000 // 9


def test_q107_funnel_and_block_arithmetic(spark):
    """The composed training-prep capstone conserves documents and packs
    contiguously: shard doc counts sum to the funnel's n_kept, the
    filter stage visibly fires, every shard's token offset equals the
    sum of earlier shards' token masses, and block spans follow the
    offset arithmetic."""
    from img2table_spark.queries import _BLK_TOK, q107_training_prep

    rows = sorted(
        q107_training_prep(spark, "/root/testdata/sf0.001").collect(),
        key=lambda r: r["shard"],
    )
    n_total, n_quality, n_kept = (
        rows[0]["n_total"],
        rows[0]["n_quality"],
        rows[0]["n_kept"],
    )
    assert n_total > n_quality >= n_kept > 0
    assert sum(r["n_docs"] for r in rows) == n_kept
    off = 0
    for r in rows:
        assert r["tok_off"] == off, (r["shard"], r["tok_off"], off)
        assert r["first_block"] == off // _BLK_TOK
        assert r["last_block"] == (off + r["bpe_toks"] - 1) // _BLK_TOK
        assert r["bpe_toks"] >= r["n_docs"]  # every kept doc >= 1 token
        assert r["order_checksum"] > 0
        off += r["bpe_toks"]
