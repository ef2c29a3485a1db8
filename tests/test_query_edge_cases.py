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
