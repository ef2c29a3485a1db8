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
