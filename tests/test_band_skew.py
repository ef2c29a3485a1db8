"""Adversarial-skew pins for the MinHash band family (r4 verdict #2 — the
q08/q48/q58 analog of tests/test_ivf.py's two-level-split pin).

A power-law corpus where ONE band key covers 10^4+ docs must produce
linear hub-star fan-out from the oversized bucket (B-1 pairs, every pair
anchored at the bucket's min doc_id), leave sub-cap buckets on the exact
all-pairs path, and stay bit-exact vs the DuckDB replay of the capped
generator — so the guard can never drift between engines.
"""

import duckdb
import pandas as pd
import pyspark.sql.functions as F
import pytest

from img2table_spark import queries as Q

HOT = 10_050  # one identical-text group — every one of its band buckets
GRP32 = 32    # sub-cap duplicate group (all-pairs path, 32 <= _BAND_CAP)
GRP8 = 8
_HOT_TEXT = (
    "the quick brown fox jumps over the lazy dog again and again and again"
)

# canonical 3-gram shingle SQL, identical to the Q08_SQL prologue
_SHINGLE_SQL = """toks AS (
  SELECT doc_id, str_split(text, ' ') AS t FROM documents
  WHERE len(str_split(text, ' ')) >= 3
),
sh AS (
  SELECT DISTINCT doc_id, t[i + 1] || ' ' || t[i + 2] || ' ' || t[i + 3] AS s
  FROM toks, LATERAL (SELECT unnest(generate_series(0, len(t) - 3)) AS i) g
)"""


@pytest.fixture(scope="module")
def skew_dir(tmp_path_factory):
    """documents.parquet with a 10^4-doc hot duplicate group, two sub-cap
    groups and a unique tail — the power-law shape of a crawl at scale."""
    tmp = tmp_path_factory.mktemp("band_skew")
    rows = [(i, _HOT_TEXT) for i in range(HOT)]
    nxt = HOT
    for g, size in [(0, GRP32), (1, GRP32), (2, GRP8)]:
        t = (
            f"tail group {g} shares this exact sentence body alpha beta "
            f"gamma delta epsilon zeta eta theta"
        )
        rows += [(nxt + j, t) for j in range(size)]
        nxt += size
    for u in range(400):
        rows.append(
            (
                nxt + u,
                f"unique document number {u} mixes w{u * 7 % 13} w{u * 11 % 17}"
                f" w{u * 3 % 7} w{u * 5 % 11} distinct tail content",
            )
        )
    pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "text": [r[1] for r in rows],
            "lang": "en",
            "source": "synthetic-skew",
            "n_chars": [len(r[1]) for r in rows],
        }
    ).to_parquet(tmp / "documents.parquet", index=False)
    return str(tmp)


def _pairs(spark, skew_dir):
    bands = Q._minhash_bands(Q._shingles(spark, skew_dir))
    return Q._band_pairs(bands)


def test_hot_bucket_emits_linear_hub_star(spark, skew_dir):
    """The 10,050-doc bucket must yield exactly HOT-1 pairs, all anchored
    at the hub (min doc_id 0) — not the ~5*10^7 all-pairs explosion."""
    hot = (
        _pairs(spark, skew_dir)
        .filter((F.col("doc_a") < HOT) & (F.col("doc_b") < HOT))
        .collect()
    )
    assert len(hot) == HOT - 1
    assert all(r["doc_a"] == 0 for r in hot)
    assert sorted(r["doc_b"] for r in hot) == list(range(1, HOT))


def test_sub_cap_buckets_keep_exact_all_pairs(spark, skew_dir):
    """Groups at or under _BAND_CAP stay on the unchanged all-pairs path:
    a 32-doc identical group emits all C(32,2) pairs."""
    lo, hi = HOT, HOT + GRP32
    grp = (
        _pairs(spark, skew_dir)
        .filter((F.col("doc_a") >= lo) & (F.col("doc_b") < hi))
        .count()
    )
    assert grp == GRP32 * (GRP32 - 1) // 2


def test_total_candidate_volume_is_linear(spark, skew_dir):
    """Whole-corpus candidate count stays O(n), not O(hot^2): the guard is
    what makes a 10^12-turn power-law corpus survivable."""
    n_docs = HOT + 2 * GRP32 + GRP8 + 400
    total = _pairs(spark, skew_dir).count()
    assert total < 3 * n_docs  # vs ~5*10^7 uncapped


def test_capped_pairs_match_duckdb_replay(spark, skew_dir):
    """Spark _band_pairs ≡ the _pairs_sql_cte oracle replay on the skew
    corpus — the cross-engine pin that keeps every consumer's oracle
    honest when the cap fires (it never fires at gate scale)."""
    got = {
        (r["doc_a"], r["doc_b"]) for r in _pairs(spark, skew_dir).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS "
        f"SELECT * FROM read_parquet('{skew_dir}/documents.parquet')"
    )
    sql = (
        f"WITH {_SHINGLE_SQL}, {Q._MH_SQL_CTES}, {Q._pairs_sql_cte('cand')} "
        f"SELECT doc_a, doc_b FROM cand"
    )
    want = set(map(tuple, con.execute(sql).fetchall()))
    assert got == want


def test_gate_scale_cap_is_noop(spark):
    """At gate scale no bucket reaches _BAND_CAP, so the guard is a
    provable no-op there (the IVF-split discipline): max bucket size at
    sf0.001 stays far under the cap."""
    bands = Q._bands_table(spark, "/root/testdata/sf0.001")
    mx = bands.groupBy("band", "sig").count().agg(F.max("count")).collect()[0][0]
    assert mx < Q._BAND_CAP


def test_conv_fingerprint_df_cap_bounds_hot_key(spark, tmp_path_factory):
    """q48's conv near-dup under fingerprint skew: one boilerplate turn
    shared by 10^4 conversations (df = 10,000 >> _CONV_DF_CAP = 32) is
    dropped from pair generation entirely, so the hot key contributes ZERO
    pairs (uncapped it would contribute ~5*10^7). Conversations still pair
    on their remaining shared fingerprints, and the DuckDB oracle replays
    the cap bit-exactly."""
    import duckdb

    tmp = tmp_path_factory.mktemp("conv_skew")
    n_convs, turns = 10_000, Q._TR_TURNS
    boiler = "standard system boilerplate preamble shared by every conversation"
    rows = []
    for c in range(n_convs):
        for t in range(turns):
            if t == 0:
                text = boiler  # the hot fingerprint
            elif c in (0, 1):
                text = f"twin conversation turn {t} payload shared by c0 c1"
            else:
                text = f"conv {c} turn {t} unique payload content here"
            rows.append((c * turns + t, text))
    pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "text": [r[1] for r in rows],
            "lang": "en",
            "source": "synthetic-conv-skew",
            "n_chars": [len(r[1]) for r in rows],
        }
    ).to_parquet(tmp / "documents.parquet", index=False)
    sf_dir = str(tmp)

    got = Q.QUERIES["q48_conv_neardup"](spark, sf_dir).collect()
    # exactly the twin pair; the boilerplate turn was capped out, so
    # n_common = turns-1 and jaccard = (t-1)/(t+1) in ppm
    assert len(got) == 1
    r = got[0]
    assert (r.conv_a, r.conv_b) == ("c0", "c1")
    assert r.n_common == turns - 1
    assert r.jaccard_ppm == (1_000_000 * (turns - 1)) // (turns + 1)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS "
        f"SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    import __spark_entry__ as em

    want = con.execute(em.oracle_sql()["q48_conv_neardup"]).fetchall()
    assert [(r.conv_a, r.conv_b, r.n_common, r.jaccard_ppm) for r in got] == [
        tuple(w) for w in want
    ]
