"""Driver-facing query suite with DuckDB oracles.

Each entry exercises one operator family from SURVEY.md §2 (or a
training-data-pipeline operator) as a *Spark-first* DataFrame plan, and has
an ANSI-SQL oracle producing identical rows on the same parquet tables.

Design rules for oracle parity:
  - every computed column is integer/string typed (no float hashing except
    the ANN query, whose output is int ids);
  - ratios use integer arithmetic (e.g. containment ``2*int_area > w_area``);
  - hashes use md5 (identical hex in Spark and DuckDB);
  - every aggregate/computed column is aliased identically on both sides.
"""

from __future__ import annotations

import functools as _functools
import hashlib as _hashlib
import math as _math
from pathlib import Path

import pandas as pd  # noqa: F401 — pandas_udf type hints resolve at module scope

from pyspark.sql import DataFrame, SparkSession, Window, functions as F
from pyspark.storagelevel import StorageLevel

from img2table_spark.operators.extract import extract_cells_flat
from img2table_spark.sources.transcripts import transcripts_from_documents


_T_MEMO: dict = {}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Source-table reader with a per-(session, dir, table) PLAN memo: a
    DataFrame is an immutable logical-plan handle, so reusing it skips the
    driver-side file listing + parquet footer schema read every consumer
    repaid per call. Nothing is persisted — every execution still scans
    the parquet input."""
    key = (spark.sparkContext.applicationId, sf_dir, name)
    hit = _T_MEMO.get(key)
    if hit is None:
        hit = spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
        _T_MEMO[key] = hit
    return hit


# --------------------------------------------------------------------------
# q01 — flagship: HTML payload extraction end-to-end (S-scan → salt →
# Arrow UDF parse → explode). Oracle recomputes every cell value in SQL.
# --------------------------------------------------------------------------

def q01_html_extract_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    tr = transcripts_from_documents(spark, sf_dir)
    flat = extract_cells_flat(tr, salt=True)
    return flat.select(
        "conv_id", "turn_idx", "table_idx", "row_idx", "col_idx", "value"
    )


Q01_SQL = """
WITH d AS (
  SELECT doc_id, str_split(text, ' ') AS toks,
         2 + doc_id % 3 AS nr, 2 + doc_id % 2 AS nc,
         (doc_id % 5 = 0) AS merged
  FROM documents
  WHERE doc_id % 11 <> 3
),
g AS (
  SELECT d.doc_id, d.merged, d.toks, r.r, c.c
  FROM d,
       LATERAL (SELECT unnest(generate_series(0, d.nr - 1)) AS r) r,
       LATERAL (SELECT unnest(generate_series(0, d.nc - 1)) AS c) c
),
v AS (
  SELECT doc_id, r, c,
         CASE WHEN merged AND r = 0 AND c <= 1 THEN 0 ELSE c END AS ce
  FROM g
)
SELECT CASE WHEN v.doc_id % 17 = 0 THEN 'c_heavy'
            ELSE 'c' || (v.doc_id % 500) END            AS conv_id,
       v.doc_id                                         AS turn_idx,
       CAST(0 AS BIGINT)                                AS table_idx,
       v.r                                              AS row_idx,
       v.c                                              AS col_idx,
       'd' || v.doc_id || '_r' || v.r || '_c' || v.ce || '_' ||
         d.toks[CAST((v.r * 7 + v.ce * 3) % len(d.toks) AS INT) + 1] AS value
FROM v JOIN d ON v.doc_id = d.doc_id
"""


# --------------------------------------------------------------------------
# q02 — T1 word filter analog: predicate + projection with pushdown
# (reference: ocr/data.py:95-99)
# --------------------------------------------------------------------------

def q02_word_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.filter((F.col("event_type") == "click") & (F.col("value") >= 50))
        .select(
            "event_id",
            "user_id",
            F.round(F.col("value") * 100).cast("long").alias("value_c"),
        )
    )


Q02_SQL = """
SELECT event_id, user_id, CAST(round(value * 100) AS BIGINT) AS value_c
FROM events WHERE event_type = 'click' AND value >= 50
"""


# --------------------------------------------------------------------------
# q03 — T2 spatial containment join: words×cells interval theta join with
# >50% word-area containment (reference: ocr/data.py:108-130). The cells
# side is small → broadcast; containment in integer arithmetic.
# --------------------------------------------------------------------------

def q03_spatial_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        (F.col("event_id") % 1000).alias("wx1"),
        (F.col("event_id") % 1000 + 1 + F.col("user_id") % 40).alias("wx2"),
        (F.col("user_id") % 100).alias("wy1"),
        (F.col("user_id") % 100 + 10).alias("wy2"),
    )
    cells = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_partkey") < 100)
        .select(
            "p_partkey",
            ((F.col("p_partkey") % 10) * 100).alias("cx1"),
            ((F.col("p_partkey") % 10) * 100 + 100).alias("cx2"),
            ((F.col("p_partkey") / 10).cast("long") * 10).alias("cy1"),
            ((F.col("p_partkey") / 10).cast("long") * 10 + 10).alias("cy2"),
        )
    )
    j = ev.join(F.broadcast(cells))
    xl = F.greatest("wx1", "cx1")
    xr = F.least("wx2", "cx2")
    yt = F.greatest("wy1", "cy1")
    yb = F.least("wy2", "cy2")
    int_area = (xr - xl) * (yb - yt)
    w_area = (F.col("wx2") - F.col("wx1")) * (F.col("wy2") - F.col("wy1"))
    contained = (xr > xl) & (yb > yt) & (2 * int_area > w_area)
    return (
        j.filter(contained)
        .groupBy("p_partkey")
        .agg(
            F.count("*").alias("n_words"),
            F.sum("event_id").alias("sum_ids"),
        )
    )


Q03_SQL = """
WITH w AS (
  SELECT event_id, event_id % 1000 AS wx1,
         event_id % 1000 + 1 + user_id % 40 AS wx2,
         user_id % 100 AS wy1, user_id % 100 + 10 AS wy2
  FROM events
),
c AS (
  SELECT p_partkey, (p_partkey % 10) * 100 AS cx1, (p_partkey % 10) * 100 + 100 AS cx2,
         (p_partkey // 10) * 10 AS cy1, (p_partkey // 10) * 10 + 10 AS cy2
  FROM part WHERE p_partkey < 100
)
SELECT p_partkey, COUNT(*) AS n_words, CAST(SUM(event_id) AS BIGINT) AS sum_ids
FROM w, c
WHERE least(wx2, cx2) > greatest(wx1, cx1)
  AND least(wy2, cy2) > greatest(wy1, cy1)
  AND 2 * (least(wx2, cx2) - greatest(wx1, cx1)) * (least(wy2, cy2) - greatest(wy1, cy1))
      > (wx2 - wx1) * (wy2 - wy1)
GROUP BY p_partkey
"""


# --------------------------------------------------------------------------
# q04 — T3/T4 ordered line assembly: ordered string aggregation per group
# (reference: ocr/data.py:133-145 — ordering is part of the contract)
# --------------------------------------------------------------------------

def q04_line_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    item = F.struct(
        F.col("l_linenumber").alias("n"),
        F.concat("l_returnflag", "l_linestatus").alias("v"),
    )
    return (
        li.groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_list(item)).alias("xs"))
        .select(
            "l_orderkey",
            F.array_join(F.transform("xs", lambda x: x["v"]), " ").alias("line_text"),
        )
    )


Q04_SQL = """
SELECT l_orderkey,
       string_agg(l_returnflag || l_linestatus, ' '
                  ORDER BY l_linenumber, l_returnflag || l_linestatus) AS line_text
FROM lineitem GROUP BY l_orderkey
"""


# --------------------------------------------------------------------------
# q05 — B9 window-prune analog: distinct-count over a window then prune
# (reference: bordered_tables/tables/table_creation.py:63-64)
# --------------------------------------------------------------------------

def q05_window_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    return (
        ev.withColumn("n_types", F.size(F.collect_set("event_type").over(w)).cast("long"))
        .filter(F.col("n_types") >= 4)
        .select("user_id", "n_types")
        .distinct()
    )


Q05_SQL = """
SELECT DISTINCT user_id, n_types FROM (
  SELECT user_id, COUNT(DISTINCT event_type) OVER (PARTITION BY user_id) AS n_types
  FROM events
) WHERE n_types >= 4
"""


# --------------------------------------------------------------------------
# q06 — P4 mode-of-odd-bins analog: group → count → top-1 per key with
# deterministic tie-break (reference: tables/metrics.py:388-392)
# --------------------------------------------------------------------------

def q06_mode_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    binned = li.select(
        "l_returnflag",
        (2 * F.floor(F.col("l_quantity") / 2) + 1).cast("long").alias("bin"),
    )
    counts = binned.groupBy("l_returnflag", "bin").agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("l_returnflag").orderBy(F.desc("cnt"), F.asc("bin"))
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("l_returnflag", F.col("bin").alias("mode_bin"), "cnt")
    )


Q06_SQL = """
WITH b AS (
  SELECT l_returnflag, CAST(2 * floor(l_quantity / 2) + 1 AS BIGINT) AS bin
  FROM lineitem
),
c AS (SELECT l_returnflag, bin, COUNT(*) AS cnt FROM b GROUP BY l_returnflag, bin)
SELECT l_returnflag, bin AS mode_bin, cnt FROM (
  SELECT *, row_number() OVER (PARTITION BY l_returnflag ORDER BY cnt DESC, bin ASC) AS rk
  FROM c
) WHERE rk = 1
"""


# --------------------------------------------------------------------------
# q07 — exact dedup: hash-groupBy, keep min id (training-data op)
# --------------------------------------------------------------------------

def q07_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.groupBy(F.md5("text").alias("text_hash"))
        .agg(F.min("doc_id").alias("keeper"), F.count("*").alias("n_copies"))
    )


Q07_SQL = """
SELECT md5(text) AS text_hash, MIN(doc_id) AS keeper, COUNT(*) AS n_copies
FROM documents GROUP BY md5(text)
"""


# --------------------------------------------------------------------------
# q08 — MinHash + LSH near-dup candidates, verified by exact 3-shingle
# Jaccard ≥ 0.5 (integer test 3*|∩| ≥ |A|+|B|). Shuffles only on band
# signature and shingle — the classic scale-out LSH shape.
# --------------------------------------------------------------------------

_N_HASHES = 8
_BAND_ROWS = 2

# MinHash family: ONE md5 per shingle (60-bit base from the first 15 hex
# chars), then 8 affine permutations h_k = (A_k*base + B_k) mod P with
# P = 2^61 - 1. Cuts signature hashing 8x vs md5-per-(k, shingle) AND kills
# the x8 explode-through-shuffle: minhashes are 8 parallel MIN aggregates in
# ONE groupBy(doc_id). Arithmetic is exact in Spark decimal(38,0) and DuckDB
# HUGEINT, so both engines derive identical signatures (probed: base and
# affine values equal across Spark/DuckDB/Python).
_MH_P = (1 << 61) - 1
_MH_AB = [
    (981274561237, 77712345), (662617128911, 31990151),
    (154110941923, 95123837), (839923177811, 12777721),
    (423400177283, 66600217), (598472911493, 48121403),
    (777001266899, 90909091), (318199955057, 21092393),
]
_MH_BASE_SPARK = "cast(conv(substring(md5(s), 1, 15), 16, 10) as decimal(20,0))"
# Long-only variant of the affine family (r6 optimization): BigDecimal
# multiply/pmod was ~3x the cost of the whole minhash aggregation, and the
# md5+conv base was re-derived per hash. The identity used, with
# P = 2^61 - 1 (so 2^61 ≡ 1 (mod P)) and every intermediate provably
# < 2^63 under Spark 4's ANSI overflow checks:
#   base = bh·2^30 + bl  (base < 2^60),  A = ah·2^20 + al  (A < 2^40)
#   A·base = ah·bh·2^50 + ah·bl·2^20 + al·bh·2^30 + al·bl   (products < 2^50)
#   x·2^k mod P folds as (x >> (61-k)) + ((x & (2^(61-k)-1)) << k) < 2^61+2^50
# Sum of the folded terms + B < 2^62.8, one pmod finishes. Equality with the
# decimal path (and so with the DuckDB HUGEINT oracles) is pinned by
# tests/test_minhash_long.py over the corpus and adversarial 60-bit bases.
_MH_BASE_LONG = "cast(conv(substring(md5(s), 1, 15), 16, 10) as bigint)"


def _mh_affine_long(a: int, b: int, base_col: str = "mhb") -> str:
    ah, al = a >> 20, a & ((1 << 20) - 1)
    bh = f"shiftright({base_col}, 30)"
    bl = f"({base_col} & 1073741823)"
    t_hh = f"({ah}L * {bh})"   # < 2^50, scaled by 2^50
    t_hl = f"({ah}L * {bl})"   # < 2^50, scaled by 2^20
    t_lh = f"({al}L * {bh})"   # < 2^50, scaled by 2^30
    t_ll = f"({al}L * {bl})"   # < 2^40, scaled by 1
    return (
        f"pmod((shiftright({t_hh}, 11) + shiftleft({t_hh} & 2047, 50))"
        f" + (shiftright({t_hl}, 41) + shiftleft({t_hl} & 2199023255551, 20))"
        f" + (shiftright({t_lh}, 31) + shiftleft({t_lh} & 2147483647, 30))"
        f" + {t_ll} + {b}L, {_MH_P}L)"
    )
_MH_SQL_MINS = ",\n         ".join(
    f"MIN(CAST((CAST({a} AS HUGEINT) * base + {b}) % {_MH_P} AS BIGINT)) AS m{k}"
    for k, (a, b) in enumerate(_MH_AB)
)
_MH_SQL_BANDS = "\n  UNION ALL ".join(
    f"SELECT doc_id, {bb} AS band, CAST(m{2 * bb} AS VARCHAR) || ',' || "
    f"CAST(m{2 * bb + 1} AS VARCHAR) AS sig FROM mh"
    for bb in range(_N_HASHES // _BAND_ROWS)
)
# mh/bands are MATERIALIZED: DuckDB 1.x inlines CTEs by default and the
# capped pair CTE references bands three times (all-pairs arm, stats,
# star arm) — inlined, the whole shingle+minhash chain re-runs per
# reference, which at the sf1 stress scale spilled temp storage until the
# disk filled (q32, round 5). Same lesson as q73/q74's MATERIALIZED CTEs.
_MH_SQL_CTES = f"""mh AS MATERIALIZED (
  SELECT doc_id,
         {_MH_SQL_MINS}
  FROM (SELECT doc_id,
               CAST(CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT) AS HUGEINT) AS base
        FROM sh) q
  GROUP BY doc_id
),
bands AS MATERIALIZED (
  {_MH_SQL_BANDS}
)"""


def _minhash_bands(sh: DataFrame) -> DataFrame:
    """(doc_id, band, sig) LSH band keys via the affine family above —
    md5 base derived ONCE per shingle, then 8 long-only mulmods (see
    _mh_affine_long; bit-equal to the decimal path by the pinned test)."""
    hs = [
        F.expr(_mh_affine_long(a, b)).alias(f"h{k}")
        for k, (a, b) in enumerate(_MH_AB)
    ]
    mins = (
        sh.select("doc_id", F.expr(_MH_BASE_LONG).alias("mhb"))
        .select("doc_id", *hs)
        .groupBy("doc_id")
        .agg(*[F.min(f"h{k}").alias(f"m{k}") for k in range(_N_HASHES)])
    )
    return mins.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bb).cast("long").alias("band"),
                        F.concat_ws(",", f"m{2 * bb}", f"m{2 * bb + 1}").alias("sig"),
                    )
                    for bb in range(_N_HASHES // _BAND_ROWS)
                ]
            )
        ).alias("bs"),
    ).select("doc_id", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig"))


def _shingles(
    spark: SparkSession, sf_dir: str, *, cluster_by_s: bool = False, width: int = 3
) -> DataFrame:
    """Distinct (doc_id, n-gram) shingle table; ``width`` tokens per
    shingle (space-joined). The size filter keeps the ANSI sequence()
    guard: sequence(0, negative) counts DOWN."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.split("text", " ").alias("t")).filter(
        F.size("t") >= width
    )
    # Every shingle of a doc originates from that doc's single source row,
    # so the global DISTINCT over (doc_id, s) is exactly a per-row
    # array_distinct BEFORE the explode — dedup happens map-side with zero
    # aggregation, and the one exchange below is free to carry the
    # partitioning the consumers actually need: hashpartitioning(doc_id)
    # serves the band min-agg, q08's sizes agg and semi-join probe;
    # hashpartitioning(s) serves q17's DF-cap window + self-join. The old
    # distinct's hashpartitioning(doc_id, s) satisfied neither, so every
    # consumer paid a fresh exchange over the widest table in the family.
    exploded = toks.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.expr(
                    f"transform(sequence(0, size(t) - {width}),"
                    f" i -> array_join(slice(t, i + 1, {width}), ' '))"
                )
            )
        ).alias("s"),
    )
    return exploded.repartition("s" if cluster_by_s else "doc_id")


_BANDS_MEMO: dict = {}


def _memo_put(memo: dict, key: tuple, value, spark: SparkSession) -> None:
    """Insert into an (applicationId, ...)-keyed DataFrame memo, first
    evicting (and unpersisting, where the owning session still answers)
    entries from OTHER SparkSessions — a long-lived driver that cycles
    sessions must not accumulate dead persisted-DataFrame references
    (ADVICE r4)."""
    app_id = spark.sparkContext.applicationId
    for stale in [k for k in memo if k[0] != app_id]:
        old = memo.pop(stale)
        # a memo value is either one DataFrame or a structure of them
        # (the BPE chain stores [(vocab, top), ...])
        dfs = [old] if hasattr(old, "unpersist") else [
            d for step in old for d in step if hasattr(d, "unpersist")
        ]
        for d in dfs:
            try:
                d.unpersist()
            except Exception:
                pass  # owning session already gone — nothing to release
    memo[key] = value


_SHINGLES_MEMO: dict = {}


def _shingles_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted + memoized DEFAULT-width (3-gram) distinct shingle table —
    the base artifact underneath the band index. Built once per (session,
    sf_dir); consumers: the band-index build and q08's verification probe
    arms. Width/clustering variants (q17's cluster_by_s, q26's 13-gram)
    stay un-memoized — they are single-consumer."""
    key = (spark.sparkContext.applicationId, sf_dir)
    hit = _SHINGLES_MEMO.get(key)
    if hit is not None:
        return hit
    out = _shingles(spark, sf_dir).persist(StorageLevel.MEMORY_AND_DISK)
    _memo_put(_SHINGLES_MEMO, key, out, spark)
    return out


def _bands_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted + memoized (doc_id, band, sig) MinHash-LSH band index —
    the materialized dedup index, same discipline as the IVF assignment
    table: built ONCE per (session, sf_dir) and read by every consumer
    (q08 pair generation and _lp_labels through it, q58's incremental
    probe, q66's split-leakage audit). Without the memo each consumer
    re-runs the shingle explode + 16-hash min-agg chain — the most
    expensive part of the whole dedup stack. At cluster scale this table
    is written once per corpus build and joined many times."""
    key = (spark.sparkContext.applicationId, sf_dir)
    hit = _BANDS_MEMO.get(key)
    if hit is not None:
        return hit
    out = _minhash_bands(_shingles_table(spark, sf_dir)).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    _memo_put(_BANDS_MEMO, key, out, spark)
    return out


# Oversized-band-bucket guard (VERDICT r5 skew directive — the MinHash
# analog of the IVF two-level split). A band bucket with B members emits
# B·(B-1)/2 candidate pairs under the plain self-join: one hot key covering
# 10⁴+ near-identical docs (a power-law duplication tail at 10^12-turn
# scale) would fan a single join key out to 10⁸ rows. Buckets larger than
# _BAND_CAP instead emit a HUB STAR — every member pairs with the bucket's
# min doc_id — so per-key fan-out is B-1, linear. Connectivity for the
# union-find consumers (q16/q23/q32) is preserved: all members stay
# reachable through the hub, and oversized buckets are overwhelmingly
# exact-duplicate groups, so the hub star verifies at the same Jaccard as
# any other spanning set of the clique. Provable no-op at gate scale (max
# observed bucket: 3 at sf0.01, 15 at sf0.1) and replayed exactly by every
# consumer's DuckDB oracle; bounded-fan-out pinned by the synthetic-skew
# pytest (tests/test_band_skew.py).
_BAND_CAP = 64


def _band_pairs(bands: DataFrame) -> DataFrame:
    """Candidate (doc_a < doc_b) pairs from an LSH band index with the
    oversized-bucket hub-star guard (see _BAND_CAP). Each bucket's members
    arrive as ONE collect_list aggregation and the pairs are expanded
    in-codegen: capped buckets emit every a < b combination (identical to
    the old windowed self-join — ≤ cap²/2 structs per bucket), oversized
    buckets emit the hub star (every member above the bucket's min
    doc_id). One exchange for the agg, one for the final distinct — the
    old shape paid the window sort plus a (band, sig) self-join on top.
    Pair sets are order-independent, so collect_list's nondeterministic
    ordering cannot change the result."""
    g = bands.groupBy("band", "sig").agg(F.collect_list("doc_id").alias("ds"))
    pairs = g.select(
        F.explode(
            F.when(
                F.size("ds") <= _BAND_CAP,
                F.expr(
                    "flatten(transform(ds, x ->"
                    " transform(filter(ds, y -> y > x),"
                    " y -> named_struct('doc_a', x, 'doc_b', y))))"
                ),
            ).otherwise(
                F.expr(
                    "transform(filter(ds, y -> y > array_min(ds)),"
                    " y -> named_struct('doc_a', array_min(ds), 'doc_b', y))"
                )
            )
        ).alias("p")
    ).select("p.doc_a", "p.doc_b")
    return pairs.distinct()


def _pairs_sql_cte(
    name: str = "cand", bands: str = "bands", materialized: bool = False
) -> str:
    """DuckDB CTE pair replaying _band_pairs bit-exactly (stats + capped
    all-pairs UNION hub star). UNION dedups, matching the .distinct().
    ``materialized`` pins DuckDB's CTE inlining off for the deep q73/q74
    chains (DuckDB 1.0 inlines by default and re-plans the whole chain per
    scalar subquery — the round-3 lesson)."""
    mat = "MATERIALIZED " if materialized else ""
    return f"""bstats_{name} AS {mat}(
  SELECT band, sig, COUNT(*) AS bsz, MIN(doc_id) AS hub
  FROM {bands} GROUP BY band, sig),
small_{name} AS {mat}(
  SELECT b.doc_id, b.band, b.sig FROM {bands} b
  JOIN bstats_{name} s ON s.band = b.band AND s.sig = b.sig
  WHERE s.bsz <= {_BAND_CAP}),
{name} AS {mat}(
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM small_{name} a JOIN small_{name} b
    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
  UNION
  SELECT s.hub AS doc_a, b.doc_id AS doc_b
  FROM {bands} b JOIN bstats_{name} s ON s.band = b.band AND s.sig = b.sig
  WHERE s.bsz > {_BAND_CAP} AND b.doc_id > s.hub)"""


_CAND_PAIRS_MEMO: dict = {}


def _cand_pairs_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted + memoized candidate-pair table from the corpus band
    index — the third materialized dedup artifact (bands → candidate
    pairs → LP labels), consumed by q08, q66's leakage audit and q73's
    precision audit. Materializing it once also keeps the physical plan
    of every consumer bounded: _band_pairs references the band table
    from four arms, and unpersisted that quadruples each consumer's plan
    tree. At cluster scale this is written once per corpus build."""
    key = (spark.sparkContext.applicationId, sf_dir)
    hit = _CAND_PAIRS_MEMO.get(key)
    if hit is not None:
        return hit
    out = _band_pairs(_bands_table(spark, sf_dir)).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    _memo_put(_CAND_PAIRS_MEMO, key, out, spark)
    return out


def q08_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = _shingles_table(spark, sf_dir)
    pairs = _cand_pairs_table(spark, sf_dir)
    # Semi-join prefilter (VERDICT r4 #5): only shingles of docs that
    # actually hit a band bucket enter the verification joins. At 100 TB
    # the candidate set is a vanishing fraction of the corpus, so the two
    # probe joins below scan band-hit shingles only instead of the full
    # shingle table twice. A doc's shingle set survives intact (the semi
    # filters whole doc_ids, not shingle rows), so intersection counts and
    # sizes are unchanged for every doc that can appear in the output.
    cand_ids = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .union(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    # persist: three consumers (sizes, both intersection-probe arms) would
    # otherwise each re-run the tokenize + explode + semi-join chain
    sh_c = sh.join(cand_ids, "doc_id", "left_semi").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    sizes = sh_c.groupBy("doc_id").agg(F.count("*").alias("n"))
    inter = (
        pairs.join(sh_c.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
        .join(sh_c.alias("sb"), (F.col("doc_b") == F.col("sb.doc_id")) & (F.col("sa.s") == F.col("sb.s")))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.alias("na"), F.col("doc_a") == F.col("na.doc_id"))
        .join(sizes.alias("nb"), F.col("doc_b") == F.col("nb.doc_id"))
        .filter(3 * F.col("inter") >= F.col("na.n") + F.col("nb.n"))
        .select("doc_a", "doc_b", "inter")
    )


Q08_SQL = f"""
WITH toks AS (
  SELECT doc_id, str_split(text, ' ') AS t FROM documents WHERE len(str_split(text, ' ')) >= 3
),
sh AS (
  SELECT DISTINCT doc_id, t[i + 1] || ' ' || t[i + 2] || ' ' || t[i + 3] AS s
  FROM toks, LATERAL (SELECT unnest(generate_series(0, len(t) - 3)) AS i) g
),
{_MH_SQL_CTES},
{_pairs_sql_cte("pairs")},
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT p.doc_a, p.doc_b, COUNT(*) AS inter
  FROM pairs p
  JOIN sh sa ON sa.doc_id = p.doc_a
  JOIN sh sb ON sb.doc_id = p.doc_b AND sb.s = sa.s
  GROUP BY p.doc_a, p.doc_b
)
SELECT i.doc_a, i.doc_b, i.inter
FROM inter i JOIN sizes na ON na.doc_id = i.doc_a JOIN sizes nb ON nb.doc_id = i.doc_b
WHERE 3 * i.inter >= na.n + nb.n
"""


# --------------------------------------------------------------------------
# q09 — SimHash (16-bit) document fingerprint (training-data op)
# --------------------------------------------------------------------------

def q09_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    tk = docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    h = tk.select(
        "doc_id", F.conv(F.substring(F.md5("tok"), 1, 4), 16, 10).cast("long").alias("hv")
    )
    bits = (
        h.select("doc_id", "hv", F.explode(F.sequence(F.lit(0), F.lit(15))).alias("b"))
        .groupBy("doc_id", "b")
        .agg(
            F.sum(
                F.expr("IF((shiftright(hv, b) & 1) = 1, 1, -1)")
            ).alias("s")
        )
    )
    return bits.groupBy("doc_id").agg(
        F.sum(F.expr("IF(s > 0, shiftleft(1L, b), 0L)")).cast("long").alias("simhash")
    )


Q09_SQL = """
WITH tk AS (SELECT doc_id, unnest(str_split(text, ' ')) AS tok FROM documents),
h AS (SELECT doc_id, ('0x' || substring(md5(tok), 1, 4))::BIGINT AS hv FROM tk),
bits AS (
  SELECT doc_id, b, SUM(CASE WHEN (hv >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s
  FROM h, (SELECT unnest(generate_series(0, 15)) AS b) bs
  GROUP BY doc_id, b
)
SELECT doc_id, CAST(SUM(CASE WHEN s > 0 THEN 1 << b ELSE 0 END) AS BIGINT) AS simhash
FROM bits GROUP BY doc_id
"""


# --------------------------------------------------------------------------
# q10 — text analysis: token counts, stopword-based language guess, quality
# metrics (all integer arithmetic; training-data op)
# --------------------------------------------------------------------------

_STOP_EN = ["the", "a", "of", "and", "to", "in", "is"]


def q10_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    stop = ",".join(f"'{s}'" for s in _STOP_EN)
    t = docs.select("doc_id", F.split("text", " ").alias("t"))
    return t.select(
        "doc_id",
        F.size("t").cast("long").alias("n_tokens"),
        F.expr(f"size(filter(t, x -> x IN ({stop})))").cast("long").alias("n_stop"),
        F.size(F.array_distinct("t")).cast("long").alias("n_distinct"),
        F.expr("aggregate(t, 0L, (acc, x) -> acc + length(x))").alias("n_chars_tok"),
    ).select(
        "doc_id",
        "n_tokens",
        "n_stop",
        F.when(F.col("n_stop") * 10 >= F.col("n_tokens"), F.lit("en"))
        .otherwise(F.lit("unknown"))
        .alias("lang_guess"),
        ((100 * F.col("n_distinct")) / F.col("n_tokens")).cast("long").alias("ttr_pct"),
        ((100 * F.col("n_chars_tok")) / F.col("n_tokens")).cast("long").alias("avg_len_c"),
    )


Q10_SQL = f"""
WITH t AS (SELECT doc_id, str_split(text, ' ') AS t FROM documents),
m AS (
  SELECT doc_id, len(t) AS n_tokens,
         len(list_filter(t, x -> list_contains([{", ".join(repr(s) for s in _STOP_EN)}], x))) AS n_stop,
         len(list_distinct(t)) AS n_distinct,
         list_sum(list_transform(t, x -> length(x))) AS n_chars_tok
  FROM t
)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, CAST(n_stop AS BIGINT) AS n_stop,
       CASE WHEN n_stop * 10 >= n_tokens THEN 'en' ELSE 'unknown' END AS lang_guess,
       CAST((100 * n_distinct) // n_tokens AS BIGINT) AS ttr_pct,
       CAST((100 * n_chars_tok) // n_tokens AS BIGINT) AS avg_len_c
FROM m
"""


# --------------------------------------------------------------------------
# q11 — winnowing fingerprints: rolling min-hash over shingle windows
# (document fingerprinting; window function over positions)
# --------------------------------------------------------------------------

_WINNOW_W = 4


def q11_winnow_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.split("text", " ").alias("t")).filter(F.size("t") >= 3)
    sh = toks.select(
        "doc_id",
        F.posexplode(
            F.expr("transform(sequence(0, size(t) - 3), i -> concat(t[i], ' ', t[i+1], ' ', t[i+2]))")
        ).alias("i", "s"),
    ).select("doc_id", "i", F.md5("s").alias("h"))
    w = (
        Window.partitionBy("doc_id")
        .orderBy("i")
        .rowsBetween(Window.currentRow, _WINNOW_W - 1)
    )
    fp = sh.select("doc_id", F.min("h").over(w).alias("fp"))
    return fp.groupBy("doc_id").agg(F.count_distinct("fp").alias("n_fp"))


Q11_SQL = f"""
WITH toks AS (
  SELECT doc_id, str_split(text, ' ') AS t FROM documents WHERE len(str_split(text, ' ')) >= 3
),
sh AS (
  SELECT doc_id, i, md5(t[i + 1] || ' ' || t[i + 2] || ' ' || t[i + 3]) AS h
  FROM toks, LATERAL (SELECT unnest(generate_series(0, len(t) - 3)) AS i) g
),
fp AS (
  SELECT doc_id,
         MIN(h) OVER (PARTITION BY doc_id ORDER BY i
                      ROWS BETWEEN CURRENT ROW AND {_WINNOW_W - 1} FOLLOWING) AS fp
  FROM sh
)
SELECT doc_id, COUNT(DISTINCT fp) AS n_fp FROM fp GROUP BY doc_id
"""


# --------------------------------------------------------------------------
# q12 — ANN: brute-force cosine top-3 neighbors for a query subset.
# Broadcast the tiny query side; JVM-side zip_with dot products.
# --------------------------------------------------------------------------

_TOPK = 3


def q12_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.expr("transform(embedding, x -> cast(x AS DOUBLE))").alias("v")
    )
    norm = F.sqrt(F.expr("aggregate(v, 0D, (acc, x) -> acc + x * x)"))
    emb = emb.withColumn("nrm", norm)
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    j = emb.crossJoin(F.broadcast(q)).filter(F.col("vec_id") != F.col("query_id"))
    dot = F.expr("aggregate(zip_with(v, qv, (x, y) -> x * y), 0D, (acc, x) -> acc + x)")
    scored = j.select(
        "query_id", "vec_id", (dot / (F.col("nrm") * F.col("qn"))).alias("cos")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _TOPK)
        .select("query_id", F.col("rank").cast("long").alias("rank"), F.col("vec_id").alias("neighbor_id"))
    )


Q12_SQL = f"""
WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
scored AS (
  SELECT q.query_id, e.vec_id,
         list_cosine_similarity(e.v, q.qv) AS cos
  FROM e, q WHERE e.vec_id <> q.query_id
)
SELECT query_id, CAST(rank AS BIGINT) AS rank, vec_id AS neighbor_id FROM (
  SELECT query_id, vec_id,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id ASC) AS rank
  FROM scored
) WHERE rank <= {_TOPK}
"""


# --------------------------------------------------------------------------
# q15 — IVF-bucketed ANN: the scale path for q12. Vectors are assigned to
# the nearest of k kmeans-trained centroids (coarse quantization); queries
# search only their own bucket. At 100 TB this turns an O(N·Q) brute force
# into a shuffle-on-bucket + per-bucket local search. k = clamp(ceil(N/64),
# 8, 512) actually grows with the corpus, so per-bucket work stays bounded.
#
# The trainer is deterministic FIXED-POINT Lloyd's so the DuckDB oracle can
# replay it bit-exactly: embeddings are quantized to integers
# (floor(x*1e6 + 0.5)), distances are exact integer squared-L2, centroid
# updates are floor(sum/count) with the sum exact in int64 (< 2^53, so the
# double division is also exact-deterministic). Training runs on a
# hash-chosen sample of max(4096, 64·k) points collected to the driver
# (bounded — the same driver-small contract as a broadcast dim); assignment
# of the full table is a vectorized Arrow-UDF argmin against the BROADCAST
# codebook: no crossJoin row explosion, no window shuffle, and the plan
# stays O(1) in k (embedding the k×d matrix as literals bloats every
# Catalyst tree and re-analyzes it per query).
#
# TWO-LEVEL SPLIT (the r3-verdict scale fix): k caps at 512, so past
# n ≈ 32k·64 the coarse buckets grow as n/512 and any within-bucket
# all-pairs (q18) turns quadratic again. After coarse assignment, buckets
# larger than 4× the target size are re-split by a SECOND per-bucket
# codebook — trained by the same fixed-point Lloyd's on a per-bucket
# hash-chosen sample (distributed: applyInPandas per oversized bucket over
# only the SAMPLE rows, so no task ever materializes a whole bucket), then
# re-assigned by a broadcast-codebook Arrow UDF (zero extra shuffle: the
# sub-assignment is a map over the existing partitioning). The split round
# repeats up to _IVF_MAX_LEVELS-1 times, so max bucket size stays bounded
# past the k-cap (pinned by tests/test_ivf.py). Split ids are
# (bucket+1)·2^20 + sub + 1 — disjoint from unsplit coarse ids (< 2^20).
# The DuckDB oracle replays every level bit-exactly (per-bucket Lloyd's as
# window-partitioned CTEs); at the driver's gate scale no bucket exceeds
# the threshold, so the split CTEs are provably no-ops there and the split
# path is exercised by the synthetic-skew parity test instead.
# --------------------------------------------------------------------------

_IVF_KMIN = 8
_IVF_KMAX = 512
_IVF_TARGET_BUCKET = 64
_IVF_SAMPLE = 4096  # level-1 sample floor (oracle back-compat)
_IVF_SAMPLE_PER_K = 64  # sample scales with k: ≥ 64 points per centroid
_IVF_ITERS = 3
_IVF_SPLIT_THRESHOLD = 4 * _IVF_TARGET_BUCKET  # split buckets > 256 rows
_IVF_SUB_KMIN = 2
_IVF_SUB_SHIFT = 1 << 20  # split id = (bucket+1)·2^20 + sub + 1
_IVF_MAX_LEVELS = 3  # 1 coarse level + up to 2 split rounds

_QUANT_EXPR = "transform(embedding, x -> cast(floor(cast(x AS DOUBLE) * 1000000D + 0.5D) AS bigint))"

_IVF_MEMO: dict = {}


def _quantized_emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.expr("transform(embedding, x -> cast(x AS DOUBLE))").alias("v"),
        F.expr(_QUANT_EXPR).alias("qv"),
    )


def ivf_k_for(n: int) -> int:
    """Centroid count for a corpus of n vectors: ceil(n / target_bucket),
    clamped to [8, 512]."""
    return max(_IVF_KMIN, min(-(-n // _IVF_TARGET_BUCKET), _IVF_KMAX))


def _ivf_sub_k(n: int) -> int:
    """Level-2 centroid count for an oversized bucket of n rows."""
    return max(_IVF_SUB_KMIN, min(-(-n // _IVF_TARGET_BUCKET), _IVF_KMAX))


def _sq_dists(pts, cents):
    """Exact integer pairwise squared-L2 (m,d)×(k,d) → (m,k).

    Fast path: the matmul identity |a-b|² = |a|² + |b|² - 2a·b in float64 —
    BLAS-speed, and EXACT while every intermediate stays below 2^53: with
    |x| ≤ Q the largest term is 4·d·Q², so Q < 4e6 (d=64) keeps all values
    integer-representable. Quantized embeddings are ±~6e5 here (10× margin);
    anything larger falls back to the O(m·k·d) int64 broadcast form, which
    is exact unconditionally."""
    import numpy as np

    hi = max(
        int(np.abs(pts).max(initial=0)), int(np.abs(cents).max(initial=0))
    )
    if hi < 4_000_000:
        P = pts.astype(np.float64)
        C = cents.astype(np.float64)
        return (
            (P * P).sum(axis=1)[:, None]
            + (C * C).sum(axis=1)[None, :]
            - 2.0 * (P @ C.T)
        )
    diff = pts[:, None, :].astype(np.int64) - cents[None, :, :]
    return (diff * diff).sum(axis=2)


def _lloyd_fixed_point(pts, k: int):
    """Deterministic fixed-point Lloyd's shared by the level-1 trainer, the
    per-bucket level-2 trainer, and the split tests: seeds = first k rows,
    _IVF_ITERS rounds of exact-integer argmin (ties → lowest cid) +
    floor(sum/count) centroid update (empty cluster keeps its centroid).
    Bit-identical to the DuckDB CTE replay."""
    import numpy as np

    cents = pts[:k].copy()
    for _ in range(_IVF_ITERS):
        assign = _sq_dists(pts, cents).argmin(axis=1)
        for c in range(k):
            m = assign == c
            if m.any():
                s = pts[m].sum(axis=0, dtype=np.int64)
                cents[c] = np.floor(
                    s.astype(np.float64) / m.sum()
                ).astype(np.int64)
    return cents


def train_ivf_centroids(spark: SparkSession, sf_dir: str) -> list:
    """Deterministic fixed-point Lloyd's kmeans over a hash-chosen sample.

    Sample = the max(_IVF_SAMPLE, 64·k) rows with smallest
    (md5(vec_id), vec_id) — a deterministic, engine-portable pseudo-random
    draw whose size scales with k so the cap-region codebook keeps ≥ 64
    points per centroid (r3 verdict #2). Seeds = the first k sample rows in
    that order; iteration = _lloyd_fixed_point. All arithmetic is exact
    (int64 sums < 2^53), so numpy here and DuckDB's unrolled CTE replay in
    Q15/Q18's oracles produce identical centroids and buckets.
    """
    if sf_dir in _IVF_MEMO:
        return _IVF_MEMO[sf_dir]
    import numpy as np

    emb = _quantized_emb(spark, sf_dir)
    n = emb.count()
    k = ivf_k_for(n)
    rows = (
        emb.select("vec_id", "qv", F.md5(F.col("vec_id").cast("string")).alias("h"))
        .orderBy("h", "vec_id")
        .limit(max(_IVF_SAMPLE, _IVF_SAMPLE_PER_K * k))
        .collect()
    )
    pts = np.array([r["qv"] for r in rows], dtype=np.int64)
    cents = _lloyd_fixed_point(pts, k)
    out = [[int(x) for x in c] for c in cents]
    _IVF_MEMO[sf_dir] = out
    return out


_IVF_SPLIT_MEMO: dict = {}
# (applicationId, sf_dir) → persisted assigned-DataFrame (the materialized
# IVF index); keyed by session so a stopped SparkSession never leaks a dead
# cached plan into a new one.
_IVF_ASSIGN_MEMO: dict = {}


def _sub_bucket_udf(bcb):
    """Arrow UDF re-assigning rows of split buckets against their broadcast
    sub-codebooks. A separate factory so each split round's UDF closes over
    ITS OWN broadcast (a loop-local closure would rebind to the last round's
    codebooks when Spark serializes the plan lazily)."""
    import numpy as np

    @F.pandas_udf("long")
    def sub_bucket(bucket: pd.Series, qv: pd.Series) -> pd.Series:
        out = bucket.to_numpy(dtype=np.int64).copy()
        books = bcb.value
        for b in np.unique(out):
            book = books.get(int(b))
            if book is None:
                continue
            m = out == b
            pts = np.array(qv[m].tolist(), dtype=np.int64)
            sub = _sq_dists(pts, book).argmin(axis=1).astype(np.int64)
            out[m] = (b + 1) * _IVF_SUB_SHIFT + sub + 1
        return pd.Series(out)

    return sub_bucket


def _ivf_split_oversized(
    spark: SparkSession, sf_dir: str, df: DataFrame
) -> DataFrame:
    """Re-split coarse buckets larger than _IVF_SPLIT_THRESHOLD with a
    second trained codebook (module-header comment has the full design).

    Per split round: (1) bucket sizes — one agg, output bounded by the
    bucket count; (2) deterministic per-bucket sample — ONE window shuffle
    over only the oversized buckets' rows (rank by (md5(vec_id), vec_id),
    keep rank ≤ 64·k₂); (3) per-bucket Lloyd's via applyInPandas over the
    SAMPLE (task input ≤ 64·512 rows — never a whole bucket); (4) collect
    the codebooks (≤ Σk₂ rows ≈ MBs) and re-assign via a broadcast-codebook
    Arrow UDF — a pure map, zero shuffle. Codebooks are memoized per sf_dir
    so q15+q18 share one training pass."""
    import numpy as np

    memo = _IVF_SPLIT_MEMO.get(sf_dir)
    levels: list = [] if memo is None else memo
    for lvl in range(_IVF_MAX_LEVELS - 1):
        if memo is not None:
            if lvl >= len(levels):
                break
            books = levels[lvl]
        else:
            sizes = (
                df.groupBy("bucket")
                .count()
                .filter(F.col("count") > _IVF_SPLIT_THRESHOLD)
                .collect()
            )
            over = {int(r["bucket"]): _ivf_sub_k(int(r["count"])) for r in sizes}
            if not over:
                break
            k2_df = spark.createDataFrame(
                sorted(over.items()), "bucket long, k2 int"
            )
            w = Window.partitionBy("bucket").orderBy(
                F.md5(F.col("vec_id").cast("string")), "vec_id"
            )
            samp = (
                df.join(F.broadcast(k2_df), "bucket")
                .withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") <= _IVF_SAMPLE_PER_K * F.col("k2"))
                .select("bucket", "rn", "qv", "k2")
            )

            def _train(pdf: "pd.DataFrame") -> "pd.DataFrame":
                pdf = pdf.sort_values("rn")
                pts = np.array(pdf["qv"].tolist(), dtype=np.int64)
                cents = _lloyd_fixed_point(pts, int(pdf["k2"].iloc[0]))
                return pd.DataFrame(
                    {
                        "bucket": int(pdf["bucket"].iloc[0]),
                        "cid": range(len(cents)),
                        "cv": [[int(x) for x in c] for c in cents],
                    }
                )

            rows = (
                samp.groupBy("bucket")
                .applyInPandas(_train, "bucket long, cid long, cv array<long>")
                .collect()
            )
            grouped: dict = {}
            for r in rows:
                grouped.setdefault(int(r["bucket"]), []).append(
                    (int(r["cid"]), r["cv"])
                )
            books = {
                b: np.array([cv for _, cv in sorted(v)], dtype=np.int64)
                for b, v in grouped.items()
            }
            levels.append(books)
        bcb = spark.sparkContext.broadcast(books)
        df = df.withColumn(
            "bucket", _sub_bucket_udf(bcb)(F.col("bucket"), F.col("qv"))
        )
    if memo is None:
        _IVF_SPLIT_MEMO[sf_dir] = levels
    return df


def _ivf_assigned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embeddings → (vec_id, v, vn, bucket) via nearest-trained-centroid
    coarse quantization (see train_ivf_centroids) plus the oversized-bucket
    split rounds (_ivf_split_oversized).

    Assignment is a vectorized Arrow UDF over the BROADCAST codebook — the
    standard IVF shape. The r2 variant embedded the k×d centroid matrix as
    plan literals, which bloats every Catalyst tree by k·d nodes (2048 at
    sf0.1; 10⁵+ at corpus scale where k keeps growing) and re-analyzes it
    per query; a broadcast closure keeps the plan O(1) regardless of k.
    Exactness: int64 squared distances, argmin ties → lowest cid (np.argmin
    returns the first minimum) — bit-identical to the trainer and to the
    DuckDB CTE replay in the q15/q18 oracles.

    The finished (vec_id, v, vn, bucket) table is persisted and memoized
    per (session, sf_dir) — the materialized-index shape of IVF. Every
    consumer (q15 probe join, q18's SELF-join, q45 SemDeDup) would
    otherwise re-run the scan + assignment UDF chain per plan arm; q18
    alone pays it twice. At cluster scale this table is written once per
    index build (it IS the index) and read many times."""
    import numpy as np

    memo_key = (spark.sparkContext.applicationId, sf_dir)
    hit = _IVF_ASSIGN_MEMO.get(memo_key)
    if hit is not None:
        return hit

    cents = train_ivf_centroids(spark, sf_dir)
    bc = spark.sparkContext.broadcast(np.array(cents, dtype=np.int64))

    @F.pandas_udf("long")
    def nearest_cid(qv: pd.Series) -> pd.Series:
        P = np.array(qv.tolist(), dtype=np.int64)  # (batch, d)
        d2 = _sq_dists(P, bc.value)
        return pd.Series(d2.argmin(axis=1).astype(np.int64))

    assigned = _quantized_emb(spark, sf_dir).withColumn(
        "bucket", nearest_cid(F.col("qv"))
    )
    out = (
        _ivf_split_oversized(spark, sf_dir, assigned)
        # pre-normalized vectors: downstream pairwise cosine becomes a plain
        # dot product — O(d) per pair instead of O(3d) (norms otherwise get
        # recomputed for every one of a vector's ~bucket-size partners)
        .withColumn(
            "vn",
            F.expr("transform(v, x -> x / sqrt(aggregate(v, 0D, (acc, y) -> acc + y * y)))"),
        )
        .select("vec_id", "v", "vn", "bucket")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    _memo_put(_IVF_ASSIGN_MEMO, memo_key, out, spark)
    return out


def _ivf_sql_ctes() -> str:
    """DuckDB CTE chain replaying train_ivf_centroids + full-table
    assignment + every oversized-bucket split round bit-exactly (integer
    arithmetic throughout — see trainer docstring; split rounds are the
    same Lloyd's partitioned per bucket). Yields CTEs: e(vec_id, v, qv),
    assigned(vec_id, v, bucket). All CTEs are MATERIALIZED: DuckDB 1.0
    inlines CTEs by default and this chain is deep enough (4 + 10 per
    split level, multiply-referenced) that inlining explodes planning
    exponentially."""
    sqdist = (
        "list_sum(list_transform(generate_series(1, len({a}.qv)), "
        "i -> ({a}.qv[i] - {c}.cv[i]) * ({a}.qv[i] - {c}.cv[i])))"
    )
    parts = [
        f"""e AS MATERIALIZED (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
         list_transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) AS qv
  FROM embeddings),
params AS MATERIALIZED (
  SELECT GREATEST({_IVF_KMIN}, LEAST(CAST(CEIL(COUNT(*) / {_IVF_TARGET_BUCKET}.0) AS BIGINT), {_IVF_KMAX})) AS k
  FROM e),
samp AS MATERIALIZED (
  SELECT vec_id, qv, rn FROM (
    SELECT vec_id, qv,
           row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
    FROM e), params WHERE rn <= GREATEST({_IVF_SAMPLE}, {_IVF_SAMPLE_PER_K} * k)),
cent0 AS MATERIALIZED (SELECT rn - 1 AS cid, qv AS cv FROM samp, params WHERE rn <= k)"""
    ]
    prev = "cent0"
    for t in range(1, _IVF_ITERS + 1):
        parts.append(
            f"""assign{t} AS MATERIALIZED (
  SELECT vec_id, qv, cid FROM (
    SELECT s.vec_id, s.qv, c.cid,
           row_number() OVER (PARTITION BY s.vec_id
                              ORDER BY {sqdist.format(a='s', c='c')} ASC, c.cid ASC) AS rk
    FROM samp s, {prev} c) WHERE rk = 1),
newc{t} AS MATERIALIZED (
  SELECT cid, list(CAST(FLOOR(CAST(sm AS DOUBLE) / cnt) AS BIGINT) ORDER BY dim) AS cv
  FROM (
    SELECT a.cid, d.i AS dim, SUM(a.qv[d.i]) AS sm, COUNT(*) AS cnt
    FROM assign{t} a, LATERAL (SELECT unnest(generate_series(1, len(a.qv))) AS i) d
    GROUP BY a.cid, d.i) GROUP BY cid),
cent{t} AS MATERIALIZED (
  SELECT p.cid, COALESCE(n.cv, p.cv) AS cv
  FROM {prev} p LEFT JOIN newc{t} n ON n.cid = p.cid)"""
        )
        prev = f"cent{t}"
    parts.append(
        f"""assigned_l1 AS MATERIALIZED (
  SELECT vec_id, v, qv, cid AS bucket FROM (
    SELECT e.vec_id, e.v, e.qv, c.cid,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {sqdist.format(a='e', c='c')} ASC, c.cid ASC) AS rk
    FROM e, {prev} c) WHERE rk = 1)"""
    )
    prev_assigned = "assigned_l1"
    for lv in range(2, _IVF_MAX_LEVELS + 1):
        p = prev_assigned
        parts.append(
            f"""ovr{lv} AS MATERIALIZED (
  SELECT bucket,
         GREATEST({_IVF_SUB_KMIN}, LEAST(CAST(CEIL(COUNT(*) / {_IVF_TARGET_BUCKET}.0) AS BIGINT), {_IVF_KMAX})) AS k2
  FROM {p} GROUP BY bucket HAVING COUNT(*) > {_IVF_SPLIT_THRESHOLD}),
samp{lv} AS MATERIALIZED (
  SELECT bucket, vec_id, qv, rn, k2 FROM (
    SELECT a.bucket, a.vec_id, a.qv, o.k2,
           row_number() OVER (PARTITION BY a.bucket
                              ORDER BY md5(CAST(a.vec_id AS VARCHAR)), a.vec_id) AS rn
    FROM {p} a JOIN ovr{lv} o ON o.bucket = a.bucket)
  WHERE rn <= {_IVF_SAMPLE_PER_K} * k2),
scent{lv}_0 AS MATERIALIZED (SELECT bucket, rn - 1 AS cid, qv AS cv FROM samp{lv} WHERE rn <= k2)"""
        )
        sprev = f"scent{lv}_0"
        for t in range(1, _IVF_ITERS + 1):
            parts.append(
                f"""sassign{lv}_{t} AS MATERIALIZED (
  SELECT bucket, vec_id, qv, cid FROM (
    SELECT s.bucket, s.vec_id, s.qv, c.cid,
           row_number() OVER (PARTITION BY s.bucket, s.vec_id
                              ORDER BY {sqdist.format(a='s', c='c')} ASC, c.cid ASC) AS rk
    FROM samp{lv} s JOIN {sprev} c ON c.bucket = s.bucket) WHERE rk = 1),
snewc{lv}_{t} AS MATERIALIZED (
  SELECT bucket, cid, list(CAST(FLOOR(CAST(sm AS DOUBLE) / cnt) AS BIGINT) ORDER BY dim) AS cv
  FROM (
    SELECT a.bucket, a.cid, d.i AS dim, SUM(a.qv[d.i]) AS sm, COUNT(*) AS cnt
    FROM sassign{lv}_{t} a, LATERAL (SELECT unnest(generate_series(1, len(a.qv))) AS i) d
    GROUP BY a.bucket, a.cid, d.i) GROUP BY bucket, cid),
scent{lv}_{t} AS MATERIALIZED (
  SELECT p.bucket, p.cid, COALESCE(n.cv, p.cv) AS cv
  FROM {sprev} p LEFT JOIN snewc{lv}_{t} n ON n.bucket = p.bucket AND n.cid = p.cid)"""
            )
            sprev = f"scent{lv}_{t}"
        parts.append(
            f"""assigned_l{lv} AS MATERIALIZED (
  SELECT a.vec_id, a.v, a.qv,
         CASE WHEN s.cid IS NULL THEN a.bucket
              ELSE (a.bucket + 1) * {_IVF_SUB_SHIFT} + s.cid + 1 END AS bucket
  FROM {p} a LEFT JOIN (
    SELECT bucket, vec_id, cid FROM (
      SELECT a2.bucket, a2.vec_id, c.cid,
             row_number() OVER (PARTITION BY a2.bucket, a2.vec_id
                                ORDER BY {sqdist.format(a='a2', c='c')} ASC, c.cid ASC) AS rk
      FROM {p} a2 JOIN scent{lv}_{_IVF_ITERS} c ON c.bucket = a2.bucket) WHERE rk = 1
  ) s ON s.bucket = a.bucket AND s.vec_id = a.vec_id)"""
        )
        prev_assigned = f"assigned_l{lv}"
    parts.append(
        f"assigned AS MATERIALIZED (SELECT vec_id, v, bucket FROM {prev_assigned})"
    )
    return ",\n".join(parts)


_IVF_CTES = _ivf_sql_ctes()


def q15_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    assigned = _ivf_assigned(spark, sf_dir).select("vec_id", "vn", "bucket")
    queries = assigned.filter(F.pmod("vec_id", F.lit(50)) == 0).select(
        F.col("vec_id").alias("query_id"), F.col("vn").alias("qn"), F.col("bucket").alias("qb")
    )
    dot = F.expr("aggregate(zip_with(vn, qn, (x, y) -> x * y), 0D, (acc, x) -> acc + x)")
    w_rank = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        assigned.join(F.broadcast(queries), F.col("bucket") == F.col("qb"))
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("cos", dot)
        .withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= _TOPK)
        .select("query_id", F.col("rank").cast("long").alias("rank"), F.col("vec_id").alias("neighbor_id"))
    )


Q15_SQL = f"""
WITH {_IVF_CTES},
q AS (SELECT vec_id AS query_id, v AS qv, bucket AS qb FROM assigned WHERE vec_id % 50 = 0)
SELECT query_id, CAST(rank AS BIGINT) AS rank, vec_id AS neighbor_id FROM (
  SELECT q.query_id, a.vec_id,
         row_number() OVER (PARTITION BY q.query_id
                            ORDER BY list_cosine_similarity(a.v, q.qv) DESC, a.vec_id ASC) AS rank
  FROM assigned a JOIN q ON a.bucket = q.qb
  WHERE a.vec_id <> q.query_id
) WHERE rank <= {_TOPK}
"""


# --------------------------------------------------------------------------
# q16 — near-dup CLUSTERS: connected components over the verified MinHash
# pairs (q08) via iterative min-label propagation — the distributed
# union-find (B5) analog at corpus scale. Each round combines an edge hop
# (min neighbor label) with a pointer-doubling hop (label := label[label]),
# so label distance to the component minimum shrinks superlinearly and the
# loop exits after ~ceil(log2(log2(diam)))+1 rounds instead of log2(diam);
# keeper = min doc_id per cluster. SQL oracle: DuckDB recursive CTE.
# --------------------------------------------------------------------------

_MAX_LP_ROUNDS = 32  # safety backstop; convergence check is the real exit

# (applicationId, sf_dir, reliable) → converged label DataFrame; see
# _lp_labels. Keyed by session so a stopped SparkSession never leaks a
# dead checkpointed plan into a new one.
_LP_LABELS_MEMO: dict = {}


def _lp_labels(spark: SparkSession, sf_dir: str, *, reliable: bool = False) -> DataFrame:
    """Connected-component labels (node, label) over the verified MinHash
    pairs via min-label propagation with per-round lineage truncation.

    reliable=False (default, interactive/driver-gate path): localCheckpoint —
    executor-local, fast, fine when executor loss means job retry anyway.
    reliable=True (pipeline-scale path): ``df.checkpoint()`` to the reliable
    checkpoint dir — survives executor loss at cluster scale, where a lost
    localCheckpoint block would kill the job after hours of rounds. The
    checkpoint dir must be set first (``spark.sparkContext.setCheckpointDir``
    — ``job.py --run-query ... --reliable-checkpoint-dir DIR`` does, as does
    tests/test_dedup_reliable.py); a clear error is raised here otherwise
    instead of Spark's late 'Checkpoint directory has not been set'.
    """
    if reliable and spark.sparkContext.getCheckpointDir() is None:
        raise RuntimeError(
            "reliable=True requires a checkpoint dir: call "
            "spark.sparkContext.setCheckpointDir(...) first (job.py "
            "--reliable-checkpoint-dir wires this)"
        )

    # The converged label table is the near-dup CLUSTER INDEX — q16/q23/q32
    # all start from it. Memoized per session like the IVF index: the LP
    # rounds (the expensive iterative part) run once and every consumer
    # reads the checkpointed result. At cluster scale this table is written
    # once per dedup build and joined many times.
    memo_key = (spark.sparkContext.applicationId, sf_dir, reliable)
    hit = _LP_LABELS_MEMO.get(memo_key)
    if hit is not None:
        return hit

    def _ckpt(df: DataFrame) -> DataFrame:
        # interactive path: LAZY localCheckpoint — the convergence count
        # below is the round's one action and materializes it, so each LP
        # round costs one job instead of two (eager-checkpoint + count).
        # The reliable path keeps eager checkpoint(): its write-then-read
        # semantics are part of the crash-resume contract.
        return df.checkpoint() if reliable else df.localCheckpoint(eager=False)

    pairs = _ckpt(q08_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b"))
    edges = _ckpt(
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .union(pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
        .distinct()
    )
    labels = _ckpt(
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    for _ in range(_MAX_LP_ROUNDS):
        propagated = (
            edges.join(labels, edges["dst"] == labels["node"])
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        # pointer-doubling hop: my label's own label. labels is keyed on node,
        # so this is a second equi-join against the same (small) round table —
        # one extra shuffle per round that halves the number of rounds.
        ptr = labels.select(
            F.col("node").alias("p_node"), F.col("label").alias("p_label")
        )
        stepped = _ckpt(
            labels.join(propagated, labels["node"] == propagated["src"], "left")
            .join(ptr, labels["label"] == ptr["p_node"], "left")
            .select(
                "node",
                F.col("label").alias("old_label"),
                F.least(
                    F.col("label"),
                    F.coalesce("nbr_label", F.col("label")),
                    F.coalesce("p_label", F.col("label")),
                ).alias("label"),
            )
        )
        n_changed = stepped.filter(F.col("label") != F.col("old_label")).count()
        labels = stepped.select("node", "label")
        if n_changed == 0:
            break
    _memo_put(_LP_LABELS_MEMO, memo_key, labels, spark)
    return labels


def q16_dedup_clusters(
    spark: SparkSession, sf_dir: str, *, reliable: bool = False
) -> DataFrame:
    labels = _lp_labels(spark, sf_dir, reliable=reliable)
    out = labels.groupBy("label").agg(
        F.count("*").alias("cluster_size"), F.min("node").alias("keeper")
    )
    return out.select(F.col("keeper").alias("cluster_id"), "cluster_size")


# shared CTE chain: documents → shingles → MinHash bands → verified pairs →
# connected components (node, label). Reused by q16 (cluster stats) and q23
# (corpus purge).
_Q16_CTES = f"""toks AS (
  SELECT doc_id, str_split(text, ' ') AS t FROM documents WHERE len(str_split(text, ' ')) >= 3
),
sh AS MATERIALIZED (
  SELECT DISTINCT doc_id, t[i + 1] || ' ' || t[i + 2] || ' ' || t[i + 3] AS s
  FROM toks, LATERAL (SELECT unnest(generate_series(0, len(t) - 3)) AS i) g
),
{_MH_SQL_CTES},
{_pairs_sql_cte("cand", materialized=True)},
sizes AS MATERIALIZED (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS MATERIALIZED (
  SELECT p.doc_a, p.doc_b, COUNT(*) AS inter
  FROM cand p JOIN sh sa ON sa.doc_id = p.doc_a
  JOIN sh sb ON sb.doc_id = p.doc_b AND sb.s = sa.s
  GROUP BY p.doc_a, p.doc_b
),
verified AS MATERIALIZED (
  SELECT i.doc_a, i.doc_b FROM inter i
  JOIN sizes na ON na.doc_id = i.doc_a JOIN sizes nb ON nb.doc_id = i.doc_b
  WHERE 3 * i.inter >= na.n + nb.n
),
edges AS MATERIALIZED (
  SELECT doc_a AS src, doc_b AS dst FROM verified
  UNION SELECT doc_b, doc_a FROM verified
),
walk(node, label) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.src, w.label FROM edges e JOIN walk w ON e.dst = w.node WHERE w.label < e.src
),
comp AS MATERIALIZED (SELECT node, MIN(label) AS label FROM walk GROUP BY node)"""

Q16_SQL = f"""
WITH RECURSIVE {_Q16_CTES}
SELECT label AS cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
FROM comp GROUP BY label
"""


# --------------------------------------------------------------------------
# q17 — n-gram Jaccard similarity: exact pairwise 3-gram Jaccard (integer
# percent) for a bounded candidate set — the verification primitive behind
# near-dup detection, exposed standalone. Shuffles on shingle (equi-join).
# Corpus-common shingles (document frequency > _DF_CAP) are dropped BEFORE
# the self-join — the standard document-frequency cut: one hot trigram would
# otherwise make the join key quadratic (O(df²) pairs on a single key) at
# corpus scale. Jaccard is computed over the capped shingle sets.
# --------------------------------------------------------------------------

_DF_CAP = 100


_SHC_MEMO: dict = {}


def _capped_shingles_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted + memoized DF-capped (doc_id, s) shingle table — the
    exact-Jaccard reference's base artifact, built once per (session,
    sf_dir) like the band index. Consumers: q17 (sizes + both self-join
    arms) and q73's exact-reference arm, which re-runs the q17 chain —
    without the memo the explode + DF-cap window ran once per consumer.
    At cluster scale this table is written once per corpus build."""
    key = (spark.sparkContext.applicationId, sf_dir)
    hit = _SHC_MEMO.get(key)
    if hit is not None:
        return hit
    raw = _shingles(spark, sf_dir, cluster_by_s=True)
    # DF-cap via window on the shingle key: one shuffle on s covers both the
    # document-frequency count and the rare-filter (no groupBy+self-join).
    out = (
        raw.withColumn("df", F.count("*").over(Window.partitionBy("s")))
        .filter(F.col("df") <= _DF_CAP)
        .select("doc_id", "s")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    _memo_put(_SHC_MEMO, key, out, spark)
    return out


def q17_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = _capped_shingles_table(spark, sf_dir)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    # NOTE (r6): the _band_pairs collect_list expansion was tried here and
    # REVERTED — at sf1 the capped posting lists sit near _DF_CAP and the
    # per-element lambda filter does O(B²) comparisons per shingle (23.7 s
    # vs 10.4 s for the SMJ); the self-join's sorted-run scan is the right
    # shape once B is large. Both arms ride the cached table's
    # hashpartitioning(s), so the join adds no exchange.
    inter = (
        sh.alias("a")
        .join(sh.alias("b"), F.col("a.s") == F.col("b.s"))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.alias("na"), F.col("doc_a") == F.col("na.doc_id"))
        .join(sizes.alias("nb"), F.col("doc_b") == F.col("nb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            ((100 * F.col("inter")) / (F.col("na.n") + F.col("nb.n") - F.col("inter")))
            .cast("long")
            .alias("jaccard_pct"),
        )
        .filter(F.col("jaccard_pct") >= 20)
    )


Q17_SQL = f"""
WITH toks AS (
  SELECT doc_id, str_split(text, ' ') AS t FROM documents
  WHERE len(str_split(text, ' ')) >= 3
),
raw AS (
  SELECT DISTINCT doc_id, t[i + 1] || ' ' || t[i + 2] || ' ' || t[i + 3] AS s
  FROM toks, LATERAL (SELECT unnest(generate_series(0, len(t) - 3)) AS i) g
),
rare AS (SELECT s FROM raw GROUP BY s HAVING COUNT(*) <= {_DF_CAP}),
sh AS (SELECT raw.doc_id, raw.s FROM raw JOIN rare ON raw.s = rare.s),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b,
       CAST((100 * inter) // (na.n + nb.n - inter) AS BIGINT) AS jaccard_pct
FROM inter JOIN sizes na ON na.doc_id = doc_a JOIN sizes nb ON nb.doc_id = doc_b
WHERE (100 * inter) // (na.n + nb.n - inter) >= 20
"""


# --------------------------------------------------------------------------
# q18 — embedding-cosine near-dup pairs: vectors within the SAME IVF bucket
# (coarse quantization shared with q15) whose cosine ≥ 0.35 — near-duplicate
# detection on the embedding modality. The pair join is an equi-join on
# bucket (shuffle on bucket, all-pairs only within a bucket); at real scale
# the seed count grows with the corpus so per-bucket work stays bounded —
# never a cartesian across the table.
# --------------------------------------------------------------------------

def q18_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    assigned = _ivf_assigned(spark, sf_dir).select("vec_id", "vn", "bucket")
    j = assigned.alias("a").join(
        assigned.alias("b"),
        (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.vec_id") < F.col("b.vec_id")),
    )
    cos = F.expr("aggregate(zip_with(a.vn, b.vn, (x, y) -> x * y), 0D, (acc, x) -> acc + x)")
    return (
        j.select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            cos.alias("cos"),
        )
        .filter(F.col("cos") >= 0.35)
        .select("vec_a", "vec_b")  # ids only: float scores differ in the
        # last ulp between engines (summation order) and break value hashing
    )


Q18_SQL = f"""
WITH {_IVF_CTES}
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
FROM assigned a JOIN assigned b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.v, b.v) >= 0.35
"""


# --------------------------------------------------------------------------
# q19 — token counting: whitespace tokens vs a BPE-ish regex segmentation
# (letters runs | digit runs | single punctuation) — the tokenizer-side
# statistics a training-data pipeline tracks per document.
# --------------------------------------------------------------------------

_TOK_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def q19_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("n_ws_tokens"),
        F.size(F.expr(f"regexp_extract_all(text, '{_TOK_RE}', 0)")).cast("long").alias("n_bpe_tokens"),
        F.length("text").cast("long").alias("n_chars"),
    )


Q19_SQL = f"""
SELECT doc_id,
       CAST(len(str_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
       CAST(len(regexp_extract_all(text, '{_TOK_RE}')) AS BIGINT) AS n_bpe_tokens,
       CAST(length(text) AS BIGINT) AS n_chars
FROM documents
"""


# --------------------------------------------------------------------------
# q13 — merge-contours analog: 1-D interval island counting via cumulative
# window max (reference: common.py:92-130 axis sweep merge)
# --------------------------------------------------------------------------

def q13_interval_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        F.col("l_partkey").alias("s"),
        (F.col("l_partkey") + 10 * F.col("l_linenumber")).alias("e"),
    )
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = li.withColumn("prev_max_e", F.max("e").over(w)).withColumn(
        "new_island",
        (F.col("prev_max_e").isNull() | (F.col("s") > F.col("prev_max_e"))).cast("long"),
    )
    return flagged.groupBy("l_suppkey").agg(F.sum("new_island").alias("n_islands"))


Q13_SQL = """
WITH iv AS (
  SELECT l_suppkey, l_partkey AS s, l_partkey + 10 * l_linenumber AS e FROM lineitem
),
f AS (
  SELECT l_suppkey, s,
         MAX(e) OVER (PARTITION BY l_suppkey ORDER BY s, e
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max_e
  FROM iv
)
SELECT l_suppkey,
       CAST(SUM(CASE WHEN prev_max_e IS NULL OR s > prev_max_e THEN 1 ELSE 0 END) AS BIGINT) AS n_islands
FROM f GROUP BY l_suppkey
"""


# --------------------------------------------------------------------------
# q14 — image-payload extraction e2e (S1/P/B/L/T pipelines inside the Arrow
# UDF). DuckDB cannot COMPUTE the pixel pipeline, but it can COMPARE it: the
# oracle is a SELECT over a golden parquet of the expected flat cells, whose
# values are pinned by the reference's own golden fixtures (the pytest suite
# asserts the kernels against tests/document/image/test_data/expected.xlsx
# and expected_tables.json; scripts/make_q14_golden.py materializes the
# verified output). Regenerate the golden whenever a kernel changes AND the
# pytest golden suite is green.
# --------------------------------------------------------------------------

_REF_FIXTURES = "/root/reference/tests"
_Q14_GOLDEN = str(
    Path(__file__).resolve().parents[1] / "tests" / "golden" / "q14_cells.parquet"
)

Q14_SQL = f"""
SELECT conv_id, turn_idx, table_idx, row_idx, col_idx, value
FROM read_parquet('{_Q14_GOLDEN}')
"""


_Q14_DF_MEMO: dict = {}


def _q14_corpus_df(spark: SparkSession) -> DataFrame:
    """The generated q14 corpus as a real parquet scan. createDataFrame on
    the local row list yields an RDD-backed plan that re-pickles and ships
    the ~8 MB of base64 payloads through the Python runner on EVERY action
    (measured: 2.4 s per run even column-pruned); staging the rows once per
    session to a temp parquet makes every q14 invocation a plain FileScan —
    input staging only, the extraction itself still runs in full each time."""
    key = (spark.sparkContext.applicationId,)
    hit = _Q14_DF_MEMO.get(key)
    if hit is not None:
        return hit
    import tempfile

    from img2table_spark.schema import TRANSCRIPT_SCHEMA

    path = tempfile.mkdtemp(prefix="q14_corpus_") + "/corpus"
    rows = list(_q14_corpus_rows())
    spark.createDataFrame(rows, TRANSCRIPT_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(path)
    out = spark.read.parquet(path)
    _Q14_DF_MEMO[key] = out
    for stale in [k for k in _Q14_DF_MEMO if k != key]:
        del _Q14_DF_MEMO[stale]
    return out


def q14_image_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _q14_corpus_df(spark)
    from img2table_spark.operators.extract import extract_cells_flat

    # balance=True: 30 payloads with a 12 s head — round-robin placement
    # keeps the wall at the max single payload instead of a collided sum.
    return extract_cells_flat(df, salt=True, balance=True)


@_functools.lru_cache(maxsize=1)
def _q14_corpus_rows() -> tuple:
    """Deterministic q14 payload corpus. The codec fixture encoders
    (progressive JPEG, JPEG-in-TIFF, WebP, HDR, ...) cost ~5 s of serial
    driver CPU, so the corpus is built once per process and reused by
    entry()/bench/repeat gate runs."""
    import base64
    import datetime as dt
    import json as _json
    from pathlib import Path

    ref = Path(_REF_FIXTURES)
    rows = []
    ts = dt.datetime(2026, 1, 1)
    if ref.exists():
        test_b64 = base64.b64encode(
            (ref / "document/image/test_data/test.png").read_bytes()
        ).decode()
        dark_b64 = base64.b64encode(
            (ref / "document/image/test_data/dark.png").read_bytes()
        ).decode()
        hocr = (ref / "_mock_data/tesseract_hocr.html").read_text()
        pdf_b64 = base64.b64encode(
            (ref / "document/pdf/test_data/test.pdf").read_bytes()
        ).decode()
        for i in range(8):
            rows.append(
                (
                    f"imgconv{i % 3}",
                    i,
                    "assistant",
                    _json.dumps(
                        {"image": test_b64 if i % 2 == 0 else dark_b64,
                         "hocr": hocr if i % 2 == 0 else None,
                         "implicit_rows": True}
                    ),
                    "image/png",
                    ts,
                )
            )
        for i in range(8, 12):
            rows.append((f"pdfconv{i % 2}", i, "assistant", pdf_b64, "application/pdf", ts))
        # borderless pipeline payload (L1-L12 in the driver gate): dark.png
        # with borderless detection on — expected 19×5 table, pinned by
        # tests/test_kernels_e2e_image.py vs the reference's own e2e golden
        rows.append(
            (
                "blconv0", 20, "assistant",
                _json.dumps(
                    {"image": dark_b64, "implicit_rows": True,
                     "implicit_columns": True, "borderless_tables": True}
                ),
                "image/png", ts,
            )
        )
        # rotation payload (S3 in the driver gate): the reference's skewed
        # document fixture with detect_rotation on — the skew estimate +
        # warpAffine kernels run before extraction (their own parity is
        # pinned by tests/test_kernels_rotation.py, 98 centroids exact)
        rot_b64 = base64.b64encode(
            (ref / "document/base/test_data/test.png").read_bytes()
        ).decode()
        rows.append(
            (
                "rotconv0", 21, "assistant",
                _json.dumps(
                    {"image": rot_b64, "implicit_rows": True, "detect_rotation": True}
                ),
                "image/png", ts,
            )
        )
        # text-layer-PDF pixel-path payloads (S2 glyph rendering + L stack in
        # the driver gate): test.pdf with borderless+rotation flags routes
        # through the glyph-rendered pixel pipeline and must still find the
        # four bordered tables (pinned by tests/test_pdf_rendered.py).
        # One turn PER PAGE on distinct convs: the pixel stack is the
        # heaviest per-turn work in the corpus, and page-split turns let the
        # salt exchange spread it instead of serializing both pages in one
        # task (the same pattern a 100-TB corpus needs for long documents).
        for pg in (0, 1):
            rows.append(
                (
                    f"pdfblconv{pg}", 22 + pg * 2, "assistant",
                    _json.dumps(
                        {"pdf": pdf_b64, "implicit_rows": True,
                         "borderless_tables": True, "detect_rotation": True,
                         "pages": [pg]}
                    ),
                    "application/pdf", ts,
                )
            )
        # borderless TEXT-GRID pdf payload: a native-text page whose 7×4
        # word grid has no rules at all — only the glyph-rendered borderless
        # pipeline can find it (tests/test_pdf_rendered.py pins the content)
        from img2table_spark.kernels.encoders import build_borderless_text_pdf

        rows.append(
            (
                "pdfgridconv0", 23, "assistant",
                _json.dumps(
                    {"pdf": base64.b64encode(build_borderless_text_pdf()).decode(),
                     "borderless_tables": True, "implicit_rows": False}
                ),
                "application/pdf", ts,
            )
        )
        # non-PNG codec payloads: the same test image re-encoded as BMP,
        # LZW-predictor TIFF, progressive JPEG (SOF2), and lossless WebP
        # (VP8L) — certifies those decoders in the driver's hard gate
        from img2table_spark.kernels.encoders import (
            build_ccitt_scanned_pdf,
            encode_bmp24,
            encode_jpeg_progressive,
            encode_tiff,
            encode_tiff_ccitt,
            encode_tiff_jpeg,
            encode_tiff_jpeg_oldstyle,
            encode_tiff_jpeg_oldstyle_tables,
            encode_tiff_tiled,
            encode_tiff_tiled_bilevel,
        )
        from img2table_spark.kernels.exr import encode_exr
        from img2table_spark.kernels.hdr import encode_hdr
        from img2table_spark.kernels.png import decode_png
        from img2table_spark.kernels.webp import encode_webp_vp8l

        test_img = decode_png((ref / "tables/image/test_data/test.png").read_bytes())
        for i, (payload, tool) in enumerate(
            [
                (encode_bmp24(test_img), "image/bmp"),
                (encode_tiff(test_img, compression=5, predictor=2, rows_per_strip=64), "image/tiff"),
                (encode_jpeg_progressive(test_img, qval=2), "image/jpeg"),
                (encode_webp_vp8l(test_img), "image/webp"),
                (encode_tiff_tiled(test_img, 64, 64, compression=5, predictor=2), "image/tiff"),
                (encode_tiff_jpeg(test_img, rows_per_strip=64, external_tables=True), "image/tiff"),
                (encode_hdr(test_img), "image/vnd.radiance"),
                (encode_exr(test_img, compression=3), "image/x-exr"),
                (encode_tiff_tiled_bilevel(test_img, 64, 64, compression=5), "image/tiff"),
                (encode_tiff_jpeg_oldstyle(test_img), "image/tiff"),
                # CCITT fax — the dominant real scanned-document compression
                # (VERDICT r3 top-next #1): T.6 G4 MMR and T.4 G3 2-D strips
                (encode_tiff_ccitt(test_img, compression=4), "image/tiff"),
                (encode_tiff_ccitt(test_img, compression=3, two_d=True,
                                   rows_per_strip=64), "image/tiff"),
                # old-style JPEG-in-TIFF, tables-pointer bare-MCU variant
                # (the last codec gap, closed round 5): strips of bare
                # baseline entropy data + JPEGQ/DC/ACTables tag pointers
                (encode_tiff_jpeg_oldstyle_tables(test_img, rows_per_strip=64),
                 "image/tiff"),
            ],
            start=12,
        ):
            rows.append(
                (f"codecconv{i % 2}", i, "assistant",
                 base64.b64encode(payload).decode(), tool, ts)
            )
        # CCITTFaxDecode scanned PDF (G4 image XObject, the classic fax-PDF
        # payload): extracts the same two tables as the DCT/Flate scanned
        # fixtures (pinned by tests/test_kernels_ccitt.py)
        rows.append(
            (
                "faxconv0", 26, "assistant",
                _json.dumps(
                    {"pdf": base64.b64encode(
                        build_ccitt_scanned_pdf(test_img, k=-1)).decode(),
                     "implicit_rows": True}
                ),
                "application/pdf", ts,
            )
        )
    return tuple(rows)


# --------------------------------------------------------------------------
# q20 — SRP-LSH cosine near-dup: signed-random-projection signatures (16
# deterministic hyperplanes, embedded as literals in BOTH engines), banded
# 2×8 bits; candidate pairs join on (band_idx, band_val) equality and are
# verified by exact cosine. THIS is the linear-shuffle scale path for
# embedding dedup — q18's IVF variant still does all-pairs within a coarse
# bucket, SRP banding keys shrink with corpus growth for free.
# --------------------------------------------------------------------------

_SRP_BITS = 16
_SRP_BAND = 8  # 2 bands × 8 bits
_SRP_DIM = 64
_SRP_PLANES = [
    [
        1.0 if _hashlib.md5(f"srp_{b}_{d}".encode()).digest()[0] % 2 == 0 else -1.0
        for d in range(_SRP_DIM)
    ]
    for b in range(_SRP_BITS)
]
_SRP_COS_MIN = 0.35


def q20_srp_lsh_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.expr("transform(embedding, x -> cast(x AS DOUBLE))").alias("v")
    )
    planes = F.array(
        *[F.array(*[F.lit(x) for x in row]) for row in _SRP_PLANES]
    )
    bits = F.expr(
        "transform(planes, p -> IF(aggregate(zip_with(v, p, (x, y) -> x * y), 0D,"
        " (acc, x) -> acc + x) >= 0, 1L, 0L))"
    )
    sig = emb.withColumn("planes", planes).withColumn("bits", bits).select(
        "vec_id",
        "v",
        F.expr(f"aggregate(slice(bits, 1, {_SRP_BAND}), 0L, (acc, x) -> 2 * acc + x)").alias("b0"),
        F.expr(
            f"aggregate(slice(bits, {_SRP_BAND + 1}, {_SRP_BAND}), 0L, (acc, x) -> 2 * acc + x)"
        ).alias("b1"),
    )
    banded = sig.select(
        "vec_id",
        "v",
        F.explode(
            F.array(
                F.struct(F.lit(0).alias("band_idx"), F.col("b0").alias("band_val")),
                F.struct(F.lit(1).alias("band_idx"), F.col("b1").alias("band_val")),
            )
        ).alias("band"),
    ).select("vec_id", "v", "band.band_idx", "band.band_val")
    # persist: both self-join arms reference the banded table — unpersisted,
    # the 16-plane SRP projection subtree runs once per arm. This is the
    # LSH index artifact a production build materializes anyway.
    banded = banded.persist(StorageLevel.MEMORY_AND_DISK)
    cand = (
        banded.alias("a")
        .join(banded.alias("b"), ["band_idx", "band_val"])
        .filter(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.col("a.v").alias("va"),
            F.col("b.v").alias("vb"),
        )
        .dropDuplicates(["vec_a", "vec_b"])
    )
    cos = F.expr(
        "aggregate(zip_with(va, vb, (x, y) -> x * y), 0D, (acc, x) -> acc + x) / "
        "(sqrt(aggregate(va, 0D, (acc, x) -> acc + x * x)) * "
        "sqrt(aggregate(vb, 0D, (acc, x) -> acc + x * x)))"
    )
    return cand.filter(cos >= _SRP_COS_MIN).select("vec_a", "vec_b")


def _srp_planes_sql() -> str:
    rows = ", ".join(
        f"({b}, [{', '.join(str(x) for x in row)}]::DOUBLE[])"
        for b, row in enumerate(_SRP_PLANES)
    )
    return f"(VALUES {rows}) planes(b, p)"


Q20_SQL = f"""
WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
bits AS (
  SELECT vec_id, b,
         CASE WHEN list_dot_product(v, p) >= 0 THEN 1 ELSE 0 END AS bit
  FROM e, {_srp_planes_sql()}
),
bands AS (
  SELECT vec_id, b // {_SRP_BAND} AS band_idx,
         SUM(bit * (1::BIGINT << ({_SRP_BAND - 1} - (b % {_SRP_BAND})))) AS band_val
  FROM bits GROUP BY vec_id, b // {_SRP_BAND}
),
cand AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM bands a JOIN bands b ON a.band_idx = b.band_idx AND a.band_val = b.band_val
  WHERE a.vec_id < b.vec_id
)
SELECT c.vec_a, c.vec_b
FROM cand c JOIN e ea ON ea.vec_id = c.vec_a JOIN e eb ON eb.vec_id = c.vec_b
WHERE list_cosine_similarity(ea.v, eb.v) >= {_SRP_COS_MIN}
"""


# --------------------------------------------------------------------------
# q21 — deterministic stratified sampling: hash-gated per-language rates
# (downsample the dominant language) — the standard reproducible corpus
# sampler (md5-mod gate computes identically on any engine, no RNG state).
# Narrow map + single agg: trivially scale-safe.
# --------------------------------------------------------------------------

_SAMPLE_RATES = {"en": 10}  # percent kept; every other stratum keeps 50%
_SAMPLE_DEFAULT = 50


def q21_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    gate = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10).cast(
        "long"
    ) % 100
    rate = F.when(F.col("lang") == "en", F.lit(_SAMPLE_RATES["en"])).otherwise(
        F.lit(_SAMPLE_DEFAULT)
    )
    return (
        docs.filter(gate < rate)
        .groupBy("lang", "source")
        .agg(F.count("*").alias("n_kept"), F.sum("n_chars").alias("sum_chars"))
    )


Q21_SQL = f"""
SELECT lang, source, COUNT(*) AS n_kept, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents
WHERE ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 100
      < CASE WHEN lang = 'en' THEN {_SAMPLE_RATES["en"]} ELSE {_SAMPLE_DEFAULT} END
GROUP BY lang, source
"""


# --------------------------------------------------------------------------
# q22 — sessionization: gap-based session ids over the event stream (30-min
# inactivity splits), the canonical transcript/agent-log windowing op.
# Cumulative-sum-of-flags over a per-user window — one shuffle on user_id.
# --------------------------------------------------------------------------

_SESSION_GAP_S = 1800


def q22_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_id", F.floor(F.unix_timestamp("ts")).cast("long").alias("sec")
    )
    w = Window.partitionBy("user_id").orderBy("sec", "event_id")
    flagged = ev.withColumn(
        "new_sess",
        F.when(
            F.col("sec") - F.lag("sec").over(w) > _SESSION_GAP_S, F.lit(1)
        ).otherwise(F.lit(0)).cast("long"),
    ).withColumn(
        "sess_idx",
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return flagged.groupBy("user_id", "sess_idx").agg(
        F.count("*").alias("n_events"),
        F.min("event_id").alias("first_event"),
        F.max("event_id").alias("last_event"),
        (F.max("sec") - F.min("sec")).alias("duration_s"),
    )


Q22_SQL = f"""
WITH ev AS (
  SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events
),
flagged AS (
  SELECT user_id, event_id, sec,
         CASE WHEN sec - lag(sec) OVER w > {_SESSION_GAP_S} THEN 1 ELSE 0 END AS new_sess
  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)
),
sess AS (
  SELECT user_id, event_id, sec,
         CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY sec, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_idx
  FROM flagged
)
SELECT user_id, sess_idx, COUNT(*) AS n_events,
       MIN(event_id) AS first_event, MAX(event_id) AS last_event,
       MAX(sec) - MIN(sec) AS duration_s
FROM sess GROUP BY user_id, sess_idx
"""


# --------------------------------------------------------------------------
# q23 — near-dup PURGE: the end-to-end dedup action — drop every cluster
# member except the keeper (min doc_id = its propagated label) and report
# the retained corpus per language. Anti-join against the (small) non-keeper
# set; at scale Spark broadcasts it automatically.
# --------------------------------------------------------------------------

def q23_dedup_purge(
    spark: SparkSession, sf_dir: str, *, reliable: bool = False
) -> DataFrame:
    labels = _lp_labels(spark, sf_dir, reliable=reliable)
    drops = labels.filter(F.col("node") != F.col("label")).select(
        F.col("node").alias("doc_id")
    )
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.join(drops, "doc_id", "left_anti")
        .groupBy("lang")
        .agg(F.count("*").alias("n_docs"), F.sum("n_chars").alias("sum_chars"))
    )


Q23_SQL = f"""
WITH RECURSIVE {_Q16_CTES}
SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents
WHERE doc_id NOT IN (SELECT node FROM comp WHERE node <> label)
GROUP BY lang
"""


# --------------------------------------------------------------------------
# q24 — token document frequency: the inverted-index statistic behind idf
# weighting and vocabulary pruning. Distinct (doc, token) then one shuffle
# on token; hot tokens are plain agg keys (no join), so no skew hazard.
# --------------------------------------------------------------------------

_DF_MIN = 20


def q24_token_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    ).distinct()
    return (
        toks.groupBy("tok")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") >= _DF_MIN)
    )


Q24_SQL = f"""
WITH toks AS (
  SELECT DISTINCT doc_id, unnest(str_split(text, ' ')) AS tok FROM documents
)
SELECT tok, COUNT(*) AS df FROM toks GROUP BY tok HAVING COUNT(*) >= {_DF_MIN}
"""


# --------------------------------------------------------------------------
# q25 — PII detection + redaction (training-data op). The synthetic corpus
# has no organic PII, so both sides first decorate documents.text with
# DETERMINISTIC doc_id-derived emails/phones/IPs (identical string algebra in
# Spark and DuckDB), then the operator proper — regex detect + redact — runs
# on the decorated text. Pure per-row map: zero shuffles, scale-free.
# Patterns are kept in the RE2 ∩ java.util.regex common dialect.
# --------------------------------------------------------------------------

_PII_EMAIL = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
_PII_PHONE = "\\b555-[0-9]{4}\\b"
_PII_IP = "\\b10\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"


def q25_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    dec = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                did % 3 == 0,
                F.concat(F.lit(" contact agent"), did.cast("string"), F.lit("@mail.example.com")),
            ).otherwise(F.lit("")),
            F.when(
                did % 5 == 0,
                F.concat(F.lit(" call 555-"), F.lpad((did % 10000).cast("string"), 4, "0")),
            ).otherwise(F.lit("")),
            F.when(
                did % 7 == 0,
                F.concat(
                    F.lit(" host 10."), (did % 256).cast("string"),
                    F.lit(".0."), (did % 100).cast("string"),
                ),
            ).otherwise(F.lit("")),
        ).alias("txt"),
    )
    red = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("txt"), _PII_EMAIL, "<EMAIL>"),
            _PII_PHONE, "<PHONE>",
        ),
        _PII_IP, "<IP>",
    )
    return dec.select(
        "doc_id",
        F.size(F.regexp_extract_all("txt", F.lit(_PII_EMAIL), F.lit(0))).cast("long").alias("n_email"),
        F.size(F.regexp_extract_all("txt", F.lit(_PII_PHONE), F.lit(0))).cast("long").alias("n_phone"),
        F.size(F.regexp_extract_all("txt", F.lit(_PII_IP), F.lit(0))).cast("long").alias("n_ip"),
        F.md5(red).alias("red_md5"),
    )


Q25_SQL = f"""
WITH dec AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 3 = 0
                 THEN ' contact agent' || CAST(doc_id AS VARCHAR) || '@mail.example.com'
                 ELSE '' END
         || CASE WHEN doc_id % 5 = 0
                 THEN ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                 ELSE '' END
         || CASE WHEN doc_id % 7 = 0
                 THEN ' host 10.' || CAST(doc_id % 256 AS VARCHAR)
                      || '.0.' || CAST(doc_id % 100 AS VARCHAR)
                 ELSE '' END AS txt
  FROM documents
)
SELECT doc_id,
       len(regexp_extract_all(txt, '{_PII_EMAIL}')) AS n_email,
       len(regexp_extract_all(txt, '{_PII_PHONE}')) AS n_phone,
       len(regexp_extract_all(txt, '{_PII_IP}')) AS n_ip,
       md5(regexp_replace(
             regexp_replace(
               regexp_replace(txt, '{_PII_EMAIL}', '<EMAIL>', 'g'),
               '{_PII_PHONE}', '<PHONE>', 'g'),
             '{_PII_IP}', '<IP>', 'g')) AS red_md5
FROM dec
"""


# --------------------------------------------------------------------------
# q26 — benchmark decontamination (training-data op): flag corpus documents
# sharing any n-gram shingle with a held-out "benchmark" slice (doc_id
# divisible by _DECON_MOD stands in for the eval set). The benchmark shingle
# set is tiny by construction → broadcast hash join, so the 100-TB corpus
# side never shuffles for the probe; the only exchange is the per-doc agg.
#
# ``width`` is the decontamination policy knob: production pipelines use
# 13-gram sliding windows (the GPT-3/PaLM-style convention — long enough
# that chance collisions vanish); the registered gate entry uses width 3
# because the synthetic gate corpus has documents shorter than most
# 13-grams (0 flagged rows at sf0.01 would make the hard gate vacuous).
# Both widths are oracle-checked in tests/test_query_edge_cases.py.
# --------------------------------------------------------------------------

_DECON_MOD = 97
_DECON_PROD_WIDTH = 13


def q26_decontam(
    spark: SparkSession, sf_dir: str, width: int = 3
) -> DataFrame:
    sh = _shingles(spark, sf_dir, width=width)  # distinct (doc_id, n-gram)
    bench = (
        sh.filter(F.col("doc_id") % _DECON_MOD == 0)
        .select("s")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    # ONE pass over the corpus shingles: broadcast LEFT join marks bench
    # overlaps, a single agg per doc counts both totals — the corpus side is
    # scanned once and never shuffled for the probe (the only exchange is
    # the per-doc agg).
    return (
        sh.filter(F.col("doc_id") % _DECON_MOD != 0)
        .join(F.broadcast(bench), "s", "left")
        .groupBy("doc_id")
        .agg(
            F.sum(F.coalesce("hit", F.lit(0))).alias("n_hit"),
            F.count("*").alias("n_sh"),
        )
        .filter(F.col("n_hit") > 0)
        .select(
            "doc_id",
            "n_hit",
            "n_sh",
            ((100 * F.col("n_hit")) / F.col("n_sh")).cast("long").alias("hit_pct"),
        )
    )


def decontam_sql(width: int = 3) -> str:
    """DuckDB oracle for q26 at any shingle width (same per-width token
    filter and space-joined n-grams as the Spark side)."""
    return f"""
WITH toks AS (
  SELECT doc_id, str_split(text, ' ') AS t FROM documents WHERE len(str_split(text, ' ')) >= {width}
),
sh AS (
  SELECT DISTINCT doc_id, array_to_string(t[i + 1 : i + {width}], ' ') AS s
  FROM toks, LATERAL (SELECT unnest(generate_series(0, len(t) - {width})) AS i) g
),
bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % {_DECON_MOD} = 0),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
hits AS (
  SELECT doc_id, COUNT(*) AS n_hit
  FROM sh JOIN bench USING (s)
  WHERE doc_id % {_DECON_MOD} <> 0
  GROUP BY doc_id
)
SELECT h.doc_id, h.n_hit, z.n_sh, (100 * h.n_hit) // z.n_sh AS hit_pct
FROM hits h JOIN sizes z USING (doc_id)
"""


Q26_SQL = decontam_sql(3)


# --------------------------------------------------------------------------
# q27 — repetition-quality signals (Gopher-style filters, training-data op):
# per document, the dominant word's frequency share and the duplicated-
# bigram share. Bigram stats are per-row higher-order functions (no
# shuffle); the dominant word is one explode→agg keyed by (doc_id, w) —
# hot words are AGG keys, never join keys, so no skew magnet at 100 TB.
# --------------------------------------------------------------------------


def q27_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.split("text", " ").alias("t"))
    bi = toks.select(
        "doc_id",
        F.size("t").cast("long").alias("n_tok"),
        (F.size("t") - 1).cast("long").alias("n_bi"),
        # Guard the 1-token case explicitly: sequence(0, -1) counts DOWN under
        # Spark 4 ([0,-1]) and t[-1] throws INVALID_ARRAY_INDEX in ANSI mode.
        # The n_bi >= 1 filter below only saves us while predicate pushdown
        # happens to reorder evaluation — don't rely on it.
        F.size(
            F.array_distinct(
                F.expr(
                    "CASE WHEN size(t) >= 2 THEN "
                    "transform(sequence(0, size(t) - 2), i -> concat(t[i], ' ', t[i+1])) "
                    "ELSE array() END"
                )
            )
        ).cast("long").alias("n_bi_d"),
    ).filter(F.col("n_bi") >= 1)
    wc = (
        toks.select("doc_id", F.explode("t").alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("cnt"))
    )
    rn = F.row_number().over(
        Window.partitionBy("doc_id").orderBy(F.col("cnt").desc(), F.col("w").asc())
    )
    top = (
        wc.withColumn("rn", rn)
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("w").alias("top_w"), F.col("cnt").alias("top_cnt"))
    )
    return bi.join(top, "doc_id").select(
        "doc_id",
        "n_tok",
        "top_w",
        "top_cnt",
        ((100 * F.col("top_cnt")) / F.col("n_tok")).cast("long").alias("top_pct"),
        ((100 * (F.col("n_bi") - F.col("n_bi_d"))) / F.col("n_bi")).cast("long").alias("dup_bi_pct"),
    )


Q27_SQL = """
WITH toks AS (SELECT doc_id, str_split(text, ' ') AS t FROM documents),
bi AS (
  SELECT doc_id, len(t) AS n_tok, len(t) - 1 AS n_bi,
         len(list_distinct(list_transform(generate_series(1, len(t) - 1),
                                          i -> t[i] || ' ' || t[i + 1]))) AS n_bi_d
  FROM toks WHERE len(t) >= 2
),
wc AS (
  SELECT doc_id, w, COUNT(*) AS cnt
  FROM toks, LATERAL (SELECT unnest(t) AS w) g
  GROUP BY doc_id, w
),
top AS (
  SELECT doc_id, w AS top_w, cnt AS top_cnt
  FROM (SELECT doc_id, w, cnt,
               row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, w ASC) AS rn
        FROM wc) q
  WHERE rn = 1
)
SELECT b.doc_id, b.n_tok, t.top_w, t.top_cnt,
       (100 * t.top_cnt) // b.n_tok AS top_pct,
       (100 * (b.n_bi - b.n_bi_d)) // b.n_bi AS dup_bi_pct
FROM bi b JOIN top t USING (doc_id)
"""


# --------------------------------------------------------------------------
# q28 — HTML boilerplate strip / main-content extraction (north_rule names
# this family outright: "HTML boilerplate strip ... DOM heuristics"). Both
# sides deterministically wrap documents.text in a full page (nav rail,
# link-heavy related-items aside, two-paragraph article, link-heavy footer);
# the Spark side runs the REAL link-density block segmenter
# (kernels/boilerplate.py) over the page, blind to the generator, while the
# oracle states the planted ground truth — so the gate verifies the
# heuristic actually recovers the content and drops every boilerplate
# block. Scan → synth (JVM concat) → explicit CPU-sized exchange → Arrow
# UDF: the q01 extraction shape, zero extra shuffles.
# --------------------------------------------------------------------------

_Q28_NAV = (
    '<nav><a href="/">home</a> <a href="/about">about</a> '
    '<a href="/contact">contact</a> <a href="/login">login</a></nav>'
)
_Q28_ASIDE = (
    "<aside>"
    + " ".join(f'<a href="#r{j}">related item {j}</a>' for j in range(12))
    + "</aside>"
)
_Q28_FOOTER = (
    "<footer>copyright 2026 example corp "
    '<a href="/privacy">privacy</a> <a href="/terms">terms</a> '
    '<a href="/sitemap">sitemap</a> <a href="/careers">careers</a></footer>'
)


def q28_main_content(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    page = F.concat(
        F.lit("<html><body>" + _Q28_NAV + _Q28_ASIDE + "<article><p>"),
        F.col("text"),
        F.lit("</p><p>summary of document "),
        F.col("doc_id").cast("string"),
        F.lit(" with "),
        F.size(F.split("text", " ")).cast("string"),
        F.lit(" tokens</p></article>" + _Q28_FOOTER + "</body></html>"),
    )
    pages = docs.select("doc_id", page.alias("page"))
    # Explicit CPU-derived count: AQE would size-coalesce a bare
    # repartition() under the UDF's real (CPU) cost (CLAUDE.md gotcha).
    pages = pages.repartition(spark.sparkContext.defaultParallelism * 2, "doc_id")

    @F.pandas_udf("string")
    def _main(col: pd.Series) -> pd.Series:
        from img2table_spark.kernels.boilerplate import extract_main_text

        return col.map(extract_main_text)

    return pages.select("doc_id", _main("page").alias("main_text"))


Q28_SQL = """
SELECT doc_id,
       text || chr(10) || 'summary of document ' || CAST(doc_id AS VARCHAR)
            || ' with ' || CAST(len(str_split(text, ' ')) AS VARCHAR)
            || ' tokens' AS main_text
FROM documents
"""


# --------------------------------------------------------------------------
# q29 — AS-OF JOIN (an operator Spark lacks natively; DuckDB's built-in
# ASOF JOIN is the independent oracle): each click event joins the latest
# prior view by the same user. Implemented as the canonical distributed
# shape — tag both sides, union, ONE window over (user_id, ts) carrying the
# last-seen right row forward — one shuffle on user_id, no range-join
# explosion, no per-key collect. (events ts are unique per user at all SFs,
# so the <=-tie ordering never fires; `side` orders views first anyway.)
# --------------------------------------------------------------------------


# events.ts is TIMESTAMP_NTZ: anchor-relative micros are timezone-free in
# both engines (Spark timestampdiff on NTZ / DuckDB date_diff), unlike
# epoch functions whose NTZ interpretation depends on the session zone.
_EV_US_SPARK = "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '2024-01-01 00:00:00', ts)"
_EV_US_SQL = "date_diff('microsecond', TIMESTAMP '2024-01-01 00:00:00', ts)"


def q29_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    un = (
        ev.filter(F.col("event_type") == "click")
        .select("user_id", "ts", F.lit(1).alias("side"), F.col("event_id").alias("eid"))
        .unionByName(
            ev.filter(F.col("event_type") == "view").select(
                "user_id", "ts", F.lit(0).alias("side"), F.col("event_id").alias("eid")
            )
        )
        .withColumn("us", F.expr(_EV_US_SPARK))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    view_id = F.last(F.when(F.col("side") == 0, F.col("eid")), ignorenulls=True).over(w)
    view_us = F.last(F.when(F.col("side") == 0, F.col("us")), ignorenulls=True).over(w)
    return (
        un.select(
            "user_id", "side", F.col("eid").alias("click_id"), F.col("us").alias("cus"),
            view_id.alias("view_id"), view_us.alias("vus"),
        )
        .filter((F.col("side") == 1) & F.col("view_id").isNotNull())
        .select(
            "click_id", "user_id", "view_id",
            (F.col("cus") - F.col("vus")).alias("gap_us"),
        )
    )


Q29_SQL = """
SELECT c.event_id AS click_id, c.user_id, v.event_id AS view_id,
       date_diff('microsecond', v.ts, c.ts) AS gap_us
FROM (SELECT * FROM events WHERE event_type = 'click') c
ASOF JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON c.user_id = v.user_id AND c.ts >= v.ts
"""


# --------------------------------------------------------------------------
# q30 — RANGE JOIN via time bucketing (the other join family Spark lacks):
# clicks within one hour AFTER each error event, per user. The naive plan
# is a per-user interval cross product; the scale path buckets both sides
# to the hour (exact integer `div`), explodes the probe side to its two
# candidate buckets, equi-joins on (user_id, bucket) and applies the precise
# interval filter afterwards — joins stay hash joins with bounded fan-out at
# any corpus size. Oracle is DuckDB's plain inequality join (fine at sf0.01).
# --------------------------------------------------------------------------

_HOUR_US = 3_600 * 1_000_000


def q30_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    err = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"), "user_id", F.expr(_EV_US_SPARK).alias("eus")
    )
    clk = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.expr(_EV_US_SPARK).alias("cus")
    ).withColumn("bucket", F.expr(f"cus div {_HOUR_US}"))
    err2 = err.withColumn(
        "bucket",
        F.explode(
            F.array(
                F.expr(f"eus div {_HOUR_US}"), F.expr(f"eus div {_HOUR_US} + 1")
            )
        ),
    )
    return (
        err2.join(clk, ["user_id", "bucket"])
        .filter((F.col("cus") > F.col("eus")) & (F.col("cus") <= F.col("eus") + _HOUR_US))
        .groupBy("error_id", "user_id")
        .agg(F.count("*").alias("n_clicks"))
    )


Q30_SQL = f"""
SELECT e.event_id AS error_id, e.user_id, COUNT(*) AS n_clicks
FROM events e
JOIN events c
  ON c.user_id = e.user_id AND c.event_type = 'click'
 AND date_diff('microsecond', e.ts, c.ts) > 0
 AND date_diff('microsecond', e.ts, c.ts) <= {_HOUR_US}
WHERE e.event_type = 'error'
GROUP BY e.event_id, e.user_id
"""


# --------------------------------------------------------------------------
# q31 — TF-IDF top terms per document. The idf weight is INTEGER
# ((100·N)//df — log-free so both engines agree bit-for-bit; ordering is
# what matters for term selection), score = tf · idf_pct, top-3 terms by
# (score desc, tok asc). The document-frequency table is a tiny vocabulary
# aggregate → broadcast back to the per-doc term counts, so hot tokens are
# agg keys and a BROADCAST side — never a shuffled join key (the classic
# skew trap for corpus-statistics joins at 100 TB).
# --------------------------------------------------------------------------

_TFIDF_K = 3


def q31_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    n_docs = docs.count()  # driver-side scalar: one number, not data
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    tf = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
    df_tbl = (
        toks.distinct()
        .groupBy("tok")
        .agg(F.count("*").alias("df"))
        .withColumn("idf_pct", F.expr(f"(100 * {n_docs}) div df"))
    )
    scored = tf.join(F.broadcast(df_tbl), "tok").select(
        "doc_id", "tok", (F.col("tf") * F.col("idf_pct")).alias("score")
    )
    rn = F.row_number().over(
        Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("tok").asc())
    )
    return (
        scored.withColumn("rnk", rn)
        .filter(F.col("rnk") <= _TFIDF_K)
        .select("doc_id", "tok", "score", F.col("rnk").cast("long").alias("rnk"))
    )


Q31_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest(str_split(text, ' ')) AS tok FROM documents
),
tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY doc_id, tok),
dfv AS (
  SELECT tok, COUNT(*) AS df,
         (100 * (SELECT COUNT(*) FROM documents)) // COUNT(*) AS idf_pct
  FROM (SELECT DISTINCT doc_id, tok FROM toks) d GROUP BY tok
),
scored AS (
  SELECT t.doc_id, t.tok, t.tf * v.idf_pct AS score FROM tf t JOIN dfv v USING (tok)
)
SELECT doc_id, tok, score, rnk FROM (
  SELECT doc_id, tok, score,
         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, tok ASC) AS rnk
  FROM scored
) q WHERE rnk <= {_TFIDF_K}
"""


# --------------------------------------------------------------------------
# q32 — quality-aware dedup keeper selection: compose the near-dup clusters
# (q16's label propagation) with per-doc quality (token count) and keep the
# HIGHEST-quality member per cluster (ties → smallest doc_id) — the actual
# decision a curation pipeline makes, not just "min doc_id wins". One join
# of cluster labels (small: only docs in clusters) against per-doc stats.
# --------------------------------------------------------------------------


def q32_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    labels = _lp_labels(spark, sf_dir)
    docs = _t(spark, sf_dir, "documents")
    q = docs.select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("n_tok")
    )
    members = labels.join(q, labels["node"] == q["doc_id"]).select(
        "label", "doc_id", "n_tok"
    )
    best = F.row_number().over(
        Window.partitionBy("label").orderBy(F.col("n_tok").desc(), F.col("doc_id").asc())
    )
    return (
        members.withColumn("rnk", best)
        .filter(F.col("rnk") == 1)
        .select(
            F.col("label").alias("cluster_id"),
            F.col("doc_id").alias("keeper"),
            F.col("n_tok").alias("keeper_tokens"),
        )
        .join(
            members.groupBy("label").agg(F.count("*").alias("n_members")),
            F.col("cluster_id") == F.col("label"),
        )
        .select("cluster_id", "keeper", "keeper_tokens", "n_members")
    )


Q32_SQL = f"""
WITH RECURSIVE {_Q16_CTES},
q AS (SELECT doc_id, len(str_split(text, ' ')) AS n_tok FROM documents),
members AS (
  SELECT c.label, c.node AS doc_id, q.n_tok FROM comp c JOIN q ON q.doc_id = c.node
),
best AS (
  SELECT label, doc_id, n_tok,
         row_number() OVER (PARTITION BY label ORDER BY n_tok DESC, doc_id ASC) AS rnk
  FROM members
),
counts AS (SELECT label, COUNT(*) AS n_members FROM members GROUP BY label)
SELECT b.label AS cluster_id, b.doc_id AS keeper,
       CAST(b.n_tok AS BIGINT) AS keeper_tokens, c.n_members
FROM best b JOIN counts c USING (label)
WHERE b.rnk = 1
"""


# --------------------------------------------------------------------------
# q33 — domain-level curation stats (RefinedWeb-style): attach a
# deterministic source URL to each doc (identical string algebra both sides),
# extract the host by regex (no parse_url in DuckDB), and roll up per-domain
# document counts + mean quality + a low-quality flag. Domain rollups are
# the unit of web-corpus curation decisions; the agg keys on host so hot
# domains are agg keys, never join keys.
# --------------------------------------------------------------------------

_URL_HOST_RE = "^https?://([^/]+)/"


def q33_domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://site"),
        (F.col("doc_id") % 50).cast("string"),
        F.lit(".example.com/page"),
        F.col("doc_id").cast("string"),
    )
    t = docs.select(
        "doc_id",
        F.regexp_extract(url, _URL_HOST_RE, 1).alias("host"),
        F.size(F.split("text", " ")).cast("long").alias("n_tok"),
        F.size(F.array_distinct(F.split("text", " "))).cast("long").alias("n_dist"),
    )
    return (
        t.groupBy("host")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("sum_tok"),
            ((100 * F.sum("n_dist")) / F.sum("n_tok")).cast("long").alias("ttr_pct"),
        )
        .withColumn(
            "low_quality", (F.col("ttr_pct") < 20).cast("long")
        )
    )


Q33_SQL = """
WITH t AS (
  SELECT doc_id,
         regexp_extract('https://site' || CAST(doc_id % 50 AS VARCHAR)
                        || '.example.com/page' || CAST(doc_id AS VARCHAR),
                        '^https?://([^/]+)/', 1) AS host,
         len(str_split(text, ' ')) AS n_tok,
         len(list_distinct(str_split(text, ' '))) AS n_dist
  FROM documents
)
SELECT host, COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS sum_tok,
       CAST((100 * SUM(n_dist)) // SUM(n_tok) AS BIGINT) AS ttr_pct,
       CAST(CASE WHEN (100 * SUM(n_dist)) // SUM(n_tok) < 20 THEN 1 ELSE 0 END AS BIGINT)
         AS low_quality
FROM t GROUP BY host
"""


# --------------------------------------------------------------------------
# q34 — chunk-level exact dedup (Lee et al., "Deduplicating Training Data
# Makes Language Models Better"): split each document into non-overlapping
# 10-token chunks, md5 them, and report per-document how many of its chunks
# also appear in ANOTHER document — the repeated-substring removal signal at
# paragraph granularity. Scale shape: explode → ONE shuffle on chunk hash
# for the distinct-doc count, join back on the same key (1:1 fan-out — the
# count table has exactly one row per hash, so even a boilerplate chunk
# shared by 10^9 docs adds no row explosion), then the per-doc agg.
# --------------------------------------------------------------------------

_CHUNK_W = 10


def q34_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.split("text", " ").alias("t")).filter(
        F.size("t") >= _CHUNK_W
    )
    chunks = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, size(t) div {_CHUNK_W} - 1),"
                f" i -> md5(array_join(slice(t, i * {_CHUNK_W} + 1, {_CHUNK_W}), ' ')))"
            )
        ).alias("h"),
    )
    nd = chunks.groupBy("h").agg(F.count_distinct("doc_id").alias("nd"))
    return (
        chunks.join(nd, "h")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum((F.col("nd") >= 2).cast("long")).alias("n_dup"),
        )
        .select(
            "doc_id",
            "n_chunks",
            "n_dup",
            F.expr("(100 * n_dup) div n_chunks").alias("dup_pct"),
        )
    )


Q34_SQL = f"""
WITH toks AS (
  SELECT doc_id, str_split(text, ' ') AS t FROM documents
  WHERE len(str_split(text, ' ')) >= {_CHUNK_W}
),
chunks AS (
  SELECT doc_id,
         md5(array_to_string(t[i * {_CHUNK_W} + 1 : i * {_CHUNK_W} + {_CHUNK_W}], ' ')) AS h
  FROM toks, LATERAL (SELECT unnest(generate_series(0, len(t) // {_CHUNK_W} - 1)) AS i) g
),
nd AS (SELECT h, COUNT(DISTINCT doc_id) AS nd FROM chunks GROUP BY h)
SELECT doc_id, COUNT(*) AS n_chunks,
       CAST(SUM(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
       CAST((100 * SUM(CASE WHEN nd >= 2 THEN 1 ELSE 0 END)) // COUNT(*) AS BIGINT) AS dup_pct
FROM chunks c JOIN nd USING (h)
GROUP BY doc_id
"""


# --------------------------------------------------------------------------
# q35 — unigram-LM quality score (the CCNet-style perplexity-filter shape,
# integer-exact): corpus unigram counts → per-token probability in ppm
# ((10⁶·cnt) div total — log-free so both engines agree bit-for-bit; the
# ORDERING of docs by score is what the filter consumes), doc score = mean
# token ppm. Rare-token-heavy (≈ high-perplexity) docs score low. The
# vocabulary is an agg output (Zipf-bounded, ≪ corpus) broadcast back to
# the token stream — hot tokens are agg keys and a broadcast side, never a
# shuffled join key. At 10¹²-token scale the 10⁶·cnt product moves to
# decimal(38,0) (the repo-standard ANSI overflow rule); long is exact here.
# --------------------------------------------------------------------------


def q35_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    # the corpus-total scalar is folded out of the (persisted, vocab-sized)
    # count table — NOT a separate toks.count() corpus scan (ADVICE r4; the
    # q68 no-driver-corpus-scalar pattern). The corpus is tokenized twice
    # (vocab agg + scoring join), never a third time.
    vc = toks.groupBy("tok").agg(F.count("*").alias("cnt")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    total = vc.agg(F.sum("cnt")).collect()[0][0]  # scalar over vocab rows
    vocab = vc.withColumn("ppm", F.expr(f"(1000000 * cnt) div {total}"))
    return (
        toks.join(F.broadcast(vocab), "tok")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_tok"), F.sum("ppm").alias("sum_ppm"))
        .select(
            "doc_id", "n_tok", F.expr("sum_ppm div n_tok").alias("lm_ppm")
        )
    )


Q35_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(str_split(text, ' ')) AS tok FROM documents
),
vocab AS (
  SELECT tok, (1000000 * COUNT(*)) // (SELECT COUNT(*) FROM toks) AS ppm
  FROM toks GROUP BY tok
)
SELECT doc_id, COUNT(*) AS n_tok,
       CAST(CAST(SUM(ppm) AS BIGINT) // COUNT(*) AS BIGINT) AS lm_ppm
FROM toks JOIN vocab USING (tok)
GROUP BY doc_id
"""


# --------------------------------------------------------------------------
# q36 — sequential FUNNEL over the event stream: per user, first view →
# first click strictly after it → first purchase strictly after that (the
# canonical product-analytics ordered-stage operator). Three stage aggs
# chained by equi-joins, ALL keyed on user_id — one partitioning serves the
# whole chain (no windows over the full event set, no per-user sorts of
# unbounded history). Missing stages surface as -1 (engine-portable hash).
# --------------------------------------------------------------------------


def q36_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_type", F.expr(_EV_US_SPARK).alias("us")
    )
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("us").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("us") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("us").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("us") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("us").alias("t_purchase"))
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            "t_view",
            F.coalesce("t_click", F.lit(-1)).alias("t_click"),
            F.coalesce("t_purchase", F.lit(-1)).alias("t_purchase"),
        )
    )


Q36_SQL = f"""
WITH e AS (
  SELECT user_id, event_type, {_EV_US_SQL} AS us FROM events
),
v AS (SELECT user_id, MIN(us) AS t_view FROM e WHERE event_type = 'view' GROUP BY user_id),
c AS (
  SELECT e.user_id, MIN(us) AS t_click
  FROM e JOIN v USING (user_id)
  WHERE event_type = 'click' AND us > t_view
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, MIN(us) AS t_purchase
  FROM e JOIN c USING (user_id)
  WHERE event_type = 'purchase' AND us > t_click
  GROUP BY e.user_id
)
SELECT v.user_id, t_view,
       COALESCE(t_click, -1) AS t_click,
       COALESCE(t_purchase, -1) AS t_purchase
FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
"""


# --------------------------------------------------------------------------
# q37 — retention cohorts: cohort = a user's first active day, activity =
# distinct (user, day); report active-user counts per (cohort_day,
# day_offset) — the standard growth-analytics rollup. Two aggs + one join,
# all keyed on user_id / the tiny (cohort, offset) grid; day arithmetic is
# integer microseconds div 86400·10⁶ (no timezone/session dependence on
# the TIMESTAMP_NTZ column).
# --------------------------------------------------------------------------

_DAY_US = 86_400 * 1_000_000


def q37_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    act = (
        _t(spark, sf_dir, "events")
        .select("user_id", F.expr(f"({_EV_US_SPARK}) div {_DAY_US}").alias("day"))
        .distinct()
    )
    first = act.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        act.join(first, "user_id")
        .select("user_id", "cohort_day", (F.col("day") - F.col("cohort_day")).alias("day_offset"))
        .groupBy("cohort_day", "day_offset")
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


Q37_SQL = f"""
WITH act AS (
  SELECT DISTINCT user_id, {_EV_US_SQL} // {_DAY_US} AS day FROM events
),
first AS (SELECT user_id, MIN(day) AS cohort_day FROM act GROUP BY user_id)
SELECT cohort_day, day - cohort_day AS day_offset, COUNT(DISTINCT act.user_id) AS n_users
FROM act JOIN first USING (user_id)
GROUP BY cohort_day, day - cohort_day
"""


# --------------------------------------------------------------------------
# q38 — semi-structured JSON property rollup: parse the event `props` JSON
# column (get_json_object / json_extract_string — a REAL json parse on both
# engines, not a regex), bucket the numeric property into deciles, and roll
# up counts + value cents per (event_type, decile). Money stays integer:
# cents = floor(value·100 + 0.5) — both engines compute the same IEEE
# double so the floor agrees even at representation edges. Pure
# map + one agg: 0 joins, scale-trivial.
# --------------------------------------------------------------------------


def q38_json_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.select(
            "event_type",
            F.expr("cast(get_json_object(props, '$.k') AS bigint) div 10").alias("k_decile"),
            F.expr("cast(floor(value * 100D + 0.5D) AS bigint)").alias("cents"),
        )
        .groupBy("event_type", "k_decile")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("cents").alias("sum_cents"),
        )
    )


Q38_SQL = """
SELECT event_type,
       CAST(json_extract_string(props, '$.k') AS BIGINT) // 10 AS k_decile,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents
FROM events
GROUP BY event_type, k_decile
"""


# --------------------------------------------------------------------------
# q39 — per-label embedding OUTLIERS: integer centroid per label (the IVF
# fixed-point arithmetic: exact int64 sums, floor(sum/count) — both engines
# compute the identical double division), exact integer squared distance of
# every vector to its own label's centroid, top-2 farthest per label — the
# embedding-space mislabel/contamination probe a curation pipeline runs per
# class. Shape: posexplode → (label, pos) centroid agg → join back on
# (label, pos) → (label, vec_id) agg → one bounded window per label. No
# broadcast needed and no all-pairs anywhere.
# --------------------------------------------------------------------------

_OUTLIER_K = 2


def q39_label_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("label").cast("long").alias("label"), F.expr(_QUANT_EXPR).alias("qv")
    )
    ex = emb.select("vec_id", "label", F.posexplode("qv").alias("pos", "q"))
    cent = ex.groupBy("label", "pos").agg(
        F.expr("cast(floor(cast(sum(q) AS double) / count(*)) AS bigint)").alias("c")
    )
    dist = (
        ex.join(cent, ["label", "pos"])
        .groupBy("label", "vec_id")
        .agg(F.sum((F.col("q") - F.col("c")) * (F.col("q") - F.col("c"))).alias("dist2"))
    )
    rn = F.row_number().over(
        Window.partitionBy("label").orderBy(F.col("dist2").desc(), F.col("vec_id").asc())
    )
    return (
        dist.withColumn("rnk", rn)
        .filter(F.col("rnk") <= _OUTLIER_K)
        .select("label", "vec_id", "dist2", F.col("rnk").cast("long").alias("rnk"))
    )


Q39_SQL = f"""
WITH e AS (
  SELECT vec_id, CAST(label AS BIGINT) AS label,
         list_transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) AS qv
  FROM embeddings
),
ex AS (
  SELECT vec_id, label, g.i AS pos, qv[g.i] AS q
  FROM e, LATERAL (SELECT unnest(generate_series(1, len(qv))) AS i) g
),
cent AS (
  SELECT label, pos, CAST(FLOOR(CAST(SUM(q) AS DOUBLE) / COUNT(*)) AS BIGINT) AS c
  FROM ex GROUP BY label, pos
),
dist AS (
  SELECT ex.label, vec_id, CAST(SUM((q - c) * (q - c)) AS BIGINT) AS dist2
  FROM ex JOIN cent ON cent.label = ex.label AND cent.pos = ex.pos
  GROUP BY ex.label, vec_id
)
SELECT label, vec_id, dist2, rnk FROM (
  SELECT label, vec_id, dist2,
         row_number() OVER (PARTITION BY label ORDER BY dist2 DESC, vec_id ASC) AS rnk
  FROM dist
) q WHERE rnk <= {_OUTLIER_K}
"""


# --------------------------------------------------------------------------
# q40 — context-window CHUNKING with overlap (the RAG/embedding-ingest op):
# each document becomes sliding windows of _CW_W tokens at stride _CW_S,
# with the chunk text and token span emitted per window. Pure per-row
# transform + explode: no joins, no shuffle beyond the final exchange —
# embarrassingly parallel at any corpus size. Window-count algebra is
# integer (ceil via div) so both engines enumerate identical spans.
# --------------------------------------------------------------------------

_CW_W = 32  # window tokens
_CW_S = 24  # stride (8-token overlap)


def q40_context_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.split("text", " ").alias("t"))
    # i_max = ceil(max(n - W, 0) / S); sequence guarded per the ANSI rule
    return toks.select(
        "doc_id",
        F.size("t").alias("n_tok"),
        F.explode(
            F.expr(f"sequence(0, (greatest(size(t) - {_CW_W}, 0) + {_CW_S} - 1) div {_CW_S})")
        ).alias("win_idx"),
        F.col("t"),
    ).select(
        "doc_id",
        F.col("win_idx").cast("long").alias("win_idx"),
        (F.col("win_idx") * _CW_S).cast("long").alias("start_tok"),
        F.least(F.lit(_CW_W), F.col("n_tok") - F.col("win_idx") * _CW_S)
        .cast("long")
        .alias("win_tokens"),
        F.expr(f"array_join(slice(t, win_idx * {_CW_S} + 1, {_CW_W}), ' ')").alias("chunk"),
    )


Q40_SQL = f"""
WITH toks AS (
  SELECT doc_id, str_split(text, ' ') AS t, len(str_split(text, ' ')) AS n_tok
  FROM documents
)
SELECT doc_id,
       CAST(i AS BIGINT) AS win_idx,
       CAST(i * {_CW_S} AS BIGINT) AS start_tok,
       CAST(LEAST({_CW_W}, n_tok - i * {_CW_S}) AS BIGINT) AS win_tokens,
       array_to_string(t[i * {_CW_S} + 1 : i * {_CW_S} + {_CW_W}], ' ') AS chunk
FROM toks, LATERAL (
  SELECT unnest(generate_series(0, (GREATEST(n_tok - {_CW_W}, 0) + {_CW_S} - 1) // {_CW_S})) AS i
) g
"""


# --------------------------------------------------------------------------
# q41 — SEQUENCE PACKING (training-batch construction): pack documents into
# token-budget bins by next-fit in doc_id order — the operator that turns a
# curated corpus into fixed-context training batches. Next-fit is a
# sequential recurrence, so it cannot be a window function; the distributed
# form packs WITHIN bounded groups (doc_id div _PACK_GROUP) via
# applyInPandas — deterministic (group + order are data-defined, no
# partitioning dependence), one shuffle on the group key, per-task work
# bounded by the group size. Global bin id = group · 10⁶ + local bin. The
# DuckDB oracle replays the recurrence with a recursive CTE — the one query
# family whose oracle is an explicit sequential replay.
# --------------------------------------------------------------------------

_PACK_CAP = 512  # bin token budget
_PACK_GROUP = 100  # docs per packing group


def q41_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd  # noqa: F811 — local for the closure

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr(f"doc_id div {_PACK_GROUP}").alias("grp"),
        F.size(F.split("text", " ")).cast("long").alias("n_tok"),
    )

    def pack(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("doc_id")
        bins, fill = [], 0
        b = 0
        first = True
        for n in pdf["n_tok"]:
            n = int(n)
            if not first and fill + n > _PACK_CAP:
                b += 1
                fill = 0
            fill += n
            first = False
            bins.append(b)
        out = pdf[["doc_id", "grp", "n_tok"]].copy()
        out["bin_id"] = [int(pdf["grp"].iloc[0]) * 1_000_000 + x for x in bins]
        return out

    packed = docs.groupBy("grp").applyInPandas(
        pack, "doc_id long, grp long, n_tok long, bin_id long"
    )
    return (
        packed.groupBy("bin_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("bin_tokens"),
            F.min("doc_id").alias("first_doc"),
        )
    )


Q41_SQL = f"""
WITH RECURSIVE d AS (
  SELECT doc_id, doc_id // {_PACK_GROUP} AS grp,
         len(str_split(text, ' ')) AS n_tok,
         row_number() OVER (PARTITION BY doc_id // {_PACK_GROUP} ORDER BY doc_id) AS rn
  FROM documents
),
pack(grp, rn, doc_id, n_tok, bin, fill) AS (
  SELECT grp, rn, doc_id, n_tok, 0, n_tok FROM d WHERE rn = 1
  UNION ALL
  SELECT d.grp, d.rn, d.doc_id, d.n_tok,
         CASE WHEN p.fill + d.n_tok > {_PACK_CAP} THEN p.bin + 1 ELSE p.bin END,
         CASE WHEN p.fill + d.n_tok > {_PACK_CAP} THEN d.n_tok ELSE p.fill + d.n_tok END
  FROM d JOIN pack p ON d.grp = p.grp AND d.rn = p.rn + 1
)
SELECT grp * 1000000 + bin AS bin_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS bin_tokens,
       MIN(doc_id) AS first_doc
FROM pack
GROUP BY grp * 1000000 + bin
"""


# --------------------------------------------------------------------------
# q42 — SemDeDup (semantic dedup over embeddings, Abbas et al. 2023): within
# each IVF cluster, a vector is a semantic duplicate when some LOWER-id
# vector in the same cluster has cosine ≥ τ; keeper = the lowest id. The
# paper ranks by similarity-to-centroid; we rank by vec_id because a float
# centroid ranking is tie-fragile across engines while the id order is
# exact — same keep-one-per-near-dup-group semantics. Reuses the PERSISTED
# IVF index (`_ivf_assigned`), so the marginal cost past the index build is
# one within-bucket pair join + one aggregation: shuffle on bucket only,
# per-bucket work bounded by the two-level split (never a cross-table
# cartesian) — survives 100 TB as written.
# --------------------------------------------------------------------------

_SEM_TAU = 0.30


def q42_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    assigned = _ivf_assigned(spark, sf_dir).select("vec_id", "vn", "bucket")
    j = assigned.alias("a").join(
        assigned.alias("b"),
        (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.vec_id") < F.col("b.vec_id")),
    )
    cos = F.expr("aggregate(zip_with(a.vn, b.vn, (x, y) -> x * y), 0D, (acc, x) -> acc + x)")
    dups = (
        j.filter(cos >= _SEM_TAU)
        .groupBy(F.col("b.vec_id").alias("vec_id"))
        .agg(F.count("*").alias("n_dups_earlier"))
    )
    return (
        assigned.join(dups, "vec_id", "left")
        .select(
            "vec_id",
            F.col("bucket").cast("long").alias("bucket"),
            F.coalesce("n_dups_earlier", F.lit(0)).cast("long").alias("n_dups_earlier"),
            F.when(F.col("n_dups_earlier").isNull(), F.lit(1))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("kept"),
        )
    )


Q42_SQL = f"""
WITH {_IVF_CTES},
dups AS (
  SELECT b.vec_id, COUNT(*) AS nde
  FROM assigned a JOIN assigned b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
  WHERE list_cosine_similarity(a.v, b.v) >= {_SEM_TAU}
  GROUP BY b.vec_id)
SELECT a.vec_id,
       CAST(a.bucket AS BIGINT) AS bucket,
       CAST(COALESCE(d.nde, 0) AS BIGINT) AS n_dups_earlier,
       CAST(CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END AS BIGINT) AS kept
FROM assigned a LEFT JOIN dups d ON d.vec_id = a.vec_id
"""


# --------------------------------------------------------------------------
# Deterministic transcript synthesis — the north-rule input shape
# (conv_id:string, turn_idx:int, role, text, tool) built from `documents`
# with integer-only arithmetic so Spark and DuckDB enumerate the SAME
# table. 8 turns/conv in the agent-loop pattern user → assistant(tool
# call) → tool(result) → assistant(answer), tool name varying per call.
# q43–q45 operate on this table; the pixel/extraction flagship uses the
# richer payload-bearing generator in sources/transcripts.py (not
# SQL-expressible, hence this twin for the relational operators).
# --------------------------------------------------------------------------

_TR_TURNS = 8
_TR_TOOL = (
    "CASE WHEN (doc_id % 8) % 4 IN (1, 2) THEN "
    "CASE (doc_id div 4) % 3 WHEN 0 THEN 'search' WHEN 1 THEN 'code' "
    "ELSE 'browse' END END"
)
_TR_ROLE = (
    "CASE (doc_id % 8) % 4 WHEN 0 THEN 'user' WHEN 2 THEN 'tool' "
    "ELSE 'assistant' END"
)


def _transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "documents").select(
        F.expr(f"'c' || CAST(doc_id div {_TR_TURNS} AS STRING)").alias("conv_id"),
        F.expr(f"CAST(doc_id % {_TR_TURNS} AS INT)").alias("turn_idx"),
        F.expr(_TR_ROLE).alias("role"),
        "text",
        F.expr(_TR_TOOL).alias("tool"),
        "lang",
        "n_chars",
    )


_TR_SQL = f"""tr AS (
  SELECT 'c' || CAST(doc_id // {_TR_TURNS} AS VARCHAR) AS conv_id,
         CAST(doc_id % {_TR_TURNS} AS INTEGER) AS turn_idx,
         CASE (doc_id % 8) % 4 WHEN 0 THEN 'user' WHEN 2 THEN 'tool'
              ELSE 'assistant' END AS role,
         text,
         CASE WHEN (doc_id % 8) % 4 IN (1, 2) THEN
           CASE (doc_id // 4) % 3 WHEN 0 THEN 'search' WHEN 1 THEN 'code'
                ELSE 'browse' END END AS tool,
         lang,
         n_chars
  FROM documents)"""


# --------------------------------------------------------------------------
# q43 — conversation rollup: per-conversation turn/role/tool statistics —
# the first aggregation any transcript corpus audit runs. One shuffle on
# conv_id; conv cardinality ~ corpus/8, no hot keys (conv sizes bounded by
# construction) — scale-safe.
# --------------------------------------------------------------------------


def q43_conv_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    tr = _transcripts(spark, sf_dir)
    return tr.groupBy("conv_id").agg(
        F.count("*").cast("long").alias("n_turns"),
        F.sum(F.when(F.col("role") == "user", 1).otherwise(0)).cast("long").alias("n_user"),
        F.sum(F.when(F.col("role") == "assistant", 1).otherwise(0))
        .cast("long")
        .alias("n_assistant"),
        F.sum(F.when(F.col("role") == "tool", 1).otherwise(0)).cast("long").alias("n_tool_turns"),
        # size(collect_set) not count_distinct: distinct-agg would add an
        # expand + extra exchange; the set is bounded by the 3-tool vocab
        F.size(F.collect_set("tool")).cast("long").alias("n_distinct_tools"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
        F.sum(F.size(F.split("text", " "))).cast("long").alias("sum_tokens"),
    )


Q43_SQL = f"""
WITH {_TR_SQL}
SELECT conv_id,
       COUNT(*) AS n_turns,
       CAST(SUM(CASE WHEN role = 'user' THEN 1 ELSE 0 END) AS BIGINT) AS n_user,
       CAST(SUM(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END) AS BIGINT) AS n_assistant,
       CAST(SUM(CASE WHEN role = 'tool' THEN 1 ELSE 0 END) AS BIGINT) AS n_tool_turns,
       CAST(COUNT(DISTINCT tool) AS BIGINT) AS n_distinct_tools,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       CAST(SUM(len(str_split(text, ' '))) AS BIGINT) AS sum_tokens
FROM tr
GROUP BY conv_id
"""


# --------------------------------------------------------------------------
# q44 — SFT pair assembly: each final-answer assistant turn becomes a
# (prompt, response) training sample whose prompt is the preceding ≤3 turns
# rendered "role: text". ONE window over (conv_id, turn_idx) — the frame is
# bounded (3 rows) so state per key is O(ctx), never whole-conversation;
# shuffle on conv_id only. The canonical transcripts→SFT-dataset operator.
# --------------------------------------------------------------------------

_SFT_CTX = 3


def q44_sft_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    tr = _transcripts(spark, sf_dir).withColumn(
        "line", F.expr("role || ': ' || text")
    )
    w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(-_SFT_CTX, -1)
    )
    return (
        tr.withColumn("ctx", F.collect_list("line").over(w))
        .filter((F.col("role") == "assistant") & (F.col("turn_idx") % 4 == 3))
        .select(
            "conv_id",
            F.col("turn_idx").cast("long").alias("turn_idx"),
            F.size("ctx").cast("long").alias("n_ctx_turns"),
            F.array_join("ctx", "\n").alias("prompt"),
            F.col("text").alias("response"),
        )
    )


Q44_SQL = f"""
WITH {_TR_SQL},
lines AS (
  SELECT conv_id, turn_idx, role, text,
         list(role || ': ' || text)
           OVER (PARTITION BY conv_id ORDER BY turn_idx
                 ROWS BETWEEN {_SFT_CTX} PRECEDING AND 1 PRECEDING) AS ctx
  FROM tr)
SELECT conv_id,
       CAST(turn_idx AS BIGINT) AS turn_idx,
       CAST(len(ctx) AS BIGINT) AS n_ctx_turns,
       array_to_string(ctx, chr(10)) AS prompt,
       text AS response
FROM lines
WHERE role = 'assistant' AND turn_idx % 4 = 3
"""


# --------------------------------------------------------------------------
# q45 — tool-transition matrix: across conversations, how often does tool A
# precede tool B in the same conversation's tool-CALL sequence (plus START
# pseudo-state for a conversation's first call) — the agent-trajectory
# Markov statistics. One lag window on conv_id over the (small) tool-call
# subset, then a global (from, to) count agg — scale-safe.
# --------------------------------------------------------------------------


def q45_tool_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    calls = _transcripts(spark, sf_dir).filter(
        (F.col("tool").isNotNull()) & (F.col("turn_idx") % 4 == 1)
    )
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    return (
        calls.withColumn("from_tool", F.coalesce(F.lag("tool").over(w), F.lit("START")))
        .groupBy(F.col("from_tool"), F.col("tool").alias("to_tool"))
        .agg(
            F.count("*").cast("long").alias("n_transitions"),
            F.count_distinct("conv_id").cast("long").alias("n_convs"),
        )
    )


Q45_SQL = f"""
WITH {_TR_SQL},
calls AS (
  SELECT conv_id, turn_idx, tool,
         COALESCE(lag(tool) OVER (PARTITION BY conv_id ORDER BY turn_idx),
                  'START') AS from_tool
  FROM tr WHERE tool IS NOT NULL AND turn_idx % 4 = 1)
SELECT from_tool, tool AS to_tool,
       COUNT(*) AS n_transitions,
       CAST(COUNT(DISTINCT conv_id) AS BIGINT) AS n_convs
FROM calls
GROUP BY from_tool, tool
"""


# --------------------------------------------------------------------------
# q46 — temperature-mixed sampling: flatten the language distribution with
# α = 0.5 (UNIMAX/mT5-style temperature mixing) — per-language keep rate
# p_l ∝ S·√cnt_l / (Σ√cnt · cnt_l), realized as a deterministic md5 gate.
# All arithmetic is INTEGER (isqrt is exact in IEEE doubles for n ≪ 2^52;
# one trailing integer div) so both engines compute identical ppm rates —
# no float-boundary flakes. Plan: one tiny counts agg broadcast back onto
# the scan + a per-row hash gate — a single small-side join at any scale.
# At 10^12 rows the ppm products need decimal(38) headroom — noted inline.
# --------------------------------------------------------------------------

_MIX_DIV = 3  # target sample = total div 3


def q46_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count("*").alias("cnt"))
    # isqrt via double sqrt is exact for BIGINT counts (see header note)
    counts = counts.withColumn(
        "isq", F.expr("CAST(FLOOR(SQRT(CAST(cnt AS DOUBLE))) AS BIGINT)")
    )
    tot = counts.agg(
        F.sum("cnt").alias("total"), F.sum("isq").alias("sumisq")
    )
    # ppm products: 1e6 · (total/3) · isq — decimal(38,0) at 10^12-row scale;
    # BIGINT suffices at gate scale and keeps the div exact in both engines.
    rates = counts.crossJoin(F.broadcast(tot)).select(
        "lang",
        "cnt",
        F.expr(
            f"least(CAST(1000000 AS BIGINT), "
            f"(1000000 * (total div {_MIX_DIV}) * isq) div (sumisq * cnt))"
        ).alias("p_ppm"),
    )
    gate = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast(
        "long"
    ) % 1000000
    return (
        docs.join(F.broadcast(rates), "lang")
        .withColumn("keep", (gate < F.col("p_ppm")).cast("int"))
        .groupBy("lang")
        .agg(
            F.max("cnt").cast("long").alias("n_total"),
            F.max("p_ppm").cast("long").alias("p_ppm"),
            F.sum("keep").cast("long").alias("n_kept"),
        )
    )


Q46_SQL = f"""
WITH counts AS (
  SELECT lang, COUNT(*) AS cnt,
         CAST(FLOOR(SQRT(CAST(COUNT(*) AS DOUBLE))) AS BIGINT) AS isq
  FROM documents GROUP BY lang),
tot AS (SELECT SUM(cnt) AS total, SUM(isq) AS sumisq FROM counts),
rates AS (
  SELECT lang, cnt,
         LEAST(CAST(1000000 AS BIGINT),
               (1000000 * (total // {_MIX_DIV}) * isq) // (sumisq * cnt)) AS p_ppm
  FROM counts, tot)
SELECT d.lang,
       CAST(MAX(r.cnt) AS BIGINT) AS n_total,
       CAST(MAX(r.p_ppm) AS BIGINT) AS p_ppm,
       CAST(SUM(CASE WHEN ('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT
                          % 1000000 < r.p_ppm THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
FROM documents d JOIN rates r ON r.lang = d.lang
GROUP BY d.lang
"""


# --------------------------------------------------------------------------
# q47 — hard-negative mining (contrastive training-pair construction): for
# each query vector, the highest-cosine IN-BUCKET candidate that is NOT a
# near-duplicate (cos < the q42 τ) — the "hardest negative" a retrieval
# trainer wants. Same probe shape as q15 (broadcast query side against the
# persisted IVF index, one window per query); the near-dup exclusion is a
# filter, not a join. Ids-only output for cross-engine value hashing.
# --------------------------------------------------------------------------


def q47_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    assigned = _ivf_assigned(spark, sf_dir).select("vec_id", "vn", "bucket")
    queries = assigned.filter(F.pmod("vec_id", F.lit(50)) == 0).select(
        F.col("vec_id").alias("query_id"), F.col("vn").alias("qn"), F.col("bucket").alias("qb")
    )
    dot = F.expr("aggregate(zip_with(vn, qn, (x, y) -> x * y), 0D, (acc, x) -> acc + x)")
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        assigned.join(F.broadcast(queries), F.col("bucket") == F.col("qb"))
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("cos", dot)
        .filter(F.col("cos") < _SEM_TAU)  # negatives only: exclude near-dups
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") == 1)
        .select("query_id", F.col("vec_id").alias("negative_id"))
    )


Q47_SQL = f"""
WITH {_IVF_CTES},
q AS (SELECT vec_id AS query_id, v AS qv, bucket AS qb FROM assigned WHERE vec_id % 50 = 0)
SELECT query_id, vec_id AS negative_id FROM (
  SELECT q.query_id, a.vec_id,
         row_number() OVER (PARTITION BY q.query_id
                            ORDER BY list_cosine_similarity(a.v, q.qv) DESC, a.vec_id ASC) AS rank
  FROM assigned a JOIN q ON a.bucket = q.qb
  WHERE a.vec_id <> q.query_id
    AND list_cosine_similarity(a.v, q.qv) < {_SEM_TAU}
) WHERE rank = 1
"""


# --------------------------------------------------------------------------
# q48 — conversation-level near-dup candidates: represent each conversation
# as the SET of its turns' prefix fingerprints (md5 of the lowercased first
# 40 chars — robust to tail edits, the common template-dup signal) and emit
# conversation pairs sharing >=1 fingerprint with an integer-ppm Jaccard.
# Shape: inverted index on fingerprint with a document-frequency cap (hot
# fingerprints — boilerplate turns — are dropped before the self-join, so
# pair fan-out per fingerprint is bounded by the cap, q17's discipline).
# Two shuffles (index build, pair agg); no all-pairs anywhere — scale-safe.
# --------------------------------------------------------------------------

_CONV_FP_CHARS = 40
_CONV_DF_CAP = 32


def q48_conv_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # repartition(conv_id) BEFORE the distinct: hashpartitioning(conv_id)
    # satisfies the (conv_id, fp) dedup's clustering AND the sizes agg below,
    # so one exchange serves both (the old distinct's (conv_id, fp)
    # partitioning served neither and sizes paid a second shuffle).
    fps = (
        _transcripts(spark, sf_dir)
        .select(
            "conv_id",
            F.md5(F.substring(F.lower("text"), 1, _CONV_FP_CHARS)).alias("fp"),
        )
        .repartition("conv_id")
        .distinct()
    )
    # Five consumers (sizes twice, the DF filter, both self-join sides) —
    # persist so the corpus is scanned and fingerprinted ONCE (q17's
    # discipline; MEMORY_AND_DISK spills instead of recomputing).
    fps = fps.persist(StorageLevel.MEMORY_AND_DISK)
    sizes = fps.groupBy("conv_id").agg(F.count("*").alias("sz"))
    # DF-cap as ONE window over fp (the q89 rewrite): identical row set to
    # the old groupBy(fp) + join back, one exchange the self-join reuses.
    capped = (
        fps.withColumn("df", F.count("*").over(Window.partitionBy("fp")))
        .filter(F.col("df") <= _CONV_DF_CAP)
        .select("conv_id", "fp")
    )
    pairs = (
        capped.alias("a")
        .join(capped.alias("b"), "fp")
        .filter(F.col("a.conv_id") < F.col("b.conv_id"))
        .groupBy(
            F.col("a.conv_id").alias("conv_a"), F.col("b.conv_id").alias("conv_b")
        )
        .agg(F.count("*").cast("long").alias("n_common"))
    )
    return (
        pairs.join(sizes.withColumnRenamed("conv_id", "conv_a").withColumnRenamed("sz", "sa"), "conv_a")
        .join(sizes.withColumnRenamed("conv_id", "conv_b").withColumnRenamed("sz", "sb"), "conv_b")
        .select(
            "conv_a",
            "conv_b",
            "n_common",
            F.expr("CAST((1000000 * n_common) div (sa + sb - n_common) AS BIGINT)").alias(
                "jaccard_ppm"
            ),
        )
    )


Q48_SQL = f"""
WITH {_TR_SQL},
fps AS (
  SELECT DISTINCT conv_id,
         md5(substring(lower(text), 1, {_CONV_FP_CHARS})) AS fp
  FROM tr),
sizes AS (SELECT conv_id, COUNT(*) AS sz FROM fps GROUP BY conv_id),
ok AS (SELECT fp FROM fps GROUP BY fp HAVING COUNT(*) <= {_CONV_DF_CAP}),
capped AS (SELECT fps.* FROM fps JOIN ok USING (fp)),
pairs AS (
  SELECT a.conv_id AS conv_a, b.conv_id AS conv_b, COUNT(*) AS n_common
  FROM capped a JOIN capped b ON a.fp = b.fp AND a.conv_id < b.conv_id
  GROUP BY 1, 2)
SELECT conv_a, conv_b, n_common,
       CAST((1000000 * n_common) // (sa.sz + sb.sz - n_common) AS BIGINT) AS jaccard_ppm
FROM pairs
JOIN sizes sa ON sa.conv_id = conv_a
JOIN sizes sb ON sb.conv_id = conv_b
"""


# --------------------------------------------------------------------------
# q49 — longest same-type event run per user (gaps-and-islands RLE): the
# classic sequence-quality signal — a user stuck emitting the same event
# (e.g. 'error') in a row. Island id = row_number over (user) minus
# row_number over (user, type); one shuffle on user_id shared by both
# windows and the island agg. Ordering pinned by (ts, event_id) so equal
# timestamps stay deterministic cross-engine.
# --------------------------------------------------------------------------


def q49_event_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wt = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    runs = (
        ev.withColumn("g", F.row_number().over(w) - F.row_number().over(wt))
        .groupBy("user_id", "event_type", "g")
        .agg(F.count("*").alias("run_len"), F.min("event_id").alias("start_id"))
    )
    wbest = Window.partitionBy("user_id").orderBy(F.desc("run_len"), F.asc("start_id"))
    wall = Window.partitionBy("user_id")
    return (
        runs.withColumn("n_runs", F.count("*").over(wall))
        .withColumn("rk", F.row_number().over(wbest))
        .filter(F.col("rk") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("longest_run_type"),
            F.col("run_len").cast("long").alias("longest_run"),
            F.col("start_id").cast("long").alias("run_start_event"),
            F.col("n_runs").cast("long").alias("n_runs"),
        )
    )


Q49_SQL = """
WITH seq AS (
  SELECT user_id, event_type, event_id,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
       - row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id)
           AS g
  FROM events),
runs AS (
  SELECT user_id, event_type, g, COUNT(*) AS run_len, MIN(event_id) AS start_id
  FROM seq GROUP BY user_id, event_type, g),
best AS (
  SELECT user_id, event_type, run_len, start_id,
         COUNT(*) OVER (PARTITION BY user_id) AS n_runs,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY run_len DESC, start_id ASC) AS rk
  FROM runs)
SELECT user_id, event_type AS longest_run_type,
       CAST(run_len AS BIGINT) AS longest_run,
       CAST(start_id AS BIGINT) AS run_start_event,
       CAST(n_runs AS BIGINT) AS n_runs
FROM best WHERE rk = 1
"""


# --------------------------------------------------------------------------
# q50 — context-budget truncation: keep the longest SUFFIX of each
# conversation whose whitespace-token total fits the window budget — the
# standard "most recent turns that fit" policy before SFT/packing. One
# reverse cumulative-sum window on (conv_id, turn_idx DESC); tokens are
# positive so the cumsum is monotone and the filter is exact. A
# conversation whose final turn alone busts the budget drops out entirely
# (documented; the oracle agrees). One shuffle on conv_id — scale-safe.
# --------------------------------------------------------------------------

_CTX_BUDGET = 256


def q50_context_truncate(spark: SparkSession, sf_dir: str) -> DataFrame:
    tr = _transcripts(spark, sf_dir).withColumn(
        "n_tok", F.size(F.split("text", " "))
    )
    w = (
        Window.partitionBy("conv_id")
        .orderBy(F.desc("turn_idx"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        tr.withColumn("rcum", F.sum("n_tok").over(w))
        .filter(F.col("rcum") <= _CTX_BUDGET)
        .groupBy("conv_id")
        .agg(
            F.count("*").cast("long").alias("n_kept"),
            F.min("turn_idx").cast("long").alias("first_kept_idx"),
            F.sum("n_tok").cast("long").alias("tokens_kept"),
        )
    )


Q50_SQL = f"""
WITH {_TR_SQL},
toks AS (
  SELECT conv_id, turn_idx, len(str_split(text, ' ')) AS n_tok FROM tr),
rcum AS (
  SELECT conv_id, turn_idx, n_tok,
         SUM(n_tok) OVER (PARTITION BY conv_id ORDER BY turn_idx DESC
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS rc
  FROM toks)
SELECT conv_id, COUNT(*) AS n_kept,
       CAST(MIN(turn_idx) AS BIGINT) AS first_kept_idx,
       CAST(SUM(n_tok) AS BIGINT) AS tokens_kept
FROM rcum WHERE rc <= {_CTX_BUDGET}
GROUP BY conv_id
"""


# --------------------------------------------------------------------------
# q51 — preference-pair (DPO) construction: each conversation in the
# 8-turn agent pattern has TWO final-answer assistant turns (idx 3 and 7);
# pair them as (chosen, rejected) by token-count quality with a
# deterministic tiebreak (earlier turn wins ties) — the canonical
# preference-dataset assembly when a grader score is a column. One window
# over a 2-rows-per-conversation subset, then a 2-row pivot agg; single
# shuffle on conv_id — scale-safe at any corpus size.
# --------------------------------------------------------------------------


def q51_dpo_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ans = (
        _transcripts(spark, sf_dir)
        .filter((F.col("role") == "assistant") & (F.col("turn_idx") % 4 == 3))
        .withColumn("n_tok", F.size(F.split("text", " ")))
    )
    w = Window.partitionBy("conv_id").orderBy(F.desc("n_tok"), F.asc("turn_idx"))
    r = ans.withColumn("rk", F.row_number().over(w))
    return r.groupBy("conv_id").agg(
        F.max(F.when(F.col("rk") == 1, F.col("turn_idx"))).cast("long").alias("chosen_turn"),
        F.max(F.when(F.col("rk") == 2, F.col("turn_idx"))).cast("long").alias("rejected_turn"),
        F.max(F.when(F.col("rk") == 1, F.col("n_tok"))).cast("long").alias("chosen_tokens"),
        F.max(F.when(F.col("rk") == 2, F.col("n_tok"))).cast("long").alias("rejected_tokens"),
    )


Q51_SQL = f"""
WITH {_TR_SQL},
ans AS (
  SELECT conv_id, turn_idx, len(str_split(text, ' ')) AS n_tok
  FROM tr WHERE role = 'assistant' AND turn_idx % 4 = 3),
rk AS (
  SELECT conv_id, turn_idx, n_tok,
         row_number() OVER (PARTITION BY conv_id
                            ORDER BY n_tok DESC, turn_idx ASC) AS rk
  FROM ans)
SELECT conv_id,
       CAST(MAX(CASE WHEN rk = 1 THEN turn_idx END) AS BIGINT) AS chosen_turn,
       CAST(MAX(CASE WHEN rk = 2 THEN turn_idx END) AS BIGINT) AS rejected_turn,
       CAST(MAX(CASE WHEN rk = 1 THEN n_tok END) AS BIGINT) AS chosen_tokens,
       CAST(MAX(CASE WHEN rk = 2 THEN n_tok END) AS BIGINT) AS rejected_tokens
FROM rk GROUP BY conv_id
"""


# --------------------------------------------------------------------------
# q52 — rolling range-frame burst detection: per event, how many events the
# same user emitted in the trailing hour (RANGE frame over integer epoch
# micros — events.ts is TIMESTAMP_NTZ, so event time is rebuilt tz-free via
# timestampdiff against a fixed anchor, the repo's NTZ discipline); then
# the per-user max — the rate-limit/abuse signal. RANGE frames include
# timestamp peers regardless of tiebreak order, so the count is
# deterministic without an id tiebreak. One shuffle on user_id.
# --------------------------------------------------------------------------

_BURST_WINDOW_US = 3_600_000_000  # 1 hour


def q52_rolling_burst(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").withColumn(
        "us",
        F.expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '2024-01-01 00:00:00', ts)"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-_BURST_WINDOW_US, 0)
    )
    return (
        ev.withColumn("burst", F.count("*").over(w))
        .groupBy("user_id")
        .agg(
            F.max("burst").cast("long").alias("max_burst_1h"),
            F.count("*").cast("long").alias("n_events"),
        )
    )


Q52_SQL = f"""
WITH us AS (
  SELECT user_id,
         date_diff('microsecond', TIMESTAMP '2024-01-01 00:00:00', ts) AS us
  FROM events),
burst AS (
  SELECT user_id,
         COUNT(*) OVER (PARTITION BY user_id ORDER BY us
                        RANGE BETWEEN {_BURST_WINDOW_US} PRECEDING
                              AND CURRENT ROW) AS b
  FROM us)
SELECT user_id, CAST(MAX(b) AS BIGINT) AS max_burst_1h,
       COUNT(*) AS n_events
FROM burst GROUP BY user_id
"""


# --------------------------------------------------------------------------
# q53 — merge consecutive same-role turns (speaker normalization). Raw
# multi-channel ingest fragments one logical utterance into several
# consecutive turns with the same role; training-data prep re-joins them
# (gaps-and-islands over (conv_id, turn_idx) + ordered concat — the
# transcript twin of q49's event runs). The fragmented ingest is modelled by
# a deterministic role sequence with genuine same-role adjacency
# (((doc_id*3) div 5) % 3 yields mixed island lengths 1-2), since the
# canonical 4-beat agent loop never repeats a role. Two windows + one
# ordered agg, all on conv_id — ONE shuffle, scale-safe (islands are
# intra-conversation, conv sizes bounded by construction).
# --------------------------------------------------------------------------

_Q53_ROLE = (
    "CASE ((doc_id * 3) div 5) % 3 WHEN 0 THEN 'user' "
    "WHEN 1 THEN 'assistant' ELSE 'tool' END"
)


def q53_merge_turns(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = _t(spark, sf_dir, "documents").select(
        F.expr(f"'c' || CAST(doc_id div {_TR_TURNS} AS STRING)").alias("conv_id"),
        F.expr(f"CAST(doc_id % {_TR_TURNS} AS INT)").alias("turn_idx"),
        F.expr(_Q53_ROLE).alias("role"),
        "text",
    )
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    seg = raw.withColumn(
        "chg",
        F.when(F.lag("role").over(w).eqNullSafe(F.col("role")), 0).otherwise(1),
    ).withColumn("seg", F.sum("chg").over(w))
    return seg.groupBy("conv_id", "seg").agg(
        F.min("role").alias("role"),
        F.min("turn_idx").cast("int").alias("first_turn"),
        F.count("*").cast("long").alias("n_merged"),
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(F.collect_list(F.struct("turn_idx", "text"))),
                lambda x: x["text"],
            ),
        ).alias("text"),
    ).select(
        "conv_id",
        (F.col("seg") - 1).cast("long").alias("seg_idx"),
        "role",
        "first_turn",
        "n_merged",
        "text",
    )


Q53_SQL = f"""
WITH raw AS (
  SELECT 'c' || CAST(doc_id // {_TR_TURNS} AS VARCHAR) AS conv_id,
         CAST(doc_id % {_TR_TURNS} AS INTEGER) AS turn_idx,
         CASE ((doc_id * 3) // 5) % 3 WHEN 0 THEN 'user'
              WHEN 1 THEN 'assistant' ELSE 'tool' END AS role,
         text
  FROM documents),
flg AS (
  SELECT *, CASE WHEN lag(role) OVER (PARTITION BY conv_id ORDER BY turn_idx)
                      IS NOT DISTINCT FROM role THEN 0 ELSE 1 END AS chg
  FROM raw),
seg AS (
  SELECT *, SUM(chg) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS seg
  FROM flg)
SELECT conv_id, CAST(seg - 1 AS BIGINT) AS seg_idx, MIN(role) AS role,
       CAST(MIN(turn_idx) AS INTEGER) AS first_turn,
       COUNT(*) AS n_merged,
       string_agg(text, chr(10) ORDER BY turn_idx) AS text
FROM seg GROUP BY conv_id, seg
"""


# --------------------------------------------------------------------------
# q54 — transcript-side decontamination: flag conversations whose assistant
# turns share a verbatim 8-gram with a benchmark/eval document set (the
# "don't train on eval-tainted conversations" gate — q26's twin pointed at
# transcripts instead of the pretraining corpus). The benchmark shingle set
# (docs with doc_id % 97 == 0) is tiny → broadcast; ONE pass over the
# assistant turns; per-conv rollup keeps only tainted conversations. ANSI
# guard: 8-gram transform only fires when size(t) >= 8 (sequence(a,b)
# counts DOWN when a > b — CLAUDE.md gotcha).
# --------------------------------------------------------------------------

_Q54_BENCH_MOD = 97
_Q54_K = 8


def q54_transcript_contam(spark: SparkSession, sf_dir: str) -> DataFrame:
    k = _Q54_K
    sh_expr = (
        f"CASE WHEN size(t) >= {k} THEN transform(sequence(0, size(t) - {k}), "
        f"i -> md5(array_join(slice(t, i + 1, {k}), ' '))) "
        "ELSE cast(array() as array<string>) END"
    )
    bench = (
        _t(spark, sf_dir, "documents")
        .filter(F.expr(f"doc_id % {_Q54_BENCH_MOD} = 0"))
        .select(F.split("text", " ").alias("t"))
        .select(F.explode(F.expr(sh_expr)).alias("h"))
        .distinct()
    )
    tr = _transcripts(spark, sf_dir).filter(F.col("role") == "assistant")
    flagged = (
        tr.select("conv_id", "turn_idx", F.split("text", " ").alias("t"))
        .select("conv_id", "turn_idx", F.explode(F.expr(sh_expr)).alias("h"))
        .join(F.broadcast(bench), "h")
        .select("conv_id", "turn_idx")
        .distinct()
        .groupBy("conv_id")
        .agg(F.count("*").cast("long").alias("n_tainted"))
    )
    rollup = tr.groupBy("conv_id").agg(
        F.count("*").cast("long").alias("n_assistant")
    )
    return flagged.join(rollup, "conv_id").select(
        "conv_id", "n_tainted", "n_assistant"
    )


Q54_SQL = f"""
WITH {_TR_SQL},
bench AS (
  SELECT DISTINCT md5(array_to_string(t[i + 1 : i + {_Q54_K}], ' ')) AS h
  FROM (SELECT t, unnest(range(0, GREATEST(len(t) - {_Q54_K} + 1, 0))) AS i
        FROM (SELECT str_split(text, ' ') AS t FROM documents
              WHERE doc_id % {_Q54_BENCH_MOD} = 0) d0) d),
aturns AS (
  SELECT conv_id, turn_idx, str_split(text, ' ') AS t FROM tr
  WHERE role = 'assistant'),
hits AS (
  SELECT DISTINCT conv_id, turn_idx
  FROM (SELECT conv_id, turn_idx,
               md5(array_to_string(t[i + 1 : i + {_Q54_K}], ' ')) AS h
        FROM (SELECT conv_id, turn_idx, t,
                     unnest(range(0, GREATEST(len(t) - {_Q54_K} + 1, 0))) AS i
              FROM aturns) q) s
  JOIN bench USING (h)),
flagged AS (
  SELECT conv_id, COUNT(*) AS n_tainted FROM hits GROUP BY conv_id),
rollup AS (
  SELECT conv_id, COUNT(*) AS n_assistant FROM aturns GROUP BY conv_id)
SELECT conv_id, n_tainted, n_assistant
FROM flagged JOIN rollup USING (conv_id)
"""


# --------------------------------------------------------------------------
# q55 — count-min-sketch heavy hitters: the fixed-size mergeable frequency
# sketch for 100-TB token streams. d=4 rows × w=1024 buckets; ONE md5 per
# token (60-bit base) + the q08 affine family picks the 4 buckets, so the
# cells table is a plain (r, bucket) groupBy — map-side combinable to
# ≤ 4096 rows per task, ~zero shuffle bytes regardless of corpus size. The
# probe vocabulary (tokens of docs 0-7, bounded) is estimated from the
# sketch (min over the 4 cells) and validated against its exact counts —
# est ≥ exact always; equality unless buckets collide. Both engines derive
# identical cells and estimates (exact decimal/HUGEINT arithmetic).
# --------------------------------------------------------------------------

_CMS_D = 4
_CMS_W = 1024


def _cms_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("tok"))
    )


def _cms_bucket_cols(col: str = "tok") -> list:
    # long-only affine chain (see _mh_affine_long): same values as the old
    # decimal(38,0) multiply/pmod — pmod lands in [0, P) so the % _CMS_W
    # bucket is unchanged; codegen subexpression elimination shares the one
    # md5 base across the 4 rows within the enclosing Project.
    base = f"(cast(conv(substring(md5({col}), 1, 15), 16, 10) as bigint))"
    return [
        F.expr(f"{_mh_affine_long(a, b, base_col=base)} % {_CMS_W}").alias(f"b{r}")
        for r, (a, b) in enumerate(_MH_AB[: _CMS_D])
    ]


def q55_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = _cms_tokens(spark, sf_dir)
    cells = (
        toks.select(*_cms_bucket_cols())
        .select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(r).cast("int").alias("r"),
                            F.col(f"b{r}").alias("bucket"),
                        )
                        for r in range(_CMS_D)
                    ]
                )
            ).alias("cell")
        )
        .select("cell.r", "cell.bucket")
        .groupBy("r", "bucket")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    probe = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 8)
        .select(F.explode(F.split("text", " ")).alias("tok"))
        .distinct()
    )
    est = (
        probe.select("tok", *_cms_bucket_cols())
        .select(
            "tok",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(r).cast("int").alias("r"),
                            F.col(f"b{r}").alias("bucket"),
                        )
                        for r in range(_CMS_D)
                    ]
                )
            ).alias("cell"),
        )
        .select("tok", "cell.r", "cell.bucket")
        .join(F.broadcast(cells), ["r", "bucket"])
        .groupBy("tok")
        .agg(F.min("cnt").alias("est"))
    )
    exact = (
        toks.join(F.broadcast(probe), "tok")
        .groupBy("tok")
        .agg(F.count("*").cast("long").alias("exact"))
    )
    return est.join(exact, "tok").select(
        F.col("tok").alias("token"), "est", "exact"
    )


_CMS_SQL_BUCKETS = ",\n         ".join(
    f"CAST((CAST({a} AS HUGEINT) * base + {b}) % {_MH_P} AS BIGINT) "
    f"% {_CMS_W} AS b{r}"
    for r, (a, b) in enumerate(_MH_AB[: _CMS_D])
)
_CMS_SQL_STACK = "\n  UNION ALL ".join(
    f"SELECT {r} AS r, b{r} AS bucket FROM hb" for r in range(_CMS_D)
)
_CMS_SQL_PROBE_STACK = "\n  UNION ALL ".join(
    f"SELECT tok, {r} AS r, b{r} AS bucket FROM pb" for r in range(_CMS_D)
)

Q55_SQL = f"""
WITH toks AS (
  SELECT unnest(str_split(text, ' ')) AS tok FROM documents),
hb AS (
  SELECT {_CMS_SQL_BUCKETS}
  FROM (SELECT CAST(CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT)
               AS HUGEINT) AS base FROM toks) q),
stacked AS (
  {_CMS_SQL_STACK}),
cells AS (
  SELECT r, bucket, COUNT(*) AS cnt FROM stacked GROUP BY r, bucket),
probe AS (
  SELECT DISTINCT unnest(str_split(text, ' ')) AS tok FROM documents
  WHERE doc_id < 8),
pb AS (
  SELECT tok, {_CMS_SQL_BUCKETS}
  FROM (SELECT tok, CAST(CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT)
               AS HUGEINT) AS base FROM probe) q),
pstack AS (
  {_CMS_SQL_PROBE_STACK}),
est AS (
  SELECT tok, MIN(cnt) AS est FROM pstack JOIN cells USING (r, bucket)
  GROUP BY tok),
ex AS (
  SELECT t.tok, COUNT(*) AS exact FROM toks t JOIN probe p ON t.tok = p.tok
  GROUP BY t.tok)
SELECT est.tok AS token, CAST(est.est AS BIGINT) AS est, exact
FROM est JOIN ex ON est.tok = ex.tok
"""


# --------------------------------------------------------------------------
# q56 — LogLog distinct-count sketch: distinct users per event_type via 64
# max-registers — the fixed-size mergeable alternative to COUNT(DISTINCT)
# whose shuffle is 64 (event_type, register) rows per group instead of one
# row per distinct user. Registers are MAX aggregates (deterministic,
# map-side combinable); rho = 55 - bitlength(h div 64) over the 60-bit md5
# base (v = 0 → rho 54, a 2^-54 quirk identical in both engines). The
# estimate is Durand-Flajolet LogLog with alpha scaled to integer
# (709/1000): est = (709 · m² · 2^55) div (1000 · S) where
# S = Σ 2^(55-M_j) — ALL integer arithmetic (HUGEINT / decimal(38,0)), so
# Spark and DuckDB agree bit-for-bit; exact distinct reported alongside.
# Small-range correction is HLL's linear counting (est < 5m/2 and zero
# registers present → m·ln(m/V)), with the 63 possible m·ln(m/V) values
# precomputed HERE in Python and injected as integer literals into both
# engines — no runtime float, no libm cross-engine drift.
# --------------------------------------------------------------------------

_HLL_M = 64
_HLL_TWO55 = 1 << 55
_HLL_LC_CASE = (
    "CASE n_zero "
    + " ".join(
        f"WHEN {v} THEN {round(_HLL_M * _math.log(_HLL_M / v))}"
        for v in range(1, _HLL_M)
    )
    + " END"
)


def q56_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    h = ev.select(
        "event_type",
        "user_id",
        F.expr(
            "cast(conv(substring(md5(cast(user_id as string)), 1, 15), 16, 10) "
            "as bigint)"
        ).alias("h"),
    )
    regs = (
        h.select(
            "event_type",
            (F.col("h") % _HLL_M).alias("idx"),
            (F.lit(55) - F.length(F.bin(F.expr(f"h div {_HLL_M}")))).alias("rho"),
        )
        .groupBy("event_type", "idx")
        .agg(F.max("rho").alias("m"))
    )
    sketch = regs.groupBy("event_type").agg(
        F.sum(F.expr("shiftleft(cast(1 as bigint), cast(55 - m as int))"))
        .cast("decimal(38,0)")
        .alias("s_present"),
        F.count("*").alias("n_regs"),
    )
    est = (
        sketch.select(
            "event_type",
            F.expr(
                f"cast(cast(709 as decimal(38,0)) * {_HLL_M * _HLL_M} * "
                f"{_HLL_TWO55} div (1000 * (s_present + "
                f"({_HLL_M} - n_regs) * cast({_HLL_TWO55} as decimal(38,0)))) "
                "as bigint)"
            ).alias("raw_est"),
            (F.lit(_HLL_M) - F.col("n_regs")).cast("long").alias("n_zero"),
        )
        .select(
            "event_type",
            F.expr(
                f"cast(CASE WHEN n_zero > 0 AND raw_est < {5 * _HLL_M // 2} "
                f"THEN {_HLL_LC_CASE} ELSE raw_est END as bigint)"
            ).alias("est_distinct"),
            F.col("n_zero").alias("n_zero_regs"),
        )
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("exact_distinct")
    )
    return est.join(exact, "event_type").select(
        "event_type", "est_distinct", "exact_distinct", "n_zero_regs"
    )


Q56_SQL = f"""
WITH h AS (
  SELECT event_type, user_id,
         CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
              AS BIGINT) AS h
  FROM events),
regs AS (
  SELECT event_type, h % {_HLL_M} AS idx,
         MAX(55 - length(bin(h // {_HLL_M}))) AS m
  FROM h GROUP BY event_type, h % {_HLL_M}),
sk AS (
  SELECT event_type,
         SUM(CAST(1::BIGINT << (55 - m) AS HUGEINT)) AS s_present,
         COUNT(*) AS n_regs
  FROM regs GROUP BY event_type),
raw AS (
  SELECT event_type,
         CAST((CAST(709 AS HUGEINT) * {_HLL_M * _HLL_M} * {_HLL_TWO55})
              // (1000 * (s_present +
                  ({_HLL_M} - n_regs) * CAST({_HLL_TWO55} AS HUGEINT)))
              AS BIGINT) AS raw_est,
         CAST({_HLL_M} - n_regs AS BIGINT) AS n_zero
  FROM sk),
est AS (
  SELECT event_type,
         CAST(CASE WHEN n_zero > 0 AND raw_est < {5 * _HLL_M // 2}
              THEN {_HLL_LC_CASE} ELSE raw_est END AS BIGINT) AS est_distinct,
         n_zero AS n_zero_regs
  FROM raw),
ex AS (
  SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct
  FROM events GROUP BY event_type)
SELECT event_type, est_distinct, exact_distinct, n_zero_regs
FROM est JOIN ex USING (event_type)
"""


# --------------------------------------------------------------------------
# q57 — exact discrete percentiles (p50/p90/p99 of event value per type):
# the latency/SLO rollup every event pipeline runs. percentile_disc
# semantics are hand-built from row_number + ceil-rank arithmetic
# ((p·n + 99) div 100) instead of engine builtins, so tie-handling and
# rank selection are bit-identical across Spark and DuckDB (interpolating
# percentile builtins differ; disc builtins differ on ties). ONE exchange:
# the rank window, the count window, and the pivot agg all ride the
# event_type partitioning. At 100 TB the window sort dominates — for a
# true hot path swap in a fixed-width value histogram (the q06 binned-mode
# shape); this operator is the exact-answer variant.
# --------------------------------------------------------------------------

_Q57_PCTS = (50, 90, 99)


def q57_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    wall = Window.partitionBy("event_type")
    ranked = ev.select("event_type", "value", "event_id").withColumn(
        "rn", F.row_number().over(w)
    ).withColumn("n", F.count("*").over(wall))
    aggs = [
        F.max(
            F.when(F.expr(f"rn = ({p} * n + 99) div 100"), F.col("value"))
        ).alias(f"p{p}")
        for p in _Q57_PCTS
    ]
    return ranked.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n_events"), *aggs
    )


Q57_SQL = f"""
WITH ranked AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY value, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM events)
SELECT event_type, CAST(MAX(n) AS BIGINT) AS n_events,
       {", ".join(f"MAX(CASE WHEN rn = ({p} * n + 99) // 100 THEN value END) AS p{p}" for p in _Q57_PCTS)}
FROM ranked GROUP BY event_type
"""


# --------------------------------------------------------------------------
# q58 — incremental near-dup dedup: a NEW ingest batch (doc_id % 10 == 7)
# deduped against the EXISTING corpus's MinHash-LSH band index plus
# itself — the production shape for rolling ingestion, where the corpus is
# never rescanned as text (only its persisted band-signature index, the
# very table q08 builds) and each new doc gets a verdict: 'dup_corpus'
# (shares a band signature with an indexed doc), 'dup_batch' (a lower-id
# batch sibling shares one), or 'new'. Plan shape for 100 TB: the batch is
# the SMALL side — its distinct band keys broadcast against ONE scan of
# the corpus index (left-semi, corpus never shuffled), the (small) match
# set broadcasts back onto the batch, and the intra-batch collision check
# runs on batch-sized data only.
# --------------------------------------------------------------------------

_Q58_BATCH_MOD = 10
_Q58_BATCH_REM = 7


def q58_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    bands = _bands_table(spark, sf_dir)
    is_batch = F.expr(f"doc_id % {_Q58_BATCH_MOD} = {_Q58_BATCH_REM}")
    bb = bands.filter(is_batch).persist(StorageLevel.MEMORY_AND_DISK)
    cb = bands.filter(~is_batch)
    matched = (
        cb.join(
            F.broadcast(bb.select("band", "sig").distinct()),
            ["band", "sig"],
            "left_semi",
        )
        .select("band", "sig")
        .distinct()
        .withColumn("in_c", F.lit(1))
    )
    bmin = bb.groupBy("band", "sig").agg(F.min("doc_id").alias("min_id"))
    return (
        bb.join(F.broadcast(matched), ["band", "sig"], "left_outer")
        .join(F.broadcast(bmin), ["band", "sig"])
        .groupBy("doc_id")
        .agg(
            F.max(F.coalesce(F.col("in_c"), F.lit(0))).alias("hit_c"),
            F.max(F.when(F.col("min_id") < F.col("doc_id"), 1).otherwise(0)).alias(
                "hit_b"
            ),
        )
        .select(
            "doc_id",
            F.when(F.col("hit_c") == 1, F.lit("dup_corpus"))
            .when(F.col("hit_b") == 1, F.lit("dup_batch"))
            .otherwise(F.lit("new"))
            .alias("verdict"),
        )
    )


Q58_SQL = f"""
WITH toks AS (
  SELECT doc_id, str_split(text, ' ') AS t FROM documents
  WHERE len(str_split(text, ' ')) >= 3
),
sh AS (
  SELECT DISTINCT doc_id, t[i + 1] || ' ' || t[i + 2] || ' ' || t[i + 3] AS s
  FROM toks, LATERAL (SELECT unnest(generate_series(0, len(t) - 3)) AS i) g
),
{_MH_SQL_CTES},
bb AS (
  SELECT * FROM bands WHERE doc_id % {_Q58_BATCH_MOD} = {_Q58_BATCH_REM}),
cb AS (
  SELECT * FROM bands WHERE doc_id % {_Q58_BATCH_MOD} != {_Q58_BATCH_REM}),
matched AS (
  SELECT DISTINCT c.band, c.sig FROM cb c
  JOIN (SELECT DISTINCT band, sig FROM bb) p
    ON c.band = p.band AND c.sig = p.sig),
bmin AS (
  SELECT band, sig, MIN(doc_id) AS min_id FROM bb GROUP BY band, sig)
SELECT b.doc_id,
       CASE WHEN MAX(CASE WHEN m.band IS NOT NULL THEN 1 ELSE 0 END) = 1
              THEN 'dup_corpus'
            WHEN MAX(CASE WHEN mn.min_id < b.doc_id THEN 1 ELSE 0 END) = 1
              THEN 'dup_batch'
            ELSE 'new' END AS verdict
FROM bb b
LEFT JOIN matched m ON b.band = m.band AND b.sig = m.sig
JOIN bmin mn ON b.band = mn.band AND b.sig = mn.sig
GROUP BY b.doc_id
"""


# --------------------------------------------------------------------------
# q59 — histogram quantiles: the 100-TB scale path paired with q57's exact
# sort. Values bucket into fixed unit-width bins (a bounded agg that
# map-side combines — the shuffle carries ≤ n_bins rows per group instead
# of every row through a sort), a cumulative window over the tiny bin
# table walks the CDF, and each percentile reports the first bin whose
# cumulative count reaches the q57 rank — so p_hist ∈ [floor(p_exact),
# ceil(p_exact)] by construction (error ≤ the bin width, pinned in tests).
# Integer-only; the same histogram is mergeable across days/partitions.
# --------------------------------------------------------------------------


def q59_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    bins = ev.groupBy(
        "event_type", F.floor("value").cast("long").alias("bin")
    ).agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("event_type").orderBy("bin")
    wall = Window.partitionBy("event_type")
    cum = bins.withColumn("cum", F.sum("cnt").over(w)).withColumn(
        "n", F.sum("cnt").over(wall)
    )
    aggs = [
        F.min(
            F.when(F.expr(f"cum >= ({p} * n + 99) div 100"), F.col("bin"))
        ).alias(f"p{p}_bin")
        for p in _Q57_PCTS
    ]
    return cum.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n_events"), *aggs
    )


Q59_SQL = f"""
WITH bins AS (
  SELECT event_type, CAST(floor(value) AS BIGINT) AS bin, COUNT(*) AS cnt
  FROM events GROUP BY event_type, CAST(floor(value) AS BIGINT)),
cum AS (
  SELECT event_type, bin, cnt,
         SUM(cnt) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
         SUM(cnt) OVER (PARTITION BY event_type) AS n
  FROM bins)
SELECT event_type, CAST(MAX(n) AS BIGINT) AS n_events,
       {", ".join(f"MIN(CASE WHEN cum >= ({p} * n + 99) // 100 THEN bin END) AS p{p}_bin" for p in _Q57_PCTS)}
FROM cum GROUP BY event_type
"""


# --------------------------------------------------------------------------
# q60 — BM25 keyword search top-k (Okapi BM25, k1 = 6/5, b = 3/4): the
# retrieval operator a curation pipeline uses to source topical training
# subsets ("give me the best docs for these query terms"). Integer-exact
# cross-engine: the Okapi per-term score
#   idf · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
# is multiplied through by 10·AV (AV = Σ dl, ND = |docs|, avgdl = AV/ND) so
# with idf_pct = (100·ND) div df (q31's log-free idf) it becomes
#   (1000 · idf_pct · tf · 22 · AV) div (10·AV·tf + 3·AV + 9·dl·ND)
# — pure integer floor-division, Spark decimal(38,0) ≡ DuckDB HUGEINT
# (products overflow int64 at sf0.1; the decimal/HUGEINT pairing is the
# repo's documented pattern). Scale shape: the corpus scan filters to the
# query terms immediately after the explode (everything else is never
# aggregated), df/idf of the handful of terms broadcasts, the query-term
# table broadcasts, and top-k per query is a window over the tiny scored
# table. dl rides the tokenize pass as a carried column — no join back to
# the docs table.
# --------------------------------------------------------------------------

_BM25_TERMS = [
    (1, "join"), (1, "window"),
    (2, "hash"), (2, "scan"), (2, "merge"),
    (3, "stream"), (3, "spark"),
]
_BM25_K = 5


_BM25_MEMO: dict = {}


def _bm25_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_id, doc_id, score, n_terms, dl) BM25-scored candidate table —
    shared by q60 (top-k) and q81 (RRF fusion). Tiny by construction: only
    docs containing a query term survive the post-explode filter. dl rides
    the agg (constant per doc) so fusion re-ranks need no second corpus
    scan."""
    key = (spark.sparkContext.applicationId, sf_dir)
    hit = _BM25_MEMO.get(key)
    if hit is not None:
        return hit
    docs = _t(spark, sf_dir, "documents")
    stats = (
        docs.select(F.size(F.split("text", " ")).alias("dl"))
        .agg(F.sum("dl").alias("av"), F.count("*").alias("nd"))
        .collect()[0]
    )  # two global scalars (one tiny agg), not data
    av, nd = int(stats.av), int(stats.nd)
    terms = sorted({t for _, t in _BM25_TERMS})
    toks = docs.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("dl"),
        F.explode(F.split("text", " ")).alias("tok"),
    ).filter(F.col("tok").isin(terms))
    # persist so the corpus is tokenized ONCE (q17's pattern) — without it
    # the idf branch under the broadcast re-runs the scan+explode.
    tf = toks.groupBy("doc_id", "dl", "tok").agg(F.count("*").alias("tf"))
    tf = tf.persist(StorageLevel.MEMORY_AND_DISK)
    idf = (
        tf.groupBy("tok")
        .agg(F.count("*").alias("df"))
        .withColumn("idf_pct", F.expr(f"(100 * {nd}) div df"))
    )
    qterms = spark.createDataFrame(_BM25_TERMS, "query_id INT, tok STRING")
    scored = (
        tf.join(F.broadcast(idf), "tok")
        .join(F.broadcast(qterms), "tok")
        .withColumn(
            "term_score",
            F.expr(
                f"CAST((CAST(1000 AS DECIMAL(38,0)) * idf_pct * tf * 22 * {av})"
                f" div (CAST(10 AS DECIMAL(38,0)) * {av} * tf + 3 * {av}"
                f" + 9 * dl * {nd}) AS BIGINT)"
            ),
        )
        .groupBy("query_id", "doc_id")
        .agg(
            F.sum("term_score").alias("score"),
            F.count("*").alias("n_terms"),
            F.max("dl").alias("dl"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # memoized per (session, sf_dir): q60 and q81 both consume this scored
    # table; without the memo each re-ran the scalar collect + tf chain
    _memo_put(_BM25_MEMO, key, scored, spark)
    return scored


def q60_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    scored = _bm25_scored(spark, sf_dir)
    rn = F.row_number().over(
        Window.partitionBy("query_id").orderBy(
            F.col("score").desc(), F.col("doc_id").asc()
        )
    )
    return (
        scored.withColumn("rnk", rn)
        .filter(F.col("rnk") <= _BM25_K)
        .select(
            F.col("query_id").cast("long").alias("query_id"),
            "doc_id",
            "score",
            F.col("n_terms").cast("long").alias("n_terms"),
            F.col("rnk").cast("long").alias("rnk"),
        )
    )


_BM25_VALUES = ", ".join(f"({q}, '{t}')" for q, t in _BM25_TERMS)
_BM25_IN = ", ".join(f"'{t}'" for t in sorted({t for _, t in _BM25_TERMS}))

Q60_SQL = f"""
WITH d AS (SELECT doc_id, str_split(text, ' ') AS t FROM documents),
stats AS (SELECT SUM(len(t)) AS av, COUNT(*) AS nd FROM d),
terms(query_id, tok) AS (VALUES {_BM25_VALUES}),
toks AS (SELECT doc_id, len(t) AS dl, unnest(t) AS tok FROM d),
tf AS (
  SELECT doc_id, dl, tok, COUNT(*) AS tf FROM toks
  WHERE tok IN ({_BM25_IN}) GROUP BY doc_id, dl, tok),
idf AS (
  SELECT tok, (100 * (SELECT nd FROM stats)) // COUNT(*) AS idf_pct
  FROM tf GROUP BY tok),
scored AS (
  SELECT q.query_id, f.doc_id,
         CAST(SUM(CAST((CAST(1000 AS HUGEINT) * i.idf_pct * f.tf * 22
                   * (SELECT av FROM stats))
                  // (CAST(10 AS HUGEINT) * (SELECT av FROM stats) * f.tf
                      + 3 * (SELECT av FROM stats)
                      + 9 * f.dl * (SELECT nd FROM stats)) AS BIGINT))
           AS BIGINT) AS score,
         COUNT(*) AS n_terms
  FROM tf f JOIN idf i USING (tok) JOIN terms q USING (tok)
  GROUP BY q.query_id, f.doc_id)
SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, score, n_terms,
       CAST(rnk AS BIGINT) AS rnk
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rnk
  FROM scored) z
WHERE rnk <= {_BM25_K}
"""


# --------------------------------------------------------------------------
# q61 — PMI collocations (pointwise mutual information over consecutive
# token pairs): the collocation-mining signal used to build tokenizer merge
# candidates and phrase vocabularies from a corpus. Log-free integer score:
# PMI orders by P(xy)/(P(x)·P(y)) = (c_xy/B)·T²/(c_x·c_y), so
#   score = (10^6 · c_xy · T · T) div (B · c_x · c_y)
# (T = total tokens, B = total bigrams) is monotone in PMI and bit-identical
# across engines (decimal(38,0) ≡ HUGEINT; T² overflows int64). Scale
# shape: bigram counts are agg keys (map-side combine; no hot join keys),
# the unigram vocabulary aggregate broadcasts back (vocabulary ≪ corpus —
# q31's assumption, documented there), and the global top-k runs as
# orderBy().limit() — Spark's distributed TakeOrdered, each partition
# contributes only its local top-k, no single-partition window over the
# full bigram table.
# --------------------------------------------------------------------------

_PMI_MIN_C = 5
_PMI_K = 20


def q61_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(F.split("text", " ").alias("t"))
    stats = (
        toks.select(F.size("t").alias("n"))
        .agg(
            F.sum("n").alias("t_tok"),
            F.sum(F.greatest(F.col("n") - 1, F.lit(0))).alias("b_tok"),
        )
        .collect()[0]
    )
    t_tok, b_tok = int(stats.t_tok), int(stats.b_tok)
    uni = (
        toks.select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c"))
    )
    bi = (
        toks.select(
            F.explode(
                F.expr(
                    "CASE WHEN size(t) >= 2 THEN transform(sequence(0, size(t) - 2),"
                    " i -> struct(t[i] AS w1, t[i+1] AS w2)) ELSE array() END"
                )
            ).alias("p")
        )
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c_xy"))
        .filter(F.col("c_xy") >= _PMI_MIN_C)
    )
    scored = (
        bi.join(F.broadcast(uni.select(F.col("w").alias("w1"), F.col("c").alias("c_x"))), "w1")
        .join(F.broadcast(uni.select(F.col("w").alias("w2"), F.col("c").alias("c_y"))), "w2")
        .withColumn(
            "score",
            F.expr(
                f"CAST((CAST(1000000 AS DECIMAL(38,0)) * c_xy * {t_tok} * {t_tok})"
                f" div (CAST({b_tok} AS DECIMAL(38,0)) * c_x * c_y) AS BIGINT)"
            ),
        )
    )
    top = scored.orderBy(F.col("score").desc(), "w1", "w2").limit(_PMI_K)
    rn = F.row_number().over(
        Window.orderBy(F.col("score").desc(), "w1", "w2")
    )  # window over ≤ _PMI_K rows (post-limit) — single partition is fine
    return top.withColumn("rnk", rn).select(
        "w1", "w2", "c_xy", "c_x", "c_y", "score", F.col("rnk").cast("long").alias("rnk")
    )


Q61_SQL = f"""
WITH d AS (SELECT str_split(text, ' ') AS t FROM documents),
uc AS (SELECT w, COUNT(*) AS c FROM (SELECT unnest(t) AS w FROM d) u GROUP BY w),
stats AS (
  SELECT SUM(len(t)) AS t_tok,
         SUM(CASE WHEN len(t) >= 1 THEN len(t) - 1 ELSE 0 END) AS b_tok
  FROM d),
bc AS (
  SELECT t[i] AS w1, t[i + 1] AS w2, COUNT(*) AS c_xy
  FROM d, LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i) g
  WHERE len(t) >= 2
  GROUP BY t[i], t[i + 1]
  HAVING COUNT(*) >= {_PMI_MIN_C}),
scored AS (
  SELECT bc.w1, bc.w2, bc.c_xy, u1.c AS c_x, u2.c AS c_y,
         CAST((CAST(1000000 AS HUGEINT) * bc.c_xy * (SELECT t_tok FROM stats)
               * (SELECT t_tok FROM stats))
              // (CAST((SELECT b_tok FROM stats) AS HUGEINT) * u1.c * u2.c)
           AS BIGINT) AS score
  FROM bc JOIN uc u1 ON u1.w = bc.w1 JOIN uc u2 ON u2.w = bc.w2)
SELECT w1, w2, c_xy, c_x, c_y, score, CAST(rnk AS BIGINT) AS rnk FROM (
  SELECT *, row_number() OVER (ORDER BY score DESC, w1, w2) AS rnk FROM scored) z
WHERE rnk <= {_PMI_K}
"""


# --------------------------------------------------------------------------
# q62 — URL canonicalization + canonical-URL dedup (the C4/RefinedWeb URL
# normalization step that runs BEFORE content dedup): lowercase host, fold
# scheme to https (protocol-insensitive dedup policy), strip default ports
# :80/:443, drop the #fragment, drop utm_* tracking params, strip trailing
# path slashes, and sort the surviving query params — then group by the
# canonical URL to pick a keeper. Messy URLs are synthesized
# deterministically from doc_id (4 variants per target: mixed-case
# host+scheme with :443 + utm + fragment / already-clean / http with :80 +
# trailing slash + utm / extra ref param, which must NOT collapse with the
# first three). Identical regex/string algebra on both engines; pure
# per-row map + ONE groupBy on the canonical key — 0 joins, scale-safe at
# any corpus size.
# --------------------------------------------------------------------------


def q62_url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    messy = (
        "CASE CAST(doc_id % 4 AS INT) "
        "WHEN 0 THEN concat('HTTPS://Site', p, '.Example.COM:443/page/', p, "
        "'?utm_source=feed&id=', p, '#sec') "
        "WHEN 1 THEN concat('https://site', p, '.example.com/page/', p, '?id=', p) "
        "WHEN 2 THEN concat('http://site', p, '.example.com:80/page/', p, "
        "'/?id=', p, '&utm_campaign=x') "
        "ELSE concat('https://site', p, '.example.com/page/', p, "
        "'?ref=home&id=', p) END"
    )
    t = docs.select(
        "doc_id",
        F.expr("CAST(doc_id div 4 AS STRING)").alias("p"),
    ).select("doc_id", F.expr(messy).alias("url"))
    host = F.regexp_replace(
        F.lower(F.regexp_extract("url", r"^[a-zA-Z]+://([^/?#]+)", 1)),
        r":(80|443)$",
        "",
    )
    path = F.regexp_replace(
        F.regexp_extract("url", r"^[a-zA-Z]+://[^/?#]+([^?#]*)", 1), r"/+$", ""
    )
    kept = F.expr(
        "array_join(array_sort(filter(split("
        "regexp_extract(url, '\\\\?([^#]*)', 1), '&'),"
        " x -> x != '' AND NOT startswith(x, 'utm_'))), '&')"
    )
    canon = t.select(
        "doc_id",
        F.concat(
            F.lit("https://"),
            host,
            path,
            F.when(kept == "", F.lit("")).otherwise(F.concat(F.lit("?"), kept)),
        ).alias("canon_url"),
    )
    return canon.groupBy("canon_url").agg(
        F.count("*").alias("n_docs"), F.min("doc_id").alias("keeper")
    )


Q62_SQL = """
WITH t AS (
  SELECT doc_id,
         CASE CAST(doc_id % 4 AS INT)
           WHEN 0 THEN 'HTTPS://Site' || p || '.Example.COM:443/page/' || p
                       || '?utm_source=feed&id=' || p || '#sec'
           WHEN 1 THEN 'https://site' || p || '.example.com/page/' || p
                       || '?id=' || p
           WHEN 2 THEN 'http://site' || p || '.example.com:80/page/' || p
                       || '/?id=' || p || '&utm_campaign=x'
           ELSE 'https://site' || p || '.example.com/page/' || p
                || '?ref=home&id=' || p
         END AS url
  FROM (SELECT doc_id, CAST(doc_id // 4 AS VARCHAR) AS p FROM documents) d),
c AS (
  SELECT doc_id,
         'https://'
         || regexp_replace(lower(regexp_extract(url, '^[a-zA-Z]+://([^/?#]+)', 1)),
                           ':(80|443)$', '')
         || regexp_replace(regexp_extract(url, '^[a-zA-Z]+://[^/?#]+([^?#]*)', 1),
                           '/+$', '')
         || CASE WHEN kept = '' THEN '' ELSE '?' || kept END AS canon_url
  FROM (
    SELECT doc_id, url,
           array_to_string(list_sort(list_filter(
             str_split(regexp_extract(url, '\\?([^#]*)', 1), '&'),
             x -> x != '' AND NOT starts_with(x, 'utm_'))), '&') AS kept
    FROM t) q)
SELECT canon_url, COUNT(*) AS n_docs, MIN(doc_id) AS keeper
FROM c GROUP BY canon_url
"""


# --------------------------------------------------------------------------
# q63 — C4-style line-level corpus dedup: every repeated line (fixed
# 5-token segment here — the corpus has no newlines) is dropped EXCEPT its
# globally first occurrence, ordered by (doc_id, position); the surviving
# lines are reassembled in document order and the rebuilt text is hashed.
# This is the op that actually REMOVES boilerplate (q34 only flags it).
# Scale shape: explode → ONE shuffle on the line hash claiming the
# first-occurrence key (min over an encoded (doc_id, seg) bigint — a plain
# min agg, map-side combinable, so a line shared by 10⁹ docs still reduces
# to one row), a 1:1 join back on the same hash key (no fan-out: the claim
# table has one row per hash), and one shuffle on doc_id for the ordered
# rebuild. No windows over the corpus, no sort of the full data.
# --------------------------------------------------------------------------

_LINE_W = 5
_SEG_SHIFT = 1048576  # seg_idx < 2^20 (docs are bounded); key = doc_id·2^20 + seg


def q63_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.split("text", " ").alias("t")).filter(
        F.size("t") >= _LINE_W
    )
    segs = toks.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, size(t) div {_LINE_W} - 1),"
                f" i -> array_join(slice(t, i * {_LINE_W} + 1, {_LINE_W}), ' '))"
            )
        ).alias("seg", "line"),
    ).select(
        "doc_id",
        "seg",
        "line",
        F.md5("line").alias("h"),
        F.expr(f"doc_id * {_SEG_SHIFT} + seg").alias("key"),
    )
    # first-occurrence claim as ONE window over h: min(key) over the hash
    # partition is exactly the old min-agg + join back, without the second
    # run of the segment explode under the join arm.
    marked = segs.withColumn(
        "keep_key", F.min("key").over(Window.partitionBy("h"))
    ).withColumn("kept", (F.col("key") == F.col("keep_key")).cast("long"))
    return marked.groupBy("doc_id").agg(
        F.count("*").alias("n_lines"),
        F.sum("kept").alias("n_kept"),
        F.md5(
            F.expr(
                "array_join(transform(filter(array_sort("
                "collect_list(struct(seg, line, kept))), x -> x.kept = 1),"
                " x -> x.line), ' ')"
            )
        ).alias("text_md5"),
    )


Q63_SQL = f"""
WITH toks AS (
  SELECT doc_id, str_split(text, ' ') AS t FROM documents
  WHERE len(str_split(text, ' ')) >= {_LINE_W}
),
segs AS (
  SELECT doc_id, i AS seg,
         array_to_string(t[i * {_LINE_W} + 1 : i * {_LINE_W} + {_LINE_W}], ' ') AS line,
         doc_id * {_SEG_SHIFT} + i AS key
  FROM toks, LATERAL (SELECT unnest(generate_series(0, len(t) // {_LINE_W} - 1)) AS i) g
),
first AS (SELECT md5(line) AS h, MIN(key) AS keep_key FROM segs GROUP BY md5(line)),
marked AS (
  SELECT s.doc_id, s.seg, s.line,
         CASE WHEN s.key = f.keep_key THEN 1 ELSE 0 END AS kept
  FROM segs s JOIN first f ON md5(s.line) = f.h)
SELECT doc_id, COUNT(*) AS n_lines, CAST(SUM(kept) AS BIGINT) AS n_kept,
       md5(COALESCE(string_agg(CASE WHEN kept = 1 THEN line END, ' ' ORDER BY seg),
                    '')) AS text_md5
FROM marked GROUP BY doc_id
"""


# --------------------------------------------------------------------------
# q64 — bigram-LM quality score with add-one (Laplace) smoothing, the
# KenLM-shaped upgrade of q35's unigram filter: corpus bigram counts
# c(w₁w₂) and context counts c(w₁), vocabulary size V, per-bigram smoothed
# probability in ppm = (10⁶·(c(w₁w₂)+1)) div (c(w₁)+V) — log-free integer
# floor-division so both engines agree bit-for-bit; the doc score is the
# mean bigram ppm (what a perplexity filter ORDERS by). Vocabulary and
# counts are defined over bigram-eligible docs (≥ 2 tokens). Scale shape:
# both count tables are agg outputs (Zipf-bounded ≪ corpus) joined
# small-to-small then BROADCAST back onto the bigram stream — hot bigrams
# are agg keys and a broadcast probe, never a shuffled join key; at
# 10¹²-token scale the 10⁶·cnt product moves to decimal(38,0) per the
# repo's ANSI overflow rule (long is exact at gate scale).
# --------------------------------------------------------------------------


def q64_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    # persisted: consumed by the vocab_n scalar AND the bigram explode —
    # without it the vocab_n count pays a second full tokenize scan
    # (ADVICE r4). q64 is plan-pinned no-BNLJ, so the scalar cannot ride a
    # 1-row crossJoin; a cache-backed count is the bounded alternative.
    toks = (
        docs.select("doc_id", F.split("text", " ").alias("t"))
        .filter(F.size("t") >= 2)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    bg = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, size(t) - 2),"
                " i -> struct(t[i] as w1, concat(t[i], ' ', t[i+1]) as bg))"
            )
        ).alias("b"),
    ).select("doc_id", F.col("b.w1").alias("w1"), F.col("b.bg").alias("bg"))
    bg = bg.persist(StorageLevel.MEMORY_AND_DISK)  # 3 consumers: c12/c1/join
    vocab_n = (
        toks.select(F.explode("t").alias("tok")).select("tok").distinct().count()
    )  # scalar over the CACHED token arrays — no second tokenize scan
    c12 = bg.groupBy("bg").agg(F.count("*").alias("c12"))
    c1 = bg.groupBy("w1").agg(F.count("*").alias("c1"))
    prob = (
        c12.withColumn("w1", F.expr("split(bg, ' ')[0]"))
        .join(c1, "w1")
        .select(
            "bg",
            F.expr(f"(1000000 * (c12 + 1)) div (c1 + {vocab_n})").alias("p_ppm"),
        )
    )
    return (
        bg.join(F.broadcast(prob), "bg")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_bi"), F.sum("p_ppm").alias("sum_ppm"))
        .select("doc_id", "n_bi", F.expr("sum_ppm div n_bi").alias("bigram_ppm"))
    )


Q64_SQL = """
WITH toks AS (
  SELECT doc_id, str_split(text, ' ') AS t FROM documents
  WHERE len(str_split(text, ' ')) >= 2
),
bg AS (
  SELECT doc_id, t[i + 1] AS w1, t[i + 1] || ' ' || t[i + 2] AS bg
  FROM toks, LATERAL (SELECT unnest(generate_series(0, len(t) - 2)) AS i) g
),
v AS (SELECT COUNT(DISTINCT tok) AS vn
      FROM (SELECT unnest(t) AS tok FROM toks) q),
c12 AS (SELECT bg, COUNT(*) AS c12 FROM bg GROUP BY bg),
c1 AS (SELECT w1, COUNT(*) AS c1 FROM bg GROUP BY w1),
prob AS (
  SELECT c12.bg, (1000000 * (c12.c12 + 1)) // (c1.c1 + v.vn) AS p_ppm
  FROM c12 JOIN c1 ON str_split(c12.bg, ' ')[1] = c1.w1, v)
SELECT doc_id, COUNT(*) AS n_bi,
       CAST(SUM(p_ppm) // COUNT(*) AS BIGINT) AS bigram_ppm
FROM bg JOIN prob USING (bg)
GROUP BY doc_id
"""


# --------------------------------------------------------------------------
# q65 — Gini concentration of token mass across sources: the corpus-audit
# op that answers "is my training mix dominated by one crawl domain?".
# Per-source token totals (a plain groupBy — sources are few), then the
# exact rank-formula Gini
#   G = (2·Σ i·xᵢ − (n+1)·Σx) / (n·Σx),  x sorted ascending, i = 1..n
# scaled to ppm with integer floor-division (ties broken by source name so
# the rank is deterministic). Scale shape: ONE map-side-combinable shuffle
# on source; the window and final fold run on the n_sources-row agg output
# (the single-partition window is over a handful of rows by construction).
# --------------------------------------------------------------------------


def q65_source_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    src = docs.groupBy("source").agg(
        F.sum(F.size(F.split("text", " "))).alias("toks")
    )
    w = Window.orderBy("toks", "source")
    ranked = src.withColumn("rn", F.row_number().over(w))
    return ranked.groupBy().agg(
        F.count("*").alias("n_sources"),
        F.sum("toks").alias("total_toks"),
        F.expr(
            "(1000000 * (2 * sum(rn * toks) - (count(*) + 1) * sum(toks)))"
            " div (count(*) * sum(toks))"
        ).alias("gini_ppm"),
    )


Q65_SQL = """
WITH src AS (
  SELECT source, SUM(len(str_split(text, ' '))) AS toks
  FROM documents GROUP BY source),
ranked AS (
  SELECT source, toks, row_number() OVER (ORDER BY toks, source) AS rn FROM src)
SELECT COUNT(*) AS n_sources, CAST(SUM(toks) AS BIGINT) AS total_toks,
       CAST((1000000 * (2 * SUM(rn * toks) - (COUNT(*) + 1) * SUM(toks)))
            // (COUNT(*) * SUM(toks)) AS BIGINT) AS gini_ppm
FROM ranked
"""


# --------------------------------------------------------------------------
# q66 — train/val/test split hygiene: assign every doc a deterministic
# split via the q21 md5 gate (8/1/1), then AUDIT the split for near-dup
# leakage — MinHash-LSH candidate pairs (the q08 band index, reused) whose
# two docs landed in different splits, rolled up per (split_lo, split_hi).
# A leaked val/test twin of a train doc silently inflates eval numbers;
# this is the check a curation pipeline runs before shipping a split.
# Scale shape: the band self-join is the q08 bucketed shape (pairs only
# within a band bucket, never all-pairs), the split gate is a 0-shuffle
# per-row expression, and the rollup output is ≤ 9 rows.
# --------------------------------------------------------------------------


def q66_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    def _split_of(col: "F.Column") -> "F.Column":
        gate = F.conv(
            F.substring(F.md5(col.cast("string")), 1, 4), 16, 10
        ).cast("long") % 10
        return (
            F.when(gate < 8, F.lit("train"))
            .when(gate < 9, F.lit("val"))
            .otherwise(F.lit("test"))
        )

    # candidate pairs come from the shared capped, memoized table (hub
    # star for oversized buckets — see _BAND_CAP); split labels are a pure
    # function of doc_id, so they re-derive from the pair columns.
    pairs = _cand_pairs_table(spark, sf_dir).select(
        F.col("doc_a").alias("lo"),
        F.col("doc_b").alias("hi"),
    ).withColumn("split_lo", _split_of(F.col("lo"))).withColumn(
        "split_hi", _split_of(F.col("hi"))
    )
    return (
        pairs.filter(F.col("split_lo") != F.col("split_hi"))
        .groupBy("split_lo", "split_hi")
        .agg(
            F.count("*").alias("n_pairs"),
            F.count_distinct("lo").alias("n_docs_lo"),
            F.count_distinct("hi").alias("n_docs_hi"),
        )
    )


Q66_SQL = f"""
WITH toks AS (
  SELECT doc_id, str_split(text, ' ') AS t FROM documents
  WHERE len(str_split(text, ' ')) >= 3
),
sh AS (
  SELECT DISTINCT doc_id, t[i + 1] || ' ' || t[i + 2] || ' ' || t[i + 3] AS s
  FROM toks, LATERAL (SELECT unnest(generate_series(0, len(t) - 3)) AS i) g
),
{_MH_SQL_CTES},
{_pairs_sql_cte("cand66")},
pairs AS (
  SELECT doc_a AS lo, doc_b AS hi,
         CASE WHEN ('0x' || substring(md5(CAST(doc_a AS VARCHAR)), 1, 4))::BIGINT
                   % 10 < 8 THEN 'train'
              WHEN ('0x' || substring(md5(CAST(doc_a AS VARCHAR)), 1, 4))::BIGINT
                   % 10 < 9 THEN 'val'
              ELSE 'test' END AS split_lo,
         CASE WHEN ('0x' || substring(md5(CAST(doc_b AS VARCHAR)), 1, 4))::BIGINT
                   % 10 < 8 THEN 'train'
              WHEN ('0x' || substring(md5(CAST(doc_b AS VARCHAR)), 1, 4))::BIGINT
                   % 10 < 9 THEN 'val'
              ELSE 'test' END AS split_hi
  FROM cand66)
SELECT split_lo, split_hi, COUNT(*) AS n_pairs,
       COUNT(DISTINCT lo) AS n_docs_lo, COUNT(DISTINCT hi) AS n_docs_hi
FROM pairs WHERE split_lo != split_hi
GROUP BY split_lo, split_hi
"""


# --------------------------------------------------------------------------
# q67 — training-block construction: concatenate the corpus token stream in
# doc_id order and slice it into fixed 128-token blocks (the GPT-style
# pre-training layout; q41 packs whole docs into bins, q67 SPLITS the
# stream so blocks cross doc boundaries). The global offset of every doc
# is a prefix sum — computed the DISTRIBUTED way: docs bucket by
# doc_id div 64, per-bucket token sums (a tiny table) get cumulative
# offsets via one window over that tiny table, offsets broadcast back, and
# the within-bucket prefix runs partitioned by bucket — NO single-partition
# global window, no global sort, ever (the naive SUM OVER (ORDER BY
# doc_id) collapses 100 TB onto one task; this two-level shape is how a
# prefix sum actually scales). Each doc then explodes over the ≤ n/128+1
# blocks it spans (linear fan-out) and blocks aggregate.
# --------------------------------------------------------------------------

_BLK_TOK = 128
_BLK_BUCKET = 64


def q67_token_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    n = docs.select(
        "doc_id",
        F.expr(f"doc_id div {_BLK_BUCKET}").alias("bkt"),
        F.size(F.split("text", " ")).alias("n"),
    ).filter(F.col("n") >= 1)
    bsum = n.groupBy("bkt").agg(F.sum("n").alias("bn"))
    wb = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    boff = bsum.withColumn("boff", F.coalesce(F.sum("bn").over(wb), F.lit(0))).select(
        "bkt", "boff"
    )
    wd = Window.partitionBy("bkt").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    off = (
        n.join(F.broadcast(boff), "bkt")
        .withColumn("poff", F.coalesce(F.sum("n").over(wd), F.lit(0)))
        .select("doc_id", "n", F.expr("boff + poff").alias("off"))
    )
    spans = off.select(
        "doc_id",
        "n",
        "off",
        F.explode(
            F.expr(f"sequence(off div {_BLK_TOK}, (off + n - 1) div {_BLK_TOK})")
        ).alias("block_id"),
    )
    return spans.groupBy("block_id").agg(
        F.count("*").alias("n_docs"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
        F.sum(
            F.expr(
                f"least(off + n, (block_id + 1) * {_BLK_TOK})"
                f" - greatest(off, block_id * {_BLK_TOK})"
            )
        ).alias("n_toks"),
    )


Q67_SQL = f"""
WITH n AS (
  SELECT doc_id, len(str_split(text, ' ')) AS n FROM documents
  WHERE len(str_split(text, ' ')) >= 1),
off AS (
  SELECT doc_id, n,
         COALESCE(SUM(n) OVER (ORDER BY doc_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING), 0) AS off
  FROM n),
spans AS (
  SELECT doc_id, n, off, b AS block_id
  FROM off, LATERAL (SELECT unnest(generate_series(
         CAST(off // {_BLK_TOK} AS BIGINT),
         CAST((off + n - 1) // {_BLK_TOK} AS BIGINT))) AS b) g)
SELECT block_id, COUNT(*) AS n_docs,
       MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc,
       CAST(SUM(least(off + n, (block_id + 1) * {_BLK_TOK})
                - greatest(off, block_id * {_BLK_TOK})) AS BIGINT) AS n_toks
FROM spans GROUP BY block_id
"""


# --------------------------------------------------------------------------
# q68 — DSIR-style importance weighting (Xie et al. 2023, "Data Selection
# via Importance Resampling"): score every raw doc by how target-like its
# hashed n-gram features are. Features are unigrams hashed into 256
# buckets; the target distribution comes from the en-language subset, the
# raw distribution from the whole corpus; each bucket gets an add-one
# smoothed integer ratio
#   ratio_ppm = (10⁶·(cₜ+1)·(R+256)) div ((c_r+1)·(T+256))
# (> 10⁶ ⇔ the feature is target-enriched) and a doc's weight is the mean
# ratio over its tokens — log-free floor-division so both engines agree
# bit-for-bit; products run in decimal(38,0) ≡ HUGEINT (they overflow
# int64 at corpus scale). Scale shape: BOTH distributions are 256-row agg
# outputs (fixed size at any corpus) joined then broadcast back onto the
# token stream; totals ride the same 256-row table as sums — no driver
# scalars, no second corpus scan, no hot join keys.
# --------------------------------------------------------------------------

_DSIR_B = 256


def q68_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "lang",
        F.explode(F.split("text", " ")).alias("tok"),
    ).withColumn(
        "bkt",
        F.conv(F.substring(F.md5("tok"), 1, 4), 16, 10).cast("long") % _DSIR_B,
    )
    dist = toks.groupBy("bkt").agg(
        F.count("*").alias("cr"),
        F.sum((F.col("lang") == "en").cast("long")).alias("ct"),
    )
    ratio = dist.select(
        "bkt",
        F.expr(
            f"cast(cast(1000000 as decimal(38,0)) * (ct + 1)"
            f" * (sum(cr) over () + {_DSIR_B})"
            f" div ((cr + 1) * (sum(ct) over () + {_DSIR_B})) as bigint)"
        ).alias("ratio_ppm"),
    )
    return (
        toks.join(F.broadcast(ratio), "bkt")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_tok"), F.sum("ratio_ppm").alias("s"))
        .select("doc_id", "n_tok", F.expr("s div n_tok").alias("dsir_ppm"))
    )


Q68_SQL = f"""
WITH toks AS (
  SELECT doc_id, lang,
         ('0x' || substring(md5(tok), 1, 4))::BIGINT % {_DSIR_B} AS bkt
  FROM (SELECT doc_id, lang, unnest(str_split(text, ' ')) AS tok
        FROM documents) q),
dist AS (
  SELECT bkt, COUNT(*) AS cr,
         SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS ct
  FROM toks GROUP BY bkt),
ratio AS (
  SELECT bkt,
         CAST(CAST(1000000 AS HUGEINT) * (ct + 1)
              * (SUM(cr) OVER () + {_DSIR_B})
              // ((cr + 1) * (SUM(ct) OVER () + {_DSIR_B})) AS BIGINT)
           AS ratio_ppm
  FROM dist)
SELECT doc_id, COUNT(*) AS n_tok,
       CAST(SUM(ratio_ppm) // COUNT(*) AS BIGINT) AS dsir_ppm
FROM toks JOIN ratio USING (bkt)
GROUP BY doc_id
"""


# --------------------------------------------------------------------------
# q69 — packed-sequence loss-mask density over TRANSCRIPTS (the axes-A+B
# op): concatenate the turn stream in (conv_id, turn_idx) order — which is
# doc_id order by construction — slice into q67's fixed 128-token training
# blocks, and report each block's assistant-token mass, i.e. the fraction
# of the block a supervised-fine-tune loss would actually train on (blocks
# with ~0 assistant mass are what packing pipelines drop). Same
# DISTRIBUTED two-level prefix sum as q67 (bucket sums → tiny-table window
# → broadcast offsets + within-bucket window); per-turn block overlap is
# the same bounded explode. Integer loss_ppm = 10⁶·a_toks div n_toks.
# --------------------------------------------------------------------------


def q69_block_loss_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    n = docs.select(
        "doc_id",
        F.expr(f"doc_id div {_BLK_BUCKET}").alias("bkt"),
        F.size(F.split("text", " ")).alias("n"),
        F.expr(_TR_ROLE).alias("role"),
    ).filter(F.col("n") >= 1)
    bsum = n.groupBy("bkt").agg(F.sum("n").alias("bn"))
    wb = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    boff = bsum.withColumn("boff", F.coalesce(F.sum("bn").over(wb), F.lit(0))).select(
        "bkt", "boff"
    )
    wd = Window.partitionBy("bkt").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    off = (
        n.join(F.broadcast(boff), "bkt")
        .withColumn("poff", F.coalesce(F.sum("n").over(wd), F.lit(0)))
        .select("doc_id", "n", "role", F.expr("boff + poff").alias("off"))
    )
    spans = off.select(
        "role",
        "off",
        "n",
        F.explode(
            F.expr(f"sequence(off div {_BLK_TOK}, (off + n - 1) div {_BLK_TOK})")
        ).alias("block_id"),
    ).withColumn(
        "ov",
        F.expr(
            f"least(off + n, (block_id + 1) * {_BLK_TOK})"
            f" - greatest(off, block_id * {_BLK_TOK})"
        ),
    )
    return spans.groupBy("block_id").agg(
        F.count("*").alias("n_turns"),
        F.sum("ov").alias("n_toks"),
        F.sum(F.when(F.col("role") == "assistant", F.col("ov")).otherwise(0)).alias(
            "a_toks"
        ),
        F.expr(
            "(1000000 * sum(CASE WHEN role = 'assistant' THEN ov ELSE 0 END))"
            " div sum(ov)"
        ).alias("loss_ppm"),
    )


Q69_SQL = f"""
WITH n AS (
  SELECT doc_id, len(str_split(text, ' ')) AS n,
         CASE (doc_id % 8) % 4 WHEN 0 THEN 'user' WHEN 2 THEN 'tool'
              ELSE 'assistant' END AS role
  FROM documents WHERE len(str_split(text, ' ')) >= 1),
off AS (
  SELECT doc_id, n, role,
         COALESCE(SUM(n) OVER (ORDER BY doc_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING), 0) AS off
  FROM n),
spans AS (
  SELECT role, off, n, b AS block_id,
         least(off + n, (b + 1) * {_BLK_TOK}) - greatest(off, b * {_BLK_TOK}) AS ov
  FROM off, LATERAL (SELECT unnest(generate_series(
         CAST(off // {_BLK_TOK} AS BIGINT),
         CAST((off + n - 1) // {_BLK_TOK} AS BIGINT))) AS b) g)
SELECT block_id, COUNT(*) AS n_turns,
       CAST(SUM(ov) AS BIGINT) AS n_toks,
       CAST(SUM(CASE WHEN role = 'assistant' THEN ov ELSE 0 END) AS BIGINT) AS a_toks,
       CAST((1000000 * SUM(CASE WHEN role = 'assistant' THEN ov ELSE 0 END))
            // SUM(ov) AS BIGINT) AS loss_ppm
FROM spans GROUP BY block_id
"""


# --------------------------------------------------------------------------
# q70 — deterministic epoch shuffle + shard manifest: every doc gets a
# reshuffle-free pseudo-random epoch position — shard = md5(seed‖doc_id)
# high bits mod 16, within-shard order = (md5 key, doc_id) — so any worker
# can recompute any shard's exact read order with no coordination state
# (the property an elastic/restartable training loader needs). The output
# is the shard MANIFEST: doc count, token mass, and an order-SENSITIVE
# checksum Σ rank·doc_id (two shards with the same docs in different
# orders disagree). Scale shape: the within-shard sort IS the op — a
# materialized epoch is written via repartitionByRange(shard, key) +
# sortWithinPartitions (Spark's external range sort); n_shards scales with
# the corpus so a shard stays executor-sized. The rank window here is the
# gate-scale verification twin of that write path.
# --------------------------------------------------------------------------

_EPOCH_SEED = "ep1"
_EPOCH_SHARDS = 16


def q70_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("n"),
        F.md5(F.concat(F.lit(_EPOCH_SEED), F.col("doc_id").cast("string"))).alias(
            "k"
        ),
    ).withColumn(
        "shard",
        F.conv(F.substring("k", 1, 4), 16, 10).cast("long") % _EPOCH_SHARDS,
    )
    w = Window.partitionBy("shard").orderBy("k", "doc_id")
    ranked = keyed.withColumn("rnk", F.row_number().over(w))
    return ranked.groupBy("shard").agg(
        F.count("*").alias("n_docs"),
        F.sum("n").alias("sum_toks"),
        F.sum(F.expr("rnk * doc_id")).alias("order_checksum"),
        F.min("k").alias("first_key"),
    )


Q70_SQL = f"""
WITH keyed AS (
  SELECT doc_id, len(str_split(text, ' ')) AS n,
         md5('{_EPOCH_SEED}' || CAST(doc_id AS VARCHAR)) AS k
  FROM documents),
sharded AS (
  SELECT doc_id, n, k,
         ('0x' || substring(k, 1, 4))::BIGINT % {_EPOCH_SHARDS} AS shard
  FROM keyed),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY shard ORDER BY k, doc_id) AS rnk
  FROM sharded)
SELECT shard, COUNT(*) AS n_docs, CAST(SUM(n) AS BIGINT) AS sum_toks,
       CAST(SUM(rnk * doc_id) AS BIGINT) AS order_checksum,
       MIN(k) AS first_key
FROM ranked GROUP BY shard
"""


# --------------------------------------------------------------------------
# q71 — composite Gopher/C4-style quality-filter VERDICTS: the rule table a
# curation run actually ships — every doc gets a flag per rule plus the
# final keep bit, so downstream can audit WHICH rule drops what (q10 emits
# raw signals; q71 is the decision). Rules, all integer-exact: R1 token
# count in [15, 80]; R2 mean word length in [4.5, 5.0] (9n ≤ 2·chars ∧
# chars ≤ 5n); R3 stopword fraction ≥ 2% (50·stop ≥ n); R4 top-token
# repetition ≤ 12% (25·c_top ≤ 3n). All four rules are per-row
# higher-order-function algebra over the token array — a 0-exchange pure
# JVM map, q25's discipline: nothing to shuffle at any corpus size.
# --------------------------------------------------------------------------


def q71_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    t = docs.select("doc_id", F.split("text", " ").alias("t")).select(
        "doc_id",
        F.size("t").alias("n"),
        F.expr(
            "aggregate(transform(t, x -> length(x)), 0L, (a, x) -> a + x)"
        ).alias("chars"),
        F.expr("size(filter(t, x -> x = 'the' OR x = 'a'))").alias("stop"),
        F.expr(
            "array_max(transform(array_distinct(t),"
            " x -> size(filter(t, y -> y = x))))"
        ).alias("ctop"),
    )
    return t.select(
        "doc_id",
        F.expr("CAST(n BETWEEN 15 AND 80 AS INT)").alias("r_len"),
        F.expr("CAST(9 * n <= 2 * chars AND chars <= 5 * n AS INT)").alias(
            "r_wordlen"
        ),
        F.expr("CAST(50 * stop >= n AS INT)").alias("r_stopword"),
        F.expr("CAST(25 * ctop <= 3 * n AS INT)").alias("r_repetition"),
        F.expr(
            "CAST(n BETWEEN 15 AND 80 AND 9 * n <= 2 * chars AND chars <= 5 * n"
            " AND 50 * stop >= n AND 25 * ctop <= 3 * n AS INT)"
        ).alias("keep"),
    )


Q71_SQL = """
WITH s AS (
  SELECT doc_id, len(t) AS n,
         list_sum(list_transform(t, x -> len(x))) AS chars,
         len(list_filter(t, x -> x IN ('the', 'a'))) AS stop,
         list_max(list_transform(list_distinct(t),
                                 x -> len(list_filter(t, y -> y = x)))) AS ctop
  FROM (SELECT doc_id, str_split(text, ' ') AS t FROM documents) q)
SELECT doc_id,
       CAST(n BETWEEN 15 AND 80 AS INT) AS r_len,
       CAST(9 * n <= 2 * chars AND chars <= 5 * n AS INT) AS r_wordlen,
       CAST(50 * stop >= n AS INT) AS r_stopword,
       CAST(25 * ctop <= 3 * n AS INT) AS r_repetition,
       CAST(n BETWEEN 15 AND 80 AND 9 * n <= 2 * chars AND chars <= 5 * n
            AND 50 * stop >= n AND 25 * ctop <= 3 * n AS INT) AS keep
FROM s
"""


# --------------------------------------------------------------------------
# q72 — corpus snapshot diff: classify every doc across two corpus
# versions as same / changed / removed / added — the SCD-style audit a
# data-versioned lake (Iceberg snapshots) runs between training-set cuts.
# Snapshot B derives deterministically from A (doc_id % 13 == 2 removed,
# % 7 == 1 text-updated, % 17 == 3 re-added under a new id). ONE
# full-outer hash join on doc_id (both sides shuffle once, 1:1 keys — no
# skew possible on a unique key); per-status rollup carries an
# order-insensitive content checksum (sum of 32-bit md5 prefixes) so the
# diff pins WHAT changed, not just how much.
# --------------------------------------------------------------------------

_SNAP_NEW_OFFSET = 1000000


def q72_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    a = docs.select("doc_id", F.md5("text").alias("ha"))
    b_kept = docs.filter(F.expr("doc_id % 13 != 2")).select(
        "doc_id",
        F.md5(
            F.expr("CASE WHEN doc_id % 7 = 1 THEN text || ' upd' ELSE text END")
        ).alias("hb"),
    )
    b_new = docs.filter(F.expr("doc_id % 17 = 3")).select(
        F.expr(f"doc_id + {_SNAP_NEW_OFFSET}").alias("doc_id"),
        F.md5(F.expr("'new ' || text")).alias("hb"),
    )
    b = b_kept.unionByName(b_new)
    j = a.join(b, "doc_id", "full_outer")
    status = (
        F.when(F.col("ha").isNull(), F.lit("added"))
        .when(F.col("hb").isNull(), F.lit("removed"))
        .when(F.col("ha") == F.col("hb"), F.lit("same"))
        .otherwise(F.lit("changed"))
    )
    return j.select(
        status.alias("status"),
        F.expr(
            "cast(conv(substring(coalesce(hb, ha), 1, 8), 16, 10) as bigint)"
        ).alias("hp"),
    ).groupBy("status").agg(
        F.count("*").alias("n_docs"), F.sum("hp").alias("content_checksum")
    )


Q72_SQL = f"""
WITH a AS (SELECT doc_id, md5(text) AS ha FROM documents),
b AS (
  SELECT doc_id,
         md5(CASE WHEN doc_id % 7 = 1 THEN text || ' upd' ELSE text END) AS hb
  FROM documents WHERE doc_id % 13 != 2
  UNION ALL
  SELECT doc_id + {_SNAP_NEW_OFFSET} AS doc_id, md5('new ' || text) AS hb
  FROM documents WHERE doc_id % 17 = 3),
j AS (
  SELECT CASE WHEN a.ha IS NULL THEN 'added'
              WHEN b.hb IS NULL THEN 'removed'
              WHEN a.ha = b.hb THEN 'same'
              ELSE 'changed' END AS status,
         ('0x' || substring(COALESCE(b.hb, a.ha), 1, 8))::BIGINT AS hp
  FROM a FULL OUTER JOIN b USING (doc_id))
SELECT status, COUNT(*) AS n_docs,
       CAST(SUM(hp) AS BIGINT) AS content_checksum
FROM j GROUP BY status
"""


# --------------------------------------------------------------------------
# q73 — dedup-quality audit: measure the LSH pipeline against the exact
# reference instead of trusting it — the "did my dedup actually work"
# operator a curation run ships with its dedup stats. Three pair sets,
# all already computed by this suite and reused via their memos/persists:
# raw band-collision CANDIDATES (the q08 band self-join), VERIFIED pairs
# (q08's output: 3·inter ≥ nₐ+n_b ⟺ J ≥ 1/2), and the EXACT reference
# (q17: true n-gram Jaccard ≥ 20 on DF-capped shingles). Output is one
# audit row: candidate precision (how much band noise the verify step has
# to clean), verified precision, and recall vs the exact set — integer
# percentages, engine-identical. Scale: every input is a bounded pair
# table (banded, never all-pairs); the metric joins are pair-key 1:1.
# --------------------------------------------------------------------------


def q73_dedup_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    cand = _cand_pairs_table(spark, sf_dir)
    # exact feeds three consumers (two probe joins + its own count) and is
    # the expensive arm — persist it once, q17-discipline.
    exact = (
        q17_ngram_jaccard(spark, sf_dir)
        .select("doc_a", "doc_b")
        .withColumn("ex", F.lit(1))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    ver = q08_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    c = cand.join(exact, ["doc_a", "doc_b"], "left").agg(
        F.count("*").alias("n_candidates"),
        F.sum(F.coalesce("ex", F.lit(0))).alias("n_cand_tp"),
    )
    v = ver.join(exact, ["doc_a", "doc_b"], "left").agg(
        F.count("*").alias("n_verified"),
        F.sum(F.coalesce("ex", F.lit(0))).alias("n_ver_tp"),
    )
    e = exact.agg(F.count("*").alias("n_exact"))
    return (
        c.crossJoin(v)
        .crossJoin(e)
        .select(
            "n_candidates",
            "n_verified",
            "n_exact",
            F.expr("(100 * n_cand_tp) div n_candidates").alias(
                "cand_precision_pct"
            ),
            F.expr("(100 * n_ver_tp) div n_verified").alias("ver_precision_pct"),
            F.expr("(100 * n_cand_tp) div n_exact").alias("recall_pct"),
        )
    )


Q73_SQL = f"""
WITH toks AS (
  SELECT doc_id, str_split(text, ' ') AS t FROM documents
  WHERE len(str_split(text, ' ')) >= 3
),
sh AS MATERIALIZED (
  SELECT DISTINCT doc_id, t[i + 1] || ' ' || t[i + 2] || ' ' || t[i + 3] AS s
  FROM toks, LATERAL (SELECT unnest(generate_series(0, len(t) - 3)) AS i) g
),
{_MH_SQL_CTES},
{_pairs_sql_cte("cand", materialized=True)},
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS MATERIALIZED (
  SELECT p.doc_a, p.doc_b, COUNT(*) AS inter
  FROM cand p
  JOIN sh sa ON sa.doc_id = p.doc_a
  JOIN sh sb ON sb.doc_id = p.doc_b AND sb.s = sa.s
  GROUP BY p.doc_a, p.doc_b),
ver AS MATERIALIZED (
  SELECT i.doc_a, i.doc_b FROM inter i
  JOIN sizes na ON na.doc_id = i.doc_a JOIN sizes nb ON nb.doc_id = i.doc_b
  WHERE 3 * i.inter >= na.n + nb.n),
rare AS MATERIALIZED (SELECT s FROM sh GROUP BY s HAVING COUNT(*) <= {_DF_CAP}),
shc AS MATERIALIZED (SELECT sh.doc_id, sh.s FROM sh JOIN rare ON sh.s = rare.s),
csizes AS (SELECT doc_id, COUNT(*) AS n FROM shc GROUP BY doc_id),
cinter AS MATERIALIZED (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
  FROM shc a JOIN shc b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id),
exact AS MATERIALIZED (
  SELECT doc_a, doc_b FROM cinter
  JOIN csizes na ON na.doc_id = doc_a JOIN csizes nb ON nb.doc_id = doc_b
  WHERE (100 * inter) // (na.n + nb.n - inter) >= 20),
m AS (
  SELECT
    (SELECT COUNT(*) FROM cand) AS n_candidates,
    (SELECT COUNT(*) FROM ver) AS n_verified,
    (SELECT COUNT(*) FROM exact) AS n_exact,
    (SELECT COUNT(*) FROM cand JOIN exact USING (doc_a, doc_b)) AS n_cand_tp,
    (SELECT COUNT(*) FROM ver JOIN exact USING (doc_a, doc_b)) AS n_ver_tp)
SELECT n_candidates, n_verified, n_exact,
       CAST((100 * n_cand_tp) // n_candidates AS BIGINT) AS cand_precision_pct,
       CAST((100 * n_ver_tp) // n_verified AS BIGINT) AS ver_precision_pct,
       CAST((100 * n_cand_tp) // n_exact AS BIGINT) AS recall_pct
FROM m
"""


# --------------------------------------------------------------------------
# q74 — the composed curation pipeline (FineWeb/RefinedWeb order): quality
# filter (q71's rules) → MinHash near-dup PURGE on the survivors (q08's
# band+verify chain, larger doc of a verified pair drops) → C4 line dedup
# (q63's first-occurrence claim, docs rebuilt from their kept lines) →
# exact dedup on the REBUILT text (min-doc_id keeper; the safety net for
# post-rebuild collisions) → one funnel row: corpus count after every
# stage + final token mass + an order-insensitive content checksum. The
# capstone proof that the suite's operators COMPOSE into the production
# pipeline — every stage is the already-audited scale shape, chained (at
# sf0.01 the funnel is 500 → 143 → 139 → … — each stage visibly fires).
# The stage counts land in one row via 1-row agg crossJoins (bounded
# BNLJ, q73's documented pattern).
# --------------------------------------------------------------------------


def q74_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    t = docs.select("doc_id", F.split("text", " ").alias("t")).select(
        "doc_id",
        "t",
        F.size("t").alias("n"),
        F.expr(
            "aggregate(transform(t, x -> length(x)), 0L, (a, x) -> a + x)"
        ).alias("chars"),
        F.expr("size(filter(t, x -> x = 'the' OR x = 'a'))").alias("stop"),
        F.expr(
            "array_max(transform(array_distinct(t),"
            " x -> size(filter(t, y -> y = x))))"
        ).alias("ctop"),
    )
    surv = (
        t.filter(
            F.expr(
                "n BETWEEN 15 AND 80 AND 9 * n <= 2 * chars AND chars <= 5 * n"
                " AND 50 * stop >= n AND 25 * ctop <= 3 * n"
            )
        )
        .select("doc_id", "t")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # same shape as _shingles: per-row array_distinct replaces the global
    # DISTINCT (all of a doc's shingles come from one row), and the single
    # exchange carries hashpartitioning(doc_id) for the band min-agg, sizes
    # agg and both intersection-probe arms below
    sh2 = surv.filter(F.size("t") >= 3).select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.expr(
                    "transform(sequence(0, size(t) - 3),"
                    " i -> array_join(slice(t, i + 1, 3), ' '))"
                )
            )
        ).alias("s"),
    ).repartition("doc_id").persist(StorageLevel.MEMORY_AND_DISK)
    # persist: _band_pairs references the band table from FOUR arms (stats,
    # two capped-join sides, hub star) — unpersisted, each arm re-runs the
    # shingle scan + minhash aggregation (measured 2.6s -> 0.9s for the
    # candidate stage at sf0.1). Same discipline as the corpus _bands_table.
    bands2 = _minhash_bands(sh2).persist(StorageLevel.MEMORY_AND_DISK)
    cand = _band_pairs(bands2)
    sizes = sh2.groupBy("doc_id").agg(F.count("*").alias("n"))
    inter = (
        cand.join(sh2.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
        .join(
            sh2.alias("sb"),
            (F.col("doc_b") == F.col("sb.doc_id"))
            & (F.col("sa.s") == F.col("sb.s")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    drops = (
        inter.join(sizes.alias("na"), F.col("doc_a") == F.col("na.doc_id"))
        .join(sizes.alias("nb"), F.col("doc_b") == F.col("nb.doc_id"))
        .filter(F.expr("3 * inter >= na.n + nb.n"))
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    nd = surv.join(drops, "doc_id", "left_anti").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    segs = nd.filter(F.size("t") >= _LINE_W).select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, size(t) div {_LINE_W} - 1),"
                f" i -> array_join(slice(t, i * {_LINE_W} + 1, {_LINE_W}), ' '))"
            )
        ).alias("seg", "line"),
    ).select(
        "doc_id", "seg", "line", F.md5("line").alias("h"),
        F.expr(f"doc_id * {_SEG_SHIFT} + seg").alias("key"),
    )
    # q63's window rewrite: first-occurrence min over the line hash, no
    # join arm re-running the segment explode
    rebuilt = (
        segs.withColumn("keep_key", F.min("key").over(Window.partitionBy("h")))
        .filter(F.col("key") == F.col("keep_key"))
        .groupBy("doc_id")
        .agg(
            F.expr(
                "array_join(transform(array_sort(collect_list(struct(seg, line))),"
                " x -> x.line), ' ')"
            ).alias("rtext")
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    final = (
        rebuilt.withColumn(
            "keeper",
            F.min("doc_id").over(Window.partitionBy(F.md5("rtext"))),
        )
        .filter(F.col("doc_id") == F.col("keeper"))
        .select("doc_id", "rtext")
    )
    a1 = docs.agg(F.count("*").alias("n_input"))
    a2 = surv.agg(F.count("*").alias("n_filtered"))
    a3 = nd.agg(F.count("*").alias("n_neardup"))
    a4 = rebuilt.agg(F.count("*").alias("n_linededup"))
    a5 = final.agg(
        F.count("*").alias("n_final"),
        F.sum(F.size(F.split("rtext", " "))).alias("final_toks"),
        F.sum(
            F.expr("cast(conv(substring(md5(rtext), 1, 8), 16, 10) as bigint)")
        ).alias("content_checksum"),
    )
    return a1.crossJoin(a2).crossJoin(a3).crossJoin(a4).crossJoin(a5)


Q74_SQL = f"""
WITH sig AS MATERIALIZED (
  SELECT doc_id, t, len(t) AS n,
         list_sum(list_transform(t, x -> len(x))) AS chars,
         len(list_filter(t, x -> x IN ('the', 'a'))) AS stop,
         list_max(list_transform(list_distinct(t),
                                 x -> len(list_filter(t, y -> y = x)))) AS ctop
  FROM (SELECT doc_id, str_split(text, ' ') AS t FROM documents) q),
surv AS MATERIALIZED (
  SELECT doc_id, t FROM sig
  WHERE n BETWEEN 15 AND 80 AND 9 * n <= 2 * chars AND chars <= 5 * n
        AND 50 * stop >= n AND 25 * ctop <= 3 * n),
sh AS MATERIALIZED (
  SELECT DISTINCT doc_id, t[i + 1] || ' ' || t[i + 2] || ' ' || t[i + 3] AS s
  FROM surv, LATERAL (SELECT unnest(generate_series(0, len(t) - 3)) AS i) g
  WHERE len(t) >= 3),
{_MH_SQL_CTES},
{_pairs_sql_cte("cand", materialized=True)},
sizes AS MATERIALIZED (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS MATERIALIZED (
  SELECT p.doc_a, p.doc_b, COUNT(*) AS inter
  FROM cand p
  JOIN sh sa ON sa.doc_id = p.doc_a
  JOIN sh sb ON sb.doc_id = p.doc_b AND sb.s = sa.s
  GROUP BY p.doc_a, p.doc_b),
drops AS MATERIALIZED (
  SELECT DISTINCT i.doc_b AS doc_id FROM inter i
  JOIN sizes na ON na.doc_id = i.doc_a JOIN sizes nb ON nb.doc_id = i.doc_b
  WHERE 3 * i.inter >= na.n + nb.n),
nd AS MATERIALIZED (
  SELECT * FROM surv WHERE doc_id NOT IN (SELECT doc_id FROM drops)),
segs AS MATERIALIZED (
  SELECT doc_id, i AS seg,
         array_to_string(t[i * {_LINE_W} + 1 : i * {_LINE_W} + {_LINE_W}], ' ') AS line,
         doc_id * {_SEG_SHIFT} + i AS key
  FROM nd, LATERAL (SELECT unnest(generate_series(0, len(t) // {_LINE_W} - 1)) AS i) g
  WHERE len(t) >= {_LINE_W}),
first AS MATERIALIZED (
  SELECT md5(line) AS h, MIN(key) AS keep_key FROM segs GROUP BY md5(line)),
rebuilt AS MATERIALIZED (
  SELECT s.doc_id, string_agg(s.line, ' ' ORDER BY s.seg) AS rtext
  FROM segs s JOIN first f ON md5(s.line) = f.h AND s.key = f.keep_key
  GROUP BY s.doc_id),
final AS MATERIALIZED (
  SELECT r.doc_id, r.rtext FROM rebuilt r
  JOIN (SELECT md5(rtext) AS hm, MIN(doc_id) AS keeper
        FROM rebuilt GROUP BY md5(rtext)) k
    ON md5(r.rtext) = k.hm AND r.doc_id = k.keeper)
SELECT
  (SELECT COUNT(*) FROM documents) AS n_input,
  (SELECT COUNT(*) FROM surv) AS n_filtered,
  (SELECT COUNT(*) FROM nd) AS n_neardup,
  (SELECT COUNT(*) FROM rebuilt) AS n_linededup,
  (SELECT COUNT(*) FROM final) AS n_final,
  (SELECT CAST(SUM(len(str_split(rtext, ' '))) AS BIGINT) FROM final) AS final_toks,
  (SELECT CAST(SUM(('0x' || substring(md5(rtext), 1, 8))::BIGINT) AS BIGINT)
   FROM final) AS content_checksum
"""


# --------------------------------------------------------------------------
# q75 — PageRank over a deterministic link graph (crawl-frontier / source-
# weighting centrality; Page et al. 1999). Each doc emits 3 out-links whose
# targets are md5-derived over the contiguous doc_id domain (self-loops kept
# so outdeg >= 1 — no dangling mass). Ranks are INTEGER, scaled by 10^12,
# with the exact op order pinned on both engines: contrib = rank div outdeg
# per edge, next = base + (85 * sum_contribs) div 100. K=5 power iterations;
# the oracle unrolls them as 5 plain CTE levels (DuckDB's recursive CTE
# disallows aggregates over the working table). Scale shape: edges and
# nodes persist once; each iteration is ONE groupBy(dst) shuffle — at 100 TB
# the edge table is bucketed by src and ranks co-partition with it, the
# standard distributed-PageRank layout. Complements q16's label propagation
# as the second iterative-join operator.
# --------------------------------------------------------------------------

_PR_SCALE = 10**12
_PR_K = 5
_PR_FANOUT = 3


def q75_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    # bounded scalar (q60/q61 precedent): one count parametrizes the hash
    # modulus and the per-iteration base constant
    n = docs.count()
    base = (15 * _PR_SCALE) // (100 * n)
    init = _PR_SCALE // n
    nodes = docs.select("doc_id").persist(StorageLevel.MEMORY_AND_DISK)
    slots = nodes.select(
        "doc_id", F.explode(F.sequence(F.lit(0), F.lit(_PR_FANOUT - 1))).alias("j")
    )
    edges = (
        slots.select(
            F.col("doc_id").alias("src"),
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.lit("pr"),
                                F.col("doc_id").cast("string"),
                                F.lit("-"),
                                F.col("j").cast("string"),
                            )
                        ),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("long")
                % n
            ).alias("dst"),
        )
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # out-degree as ONE window over src (identical to the old groupBy +
    # join back, minus the join arm re-reading the cached edge table)
    edges_d = edges.withColumn(
        "outdeg", F.count("*").over(Window.partitionBy("src"))
    ).persist(StorageLevel.MEMORY_AND_DISK)
    ranks = nodes.select("doc_id", F.lit(init).cast("long").alias("rank"))
    for _ in range(_PR_K):
        contribs = (
            edges_d.join(ranks, edges_d["src"] == ranks["doc_id"])
            .select("dst", F.expr("rank div outdeg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = nodes.join(
            contribs, nodes["doc_id"] == contribs["dst"], "left"
        ).select(
            "doc_id",
            (F.lit(base) + F.expr("(85 * coalesce(s, 0L)) div 100"))
            .cast("long")
            .alias("rank"),
        )
    return (
        ranks.orderBy(F.desc("rank"), F.asc("doc_id"))
        .limit(20)
        .select(F.col("doc_id").alias("node"), "rank")
    )


def _pr_iter_sql(k: int) -> str:
    prev = f"pr{k - 1}"
    return f"""pr{k} AS MATERIALIZED (
  SELECT n.doc_id,
         CAST((SELECT (15 * {_PR_SCALE}) // (100 * n) FROM nn)
              + (85 * COALESCE(c.s, 0)) // 100 AS BIGINT) AS rank
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS doc_id, CAST(SUM(p.rank // e.outdeg) AS BIGINT) AS s
    FROM {prev} p JOIN edges_d e ON e.src = p.doc_id GROUP BY e.dst) c
  ON c.doc_id = n.doc_id)"""


Q75_SQL = f"""
WITH nn AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
nodes AS MATERIALIZED (SELECT doc_id FROM documents),
edges AS MATERIALIZED (
  SELECT DISTINCT doc_id AS src,
         ('0x' || substring(md5('pr' || CAST(doc_id AS VARCHAR) || '-'
                                 || CAST(j AS VARCHAR)), 1, 8))::BIGINT
           % (SELECT n FROM nn) AS dst
  FROM documents,
       LATERAL (SELECT unnest(generate_series(0, {_PR_FANOUT - 1})) AS j) g),
edges_d AS MATERIALIZED (
  SELECT e.src, e.dst, d.outdeg
  FROM edges e JOIN (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src) d
    ON d.src = e.src),
pr0 AS MATERIALIZED (
  SELECT doc_id,
         CAST((SELECT {_PR_SCALE} // n FROM nn) AS BIGINT) AS rank
  FROM nodes),
{",".join(_pr_iter_sql(k) for k in range(1, _PR_K + 1))}
SELECT doc_id AS node, rank FROM pr{_PR_K}
ORDER BY rank DESC, doc_id ASC LIMIT 20
"""


# --------------------------------------------------------------------------
# q76 — licensed-snippet containment audit (copyright / quote detection).
# Jaccard-thresholded dedup (q08/q17) structurally misses the subset case:
# a short licensed snippet quoted inside a long document has near-zero
# Jaccard and no MinHash band collision (probed: every band-index candidate
# pair in this corpus is an exact-dup, containment-only pairs never band-
# collide). The production op is a CONTAINMENT probe: a snippet blocklist's
# 3-gram shingles joined against the corpus shingle index, grouped per
# (doc, snippet), flagging docs that contain >= 80% of a snippet's
# shingles. The blocklist here is derived deterministically in-query (q25's
# injected-PII discipline): every doc_id % 7 == 3 contributes its tokens
# [5..14] as a 10-token snippet — so each snippet provably matches its
# source (recall floor) plus any near-duplicates of it. Differs from q26
# decontam (binary ANY-hit flag per doc) by per-pair containment scoring.
# Scale shape: the blocklist side is tiny (a fraction of docs x 8
# shingles) so AQE broadcasts it; the memoized corpus shingle table is
# scanned once — same single-pass shape as q26/q54.
# --------------------------------------------------------------------------

def q76_snippet_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    sn_sh = (
        docs.filter((F.col("doc_id") % 7 == 3))
        .select(
            F.col("doc_id").alias("snippet_id"),
            F.expr("slice(split(text, ' '), 5, 10)").alias("st"),
        )
        .filter(F.size("st") >= 10)
        .select(
            "snippet_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(st) - 3),"
                    " i -> array_join(slice(st, i + 1, 3), ' '))"
                )
            ).alias("s"),
        )
        .distinct()
    )
    n_sn = sn_sh.groupBy("snippet_id").agg(F.count("*").alias("n_sn"))
    sh = _shingles_table(spark, sf_dir)
    inter = (
        sn_sh.join(sh, "s")
        .groupBy("snippet_id", "doc_id")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(n_sn, "snippet_id")
        .filter(5 * F.col("inter") >= 4 * F.col("n_sn"))
        .select("snippet_id", "doc_id", "inter", "n_sn")
    )


Q76_SQL = """
WITH sn AS (
  SELECT doc_id AS snippet_id, (str_split(text, ' '))[5:14] AS st
  FROM documents WHERE doc_id % 7 = 3 AND len(str_split(text, ' ')) >= 14
),
sn_sh AS (
  SELECT DISTINCT snippet_id, st[i + 1] || ' ' || st[i + 2] || ' ' || st[i + 3] AS s
  FROM sn, LATERAL (SELECT unnest(generate_series(0, len(st) - 3)) AS i) g
),
n_sn AS (SELECT snippet_id, COUNT(*) AS n_sn FROM sn_sh GROUP BY snippet_id),
toks AS (
  SELECT doc_id, str_split(text, ' ') AS t FROM documents
  WHERE len(str_split(text, ' ')) >= 3
),
sh AS (
  SELECT DISTINCT doc_id, t[i + 1] || ' ' || t[i + 2] || ' ' || t[i + 3] AS s
  FROM toks, LATERAL (SELECT unnest(generate_series(0, len(t) - 3)) AS i) g
),
inter AS (
  SELECT a.snippet_id, b.doc_id, COUNT(*) AS inter
  FROM sn_sh a JOIN sh b ON a.s = b.s
  GROUP BY a.snippet_id, b.doc_id
)
SELECT i.snippet_id, i.doc_id, i.inter, n.n_sn
FROM inter i JOIN n_sn n ON n.snippet_id = i.snippet_id
WHERE 5 * i.inter >= 4 * n.n_sn
"""


# --------------------------------------------------------------------------
# q77 — k-anonymity suppression rollup (privacy-safe corpus reporting).
# Per-(lang, source) stats are only released for groups with >= K members;
# smaller groups collapse into one '__suppressed__' row that still carries
# their aggregate mass, so totals reconcile without exposing small cohorts.
# Two exchanges: the corpus-scale groupBy (map-side combinable) and a
# re-agg over the GROUP-cardinality table (~|lang|x|source| rows — tiny at
# any corpus size, so the second exchange is bounded by construction).
# --------------------------------------------------------------------------

_KANON_K = 5


def q77_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    g = docs.groupBy("lang", "source").agg(
        F.count("*").alias("n"), F.sum("n_chars").alias("chars")
    )
    return (
        g.select(
            F.when(F.col("n") >= _KANON_K, F.col("lang"))
            .otherwise(F.lit("__suppressed__"))
            .alias("lang_out"),
            F.when(F.col("n") >= _KANON_K, F.col("source"))
            .otherwise(F.lit("__suppressed__"))
            .alias("source_out"),
            "n",
            "chars",
        )
        .groupBy("lang_out", "source_out")
        .agg(
            F.sum("n").alias("n_docs"),
            F.sum("chars").alias("sum_chars"),
            F.count("*").alias("n_groups"),
        )
    )


Q77_SQL = f"""
WITH g AS (
  SELECT lang, source, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS chars
  FROM documents GROUP BY lang, source
)
SELECT CASE WHEN n >= {_KANON_K} THEN lang ELSE '__suppressed__' END AS lang_out,
       CASE WHEN n >= {_KANON_K} THEN source ELSE '__suppressed__' END AS source_out,
       CAST(SUM(n) AS BIGINT) AS n_docs,
       CAST(SUM(chars) AS BIGINT) AS sum_chars,
       COUNT(*) AS n_groups
FROM g GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# q78 — bucketed co-located join (the 100-TB metadata-to-vector join). Both
# sides are written ONCE as bucketed+sorted tables (8 buckets on the join
# key via bucketBy/sortBy + saveAsTable) and every subsequent join between
# them is exchange-free AND sort-free: the bucketed scan satisfies the
# sort-merge join's distribution and ordering requirements directly. This
# is the layout a 100-TB embedding store ships with — bucket the fat vector
# table once at write time, then every metadata join for the rest of the
# corpus's life skips the shuffle. Plan pinned exchange-free up to the
# final (tiny, per-label) aggregation by tests/test_plan_shapes.py.
# --------------------------------------------------------------------------

_BUCKETED_MEMO: dict = {}
_N_BUCKETS = 8


def _bucketed_tables(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Write documents + embeddings as bucketed/sorted catalog tables, once
    per (session, sf_dir); returns the two table names. The write is the
    one-time corpus-build cost the co-located join amortizes."""
    key = (spark.sparkContext.applicationId, sf_dir)
    hit = _BUCKETED_MEMO.get(key)
    if hit is not None:
        return hit
    tag = _hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    t_docs, t_emb = f"b_docs_{tag}", f"b_emb_{tag}"
    # a fresh session's in-memory catalog has no record of a previous run's
    # managed table, but its warehouse directory survives on disk — drop
    # both, or saveAsTable fails with LOCATION_ALREADY_EXISTS
    import shutil

    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in (t_docs, t_emb):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        loc = Path(wh) / t
        if loc.exists():
            shutil.rmtree(loc)
    # repartition on the bucket key before writing: bucket hashing and
    # repartition hashing agree (Murmur3), so each task holds exactly its
    # buckets' rows and writes ONE file per bucket — the condition under
    # which Spark trusts the sortBy order and drops the SMJ's sorts
    (
        _t(spark, sf_dir, "documents")
        .select("doc_id", "lang", "source", "n_chars")
        .repartition(_N_BUCKETS, "doc_id")
        .write.bucketBy(_N_BUCKETS, "doc_id")
        .sortBy("doc_id")
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(t_docs)
    )
    (
        _t(spark, sf_dir, "embeddings")
        .select("vec_id", "label")
        .repartition(_N_BUCKETS, "vec_id")
        .write.bucketBy(_N_BUCKETS, "vec_id")
        .sortBy("vec_id")
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(t_emb)
    )
    _BUCKETED_MEMO[key] = (t_docs, t_emb)
    return t_docs, t_emb


def q78_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # since 3.0 Spark only reports a bucketed scan's sortBy order under this
    # flag (the guarantee needs one file per bucket, which _bucketed_tables'
    # pre-write repartition ensures) — with it the SMJ drops its sorts too
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    t_docs, t_emb = _bucketed_tables(spark, sf_dir)
    docs = spark.table(t_docs)
    emb = spark.table(t_emb)
    # merge hint: at gate scale the dim side fits the broadcast threshold
    # and Spark would pick BHJ, hiding the layout this query exists to
    # prove; at 100 TB both sides exceed it and SMJ is automatic. The hint
    # makes the gate-scale plan match the at-scale plan: bucketed scans
    # satisfy the SMJ's distribution AND ordering, so it runs with zero
    # exchanges and zero sorts (pinned in tests/test_plan_shapes.py).
    joined = docs.hint("merge").join(emb, docs["doc_id"] == emb["vec_id"])
    return joined.groupBy("label").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
        F.min("doc_id").alias("min_doc"),
    )


Q78_SQL = """
SELECT e.label, COUNT(*) AS n_docs,
       CAST(SUM(d.n_chars) AS BIGINT) AS sum_chars,
       MIN(d.doc_id) AS min_doc
FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
GROUP BY e.label
"""


# --------------------------------------------------------------------------
# q79 — n-gram novelty score (data valuation / contribution scoring). For
# each doc: the fraction of its distinct 3-gram shingles whose FIRST
# corpus occurrence (min doc_id) is this doc — a doc that mostly repeats
# already-seen n-grams scores low and is a downsampling candidate; the
# per-doc novelty mass is the standard cheap proxy for marginal training
# value (the dedup-aware cousin of DSIR's importance weights, q68).
# Integer ppm so Spark ≡ DuckDB exactly. Scale shape: one map-side-
# combinable min-agg on the shingle key over the memoized shingle table,
# one join back on s (both sides cluster on s — the agg's shuffle is
# reused), one per-doc agg. No all-pairs anything.
# --------------------------------------------------------------------------

def q79_novelty_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = _shingles_table(spark, sf_dir)
    fo = sh.groupBy("s").agg(F.min("doc_id").alias("first_doc"))
    return (
        sh.join(fo, "s")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(
                F.when(F.col("doc_id") == F.col("first_doc"), 1).otherwise(0)
            ).alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_novel",
            F.expr("(1000000 * n_novel) div n_shingles").alias("novelty_ppm"),
        )
    )


Q79_SQL = """
WITH toks AS (
  SELECT doc_id, str_split(text, ' ') AS t FROM documents
  WHERE len(str_split(text, ' ')) >= 3
),
sh AS (
  SELECT DISTINCT doc_id, t[i + 1] || ' ' || t[i + 2] || ' ' || t[i + 3] AS s
  FROM toks, LATERAL (SELECT unnest(generate_series(0, len(t) - 3)) AS i) g
),
fo AS (SELECT s, MIN(doc_id) AS first_doc FROM sh GROUP BY s)
SELECT sh.doc_id,
       COUNT(*) AS n_shingles,
       CAST(SUM(CASE WHEN sh.doc_id = fo.first_doc THEN 1 ELSE 0 END) AS BIGINT)
         AS n_novel,
       CAST((1000000 * SUM(CASE WHEN sh.doc_id = fo.first_doc THEN 1 ELSE 0 END))
            // COUNT(*) AS BIGINT) AS novelty_ppm
FROM sh JOIN fo ON fo.s = sh.s
GROUP BY sh.doc_id
"""


# --------------------------------------------------------------------------
# q81 — reciprocal-rank fusion (RRF) hybrid re-ranking: the standard
# retrieve-then-fuse step a curation/retrieval pipeline uses to combine
# heterogeneous rankings (Cormack et al.'s rrf = Σ 1/(k + rank), k = 60).
# Here: the BM25 ranking (q60's scored table) fused with a length-prior
# ranking (dl desc) computed WITHIN each query's top-20 candidate pool —
# retrieve-then-re-rank, so no second ranking ever touches the corpus.
# Integer-exact: 10^6 div (60 + rank) summed over the two rankings.
# Scale shape: the corpus appears only in _bm25_scored's post-explode
# term filter; all three windows partition by query_id over ≤ 20-row
# pools and share ONE hash partitioning (no extra exchange between
# ranking, fusion, and final top-k).
# --------------------------------------------------------------------------

_RRF_POOL = 20  # BM25 candidate pool per query
_RRF_C = 60  # the standard RRF dampening constant
_RRF_K = 5  # fused results per query


def q81_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    scored = _bm25_scored(spark, sf_dir)
    w_bm = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    cand = scored.withColumn("rnk_bm25", F.row_number().over(w_bm)).filter(
        F.col("rnk_bm25") <= _RRF_POOL
    )
    w_dl = Window.partitionBy("query_id").orderBy(
        F.col("dl").desc(), F.col("doc_id").asc()
    )
    fused = cand.withColumn("rnk_dl", F.row_number().over(w_dl)).withColumn(
        "rrf",
        F.expr(
            f"(1000000 div ({_RRF_C} + rnk_bm25))"
            f" + (1000000 div ({_RRF_C} + rnk_dl))"
        ),
    )
    w_f = Window.partitionBy("query_id").orderBy(
        F.col("rrf").desc(), F.col("doc_id").asc()
    )
    return (
        fused.withColumn("fused_rank", F.row_number().over(w_f))
        .filter(F.col("fused_rank") <= _RRF_K)
        .select(
            F.col("query_id").cast("long").alias("query_id"),
            "doc_id",
            F.col("rrf").cast("long").alias("rrf_score"),
            F.col("rnk_bm25").cast("long").alias("rnk_bm25"),
            F.col("rnk_dl").cast("long").alias("rnk_dl"),
            F.col("fused_rank").cast("long").alias("fused_rank"),
        )
    )


Q81_SQL = f"""
WITH d AS (SELECT doc_id, str_split(text, ' ') AS t FROM documents),
stats AS (SELECT SUM(len(t)) AS av, COUNT(*) AS nd FROM d),
terms(query_id, tok) AS (VALUES {_BM25_VALUES}),
toks AS (SELECT doc_id, len(t) AS dl, unnest(t) AS tok FROM d),
tf AS (
  SELECT doc_id, dl, tok, COUNT(*) AS tf FROM toks
  WHERE tok IN ({_BM25_IN}) GROUP BY doc_id, dl, tok),
idf AS (
  SELECT tok, (100 * (SELECT nd FROM stats)) // COUNT(*) AS idf_pct
  FROM tf GROUP BY tok),
scored AS (
  SELECT q.query_id, f.doc_id,
         CAST(SUM(CAST((CAST(1000 AS HUGEINT) * i.idf_pct * f.tf * 22
                   * (SELECT av FROM stats))
                  // (CAST(10 AS HUGEINT) * (SELECT av FROM stats) * f.tf
                      + 3 * (SELECT av FROM stats)
                      + 9 * f.dl * (SELECT nd FROM stats)) AS BIGINT))
           AS BIGINT) AS score,
         MAX(f.dl) AS dl
  FROM tf f JOIN idf i USING (tok) JOIN terms q USING (tok)
  GROUP BY q.query_id, f.doc_id),
cand AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rnk_bm25
    FROM scored) z
  WHERE rnk_bm25 <= {_RRF_POOL}),
fused AS (
  SELECT *, 1000000 // ({_RRF_C} + rnk_bm25)
            + 1000000 // ({_RRF_C} + rnk_dl) AS rrf
  FROM (
    SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY dl DESC, doc_id ASC) AS rnk_dl
    FROM cand) z)
SELECT CAST(query_id AS BIGINT) AS query_id, doc_id,
       CAST(rrf AS BIGINT) AS rrf_score,
       CAST(rnk_bm25 AS BIGINT) AS rnk_bm25,
       CAST(rnk_dl AS BIGINT) AS rnk_dl,
       CAST(fused_rank AS BIGINT) AS fused_rank
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY rrf DESC, doc_id ASC) AS fused_rank
  FROM fused) z
WHERE fused_rank <= {_RRF_K}
"""


# --------------------------------------------------------------------------
# q82 — BPE merge induction (Sennrich et al. tokenizer training): K = 3
# unrolled merge iterations over the word-frequency vocabulary. The
# classic algorithm runs on the DISTINCT-WORD table, not the corpus: one
# corpus-scale map-side-combinable word-count agg, then every iteration
# touches only the vocabulary (≪ corpus — q31's assumption). Per step:
# weighted adjacent-pair counts over each word's symbol string, global
# top-1 by (count DESC, pair ASC) via orderBy().limit(1) (distributed
# TakeOrdered, no single-partition window), merge applied as a broadcast
# 1-row crossJoin (the documented bounded-BNLJ combine) + string replace.
# Symbol strings join symbols with TWO spaces and pad one space per end at
# replace time, so each match consumes one space from each neighbouring
# separator and the replacement restores it — adjacent occurrences
# ("a b a b") merge in one pass and a symbol can never match inside a
# longer symbol. Merge order is the greedy non-overlapping left-to-right
# variant ("a a a" → "aa a"), identical on both engines (verified:
# replace() scans the original string left-to-right in both). Each output
# row carries token_mass = Σ freq·|symbols| AFTER the merge — a
# full-vocabulary checksum that every word's repr was rewritten
# correctly, not just the winning pair. Third iterative operator beside
# LP (q16) and PageRank (q75); like q75 the iteration count is a
# constant, so the oracle unrolls as CTE levels (MATERIALIZED — the
# q73/q74 lesson).
# --------------------------------------------------------------------------

_BPE_STEPS = 3

_BPE_MEMO: dict = {}


def _bpe_chain(
    spark: SparkSession, sf_dir: str, train_filter: str | None = None
) -> list:
    """The BPE merge chain: [(vocab_after_step_i, top_pair_i)] for steps
    1.._BPE_STEPS. Every vocab generation is persisted — it feeds THREE
    branches (pair counts, the rewritten next generation, and q82's mass
    checksum); unpersisted, each branch replays the whole chain back to
    the corpus scan. The vocab is bounded (distinct words ≪ corpus), so
    this is the LP-labels iterative-persist discipline, not a cache of
    corpus-scale data. Shared by q82 (training output), q85 (encode) and
    q105 (equity audit, which trains on `train_filter` only) and memoized
    per (session, sf_dir, filter) like the band/IVF indexes — a tokenizer
    is trained once per corpus and applied many times."""
    key = (spark.sparkContext.applicationId, sf_dir, train_filter)
    hit = _BPE_MEMO.get(key)
    if hit is not None:
        return hit
    docs = _t(spark, sf_dir, "documents")
    if train_filter is not None:
        docs = docs.filter(F.expr(train_filter))
    vocab = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
        .withColumn("repr", F.expr("array_join(split(word, ''), '  ')"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    steps = []
    for _step in range(_BPE_STEPS):
        toks = vocab.select(
            "freq", F.split("repr", "  ").alias("t")
        ).filter(F.size("t") >= 2)
        pairs = toks.select(
            "freq",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(t) - 2),"
                    " j -> struct(t[j] AS a, t[j + 1] AS b))"
                )
            ).alias("p"),
        ).select("freq", "p.a", "p.b")
        top = (
            pairs.groupBy("a", "b")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("a").asc(), F.col("b").asc())
            .limit(1)
        )
        vocab = vocab.crossJoin(
            F.broadcast(top.select(
                F.col("a").alias("ma"), F.col("b").alias("mb")
            ))
        ).select(
            "word",
            "freq",
            F.expr(
                "trim(replace(concat(' ', repr, ' '),"
                " concat(' ', ma, '  ', mb, ' '),"
                " concat(' ', ma, mb, ' ')))"
            ).alias("repr"),
        ).persist(StorageLevel.MEMORY_AND_DISK)
        steps.append((vocab, top))
    _memo_put(_BPE_MEMO, key, steps, spark)
    return steps


def q82_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = None
    for step, (vocab, top) in enumerate(_bpe_chain(spark, sf_dir), start=1):
        mass = vocab.agg(
            F.sum(F.expr("freq * size(split(repr, '  '))")).alias("token_mass")
        )
        row = top.crossJoin(mass).select(
            F.lit(step).cast("long").alias("step"),
            F.col("a").alias("left_sym"),
            F.col("b").alias("right_sym"),
            F.concat("a", "b").alias("merged"),
            F.col("cnt").alias("pair_count"),
            "token_mass",
        )
        out = row if out is None else out.unionByName(row)
    return out


def _bpe_sql_level(i: int) -> str:
    """One unrolled BPE merge level: pairs from v{i-1}, top-1 merge m{i},
    rewritten vocab v{i}, post-merge mass s{i}."""
    return f"""
p{i} AS (
  SELECT t[j + 1] AS a, t[j + 2] AS b, SUM(freq) AS cnt
  FROM (SELECT freq, str_split(repr, '  ') AS t FROM v{i - 1}
        WHERE len(str_split(repr, '  ')) >= 2) z,
       LATERAL (SELECT unnest(generate_series(0, len(t) - 2)) AS j) g
  GROUP BY a, b),
m{i} AS (SELECT a, b, cnt FROM p{i} ORDER BY cnt DESC, a ASC, b ASC LIMIT 1),
v{i} AS MATERIALIZED (
  SELECT word, freq,
         trim(replace(' ' || repr || ' ',
                      ' ' || m.a || '  ' || m.b || ' ',
                      ' ' || m.a || m.b || ' ')) AS repr
  FROM v{i - 1}, m{i} m),
s{i} AS (
  SELECT CAST(SUM(freq * len(str_split(repr, '  '))) AS BIGINT) AS token_mass
  FROM v{i})"""


Q82_SQL = (
    """
WITH words AS (
  SELECT tok AS word, COUNT(*) AS freq
  FROM (SELECT unnest(str_split(text, ' ')) AS tok FROM documents) z
  GROUP BY tok),
v0 AS MATERIALIZED (
  SELECT word, freq,
         array_to_string(str_split(word, ''), '  ') AS repr
  FROM words),"""
    + ",".join(_bpe_sql_level(i) for i in range(1, _BPE_STEPS + 1))
    + "\n"
    + "\nUNION ALL\n".join(
        f"SELECT CAST({i} AS BIGINT) AS step, a AS left_sym, b AS right_sym,"
        f" a || b AS merged, CAST(cnt AS BIGINT) AS pair_count, token_mass"
        f" FROM m{i} CROSS JOIN s{i}"
        for i in range(1, _BPE_STEPS + 1)
    )
)


# --------------------------------------------------------------------------
# q83 — weighted stratified sampling via distributed two-level top-k: pick
# the k highest-priority docs per language stratum, where priority is the
# integer Efraimidis–Spirakis analog key = hash div weight (weight =
# n_chars, so long docs are proportionally more likely to win; smaller
# key = higher priority; deterministic — md5 of a seeded doc_id, the q70
# discipline — and monotone in weight, documented as the log-free integer
# variant of u^(1/w) priority sampling).
# Scale shape: the naive plan is one window per stratum — |lang| is tiny,
# so each window partition is corpus/|lang| rows: the classic
# low-cardinality-key window skew. Instead top-k is TWO-LEVEL (q67's
# bucketing discipline applied to ranking): level 1 ranks within (lang,
# bucket = doc_id % 16) — 16× the parallelism, each sort 1/16 the
# stratum — and level 2 re-ranks the ≤ 16·k survivors per lang. Exact:
# the global top-k is a subset of the union of per-bucket top-k. At
# cluster scale B scales with executor count and the level-2 window is
# over B·k rows per stratum, never the corpus.
# --------------------------------------------------------------------------

_Q83_SEED = "q83:"
_Q83_K = 10
_Q83_BUCKETS = 16


def q83_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id",
        "lang",
        F.greatest(F.col("n_chars"), F.lit(1)).alias("w"),
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(_Q83_SEED), F.col("doc_id").cast("string"))),
                1,
                12,
            ),
            16,
            10,
        )
        .cast("long")
        .alias("prio"),
    ).select(
        "doc_id",
        "lang",
        "w",
        F.expr("prio div w").alias("k"),
        (F.col("doc_id") % _Q83_BUCKETS).alias("bucket"),
    )
    w1 = Window.partitionBy("lang", "bucket").orderBy(
        F.col("k").asc(), F.col("doc_id").asc()
    )
    survivors = keyed.withColumn("r1", F.row_number().over(w1)).filter(
        F.col("r1") <= _Q83_K
    )
    w2 = Window.partitionBy("lang").orderBy(F.col("k").asc(), F.col("doc_id").asc())
    return (
        survivors.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= _Q83_K)
        .select(
            "lang",
            F.col("rank").cast("long").alias("rank"),
            "doc_id",
            F.col("w").cast("long").alias("w"),
            F.col("k").alias("priority_key"),
        )
    )


Q83_SQL = f"""
WITH keyed AS (
  SELECT doc_id, lang, GREATEST(n_chars, 1) AS w,
         ('0x' || substring(md5('{_Q83_SEED}' || CAST(doc_id AS VARCHAR)),
                            1, 12))::BIGINT AS prio,
         doc_id % {_Q83_BUCKETS} AS bucket
  FROM documents),
scored AS (SELECT doc_id, lang, w, prio // w AS k, bucket FROM keyed),
survivors AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (
      PARTITION BY lang, bucket ORDER BY k ASC, doc_id ASC) AS r1
    FROM scored) z
  WHERE r1 <= {_Q83_K})
SELECT lang, CAST(rank AS BIGINT) AS rank, doc_id, CAST(w AS BIGINT) AS w,
       k AS priority_key
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY lang ORDER BY k ASC, doc_id ASC) AS rank
  FROM survivors) z
WHERE rank <= {_Q83_K}
"""


# --------------------------------------------------------------------------
# q84 — SQ8 scalar quantization of the embedding store (the FAISS
# ScalarQuantizer shape): per-dimension [min, max] trained on the corpus,
# each coordinate encoded to an 8-bit level, decoded as the level's
# round-nearest midpoint, with per-vector code checksum + reconstruction
# error. Runs on the IVF path's integer-quantized coordinates
# (floor(x·10⁶ + ½), _QUANT_EXPR) so every step is integer floor/round
# division — Spark ≡ DuckDB bit-exact, no float drift:
#   code  = ((x − mn)·255) div (mx − mn)            (0 when mx = mn)
#   recon = mn + (2·code·(mx − mn) + 255) div 510   (round-half-up)
# Scale shape: the trainer is ONE map-side-combinable per-dimension
# min/max agg (64 output rows), broadcast back onto the posexplode — the
# same broadcast-codebook discipline as IVF assignment; the per-vector
# re-agg clusters on vec_id. At 100 TB: train on a sample instead (the
# IVF sampling pattern), clamp codes at encode time — the clamp is a
# no-op here because min/max come from the same corpus (documented).
# --------------------------------------------------------------------------


def q84_sq8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    qe = _quantized_emb(spark, sf_dir).select("vec_id", "qv")
    ex = qe.select(
        "vec_id", F.posexplode("qv").alias("j", "x")
    )
    stats = ex.groupBy("j").agg(
        F.min("x").alias("mn"), F.max("x").alias("mx")
    )
    coded = ex.join(F.broadcast(stats), "j").select(
        "vec_id",
        "j",
        "x",
        "mn",
        F.expr(
            "CASE WHEN mx = mn THEN 0"
            " ELSE ((x - mn) * 255) div (mx - mn) END"
        ).alias("code"),
        (F.col("mx") - F.col("mn")).alias("scale"),
    ).withColumn(
        "recon", F.expr("mn + (2 * code * scale + 255) div 510")
    )
    return (
        coded.groupBy("vec_id")
        .agg(
            F.sum(F.expr("(j + 1) * code")).alias("code_checksum"),
            F.max(F.expr("abs(x - recon)")).alias("max_abs_err"),
            F.sum(F.expr("(x - recon) * (x - recon)")).alias("sq_err"),
        )
        .select(
            "vec_id",
            F.col("code_checksum").cast("long").alias("code_checksum"),
            F.col("max_abs_err").cast("long").alias("max_abs_err"),
            F.col("sq_err").cast("long").alias("sq_err"),
        )
    )


Q84_SQL = f"""
WITH e AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT))
           AS qv
  FROM embeddings),
ex AS (
  SELECT vec_id, u.j, u.x
  FROM e, LATERAL (SELECT unnest(qv) AS x,
                          unnest(generate_series(0, len(qv) - 1)) AS j) u),
stats AS (SELECT j, MIN(x) AS mn, MAX(x) AS mx FROM ex GROUP BY j),
coded AS (
  SELECT vec_id, ex.j, x, mn,
         CASE WHEN mx = mn THEN 0
              ELSE ((x - mn) * 255) // (mx - mn) END AS code,
         mx - mn AS scale
  FROM ex JOIN stats ON stats.j = ex.j),
recon AS (
  SELECT vec_id, j, x, code,
         mn + (2 * code * scale + 255) // 510 AS recon
  FROM coded)
SELECT vec_id,
       CAST(SUM((j + 1) * code) AS BIGINT) AS code_checksum,
       CAST(MAX(abs(x - recon)) AS BIGINT) AS max_abs_err,
       CAST(SUM((x - recon) * (x - recon)) AS BIGINT) AS sq_err
FROM recon GROUP BY vec_id
"""


# --------------------------------------------------------------------------
# q85 — BPE encode (tokenizer APPLICATION): apply q82's learned merges to
# the whole corpus and report per-doc BPE token counts + a vocabulary-
# checksummed repr hash. The train→apply pairing: training (q82) runs on
# the bounded word-frequency vocab; application is ONE corpus-scale
# equi-join of the exploded (doc_id, word) stream against the final
# vocab generation's (word → n_symbols, repr-hash) — vocab ≪ corpus, so
# the gate-scale plan broadcasts it and the 100-TB plan takes the SMJ on
# word, which is exactly the broadcast→SMJ transition the sf1 stress gate
# exists to prove. Per-doc agg: n_words, Σ n_symbols (the BPE token
# count), Σ 48-bit repr hash (order-invariant multiset checksum that
# pins every word's merged repr, not just counts), compression in ppm
# vs chars. Integer-exact throughout.
# --------------------------------------------------------------------------


def q85_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    vocab = _bpe_chain(spark, sf_dir)[-1][0]
    final_vocab = vocab.select(
        "word",
        F.expr("size(split(repr, '  '))").cast("long").alias("n_syms"),
        F.conv(F.substring(F.md5("repr"), 1, 12), 16, 10)
        .cast("long")
        .alias("rhash"),
    )
    dw = docs.select(
        "doc_id", "n_chars", F.explode(F.split("text", " ")).alias("word")
    )
    return (
        dw.join(final_vocab, "word")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.sum("n_syms").alias("n_bpe_tokens"),
            F.sum("rhash").alias("repr_checksum"),
            F.max("n_chars").alias("nc"),
        )
        .select(
            "doc_id",
            "n_words",
            "n_bpe_tokens",
            "repr_checksum",
            F.expr(
                "(1000000 * n_bpe_tokens) div greatest(nc, 1)"
            ).alias("tokens_per_char_ppm"),
        )
    )


Q85_SQL = (
    """
WITH words AS (
  SELECT tok AS word, COUNT(*) AS freq
  FROM (SELECT unnest(str_split(text, ' ')) AS tok FROM documents) z
  GROUP BY tok),
v0 AS MATERIALIZED (
  SELECT word, freq,
         array_to_string(str_split(word, ''), '  ') AS repr
  FROM words),"""
    + ",".join(_bpe_sql_level(i) for i in range(1, _BPE_STEPS + 1))
    + f""",
fv AS (
  SELECT word, CAST(len(str_split(repr, '  ')) AS BIGINT) AS n_syms,
         ('0x' || substring(md5(repr), 1, 12))::BIGINT AS rhash
  FROM v{_BPE_STEPS}),
dw AS (
  SELECT doc_id, n_chars, unnest(str_split(text, ' ')) AS word
  FROM documents)
SELECT doc_id, COUNT(*) AS n_words,
       CAST(SUM(n_syms) AS BIGINT) AS n_bpe_tokens,
       CAST(SUM(rhash) AS BIGINT) AS repr_checksum,
       CAST((1000000 * SUM(n_syms)) // GREATEST(MAX(n_chars), 1) AS BIGINT)
         AS tokens_per_char_ppm
FROM dw JOIN fv USING (word)
GROUP BY doc_id
"""
)


# --------------------------------------------------------------------------
# q86 — Bloom-filter semi-join prefilter (the runtime-filter pattern AQE
# injects for selective joins, built explicitly so its cost/accuracy is
# observable): a small blocklist's content keys are folded into a
# 1024-bit Bloom filter (32 × 32-bit words, 4 probes from disjoint md5
# hex substrings — fixed-size mergeable state, the q55/q56 sketch
# family), and the corpus is probed WITHOUT A SHUFFLE: the 4 probe
# positions are computed as columns and resolved by 4 broadcast joins
# against the ≤ 32-row word table — the probe side never exchanges.
# Per-lang accounting compares the Bloom verdict against the exact
# broadcast semi-join: n_false_pos (the cost of the prefilter) and
# n_missed, which the Bloom construction guarantees is 0 — carried as a
# column so the no-false-negative invariant is pinned in data, on both
# engines. At 100 TB the filter build is a map-side-combinable bit_or
# agg over the (small) blocklist and the probe is a pure map under the
# broadcast — rows surviving the prefilter (member ∪ false-pos) are the
# only ones that reach the expensive exact join.
# --------------------------------------------------------------------------

_BLOOM_WORDS = 32  # 32 × 32-bit words = 1024 bits
_BLOOM_OFFS = (1, 4, 7, 10)  # md5 hex substring offsets, 3 digits each


def _bloom_pos_exprs(key_col: str) -> list:
    """The 4 (word_idx, mask) probe-position column pairs for a hex-md5
    key column: 12 bits per probe from disjoint substrings, mod 1024."""
    out = []
    for i, off in enumerate(_BLOOM_OFFS, start=1):
        pos = (
            f"pmod(cast(conv(substring({key_col}, {off}, 3), 16, 10)"
            f" AS int), {_BLOOM_WORDS * 32})"
        )
        out.append(
            (
                F.expr(f"({pos}) div 32").alias(f"w{i}"),
                F.expr(
                    f"shiftleft(cast(1 AS bigint), ({pos}) % 32)"
                ).alias(f"m{i}"),
            )
        )
    return out


def q86_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.md5("text").alias("k")
    )
    # skeys feeds SIX branches (4 bloom-word unions + the exact-membership
    # probe + the build) — persist it or each branch replays the corpus
    # scan. It is blocklist-sized by construction (1/53 of docs, distinct).
    skeys = (
        docs.filter(F.col("doc_id") % 53 == 0)
        .select("k")
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    pos = _bloom_pos_exprs("k")
    bits = None
    for w, m in pos:
        part = skeys.select(w.alias("w"), m.alias("m"))
        bits = part if bits is None else bits.unionByName(part)
    bloom = (
        bits.groupBy("w")
        .agg(F.expr("bit_or(m)").alias("bits"))
        .persist(StorageLevel.MEMORY_AND_DISK)  # read by 4 broadcast builds
    )
    probe = docs.select("doc_id", "lang", "k", *[c for wm in pos for c in wm])
    for i in range(1, 5):
        f = F.broadcast(
            bloom.select(
                F.col("w").alias(f"fw{i}"), F.col("bits").alias(f"fb{i}")
            )
        )
        probe = probe.join(f, F.col(f"w{i}") == F.col(f"fw{i}"), "left")
    member = F.broadcast(
        skeys.select(F.col("k").alias("mk"), F.lit(1).alias("mem"))
    )
    flagged = probe.join(member, F.col("k") == F.col("mk"), "left").select(
        "lang",
        F.coalesce("mem", F.lit(0)).alias("is_member"),
        F.expr(
            "CASE WHEN (coalesce(fb1, 0) & m1) != 0"
            " AND (coalesce(fb2, 0) & m2) != 0"
            " AND (coalesce(fb3, 0) & m3) != 0"
            " AND (coalesce(fb4, 0) & m4) != 0 THEN 1 ELSE 0 END"
        ).alias("bloom_pass"),
    )
    return flagged.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("is_member").alias("n_member"),
        F.sum("bloom_pass").alias("n_bloom_pass"),
        F.sum(
            F.expr("CASE WHEN bloom_pass = 1 AND is_member = 0 THEN 1 ELSE 0 END")
        ).alias("n_false_pos"),
        F.sum(
            F.expr("CASE WHEN is_member = 1 AND bloom_pass = 0 THEN 1 ELSE 0 END")
        ).alias("n_missed"),
    )


def _bloom_pos_sql(key: str, i: int) -> str:
    off = _BLOOM_OFFS[i - 1]
    return (
        f"(('0x' || substring({key}, {off}, 3))::BIGINT"
        f" % {_BLOOM_WORDS * 32})"
    )


Q86_SQL = f"""
WITH d AS (SELECT doc_id, lang, md5(text) AS k FROM documents),
skeys AS (SELECT DISTINCT k FROM d WHERE doc_id % 53 = 0),
bits AS (
  {" UNION ALL ".join(
      f"SELECT {_bloom_pos_sql('k', i)} // 32 AS w,"
      f" (CAST(1 AS BIGINT) << ({_bloom_pos_sql('k', i)} % 32)) AS m"
      f" FROM skeys"
      for i in range(1, 5)
  )}),
bloom AS (SELECT w, bit_or(m) AS bits FROM bits GROUP BY w),
probe AS (
  SELECT d.doc_id, d.lang, d.k,
         {", ".join(
             f"{_bloom_pos_sql('d.k', i)} // 32 AS w{i},"
             f" (CAST(1 AS BIGINT) << ({_bloom_pos_sql('d.k', i)} % 32)) AS m{i}"
             for i in range(1, 5)
         )}
  FROM d),
flagged AS (
  SELECT p.lang,
         CASE WHEN s.k IS NULL THEN 0 ELSE 1 END AS is_member,
         CASE WHEN (COALESCE(f1.bits, 0) & p.m1) != 0
                AND (COALESCE(f2.bits, 0) & p.m2) != 0
                AND (COALESCE(f3.bits, 0) & p.m3) != 0
                AND (COALESCE(f4.bits, 0) & p.m4) != 0
              THEN 1 ELSE 0 END AS bloom_pass
  FROM probe p
  LEFT JOIN bloom f1 ON f1.w = p.w1
  LEFT JOIN bloom f2 ON f2.w = p.w2
  LEFT JOIN bloom f3 ON f3.w = p.w3
  LEFT JOIN bloom f4 ON f4.w = p.w4
  LEFT JOIN skeys s ON s.k = p.k)
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(is_member) AS BIGINT) AS n_member,
       CAST(SUM(bloom_pass) AS BIGINT) AS n_bloom_pass,
       CAST(SUM(CASE WHEN bloom_pass = 1 AND is_member = 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_false_pos,
       CAST(SUM(CASE WHEN is_member = 1 AND bloom_pass = 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_missed
FROM flagged GROUP BY lang
"""


# --------------------------------------------------------------------------
# q80 — hierarchical rollup (GROUPING SETS). The dataset-card aggregation:
# one pass emits per-(lang, source) stats, per-lang subtotals, and the
# grand total, disambiguated by grouping_id (Spark's grouping_id() and
# DuckDB's GROUPING(lang, source) use the same bit encoding — first key =
# MSB; verified 0/1/3 on both engines). NULL group keys are coalesced to
# '(all)' AFTER the gid is computed, so a real NULL in the data could
# never be confused with a subtotal row. avg chars is floor-div so the
# row values are integer-exact cross-engine.
# Scale shape: ROLLUP compiles to a single Expand + hash aggregate —
# ONE corpus-scale shuffle, map-side combinable (each input row expands
# to 3 grouping-set rows BEFORE the partial agg, so the shuffle carries
# only group cells, never data rows). The standard one-pass replacement
# for running three separate aggregation jobs over 100 TB.
# --------------------------------------------------------------------------


def q80_rollup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.rollup("lang", "source")
        .agg(
            F.grouping_id().alias("gid"),
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        .select(
            F.coalesce("lang", F.lit("(all)")).alias("lang"),
            F.coalesce("source", F.lit("(all)")).alias("source"),
            F.col("gid").cast("long").alias("gid"),
            "n_docs",
            "total_chars",
            F.expr("total_chars div n_docs").alias("avg_chars"),
        )
    )


Q80_SQL = """
SELECT COALESCE(lang, '(all)') AS lang,
       COALESCE(source, '(all)') AS source,
       CAST(GROUPING(lang, source) AS BIGINT) AS gid,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(SUM(n_chars) // COUNT(*) AS BIGINT) AS avg_chars
FROM documents
GROUP BY ROLLUP(lang, source)
"""


# --------------------------------------------------------------------------
# q87 — distributed full-corpus k-means (Lloyd's over the ENTIRE embedding
# table, not a sample). The IVF trainer (q15/q18/q42) is sample-based by
# design: it collects max(4096, 64·k) rows and irons out a codebook on the
# driver — the right INDEX-BUILD shape. Topic/style clustering for data
# curation (cluster-balanced sampling, per-cluster quality audits, DoReMi-
# style domain discovery) instead trains on every row. The distributed
# iteration shape (what MLlib's KMeans does):
#   (1) assignment — broadcast k×d codebook, vectorized Arrow argmin,
#       ZERO shuffle (the q15 assignment discipline: never embed the
#       codebook as plan literals, never fan out n×k join rows);
#   (2) centroid update — posexplode the d dims, ONE map-side-combinable
#       groupBy(cid, dim) agg whose output is ≤ k·d cells (512 here),
#       collected to the driver to seed the next broadcast. The collect is
#       bounded by k·d, never by n — the per-iteration driver round-trip
#       every distributed k-means pays.
# K iterations therefore cost K corpus-scale shuffles of k·d cells each —
# the floor for exact Lloyd's. Arithmetic is integer-exact end-to-end
# (quantized embeddings, floor(sum/count) centroid updates, argmin ties →
# lowest cid), so the DuckDB oracle replays the iterations as unrolled
# CTEs bit-for-bit. Per-point distances fit int64 (≤ 4·d·Q² ≈ 9.2e13);
# inertia is accumulated in decimal(38,0) (the ANSI overflow discipline)
# and reported as mean_sqdist = floor(sum/n_pts) < 2^53. Seeds = the k
# rows with smallest vec_id. Dim sums stay < 2^53 up to ~9e6 rows per
# cluster at Q = 1e6; past that the update agg would switch to
# decimal(38,0) cells like the inertia column.
# --------------------------------------------------------------------------

_KM_K = 8
_KM_ITERS = 2

_KM_MEMO: dict = {}


def _km_final(spark: SparkSession, sf_dir: str):
    """Full-corpus Lloyd's training (q87 header comment) → the persisted
    final assignment (vec_id, cid, d2) plus the trained centroid matrix,
    memoized per (session, sf_dir) — the IVF-index discipline: q87's
    stats and q93's purity audit share one training pass."""
    import math

    import numpy as np

    memo_key = (spark.sparkContext.applicationId, sf_dir)
    hit = _KM_MEMO.get(memo_key)
    if hit is not None:
        return hit[0]

    emb = (
        _quantized_emb(spark, sf_dir)
        .select("vec_id", "qv")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # bounded: exactly k rows (the q60/q61 driver-scalar contract)
    seeds = emb.orderBy("vec_id").limit(_KM_K).collect()
    cents = np.array(
        [r["qv"] for r in sorted(seeds, key=lambda r: r["vec_id"])],
        dtype=np.int64,
    )

    def _cid_udf(book):
        bc = spark.sparkContext.broadcast(book)

        @F.pandas_udf("long")
        def cid_of(qv: pd.Series) -> pd.Series:
            P = np.array(qv.tolist(), dtype=np.int64)
            return pd.Series(
                _sq_dists(P, bc.value).argmin(axis=1).astype(np.int64)
            )

        return cid_of

    for _ in range(_KM_ITERS):
        assigned = emb.withColumn("cid", _cid_udf(cents)(F.col("qv")))
        cells = (
            assigned.select("cid", F.posexplode("qv").alias("dim", "x"))
            .groupBy("cid", "dim")
            .agg(F.sum("x").alias("sm"), F.count("*").alias("cnt"))
            .collect()  # bounded: ≤ k·d rows
        )
        nxt = cents.copy()  # empty cluster keeps its centroid
        for r in cells:
            nxt[int(r["cid"])][int(r["dim"])] = int(
                math.floor(int(r["sm"]) / int(r["cnt"]))
            )
        cents = nxt

    bcf = spark.sparkContext.broadcast(cents)

    @F.pandas_udf("long")
    def min_d2(qv: pd.Series) -> pd.Series:
        P = np.array(qv.tolist(), dtype=np.int64)
        return pd.Series(
            _sq_dists(P, bcf.value).min(axis=1).astype(np.int64)
        )

    final = (
        emb.withColumn("cid", _cid_udf(cents)(F.col("qv")))
        .withColumn("d2", min_d2(F.col("qv")))
        .select("vec_id", "cid", "d2")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    _memo_put(_KM_MEMO, memo_key, [(final, cents)], spark)
    return final, cents


def q87_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib

    final, cents = _km_final(spark, sf_dir)
    sums = final.groupBy("cid").agg(
        F.count("*").alias("n_pts"),
        F.expr(
            "CAST(sum(CAST(d2 AS DECIMAL(38,0))) div count(*) AS LONG)"
        ).alias("mean_sqdist"),
    )
    checks = spark.createDataFrame(
        [
            (
                int(c),
                hashlib.md5(
                    ",".join(str(int(x)) for x in cents[c]).encode()
                ).hexdigest(),
            )
            for c in range(_KM_K)
        ],
        "cid long, cent_md5 string",
    )
    return sums.join(F.broadcast(checks), "cid").select(
        "cid", "n_pts", "mean_sqdist", "cent_md5"
    )


def _km_sql_ctes() -> str:
    sqdist = (
        "list_sum(list_transform(generate_series(1, len({a}.qv)), "
        "i -> ({a}.qv[i] - {c}.cv[i]) * ({a}.qv[i] - {c}.cv[i])))"
    )
    parts = [
        f"""e AS MATERIALIZED (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) AS qv
  FROM embeddings),
kcent0 AS MATERIALIZED (
  SELECT rn - 1 AS cid, qv AS cv FROM (
    SELECT qv, row_number() OVER (ORDER BY vec_id) AS rn FROM e)
  WHERE rn <= {_KM_K})"""
    ]
    prev = "kcent0"
    for t in range(1, _KM_ITERS + 1):
        parts.append(
            f"""kassign{t} AS MATERIALIZED (
  SELECT vec_id, qv, cid FROM (
    SELECT e.vec_id, e.qv, c.cid,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {sqdist.format(a='e', c='c')} ASC, c.cid ASC) AS rk
    FROM e, {prev} c) WHERE rk = 1),
knewc{t} AS MATERIALIZED (
  SELECT cid, list(CAST(FLOOR(CAST(sm AS DOUBLE) / cnt) AS BIGINT) ORDER BY dim) AS cv
  FROM (
    SELECT a.cid, d.i AS dim, SUM(a.qv[d.i]) AS sm, COUNT(*) AS cnt
    FROM kassign{t} a, LATERAL (SELECT unnest(generate_series(1, len(a.qv))) AS i) d
    GROUP BY a.cid, d.i) GROUP BY cid),
kcent{t} AS MATERIALIZED (
  SELECT p.cid, COALESCE(n.cv, p.cv) AS cv
  FROM {prev} p LEFT JOIN knewc{t} n ON n.cid = p.cid)"""
        )
        prev = f"kcent{t}"
    parts.append(
        f"""kfinal AS MATERIALIZED (
  SELECT vec_id, cid, d2 FROM (
    SELECT e.vec_id, c.cid,
           {sqdist.format(a='e', c='c')} AS d2,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {sqdist.format(a='e', c='c')} ASC, c.cid ASC) AS rk
    FROM e, {prev} c) WHERE rk = 1)"""
    )
    return ",\n".join(parts), prev


_KM_CTES, _KM_LAST_CENT = _km_sql_ctes()

Q87_SQL = f"""
WITH {_KM_CTES}
SELECT a.cid, COUNT(*) AS n_pts,
       CAST(SUM(a.d2) // COUNT(*) AS BIGINT) AS mean_sqdist,
       MIN(m.cent_md5) AS cent_md5
FROM kfinal a
JOIN (SELECT cid, md5(array_to_string(cv, ',')) AS cent_md5
      FROM {_KM_LAST_CENT}) m ON m.cid = a.cid
GROUP BY a.cid
"""


# --------------------------------------------------------------------------
# q88 — triangle counting over the q75 link graph (degree-oriented wedge
# join). Triangles/clustering coefficient are the standard graph-health
# signals for citation/link corpora (spam farms are triangle-dense). The
# naive 3-way self-join explodes on hub nodes: a degree-D node contributes
# D² wedges. The fix — Schank/Wagner orientation, the shape every
# distributed triangle counter uses — directs each undirected edge from
# the (degree, node)-SMALLER endpoint to the larger, which provably caps
# every out-degree at O(√m): wedges = one self-join of the oriented edge
# list on src, closed by one hash join probing the third edge. Each
# triangle is found exactly once (at its smallest-degree vertex) and then
# credited to all three corners via a 3-row explode.
# Scale: 2 equi-joins + 1 agg, all on edge keys; per-key fan-out bounded
# by the orientation invariant, no row ever joins more than out-deg ≤
# O(√m) partners. total_tri is a 1-row agg broadcast onto the top-20 rows
# (bounded BNLJ, the q73/q74 combine precedent).
# --------------------------------------------------------------------------


def q88_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    n = docs.count()  # bounded scalar: hash modulus (q75 contract)
    slots = docs.select(
        "doc_id", F.explode(F.sequence(F.lit(0), F.lit(_PR_FANOUT - 1))).alias("j")
    )
    raw = slots.select(
        F.col("doc_id").alias("src"),
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("pr"),
                            F.col("doc_id").cast("string"),
                            F.lit("-"),
                            F.col("j").cast("string"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % n
        ).alias("dst"),
    )
    und = (
        raw.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        )
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    deg = (
        und.select(F.col("u").alias("node"))
        .unionByName(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    oriented = (
        und.join(deg.withColumnRenamed("node", "u").withColumnRenamed("deg", "du"), "u")
        .join(deg.withColumnRenamed("node", "v").withColumnRenamed("deg", "dv"), "v")
        .select(
            F.when(
                (F.col("du") < F.col("dv"))
                | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))),
                F.col("u"),
            )
            .otherwise(F.col("v"))
            .alias("s"),
            F.when(
                (F.col("du") < F.col("dv"))
                | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))),
                F.col("v"),
            )
            .otherwise(F.col("u"))
            .alias("t"),
            F.when(
                (F.col("du") < F.col("dv"))
                | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))),
                F.col("dv"),
            )
            .otherwise(F.col("du"))
            .alias("dt"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    e1 = oriented.select(
        F.col("s").alias("a"), F.col("t").alias("b"), F.col("dt").alias("db")
    )
    e2 = oriented.select(
        F.col("s").alias("a2"), F.col("t").alias("c"), F.col("dt").alias("dc")
    )
    wedges = e1.join(e2, F.col("a") == F.col("a2")).filter(
        (F.col("db") < F.col("dc"))
        | ((F.col("db") == F.col("dc")) & (F.col("b") < F.col("c")))
    )
    e3 = oriented.select(F.col("s").alias("b3"), F.col("t").alias("c3"))
    tris = wedges.join(
        e3, (F.col("b") == F.col("b3")) & (F.col("c") == F.col("c3"))
    ).select("a", "b", "c")
    total = tris.agg(F.count("*").alias("total_tri"))
    per_node = (
        tris.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("n_tri"))
        .orderBy(F.desc("n_tri"), F.asc("node"))
        .limit(20)
    )
    return per_node.crossJoin(F.broadcast(total)).select(
        "node", "n_tri", "total_tri"
    )


Q88_SQL = f"""
WITH nn AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
raw AS MATERIALIZED (
  SELECT doc_id AS src,
         ('0x' || substring(md5('pr' || CAST(doc_id AS VARCHAR) || '-'
                                 || CAST(j AS VARCHAR)), 1, 8))::BIGINT
           % (SELECT n FROM nn) AS dst
  FROM documents,
       LATERAL (SELECT unnest(generate_series(0, {_PR_FANOUT - 1})) AS j) g),
und AS MATERIALIZED (
  SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
  FROM raw WHERE src != dst),
deg AS MATERIALIZED (
  SELECT node, COUNT(*) AS deg FROM (
    SELECT u AS node FROM und UNION ALL SELECT v AS node FROM und)
  GROUP BY node),
oriented AS MATERIALIZED (
  SELECT CASE WHEN (du.deg < dv.deg) OR (du.deg = dv.deg AND e.u < e.v)
              THEN e.u ELSE e.v END AS s,
         CASE WHEN (du.deg < dv.deg) OR (du.deg = dv.deg AND e.u < e.v)
              THEN e.v ELSE e.u END AS t,
         CASE WHEN (du.deg < dv.deg) OR (du.deg = dv.deg AND e.u < e.v)
              THEN dv.deg ELSE du.deg END AS dt
  FROM und e
  JOIN deg du ON du.node = e.u
  JOIN deg dv ON dv.node = e.v),
tris AS MATERIALIZED (
  SELECT e1.s AS a, e1.t AS b, e2.t AS c
  FROM oriented e1
  JOIN oriented e2 ON e2.s = e1.s
   AND ((e1.dt < e2.dt) OR (e1.dt = e2.dt AND e1.t < e2.t))
  JOIN oriented e3 ON e3.s = e1.t AND e3.t = e2.t),
total AS MATERIALIZED (SELECT COUNT(*) AS total_tri FROM tris)
SELECT node, n_tri, (SELECT total_tri FROM total) AS total_tri
FROM (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS n_tri
  FROM (SELECT unnest([a, b, c]) AS node FROM tris)
  GROUP BY node)
ORDER BY n_tri DESC, node ASC LIMIT 20
"""


# --------------------------------------------------------------------------
# q89 — duplicated-span coverage (the exact-substring dedup signal of Lee
# et al., "Deduplicating Training Data Makes Language Models Better", at a
# fixed window size). q34 dedups disjoint chunks and q63 dedups whole
# lines; both miss duplication at arbitrary offsets. Here every W=8-token
# sliding window is hashed; a window is "duplicated" if its text occurs
# ≥ 2 times in the corpus (any doc, any offset — within-doc repeats
# count, as in the suffix-array formulation). Per doc, overlapping dup
# windows are merged into maximal spans (gaps-and-islands: a window
# starting at i extends a span ending ≥ i-1, i.e. joins when
# i − prev_start ≤ W) and the covered-token fraction is reported — the
# per-doc number a curation pipeline thresholds on to drop
# mostly-duplicated documents.
# Scale shape: the window table is Σ n_tok rows (the shingle-table
# scale); the dup decision is ONE map-side-combinable count agg on the
# window hash followed by an equi-join back (q63's claim-join shape —
# never all-pairs); the span merge is one window over doc_id, riding a
# single hash partitioning. Output is one row per doc.
# --------------------------------------------------------------------------

_SPAN_W = 8


def q89_dup_span_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("t")
    )
    base = docs.select("doc_id", F.size("t").cast("long").alias("n_tok"), "t")
    wins = (
        base.filter(F.col("n_tok") >= _SPAN_W)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(0, size(t) - {_SPAN_W}),"
                    f" i -> struct(CAST(i AS LONG) AS i,"
                    f" md5(array_join(slice(t, i + 1, {_SPAN_W}), ' ')) AS h))"
                )
            ).alias("w"),
        )
        .select("doc_id", F.col("w.i").alias("i"), F.col("w.h").alias("h"))
    )
    # duplicated-hash filter as ONE window over h instead of the old
    # groupBy(h) + self-join back: identical row set (a window row count
    # >= 2 is exactly membership in the HAVING-count>=2 hash set), but the
    # explode+md5 subtree runs once, not once per join arm, and the h
    # exchange is the only shuffle this step needs.
    dup_wins = (
        wins.withColumn("hcnt", F.count("*").over(Window.partitionBy("h")))
        .filter(F.col("hcnt") >= 2)
        .select("doc_id", "i", "h")
    )
    w_doc = Window.partitionBy("doc_id").orderBy("i")
    spans = (
        dup_wins.withColumn("pi", F.lag("i").over(w_doc))
        .withColumn(
            "g",
            F.when(
                F.col("pi").isNull() | (F.col("i") - F.col("pi") > _SPAN_W),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn("isl", F.sum("g").over(w_doc))
        .groupBy("doc_id", "isl")
        .agg((F.max("i") - F.min("i") + _SPAN_W).alias("span_len"))
        .groupBy("doc_id")
        .agg(F.sum("span_len").alias("covered_tok"))
    )
    return (
        base.join(spans, "doc_id", "left")
        .select(
            "doc_id",
            "n_tok",
            F.coalesce("covered_tok", F.lit(0)).cast("long").alias("covered_tok"),
            F.expr(
                "CAST(1000000 * coalesce(covered_tok, 0L) div n_tok AS LONG)"
            ).alias("dup_ppm"),
        )
    )


Q89_SQL = f"""
WITH base AS MATERIALIZED (
  SELECT doc_id, str_split(text, ' ') AS t,
         CAST(len(str_split(text, ' ')) AS BIGINT) AS n_tok
  FROM documents),
wins AS MATERIALIZED (
  SELECT doc_id, CAST(g.i AS BIGINT) AS i,
         md5(array_to_string(t[g.i + 1 : g.i + {_SPAN_W}], ' ')) AS h
  FROM base, LATERAL (SELECT unnest(generate_series(0, CAST(n_tok - {_SPAN_W} AS BIGINT))) AS i) g
  WHERE n_tok >= {_SPAN_W}),
dup_h AS MATERIALIZED (
  SELECT h FROM wins GROUP BY h HAVING COUNT(*) >= 2),
dup_wins AS MATERIALIZED (
  SELECT w.doc_id, w.i FROM wins w JOIN dup_h d ON d.h = w.h),
spans AS MATERIALIZED (
  SELECT doc_id,
         SUM(span_len) AS covered_tok
  FROM (
    SELECT doc_id, isl, MAX(i) - MIN(i) + {_SPAN_W} AS span_len
    FROM (
      SELECT doc_id, i,
             SUM(CASE WHEN pi IS NULL OR i - pi > {_SPAN_W} THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY i) AS isl
      FROM (
        SELECT doc_id, i,
               lag(i) OVER (PARTITION BY doc_id ORDER BY i) AS pi
        FROM dup_wins))
    GROUP BY doc_id, isl)
  GROUP BY doc_id)
SELECT b.doc_id, b.n_tok,
       CAST(COALESCE(s.covered_tok, 0) AS BIGINT) AS covered_tok,
       CAST(1000000 * COALESCE(s.covered_tok, 0) // b.n_tok AS BIGINT) AS dup_ppm
FROM base b LEFT JOIN spans s ON s.doc_id = b.doc_id
"""


# --------------------------------------------------------------------------
# q90 — SCD2 dimension build from a changelog (slowly-changing-dimension
# type 2). The warehouse-side op every Iceberg-backed corpus store needs:
# given per-version attribute observations, compact consecutive repeats
# and emit effective-dated rows (valid_from / valid_to / is_current) so
# any historical corpus snapshot can be reconstructed with a point-in-time
# range predicate. The changelog is synthesized deterministically in-query
# (q25's injected-data discipline): 4 versions per doc, attribute =
# md5-derived value in {{0,1,2}} so consecutive repeats genuinely occur
# and get compacted.
# Scale shape: explode (0-exchange map) + ONE hash partitioning on doc_id
# that BOTH windows ride (lag for change detection, lead for interval
# close — same partition key and order, so Catalyst plans one exchange;
# the post-filter lead only re-sorts). Output rows = Σ changes ≤ 4·n_docs.
# --------------------------------------------------------------------------

_SCD_VERSIONS = 4
_SCD_OPEN = 9999


def scd_changelog(docs: DataFrame) -> DataFrame:
    """The deterministic 4-version CDC changelog q90 compacts; shared with
    the streaming twin's equivalence test (streaming/scd.py)."""
    return docs.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(_SCD_VERSIONS - 1))).alias("ver"),
    ).select(
        "doc_id",
        F.col("ver").cast("long").alias("ver"),
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("scd"),
                            F.col("doc_id").cast("string"),
                            F.lit("#"),
                            F.col("ver").cast("string"),
                        )
                    ),
                    1,
                    2,
                ),
                16,
                10,
            ).cast("long")
            % 3
        ).alias("val"),
    )


def q90_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    log = scd_changelog(_t(spark, sf_dir, "documents"))
    w = Window.partitionBy("doc_id").orderBy("ver")
    changes = log.withColumn("pv", F.lag("val").over(w)).filter(
        F.col("pv").isNull() | (F.col("val") != F.col("pv"))
    )
    return (
        changes.withColumn("nxt", F.lead("ver").over(w))
        .select(
            "doc_id",
            "val",
            F.col("ver").alias("valid_from"),
            (F.coalesce(F.col("nxt") - 1, F.lit(_SCD_OPEN)))
            .cast("long")
            .alias("valid_to"),
            F.when(F.col("nxt").isNull(), F.lit(1))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("is_current"),
        )
    )


Q90_SQL = f"""
WITH log AS (
  SELECT doc_id, CAST(g.ver AS BIGINT) AS ver,
         ('0x' || substring(md5('scd' || CAST(doc_id AS VARCHAR) || '#'
                                 || CAST(g.ver AS VARCHAR)), 1, 2))::BIGINT % 3 AS val
  FROM documents,
       LATERAL (SELECT unnest(generate_series(0, {_SCD_VERSIONS - 1})) AS ver) g),
changes AS (
  SELECT doc_id, ver, val FROM (
    SELECT doc_id, ver, val,
           lag(val) OVER (PARTITION BY doc_id ORDER BY ver) AS pv
    FROM log)
  WHERE pv IS NULL OR val != pv)
SELECT doc_id, val,
       ver AS valid_from,
       CAST(COALESCE(lead(ver) OVER (PARTITION BY doc_id ORDER BY ver) - 1,
                     {_SCD_OPEN}) AS BIGINT) AS valid_to,
       CAST(CASE WHEN lead(ver) OVER (PARTITION BY doc_id ORDER BY ver) IS NULL
                 THEN 1 ELSE 0 END AS BIGINT) AS is_current
FROM changes
"""


# --------------------------------------------------------------------------
# q91 — quality-threshold sweep (filter calibration curve). Before a
# curation run commits to a quality cutoff, the standard move is to sweep
# every candidate threshold and read off kept-document / kept-token mass —
# the data-card curve that justifies the chosen operating point. Score =
# q10's integer type-token ratio (ttr_pct, 0..100). One corpus pass
# aggregates per distinct score; the cumulative "keep if score ≥ s" mass
# is then a window over the ≤ 101-row aggregate — the q65 bounded-
# single-partition-window precedent (never a window over data rows).
# kept_ppm is integer-exact against the total token mass folded from the
# same aggregate (no second corpus scan — the q68 no-driver-scalar
# discipline).
# --------------------------------------------------------------------------


def q91_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    scored = docs.select(
        F.expr(
            "CAST(100 * size(array_distinct(split(text, ' ')))"
            " / size(split(text, ' ')) AS LONG)"
        ).alias("score"),
        F.size(F.split("text", " ")).cast("long").alias("n_tok"),
    )
    per_score = scored.groupBy("score").agg(
        F.count("*").alias("n_docs_at"),
        F.sum("n_tok").alias("tok_at"),
    )
    w = Window.orderBy(F.desc("score")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wt = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        per_score.withColumn("docs_kept", F.sum("n_docs_at").over(w))
        .withColumn("tok_kept", F.sum("tok_at").over(w))
        .withColumn("tok_total", F.sum("tok_at").over(wt))
        .select(
            "score",
            F.col("n_docs_at").cast("long").alias("n_docs_at"),
            F.col("docs_kept").cast("long").alias("docs_kept"),
            F.col("tok_kept").cast("long").alias("tok_kept"),
            F.expr(
                "CAST(CAST(1000000 AS DECIMAL(38,0)) * tok_kept"
                " div tok_total AS LONG)"
            ).alias("kept_ppm"),
        )
    )


Q91_SQL = """
WITH scored AS (
  SELECT CAST(100 * len(list_distinct(str_split(text, ' ')))
              // len(str_split(text, ' ')) AS BIGINT) AS score,
         CAST(len(str_split(text, ' ')) AS BIGINT) AS n_tok
  FROM documents),
per_score AS (
  SELECT score, COUNT(*) AS n_docs_at, CAST(SUM(n_tok) AS BIGINT) AS tok_at
  FROM scored GROUP BY score)
SELECT score,
       CAST(n_docs_at AS BIGINT) AS n_docs_at,
       CAST(SUM(n_docs_at) OVER (ORDER BY score DESC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS docs_kept,
       CAST(SUM(tok_at) OVER (ORDER BY score DESC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS tok_kept,
       CAST(1000000 * SUM(tok_at) OVER (ORDER BY score DESC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            // SUM(tok_at) OVER () AS BIGINT) AS kept_ppm
FROM per_score
"""


# --------------------------------------------------------------------------
# q92 — content-defined chunking (CDC) dedup. q34's fixed 32-token chunks
# break under INSERTION: one added token shifts every later chunk boundary
# and the whole tail stops matching. Content-defined boundaries (the
# rsync/LBFS/gear-hash family) cut where a rolling fingerprint of the
# LOCAL context hits a condition — here, after token i when the 4-gram
# ending at i hashes ≡ 0 (mod 8), mean chunk ≈ 8 tokens — so an edit only
# perturbs the chunks it touches and duplicated regions elsewhere keep
# their exact boundaries. A chunk is duplicated when its text occurs ≥ 2
# times corpus-wide; per doc we report chunk counts and the duplicated
# token fraction.
# Scale shape: boundary flags are computed IN ARRAY LAND (one transform
# per doc — never a per-token row carrying the whole doc), then one
# posexplode + a doc_id window assigns chunk ids; the chunk rebuild
# (groupBy doc_id, cid with ordered concat) rides the same partitioning;
# the dup decision is ONE map-side-combinable count agg on the chunk hash
# + a claim-join back (q63's shape). Never all-pairs.
# --------------------------------------------------------------------------

_CDC_W = 4  # rolling context: the 4-gram ending at each position
_CDC_MOD = 8  # boundary when hash % 8 == 0 → mean chunk ≈ 8 tokens

_CDC_FLAGS = (
    f"transform(sequence(1, size(t)), i -> CASE WHEN i >= {_CDC_W}"
    f" AND i < size(t)"
    f" AND CAST(conv(substring(md5(array_join(slice(t, i - {_CDC_W - 1},"
    f" {_CDC_W}), ' ')), 1, 2), 16, 10) AS LONG) % {_CDC_MOD} = 0"
    f" THEN 1 ELSE 0 END)"
)


def q92_cdc_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("t")
    )
    toks = docs.select(
        "doc_id",
        F.size("t").cast("long").alias("n_tok"),
        F.posexplode(
            F.arrays_zip(F.col("t").alias("tok"), F.expr(_CDC_FLAGS).alias("b"))
        ).alias("pos", "z"),
    ).select(
        "doc_id",
        "n_tok",
        F.col("pos").cast("long").alias("pos"),
        F.col("z.tok").alias("tok"),
        F.col("z.b").cast("long").alias("b"),
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    chunks = (
        toks.withColumn("cid", F.coalesce(F.sum("b").over(w), F.lit(0)))
        .groupBy("doc_id", "cid")
        .agg(
            F.max("n_tok").alias("n_tok"),
            F.count("*").cast("long").alias("chunk_len"),
            F.md5(
                F.concat_ws(
                    " ",
                    F.expr(
                        "transform(array_sort(collect_list(struct(pos, tok))),"
                        " s -> s.tok)"
                    ),
                )
            ).alias("h"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)  # read by the count agg + join
    )
    # duplicate flag as ONE window over h (the q89 rewrite): hcnt >= 2 is
    # exactly membership in the old HAVING-count>=2 set, without the
    # groupBy(h) + left-join arms re-reading the cached chunk table.
    flagged = chunks.withColumn(
        "hcnt", F.count("*").over(Window.partitionBy("h"))
    )
    return flagged.groupBy("doc_id").agg(
        F.max("n_tok").alias("n_tok"),
        F.count("*").cast("long").alias("n_chunks"),
        F.sum((F.col("hcnt") >= 2).cast("long")).cast("long").alias("dup_chunks"),
        F.expr(
            "CAST(1000000 * sum(CASE WHEN hcnt >= 2 THEN chunk_len"
            " ELSE 0L END) div max(n_tok) AS LONG)"
        ).alias("dup_tok_ppm"),
    )


Q92_SQL = f"""
WITH base AS MATERIALIZED (
  SELECT doc_id, str_split(text, ' ') AS t,
         CAST(len(str_split(text, ' ')) AS BIGINT) AS n_tok
  FROM documents),
toks AS MATERIALIZED (
  SELECT doc_id, n_tok, CAST(g.i - 1 AS BIGINT) AS pos, t[g.i] AS tok,
         CASE WHEN g.i >= {_CDC_W} AND g.i < len(t)
               AND ('0x' || substring(md5(array_to_string(
                     t[g.i - {_CDC_W - 1} : g.i], ' ')), 1, 2))::BIGINT
                   % {_CDC_MOD} = 0
              THEN 1 ELSE 0 END AS b
  FROM base, LATERAL (SELECT unnest(generate_series(1, len(t))) AS i) g),
chunked AS MATERIALIZED (
  SELECT doc_id, n_tok, pos, tok,
         COALESCE(SUM(b) OVER (PARTITION BY doc_id ORDER BY pos
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cid
  FROM toks),
chunks AS MATERIALIZED (
  SELECT doc_id, cid, MAX(n_tok) AS n_tok,
         CAST(COUNT(*) AS BIGINT) AS chunk_len,
         md5(string_agg(tok, ' ' ORDER BY pos)) AS h
  FROM chunked GROUP BY doc_id, cid),
dup_h AS MATERIALIZED (
  SELECT h FROM chunks GROUP BY h HAVING COUNT(*) >= 2)
SELECT c.doc_id, CAST(MAX(c.n_tok) AS BIGINT) AS n_tok,
       CAST(COUNT(*) AS BIGINT) AS n_chunks,
       CAST(SUM(CASE WHEN d.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS dup_chunks,
       CAST(1000000 * SUM(CASE WHEN d.h IS NOT NULL THEN c.chunk_len
                               ELSE 0 END) // MAX(c.n_tok) AS BIGINT)
         AS dup_tok_ppm
FROM chunks c LEFT JOIN dup_h d ON d.h = c.h
GROUP BY c.doc_id
"""


# --------------------------------------------------------------------------
# q93 — k-means cluster purity audit (the downstream consumer of q87's
# clustering, the way q73 audits the dedup pipeline). For each trained
# cluster: size, majority ground-truth label (ties → lowest label), and
# integer purity ppm — the number a curation pipeline reads before
# trusting cluster-balanced sampling or per-cluster filtering. Shares
# q87's memoized training pass (_km_final — the IVF-index discipline);
# the live work is one (cid, label) count agg (bounded output k·|labels|)
# plus a bounded window over it. The oracle replays the training CTEs and
# joins the label column back by vec_id.
# --------------------------------------------------------------------------


def q93_cluster_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    final, _ = _km_final(spark, sf_dir)
    labeled = final.join(
        _t(spark, sf_dir, "embeddings").select(
            "vec_id", F.col("label").cast("long").alias("label")
        ),
        "vec_id",
    )
    cells = labeled.groupBy("cid", "label").agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("cid").orderBy(F.desc("cnt"), F.asc("label"))
    return (
        cells.withColumn("rk", F.row_number().over(w))
        .withColumn("n_pts", F.sum("cnt").over(Window.partitionBy("cid")))
        .filter(F.col("rk") == 1)
        .select(
            "cid",
            F.col("n_pts").cast("long").alias("n_pts"),
            F.col("label").alias("top_label"),
            F.expr("CAST(1000000 * cnt div n_pts AS LONG)").alias(
                "purity_ppm"
            ),
        )
    )


Q93_SQL = f"""
WITH {_KM_CTES},
labeled AS MATERIALIZED (
  SELECT a.cid, CAST(emb.label AS BIGINT) AS label
  FROM kfinal a JOIN embeddings emb ON emb.vec_id = a.vec_id),
cells AS MATERIALIZED (
  SELECT cid, label, COUNT(*) AS cnt FROM labeled GROUP BY cid, label)
SELECT cid,
       CAST(SUM(cnt) OVER (PARTITION BY cid) AS BIGINT) AS n_pts,
       label AS top_label,
       CAST(1000000 * cnt // SUM(cnt) OVER (PARTITION BY cid) AS BIGINT)
         AS purity_ppm
FROM cells
QUALIFY row_number() OVER (PARTITION BY cid ORDER BY cnt DESC, label ASC) = 1
"""


# --------------------------------------------------------------------------
# q94 — semi-supervised label spreading over the near-dup graph (weak
# supervision: Zhu & Ghahramani label propagation, majority-vote form).
# A thin seed set (docs with doc_id % 10 == 0 expose their lang) spreads
# along the MinHash band-candidate edges: each round, every still-
# unlabeled doc adjacent to labeled docs takes the MAJORITY neighbor
# label (ties → lexicographically smallest); labeled docs are fixed.
# Two rounds unrolled (the q75/q82 constant-iteration discipline), then
# the per-round cohorts are audited against the TRUE lang — the
# measured-accuracy row a weak-supervision pipeline reports before
# trusting propagated labels. Differs from q16 (label propagation for
# connected COMPONENTS — min-id, structure only); this propagates
# semantic labels with votes and measures agreement.
# Scale shape: edges are the memoized capped candidate pairs (fan-out
# bounded by _BAND_CAP's hub-star guard); each round is one vote agg on
# dst + an anti-join against the bounded label table; labels ≤ n_docs
# rows, persisted per round so round 2 doesn't replay round 1's lineage.
# Output: 4 cohort rows (seed / round-1 / round-2 / unlabeled).
# --------------------------------------------------------------------------

_LS_ROUNDS = 2


def q94_label_spreading(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    pairs = _cand_pairs_table(spark, sf_dir)
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionByName(
            pairs.select(
                F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")
            )
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    labels = docs.filter(F.col("doc_id") % 10 == 0).select(
        "doc_id", F.col("lang").alias("label"), F.lit(0).cast("long").alias("rnd")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    for r in range(1, _LS_ROUNDS + 1):
        votes = (
            edges.join(
                labels.select(F.col("doc_id").alias("src"), "label"), "src"
            )
            .join(
                labels.select(F.col("doc_id").alias("dst")),
                "dst",
                "left_anti",
            )
            .groupBy("dst", "label")
            .agg(F.count("*").alias("cnt"))
        )
        wins = votes.groupBy("dst").agg(
            F.min(
                F.struct((-F.col("cnt")).alias("nc"), F.col("label").alias("l"))
            ).alias("w")
        )
        new = wins.select(
            F.col("dst").alias("doc_id"),
            F.col("w.l").alias("label"),
            F.lit(r).cast("long").alias("rnd"),
        )
        labels = labels.unionByName(new).persist(StorageLevel.MEMORY_AND_DISK)
    audited = docs.join(labels, "doc_id", "left").select(
        F.coalesce("rnd", F.lit(-1)).cast("long").alias("rnd"),
        F.when(F.col("label") == F.col("lang"), F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("correct"),
    )
    return audited.groupBy("rnd").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("correct").cast("long").alias("n_correct"),
        F.expr("CAST(1000000 * sum(correct) div count(*) AS LONG)").alias(
            "acc_ppm"
        ),
    )


def _ls_round_sql(r: int) -> str:
    prev = f"lab{r - 1}"
    return f"""votes{r} AS MATERIALIZED (
  SELECT e.dst AS doc_id, l.label, COUNT(*) AS cnt
  FROM edges e
  JOIN {prev} l ON l.doc_id = e.src
  WHERE e.dst NOT IN (SELECT doc_id FROM {prev})
  GROUP BY e.dst, l.label),
lab{r} AS MATERIALIZED (
  SELECT * FROM {prev}
  UNION ALL
  SELECT doc_id, label, {r} AS rnd FROM (
    SELECT doc_id, label,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY cnt DESC, label ASC) AS rk
    FROM votes{r}) WHERE rk = 1)"""


Q94_SQL = f"""
WITH toks AS MATERIALIZED (
  SELECT doc_id, str_split(text, ' ') AS t FROM documents
  WHERE len(str_split(text, ' ')) >= 3),
sh AS MATERIALIZED (
  SELECT DISTINCT doc_id, t[i + 1] || ' ' || t[i + 2] || ' ' || t[i + 3] AS s
  FROM toks, LATERAL (SELECT unnest(generate_series(0, len(t) - 3)) AS i) g),
{_MH_SQL_CTES},
{_pairs_sql_cte("cand", materialized=True)},
edges AS MATERIALIZED (
  SELECT doc_a AS src, doc_b AS dst FROM cand
  UNION ALL
  SELECT doc_b AS src, doc_a AS dst FROM cand),
lab0 AS MATERIALIZED (
  SELECT doc_id, lang AS label, CAST(0 AS BIGINT) AS rnd
  FROM documents WHERE doc_id % 10 = 0),
{",".join(_ls_round_sql(r) for r in range(1, _LS_ROUNDS + 1))}
SELECT COALESCE(l.rnd, -1) AS rnd,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN l.label = d.lang THEN 1 ELSE 0 END) AS BIGINT)
         AS n_correct,
       CAST(1000000 * SUM(CASE WHEN l.label = d.lang THEN 1 ELSE 0 END)
            // COUNT(*) AS BIGINT) AS acc_ppm
FROM documents d LEFT JOIN lab{_LS_ROUNDS} l ON l.doc_id = d.doc_id
GROUP BY COALESCE(l.rnd, -1)
"""


# --------------------------------------------------------------------------
# q95 — ANN recall audit: IVF top-k (q15) measured against exact
# brute-force top-k on the SAME query set. The q73 discipline applied to
# the similarity-search family: an approximate index is only trustworthy
# with a measured recall number next to it (every production ANN system
# ships this audit). Per query vector, overlap = |IVF top-k ∩ exact
# top-k|; output is the bounded overlap histogram (k+1 rows) with each
# cohort's share and the global mean recall in ppm.
# Scale shape: the IVF arm is q15's bucket-probe (broadcast query set,
# memoized index). The exact arm is the AUDIT arm — a broadcast
# crossJoin of the n/50 query sample against the corpus, the same
# deliberate bounded brute-force shape as q12's oracle twin; at 100 TB
# the audit runs on a query SAMPLE by construction (vec_id % 50 here).
# The overlap join and histogram aggregate over ≤ n_queries·k rows.
# Measured at sf0.1: mean recall@3 = 19.2% (overlap histogram
# 24/10/5/1 for 0/1/2/3 hits) — the known nprobe=1 trade-off: a
# query's true neighbors often live across a Voronoi boundary. The
# audit is the point; raising recall is the standard multi-probe knob
# (probe the p nearest coarse cells instead of 1), which the two-level
# index supports without reshaping — documented, not silently tuned.
# --------------------------------------------------------------------------


def _ann_recall_hist(
    spark: SparkSession, sf_dir: str, approx: DataFrame
) -> DataFrame:
    """Overlap histogram of an approximate top-k arm against the exact
    brute-force ground truth on the shared %50 query sample — the audit
    frame q95 (nprobe=1) and q96 (multi-probe) both report through."""
    assigned = _ivf_assigned(spark, sf_dir).select("vec_id", "v")
    norm = F.sqrt(F.expr("aggregate(v, 0D, (acc, x) -> acc + x * x)"))
    base = assigned.withColumn("nrm", norm)
    qset = base.filter(F.pmod("vec_id", F.lit(50)) == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    dot = F.expr(
        "aggregate(zip_with(v, qv, (x, y) -> x * y), 0D, (acc, x) -> acc + x)"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    exact = (
        base.crossJoin(F.broadcast(qset))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            (dot / (F.col("nrm") * F.col("qn"))).alias("cos"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _TOPK)
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
    )
    hits = exact.join(approx, ["query_id", "neighbor_id"]).groupBy(
        "query_id"
    ).agg(F.count("*").alias("ov"))
    per_q = qset.select("query_id").join(hits, "query_id", "left").select(
        F.coalesce("ov", F.lit(0)).cast("long").alias("overlap")
    )
    hist = per_q.groupBy("overlap").agg(F.count("*").alias("n_queries"))
    wt = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        hist.withColumn("tot_q", F.sum("n_queries").over(wt))
        .withColumn(
            "tot_ov", F.sum(F.col("overlap") * F.col("n_queries")).over(wt)
        )
        .select(
            "overlap",
            F.col("n_queries").cast("long").alias("n_queries"),
            F.expr("CAST(1000000 * n_queries div tot_q AS LONG)").alias(
                "share_ppm"
            ),
            F.expr(
                f"CAST((1000000 * tot_ov) div ({_TOPK} * tot_q) AS LONG)"
            ).alias("mean_recall_ppm"),
        )
    )


def q95_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    ivf = q15_ann_ivf(spark, sf_dir).select("query_id", "neighbor_id")
    return _ann_recall_hist(spark, sf_dir, ivf)


def _ann_audit_tail_sql(approx: str) -> str:
    """exact arm + overlap histogram CTE tail shared by Q95/Q96; compares
    the named approximate-top-k CTE against brute-force ground truth."""
    return f"""exact AS MATERIALIZED (
  SELECT query_id, vec_id AS neighbor_id FROM (
    SELECT q.query_id, e.vec_id,
           row_number() OVER (PARTITION BY q.query_id
                              ORDER BY list_cosine_similarity(e.v, q.qv) DESC,
                                       e.vec_id ASC) AS rank
    FROM e, q WHERE e.vec_id <> q.query_id
  ) WHERE rank <= {_TOPK}),
hits AS MATERIALIZED (
  SELECT i.query_id, COUNT(*) AS ov
  FROM {approx} i JOIN exact x
    ON x.query_id = i.query_id AND x.neighbor_id = i.neighbor_id
  GROUP BY i.query_id),
per_q AS MATERIALIZED (
  SELECT CAST(COALESCE(h.ov, 0) AS BIGINT) AS overlap
  FROM q LEFT JOIN hits h ON h.query_id = q.query_id),
hist AS MATERIALIZED (
  SELECT overlap, COUNT(*) AS n_queries FROM per_q GROUP BY overlap)
SELECT overlap, CAST(n_queries AS BIGINT) AS n_queries,
       CAST(1000000 * n_queries // SUM(n_queries) OVER () AS BIGINT)
         AS share_ppm,
       CAST(1000000 * SUM(overlap * n_queries) OVER ()
            // ({_TOPK} * SUM(n_queries) OVER ()) AS BIGINT)
         AS mean_recall_ppm
FROM hist"""


Q95_SQL = f"""
WITH {_IVF_CTES},
q AS MATERIALIZED (
  SELECT vec_id AS query_id, v AS qv, bucket AS qb
  FROM assigned WHERE vec_id % 50 = 0),
ivf AS MATERIALIZED (
  SELECT query_id, vec_id AS neighbor_id FROM (
    SELECT q.query_id, a.vec_id,
           row_number() OVER (PARTITION BY q.query_id
                              ORDER BY list_cosine_similarity(a.v, q.qv) DESC,
                                       a.vec_id ASC) AS rank
    FROM assigned a JOIN q ON a.bucket = q.qb
    WHERE a.vec_id <> q.query_id
  ) WHERE rank <= {_TOPK}),
{_ann_audit_tail_sql("ivf")}
"""


# --------------------------------------------------------------------------
# q96 — multi-probe IVF (the fix for the recall gap q95 MEASURED). q95
# showed nprobe=1 recall@3 ≈ 19% at sf0.1: true neighbors routinely sit
# across a Voronoi boundary from the query's own cell. The standard
# production knob is multi-probe: rank ALL LEAF cells of the (two-level)
# index by centroid distance and search the nearest _NPROBE of them. The
# leaf codebook is the level-1 centroids for unsplit buckets plus every
# split round's sub-centroids under their composite ids — the flat
# "posting-list directory" a 100-TB IVF store keeps alongside the index
# (≤ Σk ≈ thousands of rows: broadcast-sized by construction). Probe
# selection is the same broadcast-codebook Arrow argmin discipline as
# assignment (top-p by exact integer distance, ties → lowest bucket id);
# the probe join fans each query to ≤ _NPROBE buckets — cost scales
# linearly in nprobe, the explicit recall/latency dial. Same audit frame
# as q95: measured at sf0.1, mean recall@3 rises 19.2% → 43.3% at
# nprobe=4 (of ~78 leaf cells) — the expected roughly-linear recall
# gain per probed cell at this k/n ratio.
# --------------------------------------------------------------------------

_NPROBE = 4


def _ivf_leaf_codebook(spark: SparkSession, sf_dir: str):
    """(ids, matrix) of every LEAF bucket's centroid: level-1 centroids
    whose buckets were never split + each split round's sub-centroids
    under their composite ids. Parents of split buckets hold no members
    (every row re-assigns to a child), so leaves partition the corpus."""
    import numpy as np

    _ivf_assigned(spark, sf_dir)  # ensures training + split memos exist
    cents = train_ivf_centroids(spark, sf_dir)
    leaves = {cid: np.array(c, dtype=np.int64) for cid, c in enumerate(cents)}
    for books in _IVF_SPLIT_MEMO.get(sf_dir, []):
        for parent, arr in books.items():
            leaves.pop(parent, None)
            for i in range(len(arr)):
                leaves[(parent + 1) * _IVF_SUB_SHIFT + i + 1] = arr[i]
    ids = sorted(leaves)
    return (
        np.array(ids, dtype=np.int64),
        np.stack([leaves[i] for i in ids]).astype(np.int64),
    )


def _multiprobe_query_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shared %50 query sample with its _NPROBE nearest leaf cells
    exploded: (query_id, qn, qiv, qb). Probe selection is the broadcast-
    leaf-codebook Arrow argsort (top-p by exact integer distance, ties →
    lowest bucket id) — q96 scores candidates full-precision, q97 through
    the SQ8-reconstructed store; both fan each query to ≤ _NPROBE cells."""
    import numpy as np

    ids, mat = _ivf_leaf_codebook(spark, sf_dir)
    bc = spark.sparkContext.broadcast((ids, mat))

    @F.pandas_udf("array<long>")
    def probe_buckets(qiv: pd.Series) -> pd.Series:
        lids, lmat = bc.value
        P = np.array(qiv.tolist(), dtype=np.int64)
        d2 = _sq_dists(P, lmat)
        out = []
        for r in range(P.shape[0]):
            order = np.lexsort((lids, d2[r]))  # dist asc, bucket id asc
            out.append([int(x) for x in lids[order[: _NPROBE]]])
        return pd.Series(out)

    return (
        _ivf_assigned(spark, sf_dir)
        .filter(F.pmod("vec_id", F.lit(50)) == 0)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("vn").alias("qn"),
            F.expr(
                "transform(v, x -> cast(floor(x * 1000000D + 0.5D) AS bigint))"
            ).alias("qiv"),
        )
        .withColumn("qb", F.explode(probe_buckets(F.col("qiv"))))
    )


def q96_ann_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    assigned = _ivf_assigned(spark, sf_dir).select("vec_id", "vn", "bucket")
    q = _multiprobe_query_sample(spark, sf_dir).select(
        "query_id", "qn", "qb"
    )
    dot = F.expr(
        "aggregate(zip_with(vn, qn, (x, y) -> x * y), 0D, (acc, x) -> acc + x)"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    approx = (
        assigned.join(F.broadcast(q), F.col("bucket") == F.col("qb"))
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("cos", dot)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _TOPK)
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
    )
    return _ann_recall_hist(spark, sf_dir, approx)


def _ivf_leaves_sql() -> str:
    """Leaf-codebook CTE replaying _ivf_leaf_codebook: level-1 centroids
    minus split parents, plus each split level's sub-centroids (the last
    level's leaves are unconditioned — nothing deeper exists)."""
    parts = [
        f"""SELECT cid AS bucket, cv FROM cent{_IVF_ITERS}
  WHERE cid NOT IN (SELECT bucket FROM ovr2)"""
    ]
    for lv in range(2, _IVF_MAX_LEVELS + 1):
        comp = f"(s.bucket + 1) * {_IVF_SUB_SHIFT} + s.cid + 1"
        guard = (
            f"\n  WHERE {comp} NOT IN (SELECT bucket FROM ovr{lv + 1})"
            if lv < _IVF_MAX_LEVELS
            else ""
        )
        parts.append(
            f"SELECT {comp} AS bucket, s.cv FROM scent{lv}_{_IVF_ITERS} s{guard}"
        )
    return "leaves AS MATERIALIZED (\n  " + "\n  UNION ALL\n  ".join(parts) + ")"


_Q96_QDIST = (
    "list_sum(list_transform(generate_series(1, len(q.qiv)), "
    "i -> (q.qiv[i] - l.cv[i]) * (q.qiv[i] - l.cv[i])))"
)

Q96_SQL = f"""
WITH {_IVF_CTES},
{_ivf_leaves_sql()},
q AS MATERIALIZED (
  SELECT a.vec_id AS query_id, a.v AS qv, e.qv AS qiv
  FROM assigned a JOIN e ON e.vec_id = a.vec_id
  WHERE a.vec_id % 50 = 0),
mp AS MATERIALIZED (
  SELECT query_id, bucket FROM (
    SELECT q.query_id, l.bucket,
           row_number() OVER (PARTITION BY q.query_id
                              ORDER BY {_Q96_QDIST} ASC, l.bucket ASC) AS rk
    FROM q, leaves l) WHERE rk <= {_NPROBE}),
mprobe AS MATERIALIZED (
  SELECT query_id, vec_id AS neighbor_id FROM (
    SELECT p.query_id, a.vec_id,
           row_number() OVER (PARTITION BY p.query_id
                              ORDER BY list_cosine_similarity(a.v, q2.qv) DESC,
                                       a.vec_id ASC) AS rank
    FROM mp p
    JOIN assigned a ON a.bucket = p.bucket
    JOIN q q2 ON q2.query_id = p.query_id
    WHERE a.vec_id <> p.query_id) WHERE rank <= {_TOPK}),
{_ann_audit_tail_sql("mprobe")}
"""


# --------------------------------------------------------------------------
# q97 — SQ8-compressed ANN recall (ADC audit). q84 built the scalar
# quantizer and measured per-vector reconstruction ERROR; q97 measures
# what that error COSTS where it matters: retrieval recall. The database
# side of the q96 multi-probe search is replaced by the 8-bit store —
# every candidate is scored through its SQ8-RECONSTRUCTED vector while
# the query stays full-precision (FAISS's asymmetric-distance setup),
# and the same q95/q96 audit frame reports overlap vs exact brute-force
# ground truth. Isolation by construction: identical probe selection and
# candidate sets as q96, so any recall delta vs q96 is pure quantization
# loss (measured at sf0.1: none — 8 bits/dim is lossless at this k).
# Scale shape: the per-dimension [mn,mx] trainer is ONE map-side-
# combinable d-row agg collected once per (session, sf_dir) (bounded
# scalar collect, d=64) and inlined as two d-element literal arrays —
# reconstruction is then a pure column map over the memoized IVF index
# (zero extra joins/exchanges: at 100 TB the store ships (vec_id,
# bucket, codes) and decode happens in the scan). Cross-engine-exact
# ordering: dot/na/nb are exact int64 (< 2^53), and BOTH engines
# evaluate the same cast(dot)/sqrt(cast(na)·cast(nb)) IEEE-double
# expression — identical inputs, correctly-rounded ops, identical
# doubles; ties broken by vec_id in both.
# --------------------------------------------------------------------------

_SQ8_STATS_MEMO: dict = {}


def _sq8_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, bucket, rv, nb): the IVF index with each vector replaced
    by its SQ8 round-nearest-midpoint reconstruction (q84's exact integer
    formula) + the reconstruction's squared norm."""
    key = (spark.sparkContext.applicationId, sf_dir)
    stats = _SQ8_STATS_MEMO.get(key)
    if stats is None:
        rows = (
            _quantized_emb(spark, sf_dir)
            .select(F.posexplode("qv").alias("j", "x"))
            .groupBy("j")
            .agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
            .collect()  # bounded: d = dim(embedding) rows
        )
        by_j = {r["j"]: (r["mn"], r["mx"]) for r in rows}
        stats = (
            [int(by_j[j][0]) for j in sorted(by_j)],
            [int(by_j[j][1]) for j in sorted(by_j)],
        )
        _memo_put(_SQ8_STATS_MEMO, key, stats, spark)
    mn, mx = stats
    # two d-element literal arrays (128 nodes — far below the k·d plan-
    # bloat class the IVF broadcast exists to avoid)
    recon = (
        "transform(sequence(0, size(qv) - 1), i -> mn_a[i] + "
        "(2 * (CASE WHEN mx_a[i] = mn_a[i] THEN 0L "
        "ELSE ((qv[i] - mn_a[i]) * 255) div (mx_a[i] - mn_a[i]) END) "
        "* (mx_a[i] - mn_a[i]) + 255) div 510)"
    )
    return (
        _ivf_assigned(spark, sf_dir)
        .select(
            "vec_id",
            "bucket",
            F.expr(
                "transform(v, x -> cast(floor(x * 1000000D + 0.5D) AS bigint))"
            ).alias("qv"),
        )
        .withColumn("mn_a", F.array(*[F.lit(v) for v in mn]))
        .withColumn("mx_a", F.array(*[F.lit(v) for v in mx]))
        .withColumn("rv", F.expr(recon))
        .withColumn(
            "nb",
            F.expr("aggregate(zip_with(rv, rv, (x, y) -> x * y), 0L,"
                   " (acc, x) -> acc + x)"),
        )
        .select("vec_id", "bucket", "rv", "nb")
    )


def _adc_topk_hist(
    spark: SparkSession, sf_dir: str, store: DataFrame
) -> DataFrame:
    """Shared asymmetric-distance audit arm (q97 SQ8 / q102 PQ): score the
    q96 multi-probe candidate set through a RECONSTRUCTED store — (vec_id,
    bucket, rv, nb) with rv the compressed-then-decoded integer vector —
    while the query side stays full-precision, then report top-k overlap
    through the q95/q96 recall frame. Identical probe selection and
    candidate sets across q96/q97/q102, so recall deltas isolate pure
    quantization loss per compression level."""
    q = _multiprobe_query_sample(spark, sf_dir).select(
        "query_id",
        "qiv",
        F.expr(
            "aggregate(zip_with(qiv, qiv, (x, y) -> x * y), 0L,"
            " (acc, x) -> acc + x)"
        ).alias("na"),
        "qb",
    )
    dot = F.expr(
        "aggregate(zip_with(rv, qiv, (x, y) -> x * y), 0L,"
        " (acc, x) -> acc + x)"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosd"), F.asc("vec_id"))
    approx = (
        store.join(F.broadcast(q), F.col("bucket") == F.col("qb"))
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("dot", dot)
        .withColumn(
            "cosd",
            F.expr(
                "cast(dot AS DOUBLE)"
                " / sqrt(cast(na AS DOUBLE) * cast(nb AS DOUBLE))"
            ),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _TOPK)
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
    )
    return _ann_recall_hist(spark, sf_dir, approx)


def q97_sq8_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _adc_topk_hist(spark, sf_dir, _sq8_store(spark, sf_dir))


_Q97_DOT = (
    "list_sum(list_transform(generate_series(1, len(q2.qiv)), "
    "i -> r.rv[i] * q2.qiv[i]))"
)

Q97_SQL = f"""
WITH {_IVF_CTES},
{_ivf_leaves_sql()},
stats AS MATERIALIZED (
  SELECT u.j, MIN(u.x) AS mn, MAX(u.x) AS mx
  FROM e, LATERAL (SELECT unnest(qv) AS x,
                          unnest(generate_series(0, len(qv) - 1)) AS j) u
  GROUP BY u.j),
rnorm AS MATERIALIZED (
  SELECT vec_id, rv,
         CAST(list_sum(list_transform(rv, x -> x * x)) AS BIGINT) AS nb
  FROM (
    SELECT vec_id,
           list(mn + (2 * (CASE WHEN mx = mn THEN 0
                           ELSE ((x - mn) * 255) // (mx - mn) END)
                      * (mx - mn) + 255) // 510 ORDER BY j) AS rv
    FROM (
      SELECT e.vec_id, u.j, u.x, s.mn, s.mx
      FROM e, LATERAL (SELECT unnest(qv) AS x,
                              unnest(generate_series(0, len(qv) - 1)) AS j) u
      JOIN stats s ON s.j = u.j)
    GROUP BY vec_id)),
q AS MATERIALIZED (
  SELECT a.vec_id AS query_id, a.v AS qv, e.qv AS qiv,
         CAST(list_sum(list_transform(e.qv, x -> x * x)) AS BIGINT) AS na
  FROM assigned a JOIN e ON e.vec_id = a.vec_id
  WHERE a.vec_id % 50 = 0),
mp AS MATERIALIZED (
  SELECT query_id, bucket FROM (
    SELECT q.query_id, l.bucket,
           row_number() OVER (PARTITION BY q.query_id
                              ORDER BY {_Q96_QDIST} ASC, l.bucket ASC) AS rk
    FROM q, leaves l) WHERE rk <= {_NPROBE}),
sq8 AS MATERIALIZED (
  SELECT query_id, vec_id AS neighbor_id FROM (
    SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cosd DESC, vec_id ASC) AS rank
    FROM (
      SELECT p.query_id, a.vec_id,
             CAST({_Q97_DOT} AS DOUBLE)
               / sqrt(CAST(q2.na AS DOUBLE) * CAST(r.nb AS DOUBLE)) AS cosd
      FROM mp p
      JOIN assigned a ON a.bucket = p.bucket
      JOIN rnorm r ON r.vec_id = a.vec_id
      JOIN q q2 ON q2.query_id = p.query_id
      WHERE a.vec_id <> p.query_id)
  ) WHERE rank <= {_TOPK}),
{_ann_audit_tail_sql("sq8")}
"""


# --------------------------------------------------------------------------
# q98 — exact phrase search over a positional inverted index: the
# retrieval op BM25 (q60) can't express — "these words, adjacent, in this
# order". The classic distributed shape: tokenize with POSITIONS, keep
# only phrase-vocabulary postings (the broadcast phrase-word table
# filters the corpus stream immediately after the explode — everything
# else never shuffles), then the k-way positional intersect collapses to
# ONE group: a posting for word i of phrase p at position pos votes for
# candidate start (p, doc_id, pos − i); a start where all k distinct
# offsets voted is an occurrence. Overlapping matches count (both
# engines, same rule); a repeated-word phrase ('slow slow') exercises the
# DISTINCT-offset guard — one token can't satisfy two offsets at the
# same start. Per-doc result rows (n_occ, first_pos) are the search
# output; the start-group agg is the single corpus-scale shuffle (on the
# phrase-filtered stream), the per-doc re-agg runs over occurrence rows.
# --------------------------------------------------------------------------

_PHRASES = [
    (1, "hash join"),
    (2, "table scan"),
    (3, "sort merge join"),
    (4, "window agg"),
    (5, "slow slow"),
]


def q98_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    post = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok")
    )
    pw = spark.createDataFrame(
        [
            (pid, off, w)
            for pid, ph in _PHRASES
            for off, w in enumerate(ph.split(" "))
        ],
        "pid INT, off INT, tok STRING",
    )
    lens = spark.createDataFrame(
        [(pid, len(ph.split(" "))) for pid, ph in _PHRASES], "pid INT, n INT"
    )
    occ = (
        post.join(F.broadcast(pw), "tok")
        .select(
            "pid", "doc_id", (F.col("pos") - F.col("off")).alias("start"), "off"
        )
        .filter(F.col("start") >= 0)
        .groupBy("pid", "doc_id", "start")
        .agg(F.countDistinct("off").alias("k"))
    )
    return (
        occ.join(F.broadcast(lens), "pid")
        .filter(F.col("k") == F.col("n"))
        .groupBy("pid", "doc_id")
        .agg(
            F.count("*").cast("long").alias("n_occ"),
            F.min("start").cast("long").alias("first_pos"),
        )
    )


_Q98_PW = ", ".join(
    f"({pid}, {off}, '{w}')"
    for pid, ph in _PHRASES
    for off, w in enumerate(ph.split(" "))
)
_Q98_LENS = ", ".join(
    f"({pid}, {len(ph.split(' '))})" for pid, ph in _PHRASES
)

Q98_SQL = f"""
WITH post AS (
  SELECT doc_id, u.pos, u.tok
  FROM documents,
       LATERAL (SELECT unnest(str_split(text, ' ')) AS tok,
                       unnest(generate_series(0, len(str_split(text, ' ')) - 1))
                         AS pos) u),
pw(pid, off, tok) AS (VALUES {_Q98_PW}),
plen(pid, n) AS (VALUES {_Q98_LENS}),
occ AS (
  SELECT pw.pid, p.doc_id, p.pos - pw.off AS start,
         COUNT(DISTINCT pw.off) AS k
  FROM post p JOIN pw ON pw.tok = p.tok
  WHERE p.pos - pw.off >= 0
  GROUP BY pw.pid, p.doc_id, p.pos - pw.off)
SELECT CAST(o.pid AS INTEGER) AS pid, o.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_occ,
       CAST(MIN(o.start) AS BIGINT) AS first_pos
FROM occ o JOIN plen l ON l.pid = o.pid AND o.k = l.n
GROUP BY o.pid, o.doc_id
"""


# --------------------------------------------------------------------------
# q99 — range-partition split points (equi-depth boundaries) from the
# histogram CDF: the planning op behind skew-free range partitioning /
# sorted-output sharding at 100 TB. Spark's own RangePartitioner samples;
# this is the deterministic exact-rank version: for B target buckets the
# i-th boundary is the first unit bin whose cumulative count reaches
# rank_i = (i·n + B − 1) div B (q57's ceiling-rank arithmetic, so
# boundaries are exact order statistics of the binned values, ties
# engine-identical). Every row between boundary i−1 (exclusive) and i
# (inclusive) lands in bucket i: per-bucket row counts are equal to
# within one bin's mass — the guarantee that makes downstream
# repartitionByRange-style writes balanced. Scale shape: ONE map-side-
# combinable (event_type, bin) agg (the shuffle carries ≤ n_bins rows per
# type, q59's bounded class); the boundary explode + CDF walk run over
# the tiny bin table. Output pins each boundary's bin AND the realized
# bucket mass (cum at the boundary), so a regression in either the walk
# or the rank arithmetic is caught.
# --------------------------------------------------------------------------

_Q99_BUCKETS = 16


def q99_range_split_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    bins = ev.groupBy(
        "event_type", F.floor("value").cast("long").alias("bin")
    ).agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("event_type").orderBy("bin")
    wall = Window.partitionBy("event_type")
    cum = bins.withColumn("cum", F.sum("cnt").over(w)).withColumn(
        "n", F.sum("cnt").over(wall)
    )
    b = F.explode(
        F.array(*[F.lit(i) for i in range(1, _Q99_BUCKETS + 1)])
    ).alias("bucket_no")
    ranks = cum.select("event_type", "bin", "cum", "n", b).withColumn(
        "rank", F.expr(f"(bucket_no * n + {_Q99_BUCKETS} - 1) div {_Q99_BUCKETS}")
    )
    return (
        ranks.filter(F.col("cum") >= F.col("rank"))
        .groupBy("event_type", "bucket_no")
        .agg(
            F.min("bin").cast("long").alias("split_bin"),
            F.min("cum").cast("long").alias("cum_at_split"),
            F.max("n").cast("long").alias("n_events"),
        )
    )


Q99_SQL = f"""
WITH bins AS (
  SELECT event_type, CAST(floor(value) AS BIGINT) AS bin, COUNT(*) AS cnt
  FROM events GROUP BY event_type, CAST(floor(value) AS BIGINT)),
cum AS (
  SELECT event_type, bin, cnt,
         SUM(cnt) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
         SUM(cnt) OVER (PARTITION BY event_type) AS n
  FROM bins),
ranks AS (
  SELECT c.event_type, c.bin, c.cum, c.n, b.bucket_no,
         (b.bucket_no * c.n + {_Q99_BUCKETS} - 1) // {_Q99_BUCKETS} AS rank
  FROM cum c, (SELECT unnest(generate_series(1, {_Q99_BUCKETS})) AS bucket_no) b)
SELECT event_type, CAST(bucket_no AS INTEGER) AS bucket_no,
       CAST(MIN(bin) AS BIGINT) AS split_bin,
       CAST(MIN(cum) AS BIGINT) AS cum_at_split,
       CAST(MAX(n) AS BIGINT) AS n_events
FROM ranks WHERE cum >= rank
GROUP BY event_type, bucket_no
"""


# --------------------------------------------------------------------------
# q100 — exact-quota stratified holdout: allocate a 10% validation split
# across languages with LARGEST-REMAINDER apportionment (quotas sum to
# exactly N div 10 — q21's md5-mod split only approximates proportions),
# then select each stratum's quota as the a_l SMALLEST doc hashes —
# exact per-stratum order statistics WITHOUT a per-lang corpus window.
# Selection is the q67/q99 two-level discipline applied to hashes:
# (1) one map-side-combinable (lang, top-16-bits-of-h) histogram — the
# only corpus-scale shuffle, ≤ 65536 rows per lang out; (2) a CDF walk
# over that bounded table finds each lang's threshold bin T_l (first
# cum ≥ a_l): everything below T_l is selected wholesale, and only the
# single threshold BIN (≈ n_l/2^16 rows) is ranked to pick the exact
# remainder — the low-cardinality per-lang window that would otherwise
# funnel 10% of the corpus through one task never exists. h is the
# repo's 60-bit md5 idiom (engine-identical); ties broken by doc_id.
# Output pins the full apportionment (floor share, remainder rank,
# quota), the realized threshold, and Σ doc_id over the selected set —
# n_selected must equal the quota exactly (asserted in a semantic test).
# --------------------------------------------------------------------------

_Q100_FRAC = 10  # select N div _Q100_FRAC rows overall
_Q100_BIN_SHIFT = 44  # h < 2^60; top 16 bits → 65536 bins


def q100_quota_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("long")
        .alias("h"),
    ).withColumn("hb", F.expr(f"h div {1 << _Q100_BIN_SHIFT}"))
    binc = docs.groupBy("lang", "hb").agg(F.count("*").alias("cnt"))
    binc = binc.persist(StorageLevel.MEMORY_AND_DISK)  # CDF walk + alloc

    # --- apportionment over the ≤ n_langs-row table (bounded windows) ---
    langs = binc.groupBy("lang").agg(F.sum("cnt").alias("n_l"))
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    wrk = Window.orderBy(F.desc("r_l"), F.asc("lang"))
    alloc = (
        langs.withColumn("n_total", F.sum("n_l").over(wall))
        .withColumn("q_total", F.expr(f"n_total div {_Q100_FRAC}"))
        # decimal(38,0) product: n_l·Q overflows int64 at corpus scale
        .withColumn(
            "f_l",
            F.expr(
                "CAST((CAST(n_l AS DECIMAL(38,0)) * q_total) div n_total"
                " AS LONG)"
            ),
        )
        .withColumn(
            "r_l",
            F.expr(
                "CAST((CAST(n_l AS DECIMAL(38,0)) * q_total) % n_total"
                " AS LONG)"
            ),
        )
        .withColumn("d", F.expr("q_total - sum(f_l) OVER ()"))
        .withColumn("rk", F.row_number().over(wrk))
        .withColumn(
            "quota", F.expr("f_l + CASE WHEN rk <= d THEN 1 ELSE 0 END")
        )
        .select("lang", "n_l", "f_l", "r_l", "rk", "quota")
    )

    # --- threshold bin per lang from the CDF of the bounded histogram ---
    wcum = Window.partitionBy("lang").orderBy("hb")
    cum = binc.withColumn("cum", F.sum("cnt").over(wcum))
    thr = (
        cum.join(F.broadcast(alloc.select("lang", "quota")), "lang")
        .filter(F.col("cum") >= F.col("quota"))
        .groupBy("lang")
        .agg(
            F.min("hb").alias("t_bin"),
            F.min_by(F.expr("cum - cnt"), F.col("hb")).alias("below"),
            F.max("quota").alias("quota"),
        )
        .withColumn("extra", F.expr("quota - below"))
        .select("lang", "t_bin", "below", "extra")
    )

    # --- selection in ONE corpus pass: keep hb ≤ T_l (quota subset + its
    # bin), rank within (lang, hb) — below-threshold rows ignore their
    # rank, threshold-bin rows keep rnk ≤ extra. The window partitions on
    # (lang, hb), 65536 well-spread bins per lang — never the per-lang
    # funnel a partitionBy(lang) over 10% of the corpus would be.
    wbin = Window.partitionBy("lang", "hb").orderBy("h", "doc_id")
    sel = (
        docs.join(F.broadcast(thr), "lang")
        .filter(F.col("hb") <= F.col("t_bin"))
        .withColumn("rnk", F.row_number().over(wbin))
        .filter(
            (F.col("hb") < F.col("t_bin")) | (F.col("rnk") <= F.col("extra"))
        )
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_sel"),
            F.sum("doc_id").alias("sum_sel"),
        )
    )
    return (
        alloc.join(F.broadcast(thr.select("lang", "t_bin")), "lang")
        .join(F.broadcast(sel), "lang", "left")
        .select(
            "lang",
            F.col("n_l").cast("long").alias("n_docs"),
            F.col("f_l").cast("long").alias("floor_share"),
            F.col("r_l").cast("long").alias("remainder"),
            F.col("rk").cast("int").alias("remainder_rank"),
            F.col("quota").cast("long").alias("quota"),
            F.col("t_bin").cast("long").alias("threshold_bin"),
            F.expr("coalesce(n_sel, 0)").cast("long").alias("n_selected"),
            F.expr("coalesce(sum_sel, 0)").cast("long").alias("val_checksum"),
        )
    )


Q100_SQL = f"""
WITH d AS (
  SELECT doc_id, lang,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
           AS h
  FROM documents),
db AS (SELECT doc_id, lang, h, h // {1 << _Q100_BIN_SHIFT} AS hb FROM d),
binc AS (SELECT lang, hb, COUNT(*) AS cnt FROM db GROUP BY lang, hb),
langs AS (SELECT lang, SUM(cnt) AS n_l FROM binc GROUP BY lang),
alloc AS (
  SELECT lang, n_l, f_l, r_l,
         row_number() OVER (ORDER BY r_l DESC, lang ASC) AS rk,
         f_l + CASE WHEN row_number() OVER (ORDER BY r_l DESC, lang ASC)
                    <= q_total - SUM(f_l) OVER () THEN 1 ELSE 0 END AS quota
  FROM (
    SELECT lang, n_l,
           CAST((CAST(n_l AS HUGEINT) * q_total) // n_total AS BIGINT) AS f_l,
           CAST((CAST(n_l AS HUGEINT) * q_total) % n_total AS BIGINT) AS r_l,
           q_total
    FROM (SELECT lang, n_l,
                 SUM(n_l) OVER () AS n_total,
                 SUM(n_l) OVER () // {_Q100_FRAC} AS q_total
          FROM langs))),
cum AS (
  SELECT lang, hb, cnt,
         SUM(cnt) OVER (PARTITION BY lang ORDER BY hb) AS cum
  FROM binc),
thr AS (
  SELECT c.lang,
         MIN(c.hb) AS t_bin,
         MIN_BY(c.cum - c.cnt, c.hb) AS below,
         MAX(a.quota) - MIN_BY(c.cum - c.cnt, c.hb) AS extra
  FROM cum c JOIN alloc a ON a.lang = c.lang
  WHERE c.cum >= a.quota
  GROUP BY c.lang),
sel AS (
  SELECT lang, COUNT(*) AS n_sel, SUM(doc_id) AS sum_sel
  FROM (
    SELECT db.lang, db.doc_id, db.hb, t.t_bin, t.extra,
           row_number() OVER (PARTITION BY db.lang, db.hb
                              ORDER BY db.h ASC, db.doc_id ASC) AS rnk
    FROM db JOIN thr t ON t.lang = db.lang
    WHERE db.hb <= t.t_bin)
  WHERE hb < t_bin OR rnk <= extra
  GROUP BY lang)
SELECT a.lang,
       CAST(a.n_l AS BIGINT) AS n_docs,
       CAST(a.f_l AS BIGINT) AS floor_share,
       CAST(a.r_l AS BIGINT) AS remainder,
       CAST(a.rk AS INTEGER) AS remainder_rank,
       CAST(a.quota AS BIGINT) AS quota,
       CAST(t.t_bin AS BIGINT) AS threshold_bin,
       CAST(COALESCE(s.n_sel, 0) AS BIGINT) AS n_selected,
       CAST(COALESCE(s.sum_sel, 0) AS BIGINT) AS val_checksum
FROM alloc a
JOIN thr t ON t.lang = a.lang
LEFT JOIN sel s ON s.lang = a.lang
"""


# --------------------------------------------------------------------------
# q101 — n-gram language identification: the classic fastText-style
# heuristic (hashed character-trigram Naive-Bayes profile per language)
# as a corpus-scale classification pass. The label set is FIXED by the
# model (_LID_LANGS — real lang-ID models ship a closed label set);
# training reads the doc_id%10<8 split, evaluation tags every doc with
# its split so the confusion matrix separates in-sample from held-out.
# Integer-exact throughout (q35/q64 discipline): per-(lang,bucket)
# add-one profile scores in ppm via decimal(38,0), document score =
# sum of bucket scores over trigram OCCURRENCES, argmax by a fixed
# lang-ascending CASE chain (ties → lexicographically smallest lang).
# NOTE (honesty): this synthetic corpus draws every lang's text from
# one shared vocabulary, so measured held-out accuracy ≈ the class
# prior — the AUDIT output is the point, exactly like q95's recall.
# Scale shape: profile = ONE map-side-combinable agg folding the corpus
# to ≤ _LID_B rows (5 conditional sums wide, window over that bounded
# table only); classification = explode → broadcast profile join →
# ONE (doc_id) agg; the confusion matrix is a ≤ 2·|langs|²-row agg.
# No per-doc state, no driver loop; trigram stream never reshuffles on
# anything but doc_id.
# --------------------------------------------------------------------------

_LID_LANGS = ["de", "en", "es", "fr", "zh"]
_LID_B = 256


def _lid_pred_case(prefix: str = "s_") -> str:
    """Shared argmax CASE chain: first lang (ascending) whose score ties
    the max wins — identical text in both engines."""
    arms = []
    for lang in _LID_LANGS:
        conds = " AND ".join(
            f"{prefix}{lang} >= {prefix}{other}"
            for other in _LID_LANGS
            if other != lang
        )
        arms.append(f"WHEN {conds} THEN '{lang}'")
    return "CASE " + " ".join(arms) + " END"


# (trigram → bucket) memo shared across tasks of a reused python worker:
# the corpus vocabulary is shared, so the distinct-trigram space is tiny and
# each md5 is paid once per worker, not once per occurrence. Keys are the
# packed int24 of an ASCII trigram or the str itself (non-ASCII path) — the
# two key spaces cannot collide.
_LID_TRI_CACHE: dict = {}


def _lid_fold_batches(batches):
    """mapInPandas body: (doc_id, lang, text) → per-doc (bkt, cnt) rows.
    Bit-identical to exploding one row per character trigram and counting:
    bkt = ('0x' || md5(tri)[:4]) % _LID_B over UTF-8 bytes, trigrams are
    code-point windows (ASCII texts take a vectorized numpy path; others a
    plain loop). Folding occurrences per doc IN the map kernel removes the
    trigram-explode entirely — the q25 0-exchange class (VERDICT r5 #4)."""
    import hashlib

    import numpy as np

    cache = _LID_TRI_CACHE
    md5 = hashlib.md5
    for pdf in batches:
        out_doc: list = []
        out_lang: list = []
        out_bkt: list = []
        out_cnt: list = []
        for doc_id, lang, text in zip(
            pdf["doc_id"].tolist(), pdf["lang"].tolist(), pdf["text"].tolist()
        ):
            if text is None or len(text) < 3:
                # sentinel: keeps the doc present downstream with zero mass
                # (bkt -1 never matches a real trigram bucket; cnt 0 adds
                # nothing to any sum — including the profile aggregation,
                # whose add-one divisor is the constant _LID_B, not a row
                # count). Lets consumers skip the docs re-join for
                # "every doc appears, scores default 0" semantics.
                out_doc.append(doc_id)
                out_lang.append(lang)
                out_bkt.append(-1)
                out_cnt.append(0)
                continue
            bcounts: dict = {}
            if text.isascii():
                a = np.frombuffer(text.encode(), dtype=np.uint8).astype(np.int32)
                tri = a[:-2] * 65536 + a[1:-1] * 256 + a[2:]
                vals, cnts = np.unique(tri, return_counts=True)
                for v, n in zip(vals.tolist(), cnts.tolist()):
                    b = cache.get(v)
                    if b is None:
                        g = chr(v >> 16) + chr((v >> 8) & 255) + chr(v & 255)
                        b = int(md5(g.encode()).hexdigest()[:4], 16) % _LID_B
                        cache[v] = b
                    bcounts[b] = bcounts.get(b, 0) + n
            else:
                for i in range(len(text) - 2):
                    g = text[i : i + 3]
                    b = cache.get(g)
                    if b is None:
                        b = int(md5(g.encode("utf-8")).hexdigest()[:4], 16) % _LID_B
                        cache[g] = b
                    bcounts[b] = bcounts.get(b, 0) + 1
            for b, n in bcounts.items():
                out_doc.append(doc_id)
                out_lang.append(lang)
                out_bkt.append(b)
                out_cnt.append(n)
        if out_doc:
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out_doc, dtype="int64"),
                    "lang": out_lang,
                    "bkt": pd.Series(out_bkt, dtype="int64"),
                    "cnt": pd.Series(out_cnt, dtype="int64"),
                }
            )


def _lid_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, lang, bkt, cnt) per-doc trigram-bucket counts as a ZERO-
    exchange pure map over the documents scan."""
    return _t(spark, sf_dir, "documents").select("doc_id", "lang", "text").mapInPandas(
        _lid_fold_batches, "doc_id long, lang string, bkt long, cnt long"
    )


def _lid_trigrams(df: DataFrame) -> DataFrame:
    """Explode a (…, text) frame into one row per character trigram with
    its hashed profile bucket — shared by batch q101 and the serve-path
    stream (streaming/classify.py); extra columns (e.g. the stream's
    event-time) ride along, `text` and the raw trigram are dropped."""
    return (
        df.filter(F.length("text") >= 3)
        .select(
            "*",
            F.explode(
                F.expr(
                    "transform(sequence(1, length(text) - 2),"
                    " i -> substring(text, i, 3))"
                )
            ).alias("g"),
        )
        .withColumn(
            "bkt",
            F.conv(F.substring(F.md5("g"), 1, 4), 16, 10).cast("long")
            % _LID_B,
        )
        .drop("g", "text")
    )


def _lid_profiles(
    spark: SparkSession, sf_dir: str, counts: DataFrame | None = None
) -> DataFrame:
    """Train the hashed-trigram Naive-Bayes profile table on the
    doc_id%10<8 split: ≤ _LID_B rows of per-lang add-one ppm scores.
    This is the MODEL a serve path broadcasts (streaming/classify.py);
    batch q101 trains and evaluates it in one plan. Counts arrive pre-
    folded per doc from the 0-exchange map kernel (summing cnt where
    lang = l ≡ counting exploded occurrence rows where lang = l); batch
    q101 passes its persisted counts table so train + score share one
    derivation."""
    cnt = counts if counts is not None else _lid_counts(spark, sf_dir)
    prof = (
        cnt.filter(F.expr("doc_id % 10 < 8"))
        .groupBy("bkt")
        .agg(
            *[
                F.sum(
                    F.when(F.col("lang") == lang, F.col("cnt")).otherwise(F.lit(0))
                ).alias(f"c_{lang}")
                for lang in _LID_LANGS
            ]
        )
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    for lang in _LID_LANGS:
        prof = prof.withColumn(f"t_{lang}", F.sum(f"c_{lang}").over(wall))
    return prof.select(
        "bkt",
        *[
            F.expr(
                f"CAST((CAST(1000000 AS DECIMAL(38,0)) * (c_{lang} + 1))"
                f" div (t_{lang} + {_LID_B}) AS LONG)"
            ).alias(f"p_{lang}")
            for lang in _LID_LANGS
        ],
    )


def _lid_scores(tri: DataFrame, prof: DataFrame, group_cols: list) -> DataFrame:
    """Score trigram rows against the broadcast profile and fold to one
    (s_de..s_zh) score row per group — group_cols is ["doc_id"] in batch
    q101 and [window, doc_id, lang] in the streaming serve path."""
    return (
        tri.join(F.broadcast(prof), "bkt")
        .groupBy(*group_cols)
        .agg(*[F.sum(f"p_{lang}").alias(f"s_{lang}") for lang in _LID_LANGS])
    )


def q101_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ONE 0-exchange fold of the corpus to per-doc bucket counts feeds both
    # the profile training and the scoring arm (the old shape exploded one
    # row per trigram TWICE — VERDICT r5 #4); persist so the two consumers
    # share the map pass.
    cnt = _lid_counts(spark, sf_dir).persist(StorageLevel.MEMORY_AND_DISK)
    prof = _lid_profiles(spark, sf_dir, counts=cnt)
    # LEFT join + coalesce ≡ the old inner join: occurrence rows whose
    # bucket is absent from the trained profile contributed nothing to the
    # per-doc sums there (dropped), and contribute an explicit 0 here. The
    # sentinel rows make every doc present, so the old docs-table re-scan +
    # left join (2 more exchanges + a sort) is gone; lang rides the
    # aggregation key (1:1 with doc_id) and split derives from doc_id.
    sc = (
        cnt.join(F.broadcast(prof), "bkt", "left")
        .groupBy("doc_id", "lang")
        .agg(
            *[
                F.sum(
                    F.coalesce(F.col(f"p_{lang}"), F.lit(0)) * F.col("cnt")
                ).alias(f"s_{lang}")
                for lang in _LID_LANGS
            ]
        )
    )
    scored = sc.select(
        "lang",
        F.expr(
            "CASE WHEN doc_id % 10 < 8 THEN 'train' ELSE 'heldout' END"
        ).alias("split"),
        *[F.col(f"s_{lang}") for lang in _LID_LANGS],
    )
    return (
        scored.withColumn("pred_lang", F.expr(_lid_pred_case()))
        .groupBy("split", F.col("lang").alias("true_lang"), "pred_lang")
        .agg(F.count("*").alias("n_docs"))
    )


Q101_SQL = f"""
WITH tri AS (
  SELECT doc_id, lang,
         ('0x' || substring(md5(substr(text, g.i, 3)), 1, 4))::BIGINT
           % {_LID_B} AS bkt
  FROM documents,
       LATERAL (SELECT unnest(generate_series(1, len(text) - 2)) AS i) g
  WHERE len(text) >= 3),
prof AS (
  SELECT bkt,
         {", ".join(f"SUM(CASE WHEN lang = '{lang}' THEN 1 ELSE 0 END) AS c_{lang}" for lang in _LID_LANGS)}
  FROM tri WHERE doc_id % 10 < 8 GROUP BY bkt),
p AS (
  SELECT bkt,
         {", ".join(f"CAST(CAST(1000000 AS HUGEINT) * (c_{lang} + 1) // (SUM(c_{lang}) OVER () + {_LID_B}) AS BIGINT) AS p_{lang}" for lang in _LID_LANGS)}
  FROM prof),
sc AS (
  SELECT doc_id,
         {", ".join(f"CAST(SUM(p_{lang}) AS BIGINT) AS s_{lang}" for lang in _LID_LANGS)}
  FROM tri JOIN p USING (bkt) GROUP BY doc_id),
scored AS (
  SELECT d.lang,
         CASE WHEN d.doc_id % 10 < 8 THEN 'train' ELSE 'heldout' END AS split,
         {", ".join(f"COALESCE(s.s_{lang}, 0) AS s_{lang}" for lang in _LID_LANGS)}
  FROM documents d LEFT JOIN sc s ON s.doc_id = d.doc_id)
SELECT split, lang AS true_lang, {_lid_pred_case()} AS pred_lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM scored GROUP BY 1, 2, 3
"""


# --------------------------------------------------------------------------
# q102 — product quantization (PQ) ADC recall audit: the next rung DOWN
# the compression ladder q84/q97 started. SQ8 keeps 8 bits/DIMENSION
# (d bytes/vector); PQ stores _PQ_M 4-bit codes/vector (log2(_PQ_K)·m =
# 4 bytes here vs 64 — the FAISS IVF-PQ memory shape for billion-vector
# stores). Per-subspace codebooks are trained with the q87 Lloyd
# discipline (seeds = first _PQ_K vec_ids' subvectors, _PQ_ITERS
# iterations, integer centroids via floor-division means, argmin ties →
# lowest code); encoding and decoding are ONE broadcast-codebook Arrow
# pass over the memoized IVF index (zero extra exchanges — the m·k·dsub
# = d·k codebook is broadcast, never plan literals). The audit scores
# the q96 multi-probe candidate set through the PQ-RECONSTRUCTED store
# (query full-precision) in the shared _adc_topk_hist frame, so recall
# vs q96/q97 isolates pure PQ loss — q96 ≥ q97 ≥/≈ q102 is the
# documented ladder (q96's full-precision re-rank is provably maximal
# for the shared candidate set; see tests/test_ann_ladder.py).
# Cross-engine exactness: same int64 dot / IEEE-double cos expression
# as q97; the oracle replays every Lloyd iteration as unrolled
# MATERIALIZED CTEs (the q87 replay, per subspace).
# --------------------------------------------------------------------------

_PQ_M = 8
_PQ_K = 16
_PQ_ITERS = 2

_PQ_MEMO: dict = {}


def _pq_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, bucket, rv, nb): the IVF index with each vector replaced
    by its PQ reconstruction (concatenated nearest sub-centroids) + the
    reconstruction's squared norm. Codebooks trained on the quantized
    integer embeddings; memoized per (session, sf_dir)."""
    import math

    import numpy as np

    key = (spark.sparkContext.applicationId, sf_dir)
    hit = _PQ_MEMO.get(key)
    if hit is not None:
        return hit

    emb = (
        _quantized_emb(spark, sf_dir)
        .select("vec_id", "qv")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # bounded: exactly _PQ_K rows (the q87 seeding contract)
    seeds = emb.orderBy("vec_id").limit(_PQ_K).collect()
    S = np.array(
        [r["qv"] for r in sorted(seeds, key=lambda r: r["vec_id"])],
        dtype=np.int64,
    )
    d = S.shape[1]
    if d % _PQ_M:
        raise ValueError(f"embedding dim {d} not divisible by m={_PQ_M}")
    dsub = d // _PQ_M
    # cents[s][c] = subvector s of seed vector c
    cents = S.reshape(_PQ_K, _PQ_M, dsub).transpose(1, 0, 2).copy()

    def _codes_udf(book):
        bc = spark.sparkContext.broadcast(book)

        @F.pandas_udf("array<long>")
        def codes_of(qv: pd.Series) -> pd.Series:
            B = bc.value
            P = np.array(qv.tolist(), dtype=np.int64)
            m, _, ds = B.shape
            out = np.empty((P.shape[0], m), dtype=np.int64)
            for s in range(m):
                out[:, s] = _sq_dists(
                    P[:, s * ds : (s + 1) * ds], B[s]
                ).argmin(axis=1)
            return pd.Series(out.tolist())

        return codes_of

    for _ in range(_PQ_ITERS):
        asg = emb.withColumn("codes", _codes_udf(cents)(F.col("qv")))
        cells = (
            asg.select("codes", F.posexplode("qv").alias("dim", "x"))
            .withColumn(
                "code", F.expr(f"codes[cast(dim div {dsub} as int)]")
            )
            .withColumn("sub", F.expr(f"dim div {dsub}"))
            .groupBy("sub", "code", "dim")
            .agg(F.sum("x").alias("sm"), F.count("*").alias("cnt"))
            .collect()  # bounded: ≤ m·k·dsub = d·k rows
        )
        nxt = cents.copy()  # empty code cell keeps its centroid
        for r in cells:
            s, c = int(r["sub"]), int(r["code"])
            # float-division floor — bit-identical to the oracle's
            # FLOOR(CAST(sm AS DOUBLE) / cnt) (the q87 centroid rule)
            nxt[s][c][int(r["dim"]) - s * dsub] = int(
                math.floor(int(r["sm"]) / int(r["cnt"]))
            )
        cents = nxt

    # the training-side projection is dead once the codebooks are final —
    # release it instead of pinning it for the session (ADVICE r5)
    emb.unpersist()

    bcf = spark.sparkContext.broadcast(cents)

    @F.pandas_udf("array<long>")
    def recon_of(qv: pd.Series) -> pd.Series:
        B = bcf.value
        P = np.array(qv.tolist(), dtype=np.int64)
        m, _, ds = B.shape
        out = np.empty((P.shape[0], m * ds), dtype=np.int64)
        for s in range(m):
            codes = _sq_dists(P[:, s * ds : (s + 1) * ds], B[s]).argmin(
                axis=1
            )
            out[:, s * ds : (s + 1) * ds] = B[s][codes]
        return pd.Series(out.tolist())

    store = (
        _ivf_assigned(spark, sf_dir)
        .select(
            "vec_id",
            "bucket",
            F.expr(
                "transform(v, x -> cast(floor(x * 1000000D + 0.5D) AS bigint))"
            ).alias("qv"),
        )
        .withColumn("rv", recon_of(F.col("qv")))
        .withColumn(
            "nb",
            F.expr(
                "aggregate(zip_with(rv, rv, (x, y) -> x * y), 0L,"
                " (acc, x) -> acc + x)"
            ),
        )
        .select("vec_id", "bucket", "rv", "nb")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # memoize the DataFrame itself: _memo_put's eviction unpersists a bare
    # DataFrame value, while a flat [store] list defeated it (ADVICE r5)
    _memo_put(_PQ_MEMO, key, store, spark)
    return store


def q102_pq_adc_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _adc_topk_hist(spark, sf_dir, _pq_store(spark, sf_dir))


def _pq_sql_ctes() -> str:
    """Unrolled per-subspace Lloyd replay (the q87 oracle pattern, with a
    (sub, cid) compound key) ending in rnorm (vec_id, rv, nb)."""
    sl = f"[b.sub * (len({{v}}) // {_PQ_M}) + 1 : (b.sub + 1) * (len({{v}}) // {_PQ_M})]"
    sqd = (
        "list_sum(list_transform(generate_series(1, len(s.sv)), "
        "i -> (s.sv[i] - c.cv[i]) * (s.sv[i] - c.cv[i])))"
    )
    parts = [
        f"""psub AS (SELECT unnest(generate_series(0, {_PQ_M - 1})) AS sub),
pcent0 AS MATERIALIZED (
  SELECT b.sub, p.rn - 1 AS cid, p.qv{sl.format(v='p.qv')} AS cv
  FROM (SELECT qv, row_number() OVER (ORDER BY vec_id) AS rn FROM e) p,
       psub b
  WHERE p.rn <= {_PQ_K}),
esub AS MATERIALIZED (
  SELECT e.vec_id, b.sub, e.qv{sl.format(v='e.qv')} AS sv
  FROM e, psub b)"""
    ]
    prev = "pcent0"
    for t in range(1, _PQ_ITERS + 1):
        parts.append(
            f"""passign{t} AS MATERIALIZED (
  SELECT vec_id, sub, sv, cid FROM (
    SELECT s.vec_id, s.sub, s.sv, c.cid,
           row_number() OVER (PARTITION BY s.vec_id, s.sub
                              ORDER BY {sqd} ASC, c.cid ASC) AS rk
    FROM esub s JOIN {prev} c ON c.sub = s.sub) WHERE rk = 1),
pnewc{t} AS MATERIALIZED (
  SELECT sub, cid,
         list(CAST(FLOOR(CAST(sm AS DOUBLE) / cnt) AS BIGINT)
              ORDER BY dim) AS cv
  FROM (
    SELECT a.sub, a.cid, d.i AS dim, SUM(a.sv[d.i]) AS sm, COUNT(*) AS cnt
    FROM passign{t} a,
         LATERAL (SELECT unnest(generate_series(1, len(a.sv))) AS i) d
    GROUP BY a.sub, a.cid, d.i) GROUP BY sub, cid),
pcent{t} AS MATERIALIZED (
  SELECT p.sub, p.cid, COALESCE(n.cv, p.cv) AS cv
  FROM {prev} p LEFT JOIN pnewc{t} n ON n.sub = p.sub AND n.cid = p.cid)"""
        )
        prev = f"pcent{t}"
    parts.append(
        f"""pfin AS MATERIALIZED (
  SELECT vec_id, sub, cid FROM (
    SELECT s.vec_id, s.sub, c.cid,
           row_number() OVER (PARTITION BY s.vec_id, s.sub
                              ORDER BY {sqd} ASC, c.cid ASC) AS rk
    FROM esub s JOIN {prev} c ON c.sub = s.sub) WHERE rk = 1),
prv AS MATERIALIZED (
  SELECT f.vec_id, flatten(list(c.cv ORDER BY c.sub)) AS rv
  FROM pfin f JOIN {prev} c ON c.sub = f.sub AND c.cid = f.cid
  GROUP BY f.vec_id),
rnorm AS MATERIALIZED (
  SELECT vec_id, rv,
         CAST(list_sum(list_transform(rv, x -> x * x)) AS BIGINT) AS nb
  FROM prv)"""
    )
    return ",\n".join(parts)


Q102_SQL = f"""
WITH {_IVF_CTES},
{_ivf_leaves_sql()},
{_pq_sql_ctes()},
q AS MATERIALIZED (
  SELECT a.vec_id AS query_id, a.v AS qv, e.qv AS qiv,
         CAST(list_sum(list_transform(e.qv, x -> x * x)) AS BIGINT) AS na
  FROM assigned a JOIN e ON e.vec_id = a.vec_id
  WHERE a.vec_id % 50 = 0),
mp AS MATERIALIZED (
  SELECT query_id, bucket FROM (
    SELECT q.query_id, l.bucket,
           row_number() OVER (PARTITION BY q.query_id
                              ORDER BY {_Q96_QDIST} ASC, l.bucket ASC) AS rk
    FROM q, leaves l) WHERE rk <= {_NPROBE}),
pq AS MATERIALIZED (
  SELECT query_id, vec_id AS neighbor_id FROM (
    SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cosd DESC, vec_id ASC) AS rank
    FROM (
      SELECT p.query_id, a.vec_id,
             CAST({_Q97_DOT} AS DOUBLE)
               / sqrt(CAST(q2.na AS DOUBLE) * CAST(r.nb AS DOUBLE)) AS cosd
      FROM mp p
      JOIN assigned a ON a.bucket = p.bucket
      JOIN rnorm r ON r.vec_id = a.vec_id
      JOIN q q2 ON q2.query_id = p.query_id
      WHERE a.vec_id <> p.query_id)
  ) WHERE rank <= {_TOPK}),
{_ann_audit_tail_sql("pq")}
"""


# --------------------------------------------------------------------------
# q103 — event-rate anomaly detection via robust statistics: per
# (event_type, hour) counts, flagged against the type's MEDIAN ± k·MAD —
# the standard ops/telemetry screen (mean/stddev break on the very
# spikes being hunted; median/MAD don't). Both medians use q57's exact
# rank arithmetic ((50·n + 99) div 100 over an explicit deterministic
# ordering) so tie-handling is engine-identical — no builtin quantiles.
# Flag rule (integer): |n − med| > 3·mad AND |n − med| ≥ 3 (the
# absolute floor keeps mad=0 types from flagging ±1 jitter).
# Scale shape: the corpus folds to the BOUNDED (event_type, hour) table
# in ONE map-side-combinable agg; every window after that partitions by
# event_type over ≤ #hours rows per type (the q59-histogram class, not
# a corpus window). At 100 TB the hour table is ~10⁵ rows/type-year —
# trivially bounded.
# --------------------------------------------------------------------------


def _rate_flags(cnt: DataFrame) -> DataFrame:
    """Shared robust-flag fold over a bounded (event_type, hb, n) hourly
    count table — batch q103 builds the table with one corpus agg;
    streaming/anomaly.py feeds the SAME fold the counts its watermarked
    tumbling-window stream emitted (stream ≡ batch pinned there). Every
    window partitions by event_type over ≤ #hours rows per type."""
    wm = Window.partitionBy("event_type").orderBy("n", "hb")
    wc = Window.partitionBy("event_type")
    med = (
        cnt.withColumn("rn", F.row_number().over(wm))
        .withColumn("m", F.count("*").over(wc))
        .filter(F.expr("rn = (50 * m + 99) div 100"))
        .select("event_type", F.col("n").alias("med"))
    )
    dev = cnt.join(F.broadcast(med), "event_type").withColumn(
        "ad", F.abs(F.col("n") - F.col("med"))
    )
    wa = Window.partitionBy("event_type").orderBy("ad", "hb")
    mad = (
        dev.withColumn("rn", F.row_number().over(wa))
        .withColumn("m", F.count("*").over(wc))
        .filter(F.expr("rn = (50 * m + 99) div 100"))
        .select("event_type", F.col("ad").alias("mad"))
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .filter(F.expr("ad > 3 * mad AND ad >= 3"))
        .select(
            "event_type",
            F.col("hb").alias("hour_bucket"),
            F.col("n").alias("n_events"),
            "med",
            "mad",
            F.col("ad").alias("abs_dev"),
        )
    )


def q103_rate_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    cnt = (
        ev.select(
            "event_type",
            F.expr(f"({_EV_US_SPARK}) div 3600000000").alias("hb"),
        )
        .groupBy("event_type", "hb")
        .agg(F.count("*").alias("n"))
        .persist(StorageLevel.MEMORY_AND_DISK)  # bounded; 3 consumers
    )
    return _rate_flags(cnt)


Q103_SQL = f"""
WITH cnt AS (
  SELECT event_type,
         {_EV_US_SQL} // 3600000000 AS hb,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2),
med AS (
  SELECT event_type, n AS med FROM (
    SELECT event_type, n,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY n, hb) AS rn,
           COUNT(*) OVER (PARTITION BY event_type) AS m
    FROM cnt) WHERE rn = (50 * m + 99) // 100),
dev AS (
  SELECT c.event_type, c.hb, c.n, d.med, abs(c.n - d.med) AS ad
  FROM cnt c JOIN med d ON d.event_type = c.event_type),
mad AS (
  SELECT event_type, ad AS mad FROM (
    SELECT event_type, ad,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY ad, hb) AS rn,
           COUNT(*) OVER (PARTITION BY event_type) AS m
    FROM dev) WHERE rn = (50 * m + 99) // 100)
SELECT d.event_type,
       CAST(d.hb AS BIGINT) AS hour_bucket,
       CAST(d.n AS BIGINT) AS n_events,
       CAST(d.med AS BIGINT) AS med,
       CAST(m.mad AS BIGINT) AS mad,
       CAST(d.ad AS BIGINT) AS abs_dev
FROM dev d JOIN mad m ON m.event_type = d.event_type
WHERE d.ad > 3 * m.mad AND d.ad >= 3
"""


# --------------------------------------------------------------------------
# q104 — dedup-aware sampling weights: every near-dup cluster (q16's
# verified MinHash components) contributes ONE document of probability
# mass, split evenly — w_ppm = 10⁶ div cluster_size, singletons keep
# 10⁶ — the standard de-biasing step between dedup DETECTION and
# training-mix construction (down-weighting instead of q23's hard
# purge). Rolled up per lang: raw vs effective doc counts and raw vs
# effective character mass (what a sampler drawing by these weights
# would actually feed the model). Sums accumulate in decimal(38,0)
# (n_chars·w_ppm ~ 10¹⁰/doc — int64 would overflow at corpus scale).
# Scale shape: reuses the memoized _lp_labels table (zero extra LP
# rounds); cluster sizes = one agg on the bounded graph-node table;
# the only corpus-scale operation is the broadcast-able left join of
# documents against the clustered-node weight table + ONE map-side-
# combinable lang rollup.
# --------------------------------------------------------------------------


def q104_dedup_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    labels = _lp_labels(spark, sf_dir)
    sizes = labels.groupBy("label").agg(F.count("*").alias("csz"))
    wts = labels.join(sizes, "label").select(
        F.col("node").alias("doc_id"),
        F.expr("1000000 div csz").alias("w_ppm"),
    )
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.join(wts, "doc_id", "left")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("w_ppm").isNotNull().cast("long")).alias(
                "n_downweighted"
            ),
            F.expr(
                "CAST(sum(CAST(coalesce(w_ppm, 1000000) AS DECIMAL(38,0)))"
                " AS LONG)"
            ).alias("eff_docs_ppm"),
            F.expr(
                "CAST(sum(CAST(n_chars AS DECIMAL(38,0))) AS LONG)"
            ).alias("n_chars_total"),
            F.expr(
                "CAST(sum(CAST(n_chars AS DECIMAL(38,0))"
                " * coalesce(w_ppm, 1000000)) AS LONG)"
            ).alias("eff_chars_ppm"),
        )
    )


Q104_SQL = f"""
WITH RECURSIVE {_Q16_CTES},
csizes AS MATERIALIZED (
  SELECT label, COUNT(*) AS csz FROM comp GROUP BY label),
wts AS MATERIALIZED (
  SELECT c.node AS doc_id, 1000000 // s.csz AS w_ppm
  FROM comp c JOIN csizes s ON s.label = c.label)
SELECT d.lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN w.w_ppm IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_downweighted,
       CAST(SUM(COALESCE(w.w_ppm, 1000000)) AS BIGINT) AS eff_docs_ppm,
       CAST(SUM(d.n_chars) AS BIGINT) AS n_chars_total,
       CAST(SUM(CAST(d.n_chars AS HUGEINT) * COALESCE(w.w_ppm, 1000000))
            AS BIGINT) AS eff_chars_ppm
FROM documents d LEFT JOIN wts w ON w.doc_id = d.doc_id
GROUP BY d.lang
"""


# --------------------------------------------------------------------------
# q105 — tokenizer equity audit (train/holdout fertility + OOV): train
# the q82 BPE chain on the doc_id%10<8 split ONLY (q101's split
# convention), then measure, per (split, lang): word count, OOV rate
# (corpus words absent from the learned vocab — only possible in
# heldout), BPE token mass with CHARACTER-LEVEL FALLBACK for OOV words
# (an unseen word costs len(word) symbol tokens — the byte-fallback
# convention real BPE tokenizers use), fertility (tokens per word, ppm)
# and chars-per-token (ppm). This is the standard tokenizer-fairness
# measurement: a tokenizer trained on an unbalanced mix inflates
# fertility for under-represented languages, and the per-lang heldout
# rows are exactly the table that audit reads. Integer-exact; the 10⁶
# products accumulate in decimal(38,0)/HUGEINT (at 10¹²-token scale
# 10⁶·Σtokens overflows int64).
# Scale shape: training runs on the BOUNDED word-frequency vocab of the
# train split (q82's discipline); the audit is ONE corpus-scale LEFT
# equi-join of the exploded word stream against the final vocab (vocab
# ≪ corpus → broadcast at gate scale, SMJ on word at 100 TB — the q85
# transition) followed by ONE map-side-combinable (split, lang) agg.
# --------------------------------------------------------------------------

_Q105_TRAIN = "doc_id % 10 < 8"


def q105_tokenizer_equity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    fv = _bpe_chain(spark, sf_dir, _Q105_TRAIN)[-1][0].select(
        "word",
        F.expr("size(split(repr, '  '))").cast("long").alias("n_syms"),
    )
    dw = docs.select(
        F.expr(
            "CASE WHEN doc_id % 10 < 8 THEN 'train' ELSE 'heldout' END"
        ).alias("split"),
        "lang",
        F.explode(F.split("text", " ")).alias("word"),
    )
    return (
        dw.join(fv, "word", "left")
        .groupBy("split", "lang")
        .agg(
            F.count("*").alias("n_words"),
            F.sum(F.col("n_syms").isNull().cast("long")).alias("n_oov_words"),
            F.sum(F.expr("coalesce(n_syms, length(word))")).alias(
                "n_bpe_tokens"
            ),
            F.sum(F.length("word").cast("long")).alias("n_chars"),
        )
        .select(
            "split",
            "lang",
            "n_words",
            "n_oov_words",
            "n_bpe_tokens",
            "n_chars",
            F.expr(
                "CAST((CAST(n_bpe_tokens AS DECIMAL(38,0)) * 1000000)"
                " div n_words AS LONG)"
            ).alias("fertility_ppm"),
            F.expr(
                "CAST((CAST(n_oov_words AS DECIMAL(38,0)) * 1000000)"
                " div n_words AS LONG)"
            ).alias("oov_ppm"),
            F.expr(
                "CAST((CAST(n_chars AS DECIMAL(38,0)) * 1000000)"
                " div greatest(n_bpe_tokens, 1) AS LONG)"
            ).alias("chars_per_token_ppm"),
        )
    )


Q105_SQL = (
    f"""
WITH words AS (
  SELECT tok AS word, COUNT(*) AS freq
  FROM (SELECT unnest(str_split(text, ' ')) AS tok FROM documents
        WHERE {_Q105_TRAIN}) z
  GROUP BY tok),
v0 AS MATERIALIZED (
  SELECT word, freq,
         array_to_string(str_split(word, ''), '  ') AS repr
  FROM words),"""
    + ",".join(_bpe_sql_level(i) for i in range(1, _BPE_STEPS + 1))
    + f""",
fv AS (
  SELECT word, CAST(len(str_split(repr, '  ')) AS BIGINT) AS n_syms
  FROM v{_BPE_STEPS}),
dw AS (
  SELECT CASE WHEN {_Q105_TRAIN} THEN 'train' ELSE 'heldout' END AS split,
         lang, unnest(str_split(text, ' ')) AS word
  FROM documents)
SELECT split, lang,
       COUNT(*) AS n_words,
       CAST(SUM(CASE WHEN f.n_syms IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_oov_words,
       CAST(SUM(COALESCE(f.n_syms, len(dw.word))) AS BIGINT) AS n_bpe_tokens,
       CAST(SUM(len(dw.word)) AS BIGINT) AS n_chars,
       CAST((1000000 * SUM(COALESCE(f.n_syms, len(dw.word)))) // COUNT(*)
            AS BIGINT) AS fertility_ppm,
       CAST((1000000 * SUM(CASE WHEN f.n_syms IS NULL THEN 1 ELSE 0 END))
            // COUNT(*) AS BIGINT) AS oov_ppm,
       CAST((1000000 * SUM(len(dw.word)))
            // GREATEST(SUM(COALESCE(f.n_syms, len(dw.word))), 1)
            AS BIGINT) AS chars_per_token_ppm
FROM dw LEFT JOIN fv f USING (word)
GROUP BY split, lang
"""
)


# --------------------------------------------------------------------------
# q106 — IVF-PQ with exact re-ranking: the production two-stage
# retrieval (FAISS's IVFPQ + refine). Stage 1 scores the q96 multi-probe
# candidate set through the 4-byte PQ reconstruction (q102's ADC scan)
# and keeps a SHORTLIST of the top _RERANK_M = 4·k per query; stage 2
# re-ranks only the shortlist at FULL precision and emits top-k. The
# recall ladder gains its final rung: exact re-rank of an ADC-shortlist
# superset can only displace a ground-truth hit with another
# ground-truth hit (any corpus vector exactly-scoring above a GT member
# is itself GT), so recall(q106) ≥ recall(q102) — asserted measured in
# the ladder test alongside q96's maximality.
# Scale shape: q102's audit plan + ONE extra equi-join of the BOUNDED
# shortlist (|queries|·4k rows) against the memoized index to fetch
# full-precision vectors, then a per-query window over ≤ 4k rows. At
# 100 TB this is the whole point of PQ: the ADC scan touches 4 B/vector
# and only 4k full vectors per query are ever read back.
# --------------------------------------------------------------------------

_RERANK_M = 4 * _TOPK


def q106_pq_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    store = _pq_store(spark, sf_dir)
    q = _multiprobe_query_sample(spark, sf_dir).select(
        "query_id",
        "qiv",
        F.expr(
            "aggregate(zip_with(qiv, qiv, (x, y) -> x * y), 0L,"
            " (acc, x) -> acc + x)"
        ).alias("na"),
        "qb",
    )
    adc_dot = F.expr(
        "aggregate(zip_with(rv, qiv, (x, y) -> x * y), 0L,"
        " (acc, x) -> acc + x)"
    )
    w1 = Window.partitionBy("query_id").orderBy(
        F.desc("cosd"), F.asc("vec_id")
    )
    shortlist = (
        store.join(F.broadcast(q), F.col("bucket") == F.col("qb"))
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("dot", adc_dot)
        .withColumn(
            "cosd",
            F.expr(
                "cast(dot AS DOUBLE)"
                " / sqrt(cast(na AS DOUBLE) * cast(nb AS DOUBLE))"
            ),
        )
        .withColumn("rank", F.row_number().over(w1))
        .filter(F.col("rank") <= _RERANK_M)
        .select("query_id", "vec_id")
    )
    base = _ivf_assigned(spark, sf_dir).select("vec_id", "vn")
    qfull = (
        _ivf_assigned(spark, sf_dir)
        .filter(F.pmod("vec_id", F.lit(50)) == 0)
        .select(F.col("vec_id").alias("query_id"), F.col("vn").alias("qn2"))
    )
    rr_dot = F.expr(
        "aggregate(zip_with(vn, qn2, (x, y) -> x * y), 0D,"
        " (acc, x) -> acc + x)"
    )
    w2 = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    approx = (
        shortlist.join(base, "vec_id")
        .join(F.broadcast(qfull), "query_id")
        .withColumn("cos", rr_dot)
        .withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= _TOPK)
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
    )
    return _ann_recall_hist(spark, sf_dir, approx)


Q106_SQL = f"""
WITH {_IVF_CTES},
{_ivf_leaves_sql()},
{_pq_sql_ctes()},
q AS MATERIALIZED (
  SELECT a.vec_id AS query_id, a.v AS qv, e.qv AS qiv,
         CAST(list_sum(list_transform(e.qv, x -> x * x)) AS BIGINT) AS na
  FROM assigned a JOIN e ON e.vec_id = a.vec_id
  WHERE a.vec_id % 50 = 0),
mp AS MATERIALIZED (
  SELECT query_id, bucket FROM (
    SELECT q.query_id, l.bucket,
           row_number() OVER (PARTITION BY q.query_id
                              ORDER BY {_Q96_QDIST} ASC, l.bucket ASC) AS rk
    FROM q, leaves l) WHERE rk <= {_NPROBE}),
short AS MATERIALIZED (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cosd DESC, vec_id ASC) AS rank
    FROM (
      SELECT p.query_id, a.vec_id,
             CAST({_Q97_DOT} AS DOUBLE)
               / sqrt(CAST(q2.na AS DOUBLE) * CAST(r.nb AS DOUBLE)) AS cosd
      FROM mp p
      JOIN assigned a ON a.bucket = p.bucket
      JOIN rnorm r ON r.vec_id = a.vec_id
      JOIN q q2 ON q2.query_id = p.query_id
      WHERE a.vec_id <> p.query_id)
  ) WHERE rank <= {_RERANK_M}),
rr AS MATERIALIZED (
  SELECT query_id, vec_id AS neighbor_id FROM (
    SELECT s.query_id, s.vec_id,
           row_number() OVER (PARTITION BY s.query_id
                              ORDER BY list_cosine_similarity(a.v, q2.qv) DESC,
                                       s.vec_id ASC) AS rank
    FROM short s
    JOIN assigned a ON a.vec_id = s.vec_id
    JOIN q q2 ON q2.query_id = s.query_id) WHERE rank <= {_TOPK}),
{_ann_audit_tail_sql("rr")}
"""


# --------------------------------------------------------------------------
# q107 — the composed TRAINING-PREP pipeline (q74's curation capstone
# applied to the training-layout end): quality filter (q71's verdicts)
# → near-dup KEEPER on the survivors (q32's policy over the memoized
# q16 clusters: max tokens wins, tie → min doc_id; survivors outside
# any cluster pass) → BPE tokenize the kept docs (q85's full-corpus
# vocab join) → deterministic epoch shuffle into shards (q70's
# md5(seed‖doc_id) keying + within-shard (k, doc_id) order, pinned by
# the Σ rank·doc_id order-SENSITIVE checksum) → contiguous 128-token
# block spans across the shard-ordered stream (q67's offset
# arithmetic; the cross-shard prefix sum runs over the bounded
# ≤ _TP_SHARDS-row table). One row per shard + the corpus funnel
# (n_total → n_quality → n_kept) carried via bounded 1-row-agg
# crossJoins (the q73/q74 documented BNLJ class). The capstone proof
# that the FILTER → DEDUP → TOKENIZE → SHUFFLE → PACK DAG composes
# into one declarative plan, every stage its already-audited shape.
# --------------------------------------------------------------------------

_TP_SEED = "q107:"
_TP_SHARDS = 16


def q107_training_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    ntok = docs.select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("n")
    )
    surv = (
        q71_quality_filter(spark, sf_dir)
        .filter("keep = 1")
        .select("doc_id")
        .join(ntok, "doc_id")
        # 3 consumers: keeper rank, unclustered pass-through, funnel count
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    labels = _lp_labels(spark, sf_dir)
    labeled = surv.join(labels, surv["doc_id"] == labels["node"]).select(
        "doc_id", "n", "label"
    )
    wk = Window.partitionBy("label").orderBy(F.desc("n"), F.asc("doc_id"))
    kept_l = (
        labeled.withColumn("rk", F.row_number().over(wk))
        .filter("rk = 1")
        .select("doc_id", "n")
    )
    kept_u = surv.join(
        labels, surv["doc_id"] == labels["node"], "left_anti"
    ).select("doc_id", "n")
    kept = kept_l.unionByName(kept_u).persist(StorageLevel.MEMORY_AND_DISK)
    fv = _bpe_chain(spark, sf_dir)[-1][0].select(
        "word",
        F.expr("size(split(repr, '  '))").cast("long").alias("n_syms"),
    )
    dw = docs.join(kept.select("doc_id"), "doc_id").select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    )
    bpe = dw.join(fv, "word").groupBy("doc_id").agg(
        F.sum("n_syms").alias("btoks")
    )
    keyed = bpe.withColumn(
        "k",
        F.md5(F.concat(F.lit(_TP_SEED), F.col("doc_id").cast("string"))),
    ).withColumn(
        "shard",
        F.conv(F.substring("k", 1, 4), 16, 10).cast("long") % _TP_SHARDS,
    )
    w = Window.partitionBy("shard").orderBy("k", "doc_id")
    ranked = keyed.withColumn("rnk", F.row_number().over(w))
    pershard = ranked.groupBy("shard").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("btoks").cast("long").alias("bpe_toks"),
        F.expr(
            "CAST(sum(CAST(rnk AS DECIMAL(38,0)) * doc_id) AS LONG)"
        ).alias("order_checksum"),
    )
    # cross-shard token offsets: a single-partition window over the
    # bounded ≤ _TP_SHARDS-row table (q65's legal class)
    wsh = Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, -1)
    off = pershard.withColumn(
        "tok_off", F.coalesce(F.sum("bpe_toks").over(wsh), F.lit(0))
    )
    funnel = (
        docs.agg(F.count("*").cast("long").alias("n_total"))
        .crossJoin(surv.agg(F.count("*").cast("long").alias("n_quality")))
        .crossJoin(kept.agg(F.count("*").cast("long").alias("n_kept")))
    )
    return off.crossJoin(F.broadcast(funnel)).select(
        "shard",
        "n_docs",
        "bpe_toks",
        F.col("tok_off").cast("long").alias("tok_off"),
        F.expr(f"CAST(tok_off div {_BLK_TOK} AS LONG)").alias("first_block"),
        F.expr(
            f"CAST((tok_off + bpe_toks - 1) div {_BLK_TOK} AS LONG)"
        ).alias("last_block"),
        "order_checksum",
        "n_total",
        "n_quality",
        "n_kept",
    )


Q107_SQL = (
    f"""
WITH RECURSIVE {_Q16_CTES},
sig AS (
  SELECT doc_id, len(t) AS n,
         list_sum(list_transform(t, x -> len(x))) AS chars,
         len(list_filter(t, x -> x IN ('the', 'a'))) AS stop,
         list_max(list_transform(list_distinct(t),
                                 x -> len(list_filter(t, y -> y = x)))) AS ctop
  FROM (SELECT doc_id, str_split(text, ' ') AS t FROM documents) z),
surv AS MATERIALIZED (
  SELECT doc_id, CAST(n AS BIGINT) AS n FROM sig
  WHERE n BETWEEN 15 AND 80 AND 9 * n <= 2 * chars AND chars <= 5 * n
    AND 50 * stop >= n AND 25 * ctop <= 3 * n),
lab AS (
  SELECT v.doc_id, v.n, c.label
  FROM surv v LEFT JOIN comp c ON c.node = v.doc_id),
kept AS MATERIALIZED (
  SELECT doc_id, n FROM (
    SELECT doc_id, n,
           row_number() OVER (PARTITION BY label
                              ORDER BY n DESC, doc_id) AS rk
    FROM lab WHERE label IS NOT NULL) WHERE rk = 1
  UNION ALL
  SELECT doc_id, n FROM lab WHERE label IS NULL),
words AS (
  SELECT tok AS word, COUNT(*) AS freq
  FROM (SELECT unnest(str_split(text, ' ')) AS tok FROM documents) z
  GROUP BY tok),
v0 AS MATERIALIZED (
  SELECT word, freq,
         array_to_string(str_split(word, ''), '  ') AS repr
  FROM words),"""
    + ",".join(_bpe_sql_level(i) for i in range(1, _BPE_STEPS + 1))
    + f""",
fv AS (
  SELECT word, CAST(len(str_split(repr, '  ')) AS BIGINT) AS n_syms
  FROM v{_BPE_STEPS}),
dw AS (
  SELECT d.doc_id, unnest(str_split(d.text, ' ')) AS word
  FROM documents d JOIN kept k ON k.doc_id = d.doc_id),
bpe AS MATERIALIZED (
  SELECT doc_id, CAST(SUM(n_syms) AS BIGINT) AS btoks
  FROM dw JOIN fv USING (word) GROUP BY doc_id),
keyed AS (
  SELECT doc_id, btoks,
         md5('{_TP_SEED}' || CAST(doc_id AS VARCHAR)) AS k
  FROM bpe),
sharded AS (
  SELECT doc_id, btoks, k,
         ('0x' || substring(k, 1, 4))::BIGINT % {_TP_SHARDS} AS shard
  FROM keyed),
r2 AS (
  SELECT *, row_number() OVER (PARTITION BY shard ORDER BY k, doc_id) AS rnk
  FROM sharded),
pershard AS (
  SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(btoks) AS BIGINT) AS bpe_toks,
         CAST(SUM(CAST(rnk AS HUGEINT) * doc_id) AS BIGINT)
           AS order_checksum
  FROM r2 GROUP BY shard),
offt AS (
  SELECT *, CAST(COALESCE(SUM(bpe_toks) OVER (ORDER BY shard
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS BIGINT) AS tok_off
  FROM pershard),
funnel AS (
  SELECT (SELECT COUNT(*) FROM documents) AS n_total,
         (SELECT COUNT(*) FROM surv) AS n_quality,
         (SELECT COUNT(*) FROM kept) AS n_kept)
SELECT o.shard, o.n_docs, o.bpe_toks, o.tok_off,
       CAST(o.tok_off // {_BLK_TOK} AS BIGINT) AS first_block,
       CAST((o.tok_off + o.bpe_toks - 1) // {_BLK_TOK} AS BIGINT)
         AS last_block,
       o.order_checksum,
       CAST(f.n_total AS BIGINT) AS n_total,
       CAST(f.n_quality AS BIGINT) AS n_quality,
       CAST(f.n_kept AS BIGINT) AS n_kept
FROM offt o, funnel f
"""
)


# --------------------------------------------------------------------------
# q108 — token-distribution drift between corpus snapshots: the
# monitoring op a data-versioned lake runs between training-set cuts —
# "did this snapshot's language shift under me?". Snapshot B is q72's
# deterministic derivation (doc_id%13==2 removed, %7==1 text-updated,
# %17==3 re-added as new docs); both snapshots' token streams hash into
# 256 buckets (q68's feature space) and each bucket reports both raw
# counts, both shares in ppm, and |Δshare|; the headline is the total
# variation distance TVD_ppm = Σ|share_a − share_b| div 2, carried on
# every row (the fold runs over the bounded 256-row table). Log-free
# integer arithmetic throughout (PSI/KL need ln — TVD is the
# drift metric that stays engine-exact); 10⁶ products in
# decimal(38,0)/HUGEINT per the overflow rule.
# Scale shape: TWO map-side-combinable corpus aggs, each folding a
# snapshot's token stream to ≤ 256 rows; the full-outer join, shares
# and TVD fold all run on 256-row tables. At 100 TB the shuffle is
# 2 × 256 rows per task — nothing else moves.
# --------------------------------------------------------------------------

_DRIFT_B = 256


def _drift_buckets(df: DataFrame) -> DataFrame:
    """Explode a (…, text) frame into one row per token with its hashed
    drift bucket — shared by batch q108 and the streaming drift monitor
    (streaming/drift.py); extra columns (the stream's event-time) ride
    along, `text` and the raw token are dropped."""
    return (
        df.select("*", F.explode(F.split("text", " ")).alias("tok"))
        .withColumn(
            "bkt",
            F.conv(F.substring(F.md5("tok"), 1, 4), 16, 10).cast("long")
            % _DRIFT_B,
        )
        .drop("tok", "text")
    )


def q108_token_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    b_txt = (
        docs.filter("doc_id % 13 != 2")
        .select(
            F.expr(
                "CASE WHEN doc_id % 7 = 1 THEN text || ' upd' ELSE text END"
            ).alias("text")
        )
        .unionByName(
            docs.filter("doc_id % 17 = 3").select(
                F.expr("'new ' || text").alias("text")
            )
        )
    )

    j = (
        _drift_buckets(docs.select("text"))
        .groupBy("bkt")
        .agg(F.count("*").alias("ca"))
        .join(
            _drift_buckets(b_txt).groupBy("bkt").agg(F.count("*").alias("cb")),
            "bkt",
            "full",
        )
        .select(
            "bkt",
            F.coalesce("ca", F.lit(0)).cast("long").alias("ca"),
            F.coalesce("cb", F.lit(0)).cast("long").alias("cb"),
        )
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    shares = (
        j.withColumn("ta", F.sum("ca").over(wall))
        .withColumn("tb", F.sum("cb").over(wall))
        .select(
            "bkt",
            "ca",
            "cb",
            F.expr(
                "CAST(CAST(1000000 AS DECIMAL(38,0)) * ca div ta AS LONG)"
            ).alias("share_a_ppm"),
            F.expr(
                "CAST(CAST(1000000 AS DECIMAL(38,0)) * cb div tb AS LONG)"
            ).alias("share_b_ppm"),
        )
        .withColumn(
            "abs_delta_ppm",
            F.abs(F.col("share_a_ppm") - F.col("share_b_ppm")),
        )
    )
    return shares.withColumn(
        "tvd_ppm",
        F.expr("CAST(sum(abs_delta_ppm) OVER () div 2 AS LONG)"),
    )


Q108_SQL = f"""
WITH btxt AS (
  SELECT CASE WHEN doc_id % 7 = 1 THEN text || ' upd' ELSE text END AS text
  FROM documents WHERE doc_id % 13 != 2
  UNION ALL
  SELECT 'new ' || text AS text FROM documents WHERE doc_id % 17 = 3),
ca AS (
  SELECT ('0x' || substr(md5(tok), 1, 4))::BIGINT % {_DRIFT_B} AS bkt,
         COUNT(*) AS ca
  FROM (SELECT unnest(str_split(text, ' ')) AS tok FROM documents) z
  GROUP BY 1),
cb AS (
  SELECT ('0x' || substr(md5(tok), 1, 4))::BIGINT % {_DRIFT_B} AS bkt,
         COUNT(*) AS cb
  FROM (SELECT unnest(str_split(text, ' ')) AS tok FROM btxt) z
  GROUP BY 1),
j AS (
  SELECT COALESCE(ca.bkt, cb.bkt) AS bkt,
         CAST(COALESCE(ca.ca, 0) AS BIGINT) AS ca,
         CAST(COALESCE(cb.cb, 0) AS BIGINT) AS cb
  FROM ca FULL OUTER JOIN cb ON cb.bkt = ca.bkt),
sh AS (
  SELECT bkt, ca, cb,
         CAST(CAST(1000000 AS HUGEINT) * ca // (SUM(ca) OVER ()) AS BIGINT)
           AS share_a_ppm,
         CAST(CAST(1000000 AS HUGEINT) * cb // (SUM(cb) OVER ()) AS BIGINT)
           AS share_b_ppm
  FROM j),
d AS (
  SELECT *, abs(share_a_ppm - share_b_ppm) AS abs_delta_ppm FROM sh)
SELECT bkt, ca, cb, share_a_ppm, share_b_ppm,
       CAST(abs_delta_ppm AS BIGINT) AS abs_delta_ppm,
       CAST(SUM(abs_delta_ppm) OVER () // 2 AS BIGINT) AS tvd_ppm
FROM d
"""


QUERIES = {
    "q01_html_extract_cells": q01_html_extract_cells,
    "q02_word_filter": q02_word_filter,
    "q03_spatial_join": q03_spatial_join,
    "q04_line_assembly": q04_line_assembly,
    "q05_window_prune": q05_window_prune,
    "q06_mode_binned": q06_mode_binned,
    "q07_dedup_exact": q07_dedup_exact,
    "q08_minhash_lsh": q08_minhash_lsh,
    "q09_simhash": q09_simhash,
    "q10_text_quality": q10_text_quality,
    "q11_winnow_fingerprint": q11_winnow_fingerprint,
    "q12_cosine_topk": q12_cosine_topk,
    "q13_interval_islands": q13_interval_islands,
    "q14_image_extract": q14_image_extract,
    "q15_ann_ivf": q15_ann_ivf,
    "q16_dedup_clusters": q16_dedup_clusters,
    "q17_ngram_jaccard": q17_ngram_jaccard,
    "q18_embedding_neardup": q18_embedding_neardup,
    "q19_token_counts": q19_token_counts,
    "q20_srp_lsh_neardup": q20_srp_lsh_neardup,
    "q21_stratified_sample": q21_stratified_sample,
    "q22_sessionize": q22_sessionize,
    "q23_dedup_purge": q23_dedup_purge,
    "q24_token_df": q24_token_df,
    "q25_pii_redact": q25_pii_redact,
    "q26_decontam": q26_decontam,
    "q27_repetition": q27_repetition,
    "q28_main_content": q28_main_content,
    "q29_asof_join": q29_asof_join,
    "q30_range_join": q30_range_join,
    "q31_tfidf_topk": q31_tfidf_topk,
    "q32_dedup_keep_best": q32_dedup_keep_best,
    "q33_domain_stats": q33_domain_stats,
    "q34_chunk_dedup": q34_chunk_dedup,
    "q35_lm_score": q35_lm_score,
    "q36_funnel": q36_funnel,
    "q37_retention": q37_retention,
    "q38_json_rollup": q38_json_rollup,
    "q39_label_outliers": q39_label_outliers,
    "q40_context_chunks": q40_context_chunks,
    "q41_sequence_packing": q41_sequence_packing,
    "q42_semdedup": q42_semdedup,
    "q43_conv_rollup": q43_conv_rollup,
    "q44_sft_pairs": q44_sft_pairs,
    "q45_tool_transitions": q45_tool_transitions,
    "q46_temperature_mix": q46_temperature_mix,
    "q47_hard_negatives": q47_hard_negatives,
    "q48_conv_neardup": q48_conv_neardup,
    "q49_event_runs": q49_event_runs,
    "q50_context_truncate": q50_context_truncate,
    "q51_dpo_pairs": q51_dpo_pairs,
    "q52_rolling_burst": q52_rolling_burst,
    "q53_merge_turns": q53_merge_turns,
    "q54_transcript_contam": q54_transcript_contam,
    "q55_cms_heavy_hitters": q55_cms_heavy_hitters,
    "q56_distinct_sketch": q56_distinct_sketch,
    "q57_value_percentiles": q57_value_percentiles,
    "q58_incremental_dedup": q58_incremental_dedup,
    "q59_histogram_quantiles": q59_histogram_quantiles,
    "q60_bm25_topk": q60_bm25_topk,
    "q61_pmi_collocations": q61_pmi_collocations,
    "q62_url_canonical_dedup": q62_url_canonical_dedup,
    "q63_line_dedup": q63_line_dedup,
    "q64_bigram_lm_score": q64_bigram_lm_score,
    "q65_source_gini": q65_source_gini,
    "q66_split_leakage": q66_split_leakage,
    "q67_token_blocks": q67_token_blocks,
    "q68_dsir_weights": q68_dsir_weights,
    "q69_block_loss_mask": q69_block_loss_mask,
    "q70_epoch_shuffle": q70_epoch_shuffle,
    "q71_quality_filter": q71_quality_filter,
    "q72_snapshot_diff": q72_snapshot_diff,
    "q73_dedup_audit": q73_dedup_audit,
    "q74_curation_pipeline": q74_curation_pipeline,
    "q75_pagerank": q75_pagerank,
    "q76_snippet_containment": q76_snippet_containment,
    "q77_k_anonymity": q77_k_anonymity,
    "q78_bucketed_join": q78_bucketed_join,
    "q79_novelty_score": q79_novelty_score,
    "q80_rollup_stats": q80_rollup_stats,
    "q81_rrf_fusion": q81_rrf_fusion,
    "q82_bpe_merges": q82_bpe_merges,
    "q83_weighted_sample": q83_weighted_sample,
    "q84_sq8_quantize": q84_sq8_quantize,
    "q85_bpe_encode": q85_bpe_encode,
    "q86_bloom_prefilter": q86_bloom_prefilter,
    "q87_kmeans": q87_kmeans,
    "q88_triangles": q88_triangles,
    "q89_dup_span_coverage": q89_dup_span_coverage,
    "q90_scd2_intervals": q90_scd2_intervals,
    "q91_threshold_sweep": q91_threshold_sweep,
    "q92_cdc_chunk_dedup": q92_cdc_chunk_dedup,
    "q93_cluster_purity": q93_cluster_purity,
    "q94_label_spreading": q94_label_spreading,
    "q95_ann_recall": q95_ann_recall,
    "q96_ann_multiprobe": q96_ann_multiprobe,
    "q97_sq8_recall": q97_sq8_recall,
    "q98_phrase_search": q98_phrase_search,
    "q99_range_split_points": q99_range_split_points,
    "q100_quota_split": q100_quota_split,
    "q101_lang_id": q101_lang_id,
    "q102_pq_adc_recall": q102_pq_adc_recall,
    "q103_rate_anomaly": q103_rate_anomaly,
    "q104_dedup_weights": q104_dedup_weights,
    "q105_tokenizer_equity": q105_tokenizer_equity,
    "q106_pq_rerank": q106_pq_rerank,
    "q107_training_prep": q107_training_prep,
    "q108_token_drift": q108_token_drift,
}

ORACLES = {
    "q01_html_extract_cells": Q01_SQL,
    "q02_word_filter": Q02_SQL,
    "q03_spatial_join": Q03_SQL,
    "q04_line_assembly": Q04_SQL,
    "q05_window_prune": Q05_SQL,
    "q06_mode_binned": Q06_SQL,
    "q07_dedup_exact": Q07_SQL,
    "q08_minhash_lsh": Q08_SQL,
    "q09_simhash": Q09_SQL,
    "q10_text_quality": Q10_SQL,
    "q11_winnow_fingerprint": Q11_SQL,
    "q12_cosine_topk": Q12_SQL,
    "q13_interval_islands": Q13_SQL,
    "q14_image_extract": Q14_SQL,
    "q15_ann_ivf": Q15_SQL,
    "q16_dedup_clusters": Q16_SQL,
    "q17_ngram_jaccard": Q17_SQL,
    "q18_embedding_neardup": Q18_SQL,
    "q19_token_counts": Q19_SQL,
    "q20_srp_lsh_neardup": Q20_SQL,
    "q21_stratified_sample": Q21_SQL,
    "q22_sessionize": Q22_SQL,
    "q23_dedup_purge": Q23_SQL,
    "q24_token_df": Q24_SQL,
    "q25_pii_redact": Q25_SQL,
    "q26_decontam": Q26_SQL,
    "q27_repetition": Q27_SQL,
    "q28_main_content": Q28_SQL,
    "q29_asof_join": Q29_SQL,
    "q30_range_join": Q30_SQL,
    "q31_tfidf_topk": Q31_SQL,
    "q32_dedup_keep_best": Q32_SQL,
    "q33_domain_stats": Q33_SQL,
    "q34_chunk_dedup": Q34_SQL,
    "q35_lm_score": Q35_SQL,
    "q36_funnel": Q36_SQL,
    "q37_retention": Q37_SQL,
    "q38_json_rollup": Q38_SQL,
    "q39_label_outliers": Q39_SQL,
    "q40_context_chunks": Q40_SQL,
    "q41_sequence_packing": Q41_SQL,
    "q42_semdedup": Q42_SQL,
    "q43_conv_rollup": Q43_SQL,
    "q44_sft_pairs": Q44_SQL,
    "q45_tool_transitions": Q45_SQL,
    "q46_temperature_mix": Q46_SQL,
    "q47_hard_negatives": Q47_SQL,
    "q48_conv_neardup": Q48_SQL,
    "q49_event_runs": Q49_SQL,
    "q50_context_truncate": Q50_SQL,
    "q51_dpo_pairs": Q51_SQL,
    "q52_rolling_burst": Q52_SQL,
    "q53_merge_turns": Q53_SQL,
    "q54_transcript_contam": Q54_SQL,
    "q55_cms_heavy_hitters": Q55_SQL,
    "q56_distinct_sketch": Q56_SQL,
    "q57_value_percentiles": Q57_SQL,
    "q58_incremental_dedup": Q58_SQL,
    "q59_histogram_quantiles": Q59_SQL,
    "q60_bm25_topk": Q60_SQL,
    "q61_pmi_collocations": Q61_SQL,
    "q62_url_canonical_dedup": Q62_SQL,
    "q63_line_dedup": Q63_SQL,
    "q64_bigram_lm_score": Q64_SQL,
    "q65_source_gini": Q65_SQL,
    "q66_split_leakage": Q66_SQL,
    "q67_token_blocks": Q67_SQL,
    "q68_dsir_weights": Q68_SQL,
    "q69_block_loss_mask": Q69_SQL,
    "q70_epoch_shuffle": Q70_SQL,
    "q71_quality_filter": Q71_SQL,
    "q72_snapshot_diff": Q72_SQL,
    "q73_dedup_audit": Q73_SQL,
    "q74_curation_pipeline": Q74_SQL,
    "q75_pagerank": Q75_SQL,
    "q76_snippet_containment": Q76_SQL,
    "q77_k_anonymity": Q77_SQL,
    "q78_bucketed_join": Q78_SQL,
    "q79_novelty_score": Q79_SQL,
    "q80_rollup_stats": Q80_SQL,
    "q81_rrf_fusion": Q81_SQL,
    "q82_bpe_merges": Q82_SQL,
    "q83_weighted_sample": Q83_SQL,
    "q84_sq8_quantize": Q84_SQL,
    "q85_bpe_encode": Q85_SQL,
    "q86_bloom_prefilter": Q86_SQL,
    "q87_kmeans": Q87_SQL,
    "q88_triangles": Q88_SQL,
    "q89_dup_span_coverage": Q89_SQL,
    "q90_scd2_intervals": Q90_SQL,
    "q91_threshold_sweep": Q91_SQL,
    "q92_cdc_chunk_dedup": Q92_SQL,
    "q93_cluster_purity": Q93_SQL,
    "q94_label_spreading": Q94_SQL,
    "q95_ann_recall": Q95_SQL,
    "q96_ann_multiprobe": Q96_SQL,
    "q97_sq8_recall": Q97_SQL,
    "q98_phrase_search": Q98_SQL,
    "q99_range_split_points": Q99_SQL,
    "q100_quota_split": Q100_SQL,
    "q101_lang_id": Q101_SQL,
    "q102_pq_adc_recall": Q102_SQL,
    "q103_rate_anomaly": Q103_SQL,
    "q104_dedup_weights": Q104_SQL,
    "q105_tokenizer_equity": Q105_SQL,
    "q106_pq_rerank": Q106_SQL,
    "q107_training_prep": Q107_SQL,
    "q108_token_drift": Q108_SQL,
}
