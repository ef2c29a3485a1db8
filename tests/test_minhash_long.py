"""Pin: the long-only minhash affine family (r6) is bit-equal to the
decimal(38,0) path it replaced (and therefore to the DuckDB HUGEINT
oracles, whose equality with the decimal path was probed in r2)."""

import random

from pyspark.sql import functions as F

from img2table_spark import queries as Q

_SF = "/root/testdata/sf0.001"


def _decimal_expr(a: int, b: int) -> str:
    return (
        f"cast(pmod(cast({a} as decimal(38,0)) * cast(mhb as decimal(20,0))"
        f" + {b}, {Q._MH_P}) as bigint)"
    )


def test_affine_long_equals_decimal_on_adversarial_bases(spark):
    rng = random.Random(61)
    bases = [0, 1, 2, (1 << 60) - 1, (1 << 60) - 2, (1 << 30), (1 << 30) - 1,
             Q._MH_P % (1 << 60)] + [rng.randrange(1 << 60) for _ in range(5000)]
    df = spark.createDataFrame([(v,) for v in bases], "mhb long")
    checks = []
    for k, (a, b) in enumerate(Q._MH_AB):
        checks.append(
            F.sum(
                (
                    F.expr(f"cast({Q._mh_affine_long(a, b)} as bigint)")
                    != F.expr(_decimal_expr(a, b))
                ).cast("long")
            ).alias(f"bad{k}")
        )
    row = df.agg(*checks).collect()[0]
    assert all(v == 0 for v in row), row.asDict()
    # python-int ground truth on one batch (pins both engines to the math)
    a0, b0 = Q._MH_AB[0]
    got = {
        r["mhb"]: r["h"]
        for r in df.select(
            "mhb", F.expr(Q._mh_affine_long(a0, b0)).alias("h")
        ).collect()
    }
    for v in bases:
        assert got[v] == (a0 * v + b0) % Q._MH_P, v


def test_minhash_bands_match_decimal_path_on_corpus(spark):
    sh = Q._shingles(spark, _SF)
    # old implementation, inlined verbatim
    hs = [
        F.expr(
            f"cast(pmod(cast({a} as decimal(38,0)) * {Q._MH_BASE_SPARK} + {b}, "
            f"{Q._MH_P}) as bigint)"
        ).alias(f"h{k}")
        for k, (a, b) in enumerate(Q._MH_AB)
    ]
    old_mins = (
        sh.select("doc_id", *hs)
        .groupBy("doc_id")
        .agg(*[F.min(f"h{k}").alias(f"m{k}") for k in range(Q._N_HASHES)])
    )
    new = Q._minhash_bands(sh).orderBy("doc_id", "band").collect()
    old_rows = {r["doc_id"]: r for r in old_mins.collect()}
    assert new, "empty band table"
    for r in new:
        o = old_rows[r["doc_id"]]
        bb = r["band"]
        want = f"{o[f'm{2 * bb}']},{o[f'm{2 * bb + 1}']}"
        assert r["sig"] == want, (r, o)
