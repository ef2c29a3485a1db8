"""Local replica of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB at sf0.01, compare row count, schema
(sorted column names) and order-insensitive values.

Usage: python scripts/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import duckdb
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        dt = str(df[c].dtype)
        if dt == "object":
            # DuckDB returns HUGEINT/decimal as object — try numeric first
            # (errors="ignore" is removed in pandas 3; emulate via try/except)
            try:
                coerced = pd.to_numeric(df[c])
            except (ValueError, TypeError):
                coerced = df[c]
            if str(coerced.dtype) != "object":
                df[c] = coerced
                dt = str(coerced.dtype)
            else:
                df[c] = df[c].astype(str)
                continue
        if dt.startswith(("int", "uint", "Int")):
            df[c] = df[c].astype("int64")
        elif dt.startswith("float"):
            df[c] = df[c].round(6).astype("float64")
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from img2table_spark.session import get_spark

    spark = get_spark(app_name="correctness-check")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = normalize(fn(spark, sf_dir).toPandas())
        except Exception as exc:
            print(f"{name}: SPARK ERROR {exc}")
            failures += 1
            continue
        if name not in oracles:
            print(f"{name}: rows={len(got)} (no oracle, rows-only) [{time.time()-t0:.1f}s]")
            continue
        try:
            want = normalize(con.execute(oracles[name]).df())
        except Exception as exc:
            print(f"{name}: ORACLE ERROR {exc}")
            failures += 1
            continue
        problems = []
        if list(got.columns) != list(want.columns):
            problems.append(f"schema {list(got.columns)} != {list(want.columns)}")
        elif len(got) != len(want):
            problems.append(f"rows {len(got)} != {len(want)}")
        elif not got.equals(want):
            neq = (got != want) & ~(got.isna() & want.isna())
            bad = neq.any(axis=1)
            problems.append(f"{int(bad.sum())} mismatched rows; first:\n"
                            f"  got  {got[bad].head(2).to_dict('records')}\n"
                            f"  want {want[bad].head(2).to_dict('records')}")
        if problems:
            failures += 1
            print(f"{name}: FAIL {problems[0]} [{time.time()-t0:.1f}s]")
        else:
            print(f"{name}: OK rows={len(got)} [{time.time()-t0:.1f}s]")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
