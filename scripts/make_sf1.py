"""Generate the sf1 stress dataset (10× the sf0.1 gate) — VERDICT r4 #1.

The driver ships sf0.001/0.01/0.1 read-only; the sf1 set is derived from
sf0.1 deterministically (no randomness, no external data) so the
Spark-vs-DuckDB gate stays self-consistent at 10× scale. This is the run
that proves the promised size-driven plan transitions (broadcast→SMJ on
q34's nd join, q63's claim join, q58's index probe) actually happen and
stay green — not just that they are documented.

Replication scheme (REPL=10), all via DuckDB SQL (its parquet writer emits
micro timestamps that Spark reads as TIMESTAMP_NTZ, matching the driver's
files — pandas would write TIMESTAMP(NANOS) which Spark refuses):

- documents: replica 0 is the original; replicas 1-2 append a unique token
  pair (NEAR-DUPS — 3-gram shingle sets mostly shared, so MinHash finds
  5,000 three-member clusters); replicas 3-9 suffix every token with ~k
  (fully distinct shingles — unique docs). Duplicate structure grows with
  the corpus the way a crawl's does.
- embeddings: +k·2⁻⁷ on every component (10-member near-dup clusters in
  cosine space; quantized IVF sees growing duplicate mass).
- events: new user populations per replica (user_id + 1500k), event ids
  offset, timestamps shifted k seconds — funnels/retention replicate 10×.
- lineitem: l_orderkey offset per replica, all else identical.
- dimensions (region/nation/customer/supplier/part/orders): copied as-is.

Usage: python scripts/make_sf1.py [dst_dir]   (default /tmp/sf1)
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb

SRC = "/root/testdata/sf0.1"
REPL = 10
N_DOCS = 5000
N_VECS = 2000
N_EVENTS = 100_000
N_USERS = 1500


def main() -> int:
    dst = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1")
    dst.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW r AS SELECT unnest(generate_series(0, {REPL - 1})) AS k")

    def copy(sql: str, name: str) -> None:
        con.execute(f"COPY ({sql}) TO '{dst}/{name}.parquet' (FORMAT parquet)")
        n = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{dst}/{name}.parquet')"
        ).fetchone()[0]
        print(f"{name}: {n} rows")

    copy(
        f"""
        SELECT d.doc_id + {N_DOCS} * r.k AS doc_id,
               CASE
                 WHEN r.k = 0 THEN d.text
                 WHEN r.k <= 2 THEN d.text || ' v' || r.k || ' u'
                                  || (d.doc_id * 10 + r.k)
                 ELSE array_to_string(
                        list_transform(str_split(d.text, ' '),
                                       x -> x || '~' || r.k), ' ')
               END AS text,
               d.lang, d.source,
               CAST(len(CASE
                 WHEN r.k = 0 THEN d.text
                 WHEN r.k <= 2 THEN d.text || ' v' || r.k || ' u'
                                  || (d.doc_id * 10 + r.k)
                 ELSE array_to_string(
                        list_transform(str_split(d.text, ' '),
                                       x -> x || '~' || r.k), ' ')
               END) AS BIGINT) AS n_chars
        FROM read_parquet('{SRC}/documents.parquet') d, r
        """,
        "documents",
    )
    copy(
        f"""
        SELECT e.vec_id + {N_VECS} * r.k AS vec_id,
               CAST(list_transform(e.embedding,
                    x -> x + r.k * 0.0078125) AS FLOAT[]) AS embedding,
               e.label
        FROM read_parquet('{SRC}/embeddings.parquet') e, r
        """,
        "embeddings",
    )
    copy(
        f"""
        SELECT e.event_id + {N_EVENTS} * r.k AS event_id,
               e.ts + to_seconds(r.k) AS ts,
               e.user_id + {N_USERS} * r.k AS user_id,
               e.event_type, e.value, e.props
        FROM read_parquet('{SRC}/events.parquet') e, r
        """,
        "events",
    )
    maxkey = con.execute(
        f"SELECT MAX(l_orderkey) + 1 FROM read_parquet('{SRC}/lineitem.parquet')"
    ).fetchone()[0]
    copy(
        f"""
        SELECT l.l_orderkey + {maxkey} * r.k AS l_orderkey,
               l.* EXCLUDE (l_orderkey)
        FROM read_parquet('{SRC}/lineitem.parquet') l, r
        """,
        "lineitem",
    )
    for t in ("region", "nation", "customer", "supplier", "part", "orders"):
        copy(f"SELECT * FROM read_parquet('{SRC}/{t}.parquet')", t)
    return 0


if __name__ == "__main__":
    sys.exit(main())
