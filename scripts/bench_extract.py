"""Single extraction-throughput measurement (one JSON line on stdout).

Run under ``taskset -c 0-(N-1)`` so local[N] really has N CPUs — on a shared
box an unpinned local[8] borrows idle cores through JVM/Arrow/GC threads and
fakes superlinear per-core numbers.

Measurement-shape notes (calibrated on this box):
- Task count is cores*2, NOT cores*8: local-mode task launch costs ~5 ms of
  single-threaded scheduler time each, so 256 tasks burn ~1.3 s of pure
  fixed cost at 32 cores (measured: 15.2 s wall at 256 parts vs 12.5 s at
  64 parts, same input). Balance still holds — the salt hash spreads
  (conv_id, turn_bucket) keys uniformly over 2 waves per core.
- Warm-up runs on a small slice: it only exists to spawn Python workers,
  JIT the JVM hot paths, and initialize the noop committer; a full-size
  warm-up would double the low-side cost for nothing.
- min(walls) is the noise-floor estimator (timeit's choice): co-tenant
  bursts on this VM only ever SLOW a trial, never speed it up.

Usage: python scripts/bench_extract.py CORES SF_DIR REPEAT [TRIALS]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    cores = int(sys.argv[1])
    sf_dir = sys.argv[2]
    repeat = int(sys.argv[3]) if len(sys.argv) > 3 else 30
    trials = int(sys.argv[4]) if len(sys.argv) > 4 else 3

    from img2table_spark.operators.extract import extract_tables
    from img2table_spark.session import get_spark
    from img2table_spark.sources.transcripts import transcripts_from_documents

    spark = get_spark(
        app_name=f"bench-extract-{cores}",
        cores=cores,
        extra_conf={
            # text payloads are small — larger Arrow batches cut per-batch overhead
            "spark.sql.execution.arrow.maxRecordsPerBatch": "4096",
            # the cached transcript table grows with BENCH_REPEAT
            "spark.driver.memory": "16g",
            # cache partitions are PROCESS_LOCAL; never idle a core waiting
            # for a locality level
            "spark.locality.wait": "0",
        },
    )
    try:
        # cache the synthesized input: the metric is EXTRACTION throughput,
        # and the GC-heavy JVM string synthesis would otherwise dominate noise
        tr = transcripts_from_documents(spark, sf_dir, repeat=repeat).persist()
        n_turns = tr.count()
        parts = cores * 2
        # small-slice warm-up: python worker spawn + JVM C2 JIT + committer init
        warm = tr.limit(min(n_turns, 50_000)).repartition(parts)
        extract_tables(warm, salt=False).write.format("noop").mode("overwrite").save()
        walls = []
        for _ in range(trials):
            t0 = time.time()
            extract_tables(tr, salt=True, num_partitions=parts).write.format(
                "noop"
            ).mode("overwrite").save()
            walls.append(time.time() - t0)
        best = min(walls)
        print(
            json.dumps(
                {
                    "cores": cores,
                    "n_turns": n_turns,
                    "wall_s": round(best, 3),
                    "walls": [round(w, 3) for w in walls],
                    "turns_per_sec": round(n_turns / best, 1),
                }
            )
        )
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
