"""Single extraction-throughput measurement (one JSON line on stdout).

Run under ``taskset -c 0-(N-1)`` so local[N] really has N CPUs — on a shared
box an unpinned local[8] borrows idle cores through JVM/Arrow/GC threads and
fakes superlinear per-core numbers.

Usage: python scripts/bench_extract.py CORES SF_DIR REPEAT
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

    from pyspark.sql import functions as F

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
        },
    )
    try:
        # cache the synthesized input: the metric is EXTRACTION throughput,
        # and the GC-heavy JVM string synthesis would otherwise dominate noise
        tr = transcripts_from_documents(spark, sf_dir, repeat=repeat).persist()
        n_turns = tr.count()
        parts = cores * 8  # fine-grained tasks → stragglers amortize
        # full-size warm-up: python worker spawn + JVM C2 JIT need one real run
        extract_tables(tr, salt=True, num_partitions=parts).write.format(
            "noop"
        ).mode("overwrite").save()
        walls = []
        for _ in range(trials):
            t0 = time.time()
            extract_tables(tr, salt=True, num_partitions=parts).write.format(
                "noop"
            ).mode("overwrite").save()
            walls.append(time.time() - t0)
        # min = the noise-floor estimator (timeit's choice): co-tenant bursts
        # on this VM only ever SLOW a trial (walls scatter up to +40% within
        # one run), so the minimum is the least-biased estimate of capability
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
