"""spark-submit entrypoint for the extraction pipeline (north_rule).

Usage:
    spark-submit --py-files engine.zip img2table_spark/job.py \
        --input  /path/to/transcripts_parquet \
        --output /path/to/extracted_parquet \
        --checkpoint /path/to/checkpoints \
        [--n-buckets 64] [--wave-size 32] [--max-waves N]

Re-running the same command resumes: buckets with committed manifests are
skipped (see plans/checkpoints.py).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description="img2table-spark extraction pipeline")
    p.add_argument("--input", required=True, help="transcript parquet path")
    p.add_argument("--output", required=True, help="output parquet path")
    p.add_argument("--checkpoint", required=True, help="checkpoint manifest dir")
    p.add_argument("--n-buckets", type=int, default=64)
    p.add_argument("--wave-size", type=int, default=32)
    p.add_argument("--max-waves", type=int, default=None)
    p.add_argument("--cores", type=int, default=None, help="local[N] cores (sandbox)")
    args = p.parse_args(argv)

    from img2table_spark.plans.pipeline import run_pipeline
    from img2table_spark.session import get_spark

    spark = get_spark(app_name="img2table-spark-job", cores=args.cores)
    try:
        summary = run_pipeline(
            spark,
            args.input,
            args.output,
            args.checkpoint,
            n_buckets=args.n_buckets,
            wave_size=args.wave_size,
            max_waves=args.max_waves,
        )
        print(json.dumps(summary))
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
