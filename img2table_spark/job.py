"""spark-submit entrypoint for the extraction pipeline (north_rule).

Usage:
    spark-submit --py-files engine.zip img2table_spark/job.py \
        --input  /path/to/transcripts_parquet \
        --output /path/to/extracted_parquet \
        --checkpoint /path/to/checkpoints \
        [--n-buckets 64] [--wave-size 32] [--max-waves N]

Re-running the same command resumes: buckets with committed manifests are
skipped (see plans/checkpoints.py).

Query-runner mode — run any registered query from the same surface:
    spark-submit --py-files engine.zip img2table_spark/job.py \
        --run-query q08_minhash_lsh --sf-dir /root/testdata/sf0.01 \
        [--output /path/out_parquet]    # omit --output to print 20 rows
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description="img2table-spark extraction pipeline")
    p.add_argument("--input", help="transcript parquet path")
    p.add_argument("--output", help="output parquet path")
    p.add_argument("--checkpoint", help="checkpoint manifest dir")
    p.add_argument("--n-buckets", type=int, default=64)
    p.add_argument("--wave-size", type=int, default=32)
    p.add_argument("--max-waves", type=int, default=None)
    p.add_argument("--cores", type=int, default=None, help="local[N] cores (sandbox)")
    p.add_argument("--run-query", help="run a registered query (see --list-queries)")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.01", help="table dir for --run-query")
    p.add_argument("--list-queries", action="store_true")
    p.add_argument(
        "--reliable-checkpoint-dir",
        help="set the Spark reliable checkpoint dir (HDFS path on a cluster) "
        "and run reliable=True variants of queries that support it "
        "(q16/q23 label propagation: checkpoint() instead of "
        "localCheckpoint(), surviving executor loss)",
    )
    args = p.parse_args(argv)

    from img2table_spark import queries as q
    from img2table_spark.session import get_spark

    if args.list_queries:
        print("\n".join(q.QUERIES))
        return 0

    if args.run_query:
        fn = q.QUERIES.get(args.run_query)
        if fn is None:
            p.error(f"unknown query {args.run_query!r}; see --list-queries")
        spark = get_spark(app_name=f"img2table-spark-{args.run_query}", cores=args.cores)
        try:
            kwargs = {}
            if args.reliable_checkpoint_dir:
                import inspect

                spark.sparkContext.setCheckpointDir(args.reliable_checkpoint_dir)
                if "reliable" in inspect.signature(fn).parameters:
                    kwargs["reliable"] = True
            df = fn(spark, args.sf_dir, **kwargs)
            if args.output:
                df.write.mode("overwrite").parquet(args.output)
                print(json.dumps({"query": args.run_query, "output": args.output}))
            else:
                df.show(20, truncate=False)
            return 0
        finally:
            spark.stop()

    if not (args.input and args.output and args.checkpoint):
        p.error("--input/--output/--checkpoint are required for pipeline mode")

    from img2table_spark.plans.pipeline import run_pipeline

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
