"""Heavy-payload (image) extraction throughput at one parallelism level.

Usage: python scripts/bench_images.py CORES N_PAYLOADS [TRIALS]
Run under taskset like scripts/bench_extract.py.
"""

from __future__ import annotations

import base64
import datetime as dt
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REF = Path("/root/reference/tests")


def main() -> int:
    cores = int(sys.argv[1])
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 192
    trials = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    from img2table_spark.operators.extract import extract_tables
    from img2table_spark.schema import TRANSCRIPT_SCHEMA
    from img2table_spark.session import get_spark

    test_b64 = base64.b64encode(
        (REF / "document/image/test_data/test.png").read_bytes()
    ).decode()
    dark_b64 = base64.b64encode(
        (REF / "document/image/test_data/dark.png").read_bytes()
    ).decode()
    hocr = (REF / "_mock_data/tesseract_hocr.html").read_text()
    ts = dt.datetime(2026, 1, 1)
    rows = []
    for i in range(n):
        payload = json.dumps(
            {"image": test_b64 if i % 2 == 0 else dark_b64,
             "hocr": hocr if i % 2 == 0 else None,
             "implicit_rows": True}
        )
        rows.append((f"c{i % 37}", i, "assistant", payload, "image/png", ts))

    spark = get_spark(app_name=f"bench-img-{cores}", cores=cores)
    try:
        df = spark.createDataFrame(rows, TRANSCRIPT_SCHEMA).persist()
        df.count()
        extract_tables(df, salt=True).write.format("noop").mode("overwrite").save()  # warm
        walls = []
        for _ in range(trials):
            t0 = time.time()
            extract_tables(df, salt=True).write.format("noop").mode("overwrite").save()
            walls.append(time.time() - t0)
        best = sorted(walls)[len(walls) // 2]
        print(json.dumps({"cores": cores, "n_payloads": n, "wall_s": round(best, 3),
                          "walls": [round(w, 3) for w in walls],
                          "payloads_per_sec": round(n / best, 2)}))
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
