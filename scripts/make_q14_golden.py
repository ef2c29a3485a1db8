"""Materialize the q14 golden parquet (tests/golden/q14_cells.parquet).

q14's pixel pipeline is not SQL-expressible, so its DuckDB oracle is a
SELECT over this golden. The golden is only trustworthy because the kernels
it exercises are pinned by the reference's own fixtures in the pytest suite
(expected.xlsx values, expected_tables.json bboxes, HTML byte-equality) —
so the workflow is:

    python -m pytest -x -q            # MUST be green first
    python scripts/make_q14_golden.py # then regenerate

Run this whenever a CV kernel changes. The script refuses to write if the
q14 corpus is empty (reference fixtures missing).
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

GOLDEN = Path(__file__).resolve().parent.parent / "tests" / "golden" / "q14_cells.parquet"


def main() -> int:
    from img2table_spark.queries import q14_image_extract
    from img2table_spark.session import get_spark

    spark = get_spark(app_name="make-q14-golden")
    try:
        pdf = q14_image_extract(spark, "/root/testdata/sf0.001").toPandas()
    finally:
        spark.stop()
    if pdf.empty:
        print("q14 produced 0 rows (reference fixtures missing?) — not writing")
        return 1
    pdf = pdf.sort_values(list(pdf.columns)).reset_index(drop=True)
    GOLDEN.parent.mkdir(parents=True, exist_ok=True)
    pdf.to_parquet(GOLDEN, index=False)
    print(f"wrote {len(pdf)} rows → {GOLDEN}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
