import json
from pathlib import Path

import pandas as pd
import pytest

REF_TESTS = Path("/root/reference/tests")


@pytest.fixture(scope="session")
def ref_tests() -> Path:
    if not REF_TESTS.exists():
        pytest.skip("reference test fixtures not available")
    return REF_TESTS


def load_words_csv(path: Path) -> pd.DataFrame:
    """Load a reference 10-column OCR word table (';'-separated CSV)."""
    df = pd.read_csv(path, sep=";", dtype={"value": str})
    return df


def load_table_json(path: Path):
    """Load a reference table fixture: list of rows, row = list of cell dicts."""
    from img2table_spark.kernels.objects import Cell, Table

    with open(path) as f:
        raw = json.load(f)
    return Table(rows=[[Cell(**el) for el in row] for row in raw])


@pytest.fixture(scope="session")
def spark():
    from img2table_spark.session import get_spark

    s = get_spark(app_name="img2table-spark-tests")
    yield s
