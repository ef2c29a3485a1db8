"""Driver-contract guards: every queries() entry has an oracle, names
follow the qNN_ convention, and the driver entrypoints expose them."""

import __spark_entry__ as entrymod

from img2table_spark.queries import ORACLES, QUERIES


def test_every_query_has_an_oracle():
    assert set(QUERIES) == set(ORACLES)


def test_query_names_are_ordered_convention():
    import re

    for name in QUERIES:
        assert re.match(r"^q\d{2,3}_", name), name


def test_entrypoint_exposes_registries():
    assert set(entrymod.queries()) == set(QUERIES)
    assert set(entrymod.oracle_sql()) == set(ORACLES)


def test_oracles_are_nonempty_sql():
    for name, sql in ORACLES.items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name
