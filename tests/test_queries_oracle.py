"""Mirror of the driver's correctness gate: every queries() entry with an
oracle must match DuckDB bitwise; entries without an oracle must at least
run and return a stable schema."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod  # noqa: E402
from oracle_harness import compare, duck_con  # noqa: E402

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def con(sf_dir):
    return duck_con(sf_dir)


def test_oracle_keys_subset_of_queries():
    assert set(ORACLES) <= set(QUERIES)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert [f.name for f in df.schema.fields] == ["image_id", "cad_number", "cell"]


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_parity(spark, sf_dir, con, name):
    df = QUERIES[name](spark, sf_dir)
    if name in ORACLES:
        ok, msg = compare(df, con, ORACLES[name])
        assert ok, f"{name}: {msg}"
    else:
        assert df.count() >= 0  # rows-only check (non-SQL-expressible op)
