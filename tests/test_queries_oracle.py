"""The local mirror of the driver's correctness gate: every registered
query with an oracle must match DuckDB exactly (rows, columns, values)."""

from __future__ import annotations

import pytest

from hudi_and_delta_showcase_spark.queries import load_all
from hudi_and_delta_showcase_spark.testing import compare_query

ALL = load_all()
WITH_ORACLE = sorted(n for n, q in ALL.items() if q.oracle is not None)
ROWS_ONLY = sorted(n for n, q in ALL.items() if q.oracle is None)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_match(spark, sf_dir, name):
    q = ALL[name]
    result = compare_query(name, q.fn(spark, sf_dir), q.oracle, sf_dir)
    assert result.ok, f"{name}: {result.detail}"
    assert result.spark_rows > 0, f"{name}: empty result"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, sf_dir, name):
    q = ALL[name]
    df = q.fn(spark, sf_dir)
    assert df.count() >= 0


def test_entry_contract(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    assert df.count() > 0
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(queries)
    assert len(queries) == len(ALL)
