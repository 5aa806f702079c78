"""Driver-style correctness gate run locally: every queries() entry with an
oracle_sql() mate must match DuckDB exactly at sf0.01; entries without an
oracle get a rows-only sanity check."""

from __future__ import annotations

import pytest

from tests.conftest import SF_CORRECTNESS
from tests.oracle_compare import compare_results

import __spark_entry__ as entrymod


def _query_names():
    return sorted(entrymod.queries().keys())


@pytest.mark.parametrize("name", _query_names())
def test_query_vs_oracle(name, spark, duck):
    q = entrymod.queries()[name]
    oracles = entrymod.oracle_sql()
    df = q(spark, SF_CORRECTNESS)
    spark_pdf = df.toPandas()
    if name in oracles:
        duck_pdf = duck.execute(oracles[name]).fetchdf()
        compare_results(spark_pdf, duck_pdf, name)
    else:
        assert spark_pdf is not None  # rows-only check: query ran


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0  # driver contract: entry() must produce rows
    assert len(df.schema) > 0
