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
    # Driver-canonicalizer contract: gated outputs must be scalar-only.
    # pandas cannot sort/hash list or dict cells (s07's original raw
    # `codes` array died with "unhashable type: 'list'" in the round-4
    # gate), so any array/map/struct column must be digested (e.g.
    # md5(to_json(col))) before it reaches the registry surface.
    from pyspark.sql import types as T

    complex_cols = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]
    assert not complex_cols, (
        f"{name} exposes non-scalar columns {complex_cols}; digest them "
        "(md5(to_json(...))) so prefix-sampling harnesses can canonicalize"
    )
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
