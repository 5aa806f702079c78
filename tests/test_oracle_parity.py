"""Driver-style correctness gate run locally: every queries() entry must
have an oracle_sql() mate and match DuckDB exactly at sf0.01 (round 10
retired the last rows-only entry — q07 now emits deterministic derived
columns over its uuids)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_CORRECTNESS
from tests.oracle_compare import check_type_parity, compare_results

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
    # round-10 invariant: EVERY entry has an oracle twin (q07, the last
    # rows-only holdout, now emits deterministic derived columns)
    assert name in oracles, f"{name} has no oracle_sql() twin"
    # Round-8 harness rule: NATIVE oracle result types must be
    # hash-compatible with the Spark schema (no HUGEINT; integer-vs-
    # floating class parity). The local pandas compare below equates
    # 7 == 7.0 numerically, so without this plan-time check an uncast
    # HUGEINT aggregate passes locally and gates red at the driver —
    # which is exactly what happened to d15/m12/c20 in rounds 5-7.
    check_type_parity(duck.sql(oracles[name]), df.schema, name)
    duck_pdf = duck.execute(oracles[name]).fetchdf()
    compare_results(spark_pdf, duck_pdf, name)


def test_type_parity_catches_hugeint(spark, duck):
    """The round-8 checker must flag exactly the round-5..7 defect class:
    an uncast integer aggregate (HUGEINT in DuckDB) against a Spark bigint,
    and an integer-vs-floating class mismatch — while native BIGINT and
    cast aggregates stay legal."""
    from pyspark.sql import functions as F

    sdf = spark.range(1).select(F.lit(7).cast("long").alias("n_kept"))
    # bare sum() over BIGINT binds HUGEINT → must fail
    with pytest.raises(AssertionError, match="HUGEINT"):
        check_type_parity(
            duck.sql("SELECT sum(x) AS n_kept FROM (VALUES (7::BIGINT)) t(x)"),
            sdf.schema,
            "probe",
        )
    # cast form → legal
    check_type_parity(
        duck.sql(
            "SELECT CAST(sum(x) AS BIGINT) AS n_kept "
            "FROM (VALUES (7::BIGINT)) t(x)"
        ),
        sdf.schema,
        "probe",
    )
    # oracle floating vs Spark integer → must fail
    with pytest.raises(AssertionError, match="integer-vs-"):
        check_type_parity(
            duck.sql("SELECT 7.0::DOUBLE AS n_kept"), sdf.schema, "probe"
        )


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0  # driver contract: entry() must produce rows
    assert len(df.schema) > 0
