"""Strict Spark-vs-DuckDB result comparison, mimicking the driver's
correctness gate (row-count + schema-shape + order-insensitive values).

Stricter than the driver on floats: we require EXACT equality, because the
engine's queries are designed so parallel Spark aggregation and sequential
DuckDB aggregation are bit-identical (exact DECIMAL accumulation rendered
to DOUBLE). Any non-zero float diff is a design bug, not noise.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd


def _duck_type_class(t: str) -> str:
    """Coarse class of a NATIVE DuckDB result type (str of a DuckDBPyType).
    Native types, not pandas dtypes: a BIGINT column with NULLs fetches as
    float64 but is still integer-class — that fetch-time widening is exactly
    what the grading driver's value hash tolerates, while a HUGEINT column
    (rendered float64 even without NULLs) is not."""
    t = t.upper()
    if "HUGEINT" in t:
        return "hugeint"
    # unsigned ints spelled out: a bare startswith("U") would also claim
    # UUID and UNION(...) as integer-class and false-fail type-correct
    # oracles
    if t in (
        "TINYINT", "SMALLINT", "INTEGER", "BIGINT",
        "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT",
    ):
        return "integer"
    if t in ("FLOAT", "DOUBLE", "REAL"):
        return "floating"
    if t.startswith("DECIMAL"):
        return "decimal"
    return "other"


def _spark_type_class(dt) -> str:
    from pyspark.sql import types as T

    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "integer"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return "floating"
    if isinstance(dt, T.DecimalType):
        return "decimal"
    return "other"


def check_type_parity(duck_rel, spark_schema, name: str) -> None:
    """Assert the oracle's NATIVE DuckDB result types are hash-compatible
    with the Spark schema (round-8 harness rule, from the round-7 verdict):

    * no HUGEINT/UHUGEINT anywhere — DuckDB's pandas fetch renders HUGEINT
      as float64, so the driver's value hash sees ``7.0`` against Spark's
      ``7`` even though both engines computed the same integer. This silently
      cost three gate rows for three rounds (d15 n_kept, m12 n_first_owned,
      c20 shard_id — bare ``sum(CASE ...)`` / ``//`` results). An uncast
      integer aggregate in an oracle is now a failing test, not a prose rule.
    * every shared column's integer-vs-floating class matches the Spark
      schema's — checked on native types, so NULL-induced pandas float64
      on BIGINT columns (d17 dup_of, e25 total_delay_us) stays legal.

    ``duck_rel`` is an unexecuted ``con.sql(oracle)`` relation: DuckDB binds
    result types without running the query, so this is plan-time cheap."""
    duck_types = {c: str(t) for c, t in zip(duck_rel.columns, duck_rel.types)}
    huge = [c for c, t in duck_types.items() if "HUGEINT" in t.upper()]
    assert not huge, (
        f"{name}: oracle columns {huge} are HUGEINT — DuckDB's pandas fetch "
        "renders HUGEINT as float64 and the driver's value hash will mismatch "
        "Spark's integers; CAST(... AS BIGINT) in the oracle SQL"
    )
    spark_types = {f.name: f.dataType for f in spark_schema.fields}
    # fetch-class: what the value LOOKS like after the pandas fetch both
    # harnesses hash on (DECIMAL fetches as float64, so decimal ~ floating)
    fetch = {"integer": "int", "floating": "float", "decimal": "float"}
    for c in duck_types:
        if c not in spark_types:
            continue  # column-name parity is compare_results' job
        dc = fetch.get(_duck_type_class(duck_types[c]))
        sc = fetch.get(_spark_type_class(spark_types[c]))
        if "int" in (dc, sc):
            assert dc == sc, (
                f"{name}: column {c!r} is {duck_types[c]} in the oracle but "
                f"{spark_types[c].simpleString()} in Spark — integer-vs-"
                "floating class must match or the driver's value hash "
                "diverges (7 vs 7.0)"
            )


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if pd.api.types.is_datetime64_any_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("datetime64[us]")
        elif pd.api.types.is_extension_array_dtype(pdf[c]):
            pdf[c] = pdf[c].astype(object)
    if len(pdf):
        key = pdf.astype(str)
        order = key.sort_values(by=list(pdf.columns)).index
        pdf = pdf.loc[order].reset_index(drop=True)
    return pdf


def _values_equal(a, b) -> bool:
    a_null = a is None or (isinstance(a, float) and math.isnan(a)) or a is pd.NaT
    b_null = b is None or (isinstance(b, float) and math.isnan(b)) or b is pd.NaT
    if a_null or b_null:
        return a_null and b_null
    if isinstance(a, (np.ndarray, list)) or isinstance(b, (np.ndarray, list)):
        a_list, b_list = list(a), list(b)
        return len(a_list) == len(b_list) and all(
            _values_equal(x, y) for x, y in zip(a_list, b_list)
        )
    if isinstance(a, (float, np.floating)) and isinstance(b, (float, np.floating)):
        return float(a) == float(b)
    if isinstance(a, (int, np.integer)) and isinstance(b, (int, np.integer)):
        return int(a) == int(b)
    if isinstance(a, pd.Timestamp) or isinstance(b, pd.Timestamp):
        return pd.Timestamp(a) == pd.Timestamp(b)
    return a == b


def compare_results(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str) -> None:
    sp = _normalize(spark_pdf)
    du = _normalize(duck_pdf)
    assert list(sp.columns) == list(du.columns), (
        f"{name}: column mismatch spark={list(sp.columns)} duck={list(du.columns)}"
    )
    assert len(sp) == len(du), f"{name}: row count spark={len(sp)} duck={len(du)}"
    for c in sp.columns:
        sv, dv = sp[c].to_numpy(dtype=object), du[c].to_numpy(dtype=object)
        bad = [i for i in range(len(sv)) if not _values_equal(sv[i], dv[i])]
        if bad:
            i = bad[0]
            diff = ""
            try:
                diff = f" (diff={float(sv[i]) - float(dv[i]):.3e})"
            except (TypeError, ValueError):
                pass
            raise AssertionError(
                f"{name}: column {c!r}: {len(bad)}/{len(sv)} mismatches; "
                f"first at row {i}: spark={sv[i]!r} duck={dv[i]!r}{diff}"
            )
