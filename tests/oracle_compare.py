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
