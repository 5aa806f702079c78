"""Evidence for q32's documented 100-TB trade: the mergeable
approx_percentile sketch (same plan shape, no per-group sort) stays
within a small relative error of the exact interpolated percentiles. The
sketch is NOT a catalog entry — its values are accuracy-parameter-
dependent, so it has no cross-engine hash oracle; this test is the
accuracy side of the trade the q32 docstring claims."""

from __future__ import annotations

from pyspark.sql import functions as F

from floorist_spark.operators.relational import q32_percentiles
from floorist_spark.session import load_table
from tests.conftest import SF_CORRECTNESS

ACCURACY = 10_000  # 1/accuracy relative-rank error bound


def test_approx_percentile_tracks_exact(spark):
    exact = {r["l_returnflag"]: r for r in q32_percentiles(spark, SF_CORRECTNESS).collect()}
    approx = {
        r["l_returnflag"]: r
        for r in (
            load_table(spark, SF_CORRECTNESS, "lineitem")
            .groupBy("l_returnflag")
            .agg(
                F.expr(
                    f"approx_percentile(l_extendedprice, array(0.25, 0.5, 0.75, 0.99), {ACCURACY})"
                ).alias("p")
            )
            .select(
                "l_returnflag",
                F.expr("element_at(p, 1)").alias("p25"),
                F.expr("element_at(p, 2)").alias("median"),
                F.expr("element_at(p, 3)").alias("p75"),
                F.expr("element_at(p, 4)").alias("p99"),
            )
            .collect()
        )
    }
    assert set(exact) == set(approx)
    for flag, e in exact.items():
        a = approx[flag]
        for col in ("p25", "median", "p75", "p99"):
            rel = abs(a[col] - e[col]) / e[col]
            assert rel < 0.01, (flag, col, a[col], e[col])
