"""Adversarial cross-engine parity for the int8 scalar-quantization
operators (s07/s08) — hostile embedding vectors attack the rounding
boundaries the synthetic corpus never hits: exact .5 code boundaries,
huge/tiny magnitudes, negative zero, constant vectors, and the all-zero
scale=0 branch. Vectors go through parquet (float32) so both engines read
identical bits, exactly like the real ``embeddings`` table."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import types as T

from floorist_spark.operators.similarity import _s07_sql, _s08_sql, s07_sq8_quantize, s08_quantized_rerank
from tests.oracle_compare import compare_results

DIM = 8

HOSTILE = [
    [0.0] * DIM,                                      # scale = 0 branch
    [1.0] * DIM,                                      # constant positive
    [-1.0] * DIM,                                     # constant negative
    [1e30, -1e30] * (DIM // 2),                       # huge magnitudes
    [1e-30, -1e-30] * (DIM // 2),                     # tiny magnitudes
    [0.5, -0.5, 1.0, -1.0, 0.25, -0.25, 0.75, -0.75], # exact .5 code boundaries
    [-0.0, 0.0, 1.0, -1.0, 0.1, -0.1, 0.3, -0.3],     # negative zero
    [3.0, 1.0, -2.0, 0.5, -0.5, 2.5, -1.5, 0.125],    # single outlier scale
    [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8],
    [-0.9, 0.8, -0.7, 0.6, -0.5, 0.4, -0.3, 0.2],
    [0.123, -0.456, 0.789, -0.012, 0.345, -0.678, 0.901, -0.234],
    [2.0, 2.0, 2.0, 2.0, -2.0, -2.0, -2.0, -2.0],
]


def _write(spark, tmpdir, vectors):
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    )
    df = spark.createDataFrame(
        [(i, [float(x) for x in v], 0) for i, v in enumerate(vectors)], schema
    )
    df.coalesce(1).write.parquet(f"{tmpdir}/embeddings.parquet")
    return str(tmpdir)


@pytest.fixture(scope="module")
def duck_view():
    import duckdb

    con = duckdb.connect()
    yield con
    con.close()


def _register(con, sf_dir):
    con.execute(
        "CREATE OR REPLACE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{os.path.join(sf_dir, 'embeddings.parquet', '*.parquet')}')"
    )


def test_s07_parity_on_hostile_vectors(spark, duck_view, tmp_path_factory):
    d = _write(spark, tmp_path_factory.mktemp("sq8_hostile"), HOSTILE)
    _register(duck_view, d)
    sp = s07_sq8_quantize(spark, d).toPandas()
    du = duck_view.execute(_s07_sql()).fetchdf()
    compare_results(sp, du, "s07_hostile")
    # the scale=0 vector must produce all-zero codes and zero error; codes
    # travel as md5(to_json(codes)) (scalar-only gate contract), so pin
    # the digest of the canonical all-zero JSON rendering
    import hashlib

    zero_row = sp[sp.vec_id == 0].iloc[0]
    all_zero = "[" + ",".join(["0"] * DIM) + "]"
    assert zero_row["codes_digest"] == hashlib.md5(all_zero.encode()).hexdigest()
    assert zero_row["recon_mse"] == 0.0


def test_s08_parity_on_hostile_vectors(spark, duck_view, tmp_path_factory):
    # drop the all-zero vector: cosine with a zero norm is NaN and the
    # engines disagree on NaN comparison semantics — a zero vector is a
    # data bug upstream of retrieval, not a case the operator defines
    d = _write(spark, tmp_path_factory.mktemp("sq8_hostile8"), HOSTILE[1:])
    _register(duck_view, d)
    sp = s08_quantized_rerank(spark, d).toPandas()
    du = duck_view.execute(_s08_sql()).fetchdf()
    compare_results(sp, du, "s08_hostile")
    assert len(sp) > 0  # buckets must collide somewhere in this corpus
