"""Format-dispatch source: the same table read from parquet, ORC, CSV and
JSON landing zones must produce identical rows, so the operator catalog
and export path are format-agnostic."""

from __future__ import annotations

import pytest

from floorist_spark.sources.files import format_for, read_any


@pytest.fixture(scope="module")
def nation_everywhere(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("formats")
    src = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    paths = {"parquet": f"file://{base}/nation.parquet"}
    src.write.parquet(paths["parquet"])
    for fmt in ("orc", "csv", "json"):
        p = f"file://{base}/nation.{fmt}"
        w = src.write
        if fmt == "csv":
            w = w.option("header", "true")
        getattr(w.format(fmt), "save")(p)
        paths[fmt] = p
    return src, paths


def test_format_inference():
    assert format_for("/x/t.parquet") == "parquet"
    assert format_for("/x/t.CSV") == "csv"
    assert format_for("/x/t.jsonl") == "json"
    with pytest.raises(ValueError):
        format_for("/x/t.avro")


def test_all_formats_roundtrip_identically(spark, nation_everywhere):
    src, paths = nation_everywhere
    expect = sorted(map(tuple, src.collect()))
    schema = src.schema
    for fmt, path in paths.items():
        df = read_any(spark, path, schema=schema)
        assert sorted(map(tuple, df.collect())) == expect, fmt
        assert df.schema == schema, fmt


def test_csv_infers_without_schema(spark, nation_everywhere):
    _, paths = nation_everywhere
    df = read_any(spark, paths["csv"])
    assert df.count() == 25
    assert set(df.columns) == {"n_nationkey", "n_name", "n_regionkey"}
