"""Incremental-export semantics: a second run dumps ONLY newly arrived
files (checkpointed file-listing state), never re-reading or duplicating
earlier data — the exactly-once-per-input-file contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from floorist_spark.streaming.export import incremental_dump


def test_second_run_processes_only_new_files(spark, tmp_path):
    src = f"file://{tmp_path}/src"
    target = f"file://{tmp_path}/out"
    ckpt = f"file://{tmp_path}/ckpt"

    spark.range(0, 100).select(F.col("id").alias("v")).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    schema = spark.read.parquet(src).schema

    n1 = incremental_dump(spark, src, schema, target, ckpt)
    assert n1 >= 1
    assert spark.read.parquet(target).count() == 100

    # nothing new → no batch with rows, no output change
    n2 = incremental_dump(spark, src, schema, target, ckpt)
    assert n2 == 0
    assert spark.read.parquet(target).count() == 100

    # new file arrives → only its rows are appended
    spark.range(100, 150).select(F.col("id").alias("v")).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    n3 = incremental_dump(spark, src, schema, target, ckpt)
    assert n3 >= 1
    out = spark.read.parquet(target)
    assert out.count() == 150
    assert out.agg(F.countDistinct("v")).collect()[0][0] == 150  # no dupes
