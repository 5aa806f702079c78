"""Scale-layout proofs: partition pruning through the engine's partitioned
layout, and bucketed co-located joins.

These pin the two layout mechanisms a 100 TB deployment leans on:

* date-partitioned output (the F4 path layout IS a hive partitioning) lets
  downstream readers prune whole directories — a reader filtering one day
  must not touch the other days' files;
* bucketed tables let repeated large-large joins on the bucket key skip
  the shuffle entirely (co-located join).
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_partition_pruning_over_engine_layout(spark, tmp_path):
    """Write a dataset through Spark's partitionBy using the engine's
    date-column layout, then read with a partition filter: the scan must
    prune to ONE partition directory (PartitionFilters present, pruned
    partition count in the plan)."""
    out = f"file://{tmp_path}/pruned"
    df = spark.range(0, 3000).select(
        "id", (F.col("id") % 3 + 1).alias("day_created")
    )
    df.write.partitionBy("day_created").parquet(out)

    rd = spark.read.parquet(out).filter(F.col("day_created") == 2)
    plan = _plan(rd)
    assert "PartitionFilters" in plan and "day_created" in plan
    assert rd.count() == 1000
    # physical proof: only files under day_created=2 are read
    files = [r[0] for r in rd.select(F.input_file_name()).distinct().collect()]
    assert files and all("day_created=2" in f for f in files)


def test_bucketed_join_skips_shuffle(spark, tmp_path):
    """Two tables bucketed on the join key join WITHOUT a shuffle: the
    plan has no Exchange (only the bucketed scans + sort-merge join).
    This is the co-location strategy for repeated large-large joins."""
    a = spark.range(0, 10000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("va")
    )
    b = spark.range(0, 10000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("vb")
    )
    spark.sql("DROP TABLE IF EXISTS bucket_a")
    spark.sql("DROP TABLE IF EXISTS bucket_b")
    a.write.bucketBy(8, "k").sortBy("k").saveAsTable("bucket_a")
    b.write.bucketBy(8, "k").sortBy("k").saveAsTable("bucket_b")

    # disable broadcast so the join strategy decision is about co-location
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("bucket_a").join(spark.table("bucket_b"), "k")
        plan = _plan(joined)
        assert "Exchange" not in plan, plan
        assert joined.count() == 10000
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        spark.sql("DROP TABLE IF EXISTS bucket_a")
        spark.sql("DROP TABLE IF EXISTS bucket_b")


def test_no_inferred_generate_filter_recompute_at_scan(spark):
    """Regression for the third measured pitfall (PERFORMANCE.md):
    InferFiltersFromGenerate derives ``size(arr) > 0`` from an explode and
    predicate pushdown inlines the WHOLE array expression (tokenize +
    n-gram lambda) into the pre-repartition scan filter, re-evaluating it
    per row on the single scan task (c05's first cut: 20s vs 3s at sf0.1).

    The persist barrier in c05/t09 keeps lambda-bearing expressions out of
    every Filter node — this pins that shape for both operators."""
    from floorist_spark.operators import curation, text
    from floorist_spark.operators._cache import release_caches

    try:
        for build in (curation.c05_decontamination, text.t09_dup_ngram_fraction):
            df = build(spark, "/root/testdata/sf0.001")
            plan = df._jdf.queryExecution().sparkPlan().toString()
            bad = [
                ln
                for ln in plan.splitlines()
                if "Filter" in ln and "lambdafunction" in ln
            ]
            assert not bad, f"{build.__name__} filter recomputes a lambda:\n" + "\n".join(bad)
    finally:
        release_caches()


def test_selfcheck_stamp_roundtrip_and_staleness(tmp_path, monkeypatch):
    """The staleness guard: a stamped scale reports clean while mtimes are
    unchanged and stale once any parquet file changes (the round-3 failure
    mode: testdata regenerated under a green claim)."""
    import os
    import selfcheck

    d = tmp_path / "sfX"
    d.mkdir()
    (d / "events.parquet").write_bytes(b"x")
    monkeypatch.setattr(selfcheck, "STAMP_FILE", str(tmp_path / "stamp.json"))

    selfcheck.write_stamp(str(d))
    assert selfcheck.check_stamps() == []

    os.utime(d / "events.parquet", (1, 1))
    assert selfcheck.check_stamps() == [str(d)]

    selfcheck.write_stamp(str(d))  # re-stamping clears the staleness
    assert selfcheck.check_stamps() == []
