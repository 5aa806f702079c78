"""Cross-batch state semantics for the streaming dedup operator.

The catalog's d08 oracle runs as ONE availableNow micro-batch (where
first-seen == batch dedup); this test forces TWO micro-batches
(maxFilesPerTrigger=1) with duplicates planted across the batch boundary
and proves the GroupState actually suppresses re-emission: a digest seen
in batch 1 must not emit again in batch 2, and the surviving doc_id is
the batch-1 one.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from floorist_spark.streaming.stateful import _OUT_SCHEMA, _STATE_SCHEMA, _first_seen


@pytest.fixture
def two_batch_dir(spark, tmp_path):
    d = f"file://{tmp_path}/docs_stream"
    # batch 1: docs 0-9, unique texts t0..t9
    spark.range(0, 10).select(
        F.col("id").alias("doc_id"), F.concat(F.lit("t"), F.col("id")).alias("text")
    ).coalesce(1).write.mode("append").parquet(d)
    # batch 2: docs 10-19; docs 10-14 repeat texts t0..t4, 15-19 are new
    spark.range(10, 20).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 15, F.concat(F.lit("t"), F.col("id") - 10))
        .otherwise(F.concat(F.lit("t"), F.col("id")))
        .alias("text"),
    ).coalesce(1).write.mode("append").parquet(d)
    return d


def test_state_suppresses_duplicates_across_batches(spark, two_batch_dir):
    from pyspark.sql.streaming.state import GroupStateTimeout

    schema = spark.read.parquet(two_batch_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(two_batch_dir)
    )
    deduped = (
        stream.select(
            F.md5(F.col("text").cast("binary")).alias("text_md5"), "doc_id"
        )
        .groupBy("text_md5")
        .applyInPandasWithState(
            _first_seen, _OUT_SCHEMA, _STATE_SCHEMA, "update", GroupStateTimeout.NoTimeout
        )
    )
    q = (
        deduped.writeStream.format("memory")
        .queryName("state_test_sink")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert len(q.recentProgress) >= 2  # really ran as multiple micro-batches

    out = spark.table("state_test_sink").toPandas()
    # 15 distinct texts total; the 5 cross-batch repeats emit ONCE
    assert len(out) == 15
    assert sorted(out["keep_doc_id"]) == sorted(list(range(10)) + list(range(15, 20)))


def test_stream_dir_distinguishes_same_basename_parents(tmp_path):
    # /a/sf0.01 and /b/sf0.01 must map to DIFFERENT stream dirs, and a
    # stale link is re-pointed at the expected source (ADVICE r2)
    import os

    from floorist_spark.streaming.stateful import _stream_dir_for

    for parent in ("a", "b"):
        os.makedirs(tmp_path / parent / "sf9.9")
        (tmp_path / parent / "sf9.9" / "documents.parquet").write_bytes(b"x")

    d_a = _stream_dir_for(str(tmp_path / "a" / "sf9.9"), "documents")
    d_b = _stream_dir_for(str(tmp_path / "b" / "sf9.9"), "documents")
    assert d_a != d_b
    assert os.path.realpath(os.path.join(d_a, "documents.parquet")).startswith(
        str(tmp_path / "a")
    )
    assert os.path.realpath(os.path.join(d_b, "documents.parquet")).startswith(
        str(tmp_path / "b")
    )

    # force-stale the link inside d_a, then re-resolve: it must re-point
    link = os.path.join(d_a, "documents.parquet")
    os.remove(link)
    os.symlink(str(tmp_path / "b" / "sf9.9" / "documents.parquet"), link)
    d_a2 = _stream_dir_for(str(tmp_path / "a" / "sf9.9"), "documents")
    assert d_a2 == d_a
    assert os.path.realpath(os.path.join(d_a2, "documents.parquet")).startswith(
        str(tmp_path / "a")
    )


def test_stream_dir_flattens_directory_shaped_tables(spark, tmp_path):
    """A writer-output table (directory of part files) must stream with
    ALL its rows — the streaming file source does not recurse into
    subdirectories, so _stream_dir_for links part files flat; before that
    fix a directory-shaped table silently produced an EMPTY stream."""
    from floorist_spark.operators.dedup import d01_exact_dedup
    from floorist_spark.streaming.stateful import d08_streaming_dedup

    rows = [(i, f"text number {i % 5}") for i in range(20)]  # 5 distinct
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    d = str(tmp_path)
    df.repartition(3).write.parquet(f"{d}/documents.parquet")  # 3 part files

    got = d08_streaming_dedup(spark, d).collect()
    want = d01_exact_dedup(spark, d).collect()
    assert len(got) == 5
    assert sorted(r["keep_doc_id"] for r in got) == sorted(
        r["keep_doc_id"] for r in want
    )


@pytest.fixture
def throttle_two_batch_dir(spark, tmp_path):
    """Two micro-batches for the e26 throttle with the cooldown chain
    SPLIT across the batch boundary, plus a planted late event that would
    corrupt the chain if the watermark did not drop it."""
    import datetime as dt

    d = f"file://{tmp_path}/events_stream"
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    h = dt.timedelta(hours=1)
    batch1 = [
        (1, t0, 1, "click"),            # u1 anchor
        (2, t0 + h, 1, "click"),        # inside cooldown -> suppressed
        (10, t0, 2, "click"),           # u2 anchor
        (90, t0 + h, 9, "view"),        # watermark driver #1
    ]
    batch2 = [
        (3, t0 + 73 * h, 1, "click"),   # past cooldown -> kept
        # LATE: below the batch-2 watermark (t0+1h - 10min) AND earlier
        # than u2's anchor — if not dropped it would steal the anchor
        (11, t0 - h, 2, "click"),
        # EXACTLY at the final watermark (t0+200h - 10min): the oracle's
        # <= cutoff includes it, so the timeout must fire for it too
        # (armed one ms early — strictly-beyond firing semantics)
        (40, t0 + 200 * h - dt.timedelta(minutes=10), 4, "click"),
        (91, t0 + 200 * h, 9, "view"),  # watermark driver #2
    ]
    schema = "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING"
    spark.createDataFrame(batch1, schema).coalesce(1).write.mode("append").parquet(d)
    spark.createDataFrame(batch2, schema).coalesce(1).write.mode("append").parquet(d)
    return d, t0


def test_throttle_chain_survives_batch_boundary(spark, throttle_two_batch_dir):
    import datetime as dt

    from pyspark.sql.streaming.state import GroupStateTimeout

    from floorist_spark.streaming.stateful import (
        _E26_OUT,
        _E26_STATE,
        _throttle,
    )

    d, t0 = throttle_two_batch_dir
    schema = spark.read.parquet(d).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
        .withWatermark("ts", "10 minutes")
        .select(
            "user_id", "event_type", "ts",
            F.expr("unix_micros(ts)").alias("us"), "event_id",
        )
    )
    kept = stream.groupBy("user_id", "event_type").applyInPandasWithState(
        _throttle, _E26_OUT, _E26_STATE, "append", GroupStateTimeout.EventTimeTimeout
    )
    q = (
        kept.writeStream.format("memory")
        .queryName("throttle_test_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert len(q.recentProgress) >= 2  # genuinely multi-batch

    out = spark.table("throttle_test_sink").toPandas()
    got = {(int(r.user_id), r.event_type, int(r.event_id)) for r in out.itertuples()}
    # u1's chain spans the boundary: anchor from batch 1, the +73h kept
    # event from batch 2, the +1h event suppressed by batch-1 state
    assert (1, "click", 1) in got and (1, "click", 3) in got
    assert (1, "click", 2) not in got
    # the late batch-2 event was DROPPED, not anchored: u2 keeps event 10
    assert (2, "click", 10) in got
    assert (2, "click", 11) not in got
    # watermark driver #2 sits above the final watermark -> held
    assert (9, "view", 90) in got and (9, "view", 91) not in got
    # the boundary event (ts == final watermark) IS emitted — the
    # inclusive cutoff the recursive oracle uses
    assert (4, "click", 40) in got
    assert len(got) == 5


@pytest.fixture
def funnel_two_batch_dir(spark, tmp_path):
    """Two micro-batches for the e29 streaming funnel: a chain that
    PROGRESSES across the batch boundary, a straggler view that must not
    rewind an already-chosen anchor, a duplicate purchase that must not
    re-emit, and a deadline-expired click that stalls its chain."""
    import datetime as dt

    d = f"file://{tmp_path}/funnel_stream"
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    h = dt.timedelta(hours=1)
    batch1 = [
        (1, t0, 1, "view"),            # u1 anchor view
        (2, t0 + h, 1, "click"),       # within 24h -> chain at stage 2
        (10, t0, 2, "view"),           # u2 anchor
        (20, t0 + 30 * h, 3, "view"),  # u3: click will come too late
    ]
    batch2 = [
        (3, t0 + 2 * h, 1, "purchase"),   # completes u1 ACROSS batches
        (4, t0 + 3 * h, 1, "purchase"),   # duplicate: must NOT re-emit
        # straggler view EARLIER than u2's anchor: anchor must not rewind
        (11, t0 - 5 * h, 2, "view"),
        (12, t0 + h, 2, "click"),         # qualifies vs the ORIGINAL anchor
        (21, t0 + 55 * h, 3, "click"),    # 25h after u3's view -> expired
        (22, t0 + 56 * h, 3, "purchase"), # chain stalled -> no completion
    ]
    schema = "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING"
    spark.createDataFrame(batch1, schema).coalesce(1).write.mode("append").parquet(d)
    spark.createDataFrame(batch2, schema).coalesce(1).write.mode("append").parquet(d)
    return d, t0


def test_funnel_completes_across_batches_and_never_rewinds(spark, funnel_two_batch_dir):
    import datetime as dt

    from pyspark.sql.streaming.state import GroupStateTimeout

    from floorist_spark.streaming.stateful import (
        _E29_OUT,
        _E29_STATE,
        _funnel_match,
    )

    d, t0 = funnel_two_batch_dir
    schema = spark.read.parquet(d).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
        .select(
            "user_id", "event_type",
            F.expr("unix_micros(ts)").alias("us"), "event_id",
        )
    )
    done = stream.groupBy("user_id").applyInPandasWithState(
        _funnel_match, _E29_OUT, _E29_STATE, "append", GroupStateTimeout.NoTimeout
    )
    q = (
        done.writeStream.format("memory")
        .queryName("funnel_test_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert len(q.recentProgress) >= 2  # genuinely multi-batch

    rows = spark.table("funnel_test_sink").collect()
    got = {r["user_id"]: r for r in rows}
    us = lambda delta_h: int((t0 + dt.timedelta(hours=delta_h)).timestamp() * 1_000_000)
    # u1 completed across the boundary with the FIRST purchase only
    assert got[1]["view_us"] == us(0)
    assert got[1]["click_us"] == us(1)
    assert got[1]["purchase_us"] == us(2)
    # exactly one emission per user (duplicate purchase suppressed by the
    # done tombstone)
    assert len(rows) == len(got)
    # u2 never completed (no purchase) and u3's chain expired at the
    # click deadline — neither may appear
    assert 2 not in got and 3 not in got
    assert set(got) == {1}
