"""Multi-batch semantics for the e15 custom stateful sessionizer — the
catalog oracle runs availableNow over ONE file (single micro-batch); this
drives the same state function across TWO micro-batches (maxFilesPerTrigger
=1) so cross-batch state carry-over, the gap-close on a later batch's
event, and event-time-timeout emission are all genuinely exercised."""

from __future__ import annotations

import datetime as dt
import os
import time

from pyspark.sql import functions as F

from floorist_spark.streaming.stateful import (
    _E15_OUT,
    _E15_STATE,
    _sessionize,
)
from pyspark.sql.streaming.state import GroupStateTimeout

T0 = dt.datetime(2024, 6, 1, 12, 0, 0)


def _write(spark, d, name, rows, mtime):
    """Write one FLAT parquet file into the stream dir (the file source
    does not recurse into non-partition subdirectories)."""
    import glob
    import shutil

    df = spark.createDataFrame(
        rows, "event_id BIGINT, ts TIMESTAMP, user_id BIGINT"
    )
    tmp = os.path.join(d, f"_tmp_{name}")
    df.coalesce(1).write.parquet(tmp)
    part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
    dest = os.path.join(d, f"{name}.parquet")
    shutil.move(part, dest)
    shutil.rmtree(tmp)
    os.utime(dest, (mtime, mtime))


def test_sessionizer_across_micro_batches(spark, tmp_path):
    d = str(tmp_path / "stream_in")
    os.makedirs(d)
    m = lambda mins: T0 + dt.timedelta(minutes=mins)
    now = time.time()
    # batch 1: u1 two events 5 min apart; u2 one event
    _write(spark, d, "b1", [(1, m(0), 1), (2, m(5), 1), (3, m(0), 2)], now - 60)
    # batch 2: u1 event 45 min after its last -> closes session 1 by gap;
    # also advances the final watermark to m(50) - 10 = m(40)
    _write(spark, d, "b2", [(4, m(50), 1)], now)

    schema = "event_id BIGINT, ts TIMESTAMP, user_id BIGINT"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
        .withWatermark("ts", "10 minutes")
        .select("user_id", "ts", F.expr("unix_micros(ts)").alias("us"), "event_id")
    )
    q = (
        stream.groupBy("user_id")
        .applyInPandasWithState(
            _sessionize, _E15_OUT, _E15_STATE, "append",
            GroupStateTimeout.EventTimeTimeout,
        )
        .writeStream.format("memory")
        .queryName("e15_mb_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # assert the source really split into two micro-batches
    n_batches = len(q.recentProgress)
    assert n_batches >= 2, f"expected >=2 micro-batches, got {n_batches}"

    rows = {
        (r["user_id"], r["start_us"]): r
        for r in spark.table("e15_mb_sink").collect()
    }
    us = lambda mins: int(m(mins).timestamp() * 1_000_000)
    # u1 session 1 spans batch 1, closed by batch 2's event, end m(35) <=
    # final watermark m(40) -> emitted with both events
    assert rows[(1, us(0))]["n_events"] == 2
    assert rows[(1, us(0))]["end_us"] == us(35)
    # u2's lone session (end m(30) <= m(40)) must emit via TIMEOUT — no
    # new u2 data ever arrives after batch 1
    assert rows[(2, us(0))]["n_events"] == 1
    assert rows[(2, us(0))]["end_us"] == us(30)
    # u1 session 2 (end m(80) > watermark m(40)) must NOT be emitted
    assert (1, us(50)) not in rows
    assert len(rows) == 2
