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


class _FakeState:
    """Minimal GroupState stand-in for driving _sessionize directly."""

    def __init__(self, value=None, watermark_ms=0):
        self._value = value
        self._wm = watermark_ms
        self.timeout_set = None

    @property
    def exists(self):
        return self._value is not None

    @property
    def get(self):
        return self._value

    def update(self, v):
        self._value = v

    def remove(self):
        self._value = None

    def getCurrentWatermarkMs(self):
        return self._wm

    def setTimeoutTimestamp(self, ms):
        self.timeout_set = ms


def _us(mins):
    return int((T0 + dt.timedelta(minutes=mins)).timestamp() * 1_000_000)


def test_sessionize_multi_chunk_out_of_order():
    """applyInPandasWithState delivers a group as MULTIPLE Arrow chunks
    with no global time order; the fold must buffer + sort across chunks,
    not per chunk. Regression pin for the per-chunk-sort bug: with chunk A
    = [m40, m45] and chunk B = [m0, m5], per-chunk folding would corrupt
    the session boundaries; globally sorted, the 35-min gap splits two
    clean sessions. Emission happens on the TIMEOUT call once the
    watermark passes (events arriving below the watermark would be late
    by contract, so the data call runs at wm=0)."""
    import pandas as pd

    chunk_a = pd.DataFrame({"us": [_us(40), _us(45)], "event_id": [3, 4]})
    chunk_b = pd.DataFrame({"us": [_us(0), _us(5)], "event_id": [1, 2]})
    state = _FakeState(watermark_ms=0)
    out1 = list(_sessionize((7,), iter([chunk_a, chunk_b]), state))
    assert out1 == []  # nothing emittable at wm=0
    state._wm = _us(300) // 1000  # watermark advances -> timeout call
    out = list(_sessionize((7,), iter([]), state))
    sessions = pd.concat(out).sort_values("start_us").reset_index(drop=True)
    assert len(sessions) == 2
    assert list(sessions["start_us"]) == [_us(0), _us(40)]
    assert list(sessions["end_us"]) == [_us(35), _us(75)]
    assert list(sessions["n_events"]) == [2, 2]


def test_sessionize_late_event_does_not_rewind_session():
    """A straggler older than a retained session's last event (arriving
    in a LATER micro-batch call) must merge without moving the session
    end backwards; an event below the watermark that fits no retained
    session opens a PROVISIONAL session that closes all-late at this very
    flush and is discarded — never emitted, never merged."""
    import pandas as pd

    # call 1: session [m60, m65]
    state = _FakeState(watermark_ms=0)
    list(_sessionize((7,), iter([pd.DataFrame({"us": [_us(60), _us(65)], "event_id": [1, 2]})]), state))
    # call 2 at wm=m0: m50 gap-extends the session's front (60-50 < 30);
    # m-100 is below the watermark and near no session -> dropped
    state._wm = _us(0) // 1000
    list(
        _sessionize(
            (7,),
            iter([pd.DataFrame({"us": [_us(50), _us(-100)], "event_id": [3, 4]})]),
            state,
        )
    )
    s_start, s_last, s_n, s_ontime = state.get
    assert list(s_start) == [_us(50)]   # front-extended by the straggler
    assert list(s_last) == [_us(65)]    # end did NOT rewind
    assert list(s_n) == [3]             # m-100 quarantined, not merged
    assert list(s_ontime) == [True]


def test_sessionize_straggler_bridges_two_sessions():
    """THE multi-batch bridge case: a straggler landing in the gap
    between two retained sessions, within the session gap of BOTH, must
    fuse them into one — the old open/pending split front-extended only
    the open session and emitted two overlapping sessions."""
    import pandas as pd

    state = _FakeState(watermark_ms=0)
    # call 1: sessions [m0, m5] and [m50] (45-min gap splits them)
    list(
        _sessionize(
            (7,),
            iter([pd.DataFrame({"us": [_us(0), _us(5), _us(50)], "event_id": [1, 2, 3]})]),
            state,
        )
    )
    s_start, _, _, _ = state.get
    assert list(s_start) == [_us(0), _us(50)]
    # call 2: m25 is within 30 min of BOTH m5 and m50 -> one fused session
    list(_sessionize((7,), iter([pd.DataFrame({"us": [_us(25)], "event_id": [4]})]), state))
    s_start, s_last, s_n, _ = state.get
    assert list(s_start) == [_us(0)]
    assert list(s_last) == [_us(50)]
    assert list(s_n) == [4]
    # flush: ONE session [m0, m80], no overlapping emissions
    state._wm = _us(300) // 1000
    out = pd.concat(list(_sessionize((7,), iter([]), state)))
    assert len(out) == 1
    assert out["start_us"][0] == _us(0) and out["end_us"][0] == _us(80)
    assert out["n_events"][0] == 4


def test_sessionize_below_watermark_straggler_starts_ontime_session():
    """The same-batch straggler case: an event below the watermark that
    fits no retained session but lies within the gap of an ON-TIME event
    sorting after it in the SAME batch must become that session's true
    start (the batch gaps-and-islands oracle puts both in one session).
    Eager dropping would start the session at the on-time event and
    undercount. An isolated straggler, by contrast, forms a provisional
    session that closes all-late and is silently discarded."""
    import pandas as pd

    state = _FakeState(watermark_ms=_us(0) // 1000)  # wm = m0
    out1 = list(
        _sessionize(
            (7,),
            iter(
                [
                    pd.DataFrame(
                        # m-5: below wm, within 30 min of on-time m10;
                        # m-200: below wm, near nothing -> provisional,
                        # closes all-late at this flush -> discarded
                        {"us": [_us(10), _us(-5), _us(-200)], "event_id": [1, 2, 3]}
                    )
                ]
            ),
            state,
        )
    )
    assert out1 == []  # nothing on-time is emittable yet at wm=m0
    s_start, s_last, s_n, s_ontime = state.get
    assert list(s_start) == [_us(-5)]  # straggler is the session start
    assert list(s_last) == [_us(10)]
    assert list(s_n) == [2]            # m-200 discarded, not counted
    assert list(s_ontime) == [True]
    # watermark passes -> the joined session emits with the early start
    state._wm = _us(300) // 1000
    out = pd.concat(list(_sessionize((7,), iter([]), state)))
    assert len(out) == 1
    assert out["start_us"][0] == _us(-5)
    assert out["end_us"][0] == _us(40)
    assert out["n_events"][0] == 2


def test_sessionizer_provisional_straggler_in_real_stream(spark, tmp_path):
    """The round-6 provisional-insert semantics through the REAL stream
    (two micro-batches, watermark advanced between them): a batch-2
    straggler below the watermark that fits no retained session must
    become the START of the session an on-time batch-2 event opens
    (batch oracle start), while an isolated straggler is silently
    discarded — never emitted, never merged."""
    d = str(tmp_path / "stream_in")
    os.makedirs(d)
    m = lambda mins: T0 + dt.timedelta(minutes=mins)
    now = time.time()
    # batch 1: u1 session [m0, m5]; u2 event at m60 advances the
    # watermark to m50 after this batch
    _write(spark, d, "b1", [(1, m(0), 1), (2, m(5), 1), (3, m(60), 2)], now - 60)
    # batch 2 (wm = m50 during the data call):
    #   u1 m40  -> below wm, 35 min past m5 (fits nothing) -> provisional
    #   u1 m55  -> on-time, 15 min past m40 -> joins the provisional
    #   u2 m-100 -> below wm, near nothing -> provisional, closes
    #               all-late at this flush -> discarded
    #   u2 m120 -> advances the final watermark to m110 so the joined
    #              session (end m85) emits on the timeout pass
    _write(
        spark, d, "b2",
        [(4, m(40), 1), (5, m(55), 1), (6, m(-100), 2), (7, m(120), 2)],
        now,
    )

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
        .queryName("e15_straggler_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert len(q.recentProgress) >= 2

    rows = {
        (r["user_id"], r["start_us"]): r
        for r in spark.table("e15_straggler_sink").collect()
    }
    us = lambda mins: int(m(mins).timestamp() * 1_000_000)
    # u1 session 1: [m0, m5] closed by the gap, end m35 <= final wm m110
    assert rows[(1, us(0))]["n_events"] == 2
    # THE fix: the joined session starts at the STRAGGLER (m40), not the
    # on-time event (m55), and counts both events
    assert (1, us(40)) in rows, sorted(rows)
    assert rows[(1, us(40))]["n_events"] == 2
    assert rows[(1, us(40))]["end_us"] == us(85)
    assert (1, us(55)) not in rows  # the old eager-drop shape
    # u2: m60 session emitted alone; the m-100 provisional vanished and
    # m120 (end m150 > wm m110) is retained, not emitted
    assert rows[(2, us(60))]["n_events"] == 1
    assert (2, us(-100)) not in rows
    assert (2, us(120)) not in rows
    assert len(rows) == 3
