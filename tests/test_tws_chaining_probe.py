"""Round-11 probe, machine-checked: CAN Spark 4's transformWithState sit
BEFORE a windowed streaming aggregation?

Context (round-10 verdict task 3): the streaming ingest dedup
(`operators/events_analytics.py::_events_stream`) uses
``dropDuplicates(["event_id"])``, whose arbitrary-copy pick is
value-deterministic only under the generator contract that redelivered
event_ids carry identical bytes. A least-payload canonicalization would
discharge that contract in-engine, but it needs an ARBITRARY-STATEFUL
operator ahead of the downstream windowed aggregations —
``applyInPandasWithState`` cannot be chained that way (no mechanism to
re-declare the event-time column for downstream watermark accounting).

Probe result (2026-08-17, Spark 4.1.2): ``transformWithStateInPandas``
WITH ``eventTimeColumnName`` lifts the chaining restriction at the PLAN
level — the analyzer accepts

    TransformWithStateInPySpark -> UpdateEventTimeWatermarkColumn
        -> windowed Aggregate

and the streaming query STARTS (UnsupportedOperationChecker runs at query
start; an illegal multi-stateful shape fails there). Execution, however,
is environmentally blocked in this container: the Python state-server
protocol (`pyspark.sql.streaming.stateful_processor_api_client`, which
drives ValueState/timers) is protobuf-based
(``pyspark/sql/streaming/proto/StateMessage_pb2.py``) and the
``google.protobuf`` runtime is not installed and cannot be fetched (no
network). The failure signature is
STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE wrapping ``ImportError:
cannot import name 'descriptor' from 'google.protobuf'``.

This test pins BOTH halves so the conclusion stays true by execution, not
by prose:

* if the chained plan were REJECTED at query start (chaining actually
  disallowed), the test FAILS — the probe note would be wrong;
* in this container it observes the runner-init crash and xfails with the
  environmental reason;
* on a box WITH protobuf it runs to completion and asserts full value
  parity of the deterministic least-payload dedup against the batch twin
  — the upgrade path needs zero code changes.

Until the environment unblocks, the generator-level byte-identical
redelivery contract (pinned in tests/test_degenerate_harness.py, commit
a786f0f) remains the operative guarantee for _events_stream.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"

OUT_SCHEMA = (
    "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, "
    "value DOUBLE"
)


def _least_payload_processor():
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class LeastPayloadDedup(StatefulProcessor):
        """One row per event_id: the lexicographically-least
        (event_type, value, user_id, ts) payload within the first batch
        carrying the key; later batches' copies suppressed."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self.seen = handle.getValueState("seen", "seen SHORT")

        def handleInputRows(self, key, rows, timerValues):
            if self.seen.exists():
                for _ in rows:
                    pass
                return iter(())
            best = None
            order = ["event_type", "value", "user_id", "ts"]
            for pdf in rows:
                head = pdf.sort_values(order, kind="mergesort").iloc[[0]]
                if best is None or (
                    tuple(head.iloc[0][order]) < tuple(best.iloc[0][order])
                ):
                    best = head
            self.seen.update((1,))
            return iter([best])

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            return iter(())

        def close(self) -> None:
            pass

    return LeastPayloadDedup()


def test_transform_with_state_chains_before_windowed_agg(spark):
    from floorist_spark.operators.events_analytics import (
        STREAM_DOMAIN,
        _convert_ts,
    )
    from floorist_spark.streaming.stateful import _stream_dir_for

    raw_schema = spark.read.parquet(os.path.join(SF, "events.parquet")).schema
    stream = (
        _convert_ts(
            spark.readStream.schema(raw_schema).parquet(
                _stream_dir_for(SF, "events")
            )
        )
        .filter(STREAM_DOMAIN)
        .select("event_id", "ts", "user_id", "event_type", "value")
    )

    deduped = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy("event_id")
        .transformWithStateInPandas(
            _least_payload_processor(),
            OUT_SCHEMA,
            "Append",
            "None",
            eventTimeColumnName="ts",
        )
    )
    agged = (
        deduped.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("sv"))
        .select(F.col("w.start").alias("ws"), "event_type", "n", "sv")
    )

    # Query START is where an illegal multi-stateful plan dies
    # (UnsupportedOperationChecker). It must not.
    query = (
        agged.writeStream.format("memory")
        .queryName("tws_probe_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        query.awaitTermination()
    except Exception as e:  # noqa: BLE001 — classify the failure mode
        import importlib.util

        msg = str(e)
        # The protobuf ImportError sits in the nested Java cause chain, not
        # the top-level STREAM_FAILED message — so accept the runner-crash
        # signature only when protobuf is INDEPENDENTLY verified absent.
        try:
            # find_spec raises when even the parent `google` pkg is absent
            protobuf_missing = importlib.util.find_spec("google.protobuf") is None
        except ModuleNotFoundError:
            protobuf_missing = True
        environmental = (
            "STREAMING_PYTHON_RUNNER_INITIALIZATION" in msg
            or "google.protobuf" in msg
            or ("driver worker exited unexpectedly" in msg and protobuf_missing)
        )
        assert environmental, (
            "chained transformWithState failed for a NON-environmental "
            f"reason: {msg[:2000]}"
        )
        pytest.xfail(
            "plan-level chaining accepted (query started); execution blocked "
            "in-box: transformWithState's state-server protocol needs the "
            "google.protobuf runtime, which is not installed and not fetchable"
        )
    finally:
        if query.isActive:
            query.stop()

    # Environment has protobuf: assert full deterministic-dedup parity.
    got = spark.table("tws_probe_sink").orderBy("ws", "event_type").toPandas()
    ev = (
        _convert_ts(spark.read.parquet(os.path.join(SF, "events.parquet")))
        .filter(STREAM_DOMAIN)
        .dropDuplicates(["event_id"])
    )
    want = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("sv"))
        .select(F.col("w.start").alias("ws"), "event_type", "n", "sv")
        .orderBy("ws", "event_type")
        .toPandas()
    )
    assert len(got) == len(want) > 0
    merged = got.merge(
        want, on=["ws", "event_type"], how="outer", suffixes=("_s", "_b")
    )
    bad = merged[
        (merged["n_s"] != merged["n_b"])
        | ((merged["sv_s"] - merged["sv_b"]).abs() > 1e-9)
    ]
    assert bad.empty, bad.head(20)
