"""Event analytics over the ``events`` table — tumbling, sliding, and
session windows, plus a Structured Streaming variant of the tumbling
aggregation.

New surface beyond the reference (SURVEY §7.2.7; the reference is strictly
batch — `clowdapp.yaml:19-22` is a cron job). Batch ``window()`` /
``session_window()`` carry the semantics; the streaming variant runs the
same logical plan through ``readStream`` with an availableNow trigger to
prove the operators are streaming-ready.

Determinism: event-value sums use exact DECIMAL accumulation rendered to
DOUBLE (same technique as the relational catalog) so parallel Spark sums
are bit-identical to DuckDB's sequential ones. Window boundaries are pure
integer epoch arithmetic.

Scale (100 TB of events):

* tumbling/sliding aggregations shuffle only (window, partial-agg) pairs —
  map-side combine first; sliding duplicates each event into
  size/slide = 4 windows before the partial agg (inherent to the op);
* session windows shuffle once on user_id (Spark's session_window merge is
  a per-key sort + merge); skewed users are split by AQE;
* in streaming mode the same plans run incrementally with watermark-bounded
  state instead of a full shuffle — the state store holds only open
  windows.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from floorist_spark.session import load_table

#: exact-accumulation cast for event values (values < 1e3, 6dp is lossless
#: for the 2dp synthetic data; sum of 10k values fits DECIMAL(18,6))
_VAL_S = "CAST(value AS DECIMAL(18,6))"
_SUM_VAL = f"CAST(SUM({_VAL_S}) AS DOUBLE) AS total_value"

SESSION_GAP_MIN = 30


def _convert_ts(df: DataFrame) -> DataFrame:
    """Nanos-as-long → microsecond timestamp for the streaming reader (the
    batch path gets this from ``session.load_table``)."""
    if isinstance(df.schema["ts"].dataType, T.LongType):
        df = df.withColumn("ts", F.expr("timestamp_micros(CAST(ts DIV 1000 AS BIGINT))"))
    return df


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events scan — nanos-timestamp handling lives in ``load_table``."""
    return load_table(spark, sf_dir, "events")


# ---------------------------------------------------------------------------
# e01 — tumbling window (1 hour)
# ---------------------------------------------------------------------------

def e01_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly tumbling counts + exact value sums per event type."""
    ev = _load_events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.expr(_SUM_VAL))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
        .orderBy("window_start", "event_type")
    )


E01_SQL = f"""
SELECT date_trunc('hour', ts) AS window_start, event_type,
       count(*) AS n_events, {_SUM_VAL}
FROM events GROUP BY 1, 2 ORDER BY window_start, event_type
"""


# ---------------------------------------------------------------------------
# e02 — sliding window (1 hour, slide 15 min)
# ---------------------------------------------------------------------------

def e02_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 15 minutes: each event lands in
    size/slide = 4 windows (Spark assigns windows whose epoch-aligned
    starts are multiples of the slide)."""
    ev = _load_events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"), F.expr(_SUM_VAL))
        .select(F.col("w.start").alias("window_start"), "n_events", "total_value")
        .orderBy("window_start")
    )


# DuckDB twin: event at t belongs to the 4 windows starting at
# floor(epoch/900)*900 - k*900 for k in 0..3 (all contain t since
# (epoch mod 900) + k*900 < 3600).
E02_SQL = f"""
WITH expanded AS (
  SELECT make_timestamp(CAST((floor(epoch(ts) / 900) * 900 - k * 900) * 1000000 AS BIGINT))
           AS window_start,
         value
  FROM events, (SELECT unnest(range(0, 4)) AS k)
)
SELECT window_start, count(*) AS n_events, {_SUM_VAL}
FROM expanded GROUP BY window_start ORDER BY window_start
"""


# ---------------------------------------------------------------------------
# e03 — session windows (30-minute gap) per user
# ---------------------------------------------------------------------------

def e03_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user sessions: events closer than 30 minutes merge; the session
    extends to last-event + gap (Spark ``session_window`` semantics)."""
    ev = _load_events(spark, sf_dir)
    return (
        ev.groupBy("user_id", F.session_window("ts", f"{SESSION_GAP_MIN} minutes").alias("w"))
        .agg(F.count("*").alias("n_events"), F.expr(_SUM_VAL))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
        .orderBy("user_id", "session_start")
    )


# gaps-and-islands twin: a new session starts when the gap since the
# previous event is >= 30 min (Spark windows are end-exclusive: an event
# exactly at last+gap does NOT merge); session_end = last event + gap.
E03_SQL = f"""
WITH flagged AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   >= INTERVAL {SESSION_GAP_MIN} MINUTE
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
), numbered AS (
  SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
)
SELECT user_id, min(ts) AS session_start,
       max(ts) + INTERVAL {SESSION_GAP_MIN} MINUTE AS session_end,
       count(*) AS n_events, {_SUM_VAL}
FROM numbered GROUP BY user_id, session_id
ORDER BY user_id, session_start
"""


# ---------------------------------------------------------------------------
# e04 — Structured Streaming tumbling (availableNow)
# ---------------------------------------------------------------------------

def e04_streaming_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The e01 aggregation executed as a STREAM: ``readStream`` over the
    events parquet, availableNow trigger (process-all-then-stop), complete
    output mode into an in-memory sink. Same logical plan, incremental
    execution — shares e01's oracle, so the batch/stream parity is
    hash-checked by the driver.

    On a real cluster this runs continuously with
    ``withWatermark("ts", ...)`` + append mode and checkpointing; the
    complete-mode memory sink here keeps the demo hermetic."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    src = os.path.join(sf_dir, "events.parquet")
    raw_schema = spark.read.parquet(src).schema
    # Streaming file source lists a DIRECTORY; the testdata table is a single
    # file, so expose it through a symlink dir (what a real deployment's
    # landing prefix is anyway).
    stream_dir = os.path.join(
        tempfile.gettempdir(), f"floorist_stream_{os.path.basename(sf_dir)}"
    )
    os.makedirs(stream_dir, exist_ok=True)
    link = os.path.join(stream_dir, "events.parquet")
    if not os.path.exists(link):
        os.symlink(src, link)
    stream = _convert_ts(spark.readStream.schema(raw_schema).parquet(stream_dir))
    agg = (
        stream.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.expr(_SUM_VAL))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
    query = (
        agg.writeStream.format("memory")
        .queryName("e04_stream_sink")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.table("e04_stream_sink").orderBy("window_start", "event_type")


QUERIES = {
    "e01_tumbling_hourly": e01_tumbling_hourly,
    "e02_sliding_counts": e02_sliding_counts,
    "e03_session_windows": e03_session_windows,
    "e04_streaming_tumbling": e04_streaming_tumbling,
}

ORACLES = {
    "e01_tumbling_hourly": E01_SQL,
    "e02_sliding_counts": E02_SQL,
    "e03_session_windows": E03_SQL,
    "e04_streaming_tumbling": E01_SQL,  # stream/batch parity: same oracle
}
