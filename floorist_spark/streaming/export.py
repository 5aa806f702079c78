"""Incremental export: the streaming evolution of the batch dump (F5).

The reference re-dumps the full query result on every cron run
(`/root/reference/src/floorist/floorist.py:279-292`). With a file-based
landing zone, Structured Streaming turns the same export into an
INCREMENTAL job: ``readStream`` over the source prefix + a checkpointed
``writeStream`` parquet sink means each run processes only files that
arrived since the last run — no re-read, no duplicate rows, exactly-once
per input file. The ``availableNow`` trigger keeps the cron cadence
(process everything new, then exit 0).

Scale notes: the sink writes the same gzip parquet as the batch path;
partitioning of output files follows the stream's task layout (scale
mode); the checkpoint directory holds only file-listing state — tiny and
S3-safe."""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.types import StructType


def incremental_dump(
    spark: SparkSession,
    source_dir: str,
    schema: StructType,
    target: str,
    checkpoint: str,
) -> int:
    """Process every source file not yet recorded in ``checkpoint`` and
    append its rows to ``target`` as gzip parquet. Returns the number of
    micro-batches executed (0 = nothing new)."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    query = (
        stream.writeStream.format("parquet")
        .option("path", target)
        .option("checkpointLocation", checkpoint)
        .option("compression", "gzip")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return len([p for p in query.recentProgress if p["numInputRows"] > 0])
