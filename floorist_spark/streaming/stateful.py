"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference is strictly batch (a cron job — `clowdapp.yaml:19-22`); this
module is the streaming extension a continuous training-data pipeline
needs: operators whose state Spark's built-in streaming aggregations can't
express. The pattern: ``readStream`` → ``groupBy(key)`` →
``applyInPandasWithState(fn, output_schema, state_schema, mode, timeout)``
where ``fn`` receives Arrow-batched pandas frames per key plus a
``GroupState`` handle.

d08 — streaming exact dedup (first-seen-wins): emit a digest's row the
first time it appears across the whole stream; thereafter suppress. This
is THE streaming primitive for ingest-time dedup of a document firehose.
State per distinct digest is one boolean — at scale the state store is
RocksDB-backed and the key space is bounded with a TTL timeout
(``GroupStateTimeout.ProcessingTimeTimeout`` + ``state.setTimeoutDuration``)
so abandoned digests age out; the hermetic demo uses NoTimeout.

Determinism note: with an ``availableNow`` trigger over one input file the
stream runs as a single micro-batch, so first-seen == min(doc_id) per
digest and the result is bit-identical to batch exact dedup — giving this
stateful operator a full DuckDB hash oracle, not just a rows-only check.
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Iterator
from typing import TYPE_CHECKING, Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StringType, StructField, StructType

from floorist_spark.session import load_table

if TYPE_CHECKING:
    import pandas as pd

_OUT_SCHEMA = StructType(
    [
        StructField("text_md5", StringType()),
        StructField("keep_doc_id", LongType()),
    ]
)
_STATE_SCHEMA = StructType([StructField("seen", LongType())])


def _stream_dir_for(sf_dir: str, table: str) -> str:
    """Streaming file source lists a directory; expose the single-file
    testdata table through a symlink dir (same trick as events e04).

    The dir name embeds a hash of the ABSOLUTE source path — two datasets
    with the same basename in different parents (/a/sf0.01 vs /b/sf0.01)
    must not share a link — and a link that no longer resolves to the
    expected source (stale tempdir from an earlier run) is re-pointed."""
    import hashlib

    src = os.path.realpath(os.path.join(sf_dir, f"{table}.parquet"))
    tag = hashlib.md5(src.encode("utf-8")).hexdigest()[:12]
    d = os.path.join(
        tempfile.gettempdir(),
        f"floorist_stream_{table}_{os.path.basename(sf_dir)}_{tag}",
    )
    os.makedirs(d, exist_ok=True)
    link = os.path.join(d, f"{table}.parquet")
    if os.path.islink(link) and os.path.realpath(link) != src:
        os.remove(link)
    if not os.path.exists(link):
        os.symlink(src, link)
    return d


def _first_seen(
    key: tuple[Any, ...],
    pdfs: Iterator["pd.DataFrame"],
    state: GroupState,
) -> Iterator["pd.DataFrame"]:
    """Per-digest state function: emit min(doc_id) on first sight, suppress
    forever after. Runs once per key per micro-batch with all of that
    key's rows Arrow-batched."""
    import pandas as pd

    min_id = None
    for pdf in pdfs:
        m = int(pdf["doc_id"].min())
        min_id = m if min_id is None else min(min_id, m)
    if state.exists:
        return
    state.update((1,))
    yield pd.DataFrame({"text_md5": [key[0]], "keep_doc_id": [min_id]})


def d08_streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming first-seen dedup over the documents stream. One shuffle on
    the digest (the stateful operator's required key partitioning); state
    store holds one entry per distinct digest."""
    batch_schema = load_table(spark, sf_dir, "documents").schema
    stream = spark.readStream.schema(batch_schema).parquet(
        _stream_dir_for(sf_dir, "documents")
    )
    deduped = (
        stream.select(
            F.md5(F.col("text").cast("binary")).alias("text_md5"), "doc_id"
        )
        .groupBy("text_md5")
        .applyInPandasWithState(
            _first_seen,
            _OUT_SCHEMA,
            _STATE_SCHEMA,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )
    query = (
        deduped.writeStream.format("memory")
        .queryName("d08_stream_sink")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.table("d08_stream_sink").orderBy("keep_doc_id")


D08_SQL = """
SELECT md5(text) AS text_md5, min(doc_id) AS keep_doc_id
FROM documents GROUP BY md5(text) ORDER BY keep_doc_id
"""

QUERIES = {"d08_streaming_dedup": d08_streaming_dedup}
ORACLES = {"d08_streaming_dedup": D08_SQL}
