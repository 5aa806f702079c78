"""Canonical-identity resolution for duplicated primary keys.

The shipped testdata has unique ``doc_id`` / ``event_id``, but a 100 TB
ingest does not: at-least-once delivery and shard re-ingest duplicate
identity keys routinely, and the round-9 degenerate sweep showed the
document/event-keyed operators (the MinHash/SimHash chain, sessionizers,
mixtures) silently disagreeing with their oracles on such corpora — each
side had "key is unique" baked in somewhere different.

The contract these helpers implement: **identity-keyed operators process
each identity exactly once, represented by its lexicographically least
payload** (deterministic across engines, runs, and cluster sizes —
unlike ``dropDuplicates``, which keeps an arbitrary row). Operators
whose JOB is duplicate accounting (d01/d02/d15c exact-dup censuses, m12
CAS census) keep reading raw rows — canonicalizing their input would
delete the duplicates they exist to count.

Both sides express the same plan: a row_number window per identity key
ordered by the full payload, keeping rank 1. NULLS FIRST is pinned
explicitly because the engines' defaults differ (Spark ASC is
nulls-first, DuckDB ASC is nulls-last). On unique-key corpora this is a
value-level no-op; the Spark aggregate shuffles on the same key most
downstream aggregates use, so the exchange is shared or reused.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: identity key + payload ordering per canonicalizable table. embeddings
#: is deliberately absent: the similarity family treats vec_id as a plain
#: attribute, never as an identity to resolve — both engines read raw
#: rows, and the degenerate `random` profile (conflicting-payload vec_id
#: duplicates) pins that agreement.
_KEYS = {
    "documents": ("doc_id", ("text", "lang", "source", "n_chars")),
    "events": ("event_id", ("ts", "user_id", "event_type", "value", "props")),
}


def canonical(df: DataFrame, table: str) -> DataFrame:
    """One representative row per identity key (least payload).

    Spark side uses ``min(struct(payload...))`` — lexicographic struct
    ordering (field by field, nulls smallest) matches the oracle's
    ``ORDER BY ... NULLS FIRST`` row_number pick exactly, and unlike a
    window it is MAP-SIDE COMBINABLE: each partition pre-reduces to one
    candidate row per key, so the exchange carries at most one row per
    (key, partition) instead of sorting every duplicate — the shape that
    survives a 100x re-ingest storm."""
    key, payload = _KEYS[table]
    # unit-test corpora may omit metadata columns (lang/source/...); the
    # pick stays deterministic over whatever payload exists. Production
    # corpora and every oracle-gated run carry the full schema, where
    # this matches the oracle fragment's full ORDER BY exactly.
    present = tuple(c for c in payload if c in df.columns)
    return (
        df.groupBy(key)
        .agg(F.min(F.struct(*present)).alias("_p"))
        .select(key, *[F.col(f"_p.{c}").alias(c) for c in present])
    )


def canonical_docs(spark, sf_dir: str) -> DataFrame:
    """Session-memoized canonical documents table: ONE identity-resolution
    pass per dataset dir, shared by every doc-canonical consumer (the
    dedup chain root, d05/d10, t12/t22, c04, the per-asset m-family) —
    re-running the full-text min-struct aggregate per entry showed up as
    +1-5 s per consumer in the round-9 bench. The input is repartitioned
    to session parallelism first so the map-side partial agg is not
    single-threaded on a one-split scan. Same eviction discipline as the
    shingle memo: one dataset dir live at a time."""
    from floorist_spark.operators._cache import memo
    from floorist_spark.session import load_table

    def build() -> DataFrame:
        df = load_table(spark, sf_dir, "documents").repartition(
            spark.sparkContext.defaultParallelism
        )
        return canonical(df, "documents")

    return memo(spark, "canon_documents", sf_dir, build)


def canonical_events(spark, sf_dir: str) -> DataFrame:
    """Session-memoized canonical events table (see canonical_docs) —
    shared by the identity-keyed batch analytics e17/e19/e37."""
    from floorist_spark.operators._cache import memo
    from floorist_spark.session import load_table

    def build() -> DataFrame:
        df = load_table(spark, sf_dir, "events").repartition(
            spark.sparkContext.defaultParallelism
        )
        return canonical(df, "events")

    return memo(spark, "canon_events", sf_dir, build)


def _canon_subq(table: str) -> str:
    key, payload = _KEYS[table]
    order = ", ".join(f"{c} ASC NULLS FIRST" for c in payload)
    cols = ", ".join((key, *payload))
    return (
        f"(SELECT {cols} FROM (SELECT *, row_number() OVER "
        f"(PARTITION BY {key} ORDER BY {order}) AS _rn FROM {table}) "
        f"WHERE _rn = 1)"
    )


#: DuckDB inline-subquery twins — splice as ``FROM {CANON_DOCS_D} documents``
CANON_DOCS_D = _canon_subq("documents")
CANON_EVENTS_D = _canon_subq("events")

#: Shadowing CTE for STREAMING oracles: the stream source applies the
#: epoch gate (Spark clamps watermarks at 0 — see
#: events_analytics.STREAM_DOMAIN) THEN exactly-once ingest dedup on
#: event_id (at-least-once redelivery carries the identical record, so
#: the canonical least-payload pick equals any copy; Spark side is
#: ``dropDuplicates("event_id")``). Order matters and matches the Spark
#: plan: a duplicate id with one pre-epoch copy keeps its post-epoch
#: copy. main.-qualified so the CTE may shadow the registered view.
STREAM_EVENTS_CTE = (
    "events AS (SELECT event_id, ts, user_id, event_type, value, props "
    "FROM (SELECT *, row_number() OVER (PARTITION BY event_id ORDER BY "
    "ts ASC NULLS FIRST, user_id ASC NULLS FIRST, event_type ASC NULLS "
    "FIRST, value ASC NULLS FIRST, props ASC NULLS FIRST) AS _rn "
    "FROM main.events WHERE ts >= TIMESTAMP '1970-01-01 00:00:00') "
    "WHERE _rn = 1)"
)
