"""Registry of persisted operator intermediates, so catalog sweeps stay
memory-flat.

Operator builders persist intermediates the RETURNED lazy plan still
references (e.g. d04's hashed-shingle table feeds band signatures, the
candidate join, AND the Jaccard verify), so they cannot unpersist before
the caller runs its action. Instead, every ``persist()`` in an operator is
wrapped in :func:`track`, and :func:`release_caches` unpersists everything
recorded. It is called

* by the catalog boundary before building each entry (caches of the
  PREVIOUS, already-collected entry — this covers any external harness
  that sweeps the catalog, including the grading driver),
* by the export engine after each dump, and
* by bench/selfcheck at the end of their sweeps,

keeping a ~100-query session's executor memory flat instead of accumulating
cached partitions per query.

Caveat: tracked DataFrames include ``localCheckpoint`` results (d09's final
label table), whose lineage is truncated — after release they can be
neither read nor recomputed. The contract is therefore: a catalog entry's
returned DataFrame is valid until the NEXT entry is built, which is how
every sequential sweep (driver gate, bench, selfcheck, export engine)
consumes them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_LIVE: list = []


def track(obj):
    """Record a persisted DataFrame (or TrackedCheckpoint) for later
    release; returns it."""
    _LIVE.append(obj)
    return obj


def release_caches() -> None:
    """Unpersist every tracked intermediate (idempotent, never raises —
    a dead SparkSession just means there is nothing left to free)."""
    while _LIVE:
        obj = _LIVE.pop()
        try:
            obj.unpersist()
        except Exception:
            pass


def _persistent_ids(sc) -> set[int]:
    return {int(k) for k in sc._jsc.getPersistentRDDs().keySet().toArray()}


class TrackedCheckpoint:
    """Handle to the persistent RDD(s) a ``localCheckpoint`` created.

    ``DataFrame.unpersist()`` only uncaches through the CacheManager; a
    local checkpoint's blocks live as an RDD-level persist that stays in
    the context's persistentRdds map until JVM GC. This handle records the
    RDD ids the checkpoint added and frees them through the map — after
    ``unpersist()`` the checkpointed DataFrame is gone for good (truncated
    lineage ⇒ not recomputable), which is exactly the point."""

    def __init__(self, sc, rdd_ids: set[int]):
        self._sc = sc
        self._ids = rdd_ids

    def unpersist(self) -> None:
        m = self._sc._jsc.getPersistentRDDs()
        for i in self._ids:
            rdd = m.get(i)
            if rdd is not None:
                rdd.unpersist()
        self._ids = set()


def local_checkpoint(df: DataFrame) -> tuple[DataFrame, TrackedCheckpoint]:
    """``df.localCheckpoint()`` plus a release handle for its blocks.

    The id-diff attributes new persistent RDDs to this checkpoint; under
    concurrent dump threads an id could be misattributed, costing at worst
    a recompute of another dump's cache — never a correctness issue."""
    sc = df.sparkSession.sparkContext
    before = _persistent_ids(sc)
    out = df.localCheckpoint()
    return out, TrackedCheckpoint(sc, _persistent_ids(sc) - before)
