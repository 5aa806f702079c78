"""Operator-catalog registry — the single source of truth for every
implemented query/operator and its DuckDB oracle.

Used by two consumers:

* ``__spark_entry__`` (the driver contract) exposes these as
  ``queries()`` / ``oracle_sql()``;
* the export engine resolves floorplan rows whose ``query`` is
  ``catalog:<name>`` to the same callables, so any catalog operator can be
  dumped through the partitioned Parquet sink exactly like a SQL query.

The module list is explicit — a broken import in any operator family
fails loudly instead of silently dropping it from the correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from floorist_spark.operators._cache import release_caches

#: prefix marking a floorplan query as a catalog reference
CATALOG_PREFIX = "catalog:"


def modules():
    from floorist_spark.operators import (
        curation,
        dedup,
        events_analytics,
        multimodal,
        relational,
        similarity,
        text,
    )
    from floorist_spark.streaming import stateful

    return [
        relational,
        dedup,
        similarity,
        text,
        curation,
        events_analytics,
        multimodal,
        stateful,
    ]


def _with_cache_release(
    fn: Callable[[SparkSession, str], DataFrame],
) -> Callable[[SparkSession, str], DataFrame]:
    """Release the persisted intermediates of the PREVIOUS catalog entry
    before building this one. Catalog consumers run entries sequentially
    (action included), so at build time of entry N the caches of entry N-1
    are dead weight — this keeps a ~100-query sweep memory-flat even when
    the harness (e.g. the grading driver) never calls release itself."""

    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        release_caches()
        return fn(spark, sf_dir)

    wrapped.__name__ = getattr(fn, "__name__", "catalog_query")
    wrapped.__doc__ = fn.__doc__
    return wrapped


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in modules():
        out.update(getattr(mod, "QUERIES", {}))
    return {name: _with_cache_release(fn) for name, fn in out.items()}


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in modules():
        out.update(getattr(mod, "ORACLES", {}))
    return out


def resolve_catalog_query(
    spark: SparkSession, query: str, data_dir: str
) -> DataFrame | None:
    """If ``query`` is a ``catalog:<name>`` reference, build that operator's
    DataFrame over ``data_dir``; otherwise return None (caller treats the
    string as SQL). Unknown names raise KeyError — the executor's per-dump
    isolation turns that into a failed dump, not a crashed run."""
    q = query.strip()
    if not q.startswith(CATALOG_PREFIX):
        return None
    name = q[len(CATALOG_PREFIX) :].strip()
    fns = all_queries()
    if name not in fns:
        import difflib

        close = difflib.get_close_matches(name, fns, n=3, cutoff=0.5)
        hint = f"; did you mean {', '.join(repr(c) for c in close)}?" if close else ""
        raise KeyError(
            f"unknown catalog query {name!r} (known: {len(fns)} operators{hint})"
        )
    return fns[name](spark, data_dir)
