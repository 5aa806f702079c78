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


#: Entries promoted to the FRONT of the registry. Correctness harnesses
#: that gate a prefix of ``queries()`` (the grading driver samples the
#: first ~50) would, under round-robin alone, only ever see each family's
#: oldest entries — this list rotates the never-yet-externally-gated tail
#: into the window each round. The window holds 50 slots and must keep one
#: representative of EVERY family (q's representative is the round-robin
#: head right after the priority block), so the list is capped at 49
#: (tests/test_llm_operators.py enforces both invariants). Pure ordering —
#: membership and semantics of every entry are unchanged.
#:
#: Round-9 rotation (executing the round-8 verdict's task 2: finish the
#: rotation so no entry's last external green trails the upcoming gate by
#: more than 5 rounds). The window is now MECHANICALLY derived: the 49
#: stalest entries by last driver-green round, computed from the committed
#: CORRECTNESS_r0*.json artifacts strictly before ROTATION_ROUND
#: (tests/test_gate_rotation.py re-derives that ledger and fails if this
#: list is not a stalest-first window, if any family is unrepresented, or
#: if the max-staleness claim is violated). Snapshot at ROTATION_ROUND=9:
#: q07_uuid has never sat in a green window (rows-only by design — it
#: still deserves an external rows gate); q21-q41 were last green r3;
#: the remaining 27 slots take the r4 cohort, tie-broken to keep every
#: family represented (left at r4 for round 10: e06 e07 q05b q06 s03 s04
#: s06 — the staleness bound still holds: 9-4=5). OUT: everything gated
#: green r5-r8, including all 21 round-8 births (gated in their birth
#: round per house rule).
ROTATION_ROUND = 9

GATE_PRIORITY = [
    # -- never externally green (rows-only entry, last sampled never) ----
    "q07_uuid",
    # -- last driver green r3 --------------------------------------------
    "q21_except",
    "q22_topk_global",
    "q23_having",
    "q24_conditional_agg",
    "q25_string_funcs",
    "q26_date_funcs",
    "q27_scalar_subquery",
    "q28_anti_join",
    "q29_left_join",
    "q30_grouping_sets",
    "q31_salted_distinct_agg",
    "q32_percentiles",
    "q33_range_window",
    "q34_exists_correlated",
    "q35_distinct_on",
    "q36_string_agg",
    "q37_pivot",
    "q38_array_agg",
    "q39_lateral",
    "q40_window_medley",
    "q41_unpivot",
    # -- last driver green r4 (27 of 34; family-balanced tie-break) -------
    "c01_hash_split",
    "c03_train_order",
    "c06_mixture_weights",
    "c07_curation_pipeline",
    "d07_embedding_neardup",
    "d08_streaming_dedup",
    "e01_tumbling_hourly",
    "e02_sliding_counts",
    "e03_session_windows",
    "e04_streaming_tumbling",
    "e05_asof_join",
    "e15_custom_sessionizer",
    "m01_binary_ingest",
    "m02_media_catalog",
    "m03_byte_histogram",
    "m04_image_decode",
    "m05_frame_sample",
    "m06_thumbnail",
    "q02_alias",
    "q03_values",
    "q04_series",
    "q05_cross_join",
    "s01_cosine_topk_brute",
    "s02_lsh_bucketed_ann",
    "t02_quality_score",
    "t03_lang_id",
    "t06_regex_tokens",
]


def _interleave(dicts: list[dict]) -> dict:
    """Priority entries first (family-interleaved among themselves), then
    a round-robin merge of the remainder preserving each module's
    internal order.

    Registry order is visible downstream: correctness harnesses that
    sample a prefix of ``queries()`` (the grading driver gates the first
    ~50) would otherwise only ever see the first one or two families.
    Interleaving puts a representative of EVERY family in the first
    len(modules()) entries, so a prefix window exercises the whole
    surface — this is how e06's round-3 breakage slipped past a gate that
    stopped inside the q* block. ``GATE_PRIORITY`` additionally rotates
    the never-yet-gated tail of each family into the window."""
    prio = set(GATE_PRIORITY)
    heads = [{k: v for k, v in d.items() if k in prio} for d in dicts]
    tails = [{k: v for k, v in d.items() if k not in prio} for d in dicts]

    def robin(ds: list[dict]) -> dict:
        iters = [iter(d.items()) for d in ds]
        out: dict = {}
        while iters:
            alive = []
            for it in iters:
                try:
                    k, v = next(it)
                except StopIteration:
                    continue
                out[k] = v
                alive.append(it)
            iters = alive
        return out

    merged = robin(heads)
    merged.update(robin(tails))
    return merged


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out = _interleave([getattr(mod, "QUERIES", {}) for mod in modules()])
    return {name: _with_cache_release(fn) for name, fn in out.items()}


def all_oracles() -> dict[str, str]:
    """Oracle SQL keyed by entry name, in ``all_queries()`` order so any
    prefix-sampling harness sees query/oracle pairs consistently."""
    merged = _interleave([getattr(mod, "ORACLES", {}) for mod in modules()])
    order = _interleave([getattr(mod, "QUERIES", {}) for mod in modules()])
    return {k: merged[k] for k in order if k in merged}


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
