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
#: Round-8 rotation (executing the round-7 verdict's tasks 1, 3, 8): the
#: three rows red at every gate since r5 (d15, c20, m12 — judge-root-caused
#: to three uncast-HUGEINT oracle columns, the only three in the catalog,
#: now CAST AS BIGINT with duplicate-doc_id robustness on both engines)
#: re-gate first; the 14 wave-11..13 entries no driver window has ever
#: sampled rotate in (judge-verified HUGEINT-clean, so this completes
#: external validation of all 207 pre-round-8 entries); the round-8 births
#: (d15c corpus-shape probe, m22 magic-byte census, s24 centroid
#: separation, the wave-14 seven: q45 recursive gap-fill, e38 user
#: concentration, t28 token rarity, m23 modality sniff audit, d30
#: source-pair similarity, c24 decon width sweep, s25 quantization width
#: sweep, the wave-15 four: d31 containment audit, s26 quantized
#: recall, c25 quality-threshold sweep, t29 vocab growth curve, and
#: wave-16's e39 watermark-delay sweep, d32 cosine-threshold sweep, and
#: m24 cross-source asset overlap)
#: gate in their birth round per house rule; e26 re-gates
#: because its r7 driver bench number regressed 4x with no code change
#: (validating values while we pin the timing) and it keeps the streaming
#: family represented in the window; the remaining 14 slots re-validate
#: the entries whose last driver green is oldest (d09 + q08-q20, all last
#: green r3 — q21-q34 rotated out to make room for the round-8 births and
#: wait for round 9). OUT: everything gated green r4-r7.
GATE_PRIORITY = [
    # -- the three uncast-HUGEINT reds, re-gated after the BIGINT casts ---
    "d15_passage_dedup",
    "c20_shard_manifest",
    "m12_block_dedup_census",
    # -- round-8 births, gated in their birth round -----------------------
    "d15c_multiplicity_census",
    "m22_magic_byte_census",
    "s24_centroid_separation",
    "q45_recursive_gapfill",
    "e38_user_concentration",
    "t28_token_rarity",
    "m23_label_sniff_consistency",
    "d30_source_pair_similarity",
    "c24_decon_width_sweep",
    "s25_quantization_width_sweep",
    "d31_containment_audit",
    "s26_quantized_recall",
    "c25_quality_threshold_sweep",
    "t29_vocab_growth_curve",
    "e39_watermark_delay_sweep",
    "d32_cosine_threshold_sweep",
    "m24_cross_source_assets",
    # -- the 14 entries no driver window has ever sampled (verdict task 3)
    "q43_semi_join",
    "q44_set_ops_all",
    "d28_candidate_score_histogram",
    "d29_detector_agreement",
    "s22_nprobe_cost_frontier",
    "s23_recall_vs_nprobe",
    "t26_hapax_census",
    "t27_token_class_census",
    "c22_split_leakage_audit",
    "c23_mixture_shift",
    "e36_burst_windows",
    "e37_session_length_histogram",
    "m19_modality_mix_manifest",
    "m20_byte_uniformity_census",
    # -- streaming-family representative + the r7 bench-regression entry --
    "e26_alert_throttle",
    # -- stalest driver greens (last green r3), re-validated --------------
    "d09_dedup_clusters",
    "q08_distinct",
    "q09_in_subquery",
    "q10_quoted_idents",
    "q11_pricing_summary",
    "q12_shipping_priority",
    "q13_local_supplier_volume",
    "q14_forecast_revenue",
    "q15_rollup",
    "q16_cube",
    "q17_window_topk_per_group",
    "q18_window_running",
    "q19_union",
    "q20_intersect",
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
