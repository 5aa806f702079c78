"""Executed-plan pins for the round-8 wave-14 operators: each entry's
docstring makes specific scale claims (scan-side classifiers, digest-only
exchanges, broadcast-vs-copartitioned joins, no corpus-sized windows) —
these tests hold the PLAN to those claims so a refactor that silently
regresses the shape fails here, not at 100 TB.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(autouse=True)
def _release(spark):
    yield
    from floorist_spark.operators._cache import release_caches

    release_caches()


def test_q45_recursion_is_calendar_bounded_and_pruned(spark):
    from floorist_spark.operators.relational import q45_recursive_gapfill

    plan = _plan(q45_recursive_gapfill(spark, SF_SMOKE))
    # the spine is a true recursive loop over literals (no orders rescan
    # inside the loop), the monthly rollup partial-aggregates before its
    # exchange and BROADCASTS to the join, and the orders scan is pruned
    # to exactly the two columns the rollup needs
    assert "UnionLoop" in plan
    assert "partial_count" in plan and "partial_sum" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    scans = [ln for ln in plan.splitlines() if "FileScan parquet" in ln]
    assert len(scans) == 1, scans
    assert "o_totalprice" in scans[0] and "o_orderdate" in scans[0]
    assert "o_custkey" not in scans[0] and "o_orderpriority" not in scans[0]


def test_e38_two_level_aggregate_no_window_no_join(spark):
    from floorist_spark.operators.events_analytics import e38_user_concentration

    plan = _plan(e38_user_concentration(spark, SF_SMOKE))
    # max() replaces a top-1 row_number: no Window node anywhere, no join,
    # both rollups map-side combinable
    assert "Window" not in plan
    assert "Join" not in plan
    assert "partial_count" in plan and "partial_max" in plan


def test_t28_exchanges_are_digest_only(spark):
    from floorist_spark.operators.text import t28_token_rarity

    plan = _plan(t28_token_rarity(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    # the corpus-mean 1-row frame rides a broadcast nested loop (a true
    # 1-row cross), never a corpus-sized cartesian
    assert "BroadcastNestedLoopJoin" in plan
    # every hash exchange carries the md5 digest / ids — never raw token
    # or text columns (the d14 digest-only exchange rule)
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "tok#" not in line and "text#" not in line, line


def test_m23_verdict_is_scan_side_no_python(spark):
    from floorist_spark.operators.multimodal import m23_label_sniff_consistency

    plan = _plan(m23_label_sniff_consistency(spark, SF_SMOKE))
    # declared tag + sniff + verdict are all projection CASE arithmetic:
    # no Python eval, no signature-dictionary join; the only join is the
    # broadcast of the 3-row per-modality totals
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    assert "partial_count" in plan


def test_d30_signature_mins_combine_map_side(spark):
    from floorist_spark.operators.dedup import d30_source_pair_similarity

    plan = _plan(d30_source_pair_similarity(spark, SF_SMOKE))
    # the 32 per-source signature mins partial-aggregate before the
    # shuffle (min is associative — that is the whole design), and no
    # plain cartesian appears (the source-pair cross is a broadcast
    # nested loop over the |sources|-row signature table)
    assert "partial_min" in plan
    assert "CartesianProduct" not in plan
    # exchanges carry sources/digests — never text or shingle arrays
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "text#" not in line and "sh#" not in line, line


def test_c24_eval_sets_broadcast_and_semi_join(spark):
    from floorist_spark.operators.curation import c24_decon_width_sweep
    from floorist_spark.operators.curation import C24_WIDTHS

    plan = _plan(c24_decon_width_sweep(spark, SF_SMOKE))
    # per width: the eval n-gram set broadcasts and the train side is a
    # LEFT SEMI probe (first match stops); nothing sort-merge joins
    assert plan.count("LeftSemi") >= len(C24_WIDTHS)
    assert plan.count("BroadcastExchange") >= len(C24_WIDTHS)
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_s25_no_data_shuffle_only_final_aggregates(spark):
    from floorist_spark.operators.similarity import s25_quantization_width_sweep

    plan = _plan(s25_quantization_width_sweep(spark, SF_SMOKE))
    # codes + MSE are per-row projections over the cached base: the ONLY
    # exchanges are the three 1-row final aggregates (SinglePartition),
    # never a hash repartition of vector data
    assert "Exchange hashpartitioning" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "partial_max" in plan


# --- wave 15 ---------------------------------------------------------------


def test_t29_prefix_sum_stays_two_level(spark):
    from floorist_spark.operators.text import t29_vocab_growth_curve

    plan = _plan(t29_vocab_growth_curve(spark, SF_SMOKE))
    # the c20 invariant transplanted: exactly two Window nodes — the
    # intra-bucket running sum partitioned by bkt, and the ~sqrt(N)
    # bucket-total running sum (the only corpus-independent single
    # partition); never one global doc-level sort
    import re

    windows = [ln for ln in plan.splitlines() if "+- Window " in ln]
    assert len(windows) == 2, windows
    doc_level = [
        ln for ln in windows if re.search(r"\], \[bkt#\d+L\], \[doc_id#", ln)
    ]
    assert len(doc_level) == 1, windows
    assert "doc_id#" not in [ln for ln in windows if ln not in doc_level][0]
    # the (digest, position) exchange carries md5 + ints, never tokens
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "tok#" not in line and "text#" not in line, line


def test_s26_query_panel_broadcasts_corpus_streams(spark):
    from floorist_spark.operators.similarity import s26_quantized_recall

    plan = _plan(s26_quantized_recall(spark, SF_SMOKE))
    # per width: Q-row panel broadcast x corpus stream — a nested loop
    # over a broadcast, never a plain cartesian or a corpus shuffle
    # before the candidate set
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def test_c25_single_aggregate_no_rescan(spark):
    from floorist_spark.operators.curation import c25_quality_threshold_sweep

    plan = _plan(c25_quality_threshold_sweep(spark, SF_SMOKE))
    # all thresholds fold into ONE aggregate over ONE scan: a single
    # FileScan, partial aggregation present, no join anywhere
    scans = [ln for ln in plan.splitlines() if "FileScan parquet" in ln]
    assert len(scans) == 1, scans
    assert "partial_count" in plan
    assert "Join" not in plan


def test_d31_rides_the_band_memo_no_new_shape(spark):
    from floorist_spark.operators.dedup import d31_containment_audit

    plan = _plan(d31_containment_audit(spark, SF_SMOKE))
    # same ride as d04/d28: no cartesian, digest/id-only exchanges
    assert "CartesianProduct" not in plan
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "text#" not in line, line
