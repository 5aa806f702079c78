"""Executed-plan pins for the round-6 second and third waves (e31, t20,
t21, c17, s17, m13, e32, t22, c18, s18, m14) — each docstring's scale
claim (broadcast side, single corpus shuffle, shuffle-free map pass,
distributed top-K) asserted on the physical plan so a refactor that
silently degrades it fails CI."""

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


def test_e31_cell_grid_bounded_exchanges(spark):
    from floorist_spark.operators.events_analytics import (
        e31_seasonality_profile,
    )

    plan = _plan(e31_seasonality_profile(spark, SF_SMOKE))
    # one corpus shuffle to the 168-cell grid; everything after runs on
    # cell-bounded relations — no join in the whole plan
    assert "Join" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("Exchange hashpartitioning") <= 3


def test_t20_readability_is_shuffle_free(spark):
    from floorist_spark.operators.text import t20_readability

    plan = _plan(t20_readability(spark, SF_SMOKE))
    # pure per-row map: no hash exchange, no join, no explode — the
    # syllable scan stays inside the higher-order transform
    assert plan.count("Exchange hashpartitioning") == 0
    assert "Join" not in plan
    assert "Generate" not in plan


def test_t21_topk_is_take_ordered_not_global_rank(spark):
    from floorist_spark.operators.text import t21_vocab_coverage

    plan = _plan(t21_vocab_coverage(spark, SF_SMOKE))
    # the K most frequent types come from a distributed TakeOrdered —
    # never a corpus-wide rank window
    assert "TakeOrderedAndProject" in plan
    # the per-type counts are persisted: all three consumers (total,
    # n_types, top-K) read the cache, so the token explode/shuffle runs
    # once regardless of plan fan-out (the printed cached lineage still
    # SHOWS its exchange, but it executes only on the first materialize)
    assert plan.count("InMemoryTableScan") >= 3
    assert "CartesianProduct" not in plan


def test_c17_single_source_shuffle_broadcast_boundary(spark):
    from floorist_spark.operators.curation import c17_budget_waterfill

    plan = _plan(c17_budget_waterfill(spark, SF_SMOKE))
    # the per-source aggregate is persisted — all four consumers read
    # the cache, so the corpus scan+tokenize executes once; the budget
    # total and the water-level boundary ride broadcasts
    assert plan.count("InMemoryTableScan") >= 3
    assert "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_s17_query_side_broadcasts(spark):
    from floorist_spark.operators.similarity import s17_hard_negatives

    plan = _plan(s17_hard_negatives(spark, SF_SMOKE))
    # bounded query side broadcast at the bucket join (the 1e4ba04 rule)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_m13_vad_single_canon_shuffle(spark):
    from floorist_spark.operators.multimodal import m13_vad_segments

    plan = _plan(m13_vad_segments(spark, SF_SMOKE))
    # gate + run merge happen inside the Arrow batch pass;
    # identity resolution rides the session-memoized canonical docs table
    assert "InMemoryTableScan" in plan
    assert "partial_min" in plan
    assert "Join" not in plan
    assert "Generate" not in plan


def test_e32_broadcast_maxday_bounded_exchanges(spark):
    from floorist_spark.operators.events_analytics import e32_ewma_trend

    plan = _plan(e32_ewma_trend(spark, SF_SMOKE))
    # the 1-row max-day side broadcasts; daily buckets shuffle once to
    # (type, day) and once more to the per-type aggregate — both bounded
    assert "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("Exchange hashpartitioning") <= 3


def test_t22_rake_topk_take_ordered_no_cartesian(spark):
    from floorist_spark.operators.text import t22_rake_keyphrases

    plan = _plan(t22_rake_keyphrases(spark, SF_SMOKE))
    # the corpus-level top-25 is a TakeOrdered merge, never a global sort
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_c18_single_corpus_shuffle(spark):
    from floorist_spark.operators.curation import c18_oversample_plan

    plan = _plan(c18_oversample_plan(spark, SF_SMOKE))
    # one lang-keyed corpus shuffle; the plan windows run post-aggregation
    # on the language dimension
    assert plan.count("Exchange hashpartitioning(lang") == 1
    assert "Join" not in plan
    assert "CartesianProduct" not in plan


def test_s18_query_side_broadcasts_no_cartesian(spark):
    from floorist_spark.operators.similarity import s18_rrf_fusion

    plan = _plan(s18_rrf_fusion(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_m14_cdc_single_canon_shuffle(spark):
    import re

    from floorist_spark.operators.multimodal import m14_cdc_chunks

    plan = _plan(m14_cdc_chunks(spark, SF_SMOKE))
    # r11: the boundary scan lives in the session-memoized chunk table
    # (shared with m15) — the census is aggregates + an empty-payload
    # left join over it; no exchange carries the raw payload
    assert "InMemoryTableScan" in plan
    assert "Generate" not in plan
    assert "CartesianProduct" not in plan
    for m in re.finditer(r"Exchange hashpartitioning\([^\n]*", plan):
        assert "payload#" not in m.group(0), m.group(0)


def test_d22_exchanges_carry_hashes_not_shingles(spark):
    import re

    from floorist_spark.operators.dedup import d22_boilerplate_census

    plan = _plan(d22_boilerplate_census(spark, SF_SMOKE))
    # every shuffle keys on (source, 8-byte hash) or doc_id — shingle
    # text and the normalized document never reach an exchange
    for m in re.finditer(r"Exchange hashpartitioning\([^\n]*", plan):
        assert "text#" not in m.group(0), m.group(0)
        assert "nrm#" not in m.group(0), m.group(0)
    assert "CartesianProduct" not in plan
    # the source-count side broadcasts back over the shingle aggregate
    assert "BroadcastHashJoin" in plan


def test_d23_iterations_reuse_memoized_pairs(spark):
    from floorist_spark.operators.dedup import d23_dup_graph_pagerank

    plan = _plan(d23_dup_graph_pagerank(spark, SF_SMOKE))
    # the verified-pair chain is served from the session memo — every
    # iteration reads the cache instead of re-running band+Jaccard
    assert "InMemoryTableScan" in plan
    assert "CartesianProduct" not in plan


def test_m15_pairing_keys_on_digest_no_cartesian(spark):
    import re

    from floorist_spark.operators.multimodal import m15_chunk_overlap_pairs

    plan = _plan(m15_chunk_overlap_pairs(spark, SF_SMOKE))
    # pairing is an equi-join on the chunk digest — never all-pairs; no
    # exchange carries the raw payload
    assert "CartesianProduct" not in plan
    for m in re.finditer(r"Exchange hashpartitioning\([^\n]*", plan):
        assert "payload#" not in m.group(0), m.group(0)
    # the chunk-digest table is persisted: owners, totals and both join
    # sides read the cache instead of re-running the numpy pass
    assert plan.count("InMemoryTableScan") >= 3
