"""Executed-plan pins for the round-6 fifth wave (d24, t23, c19, s19,
e33, m16) — each docstring's scale claim (digest-only exchanges,
shuffle-free projections, broadcast discipline, WindowGroupLimit top-K)
asserted on the physical plan so a refactor that silently degrades it
fails CI."""

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


def test_d24_exchanges_carry_digests_not_text(spark):
    from floorist_spark.operators.dedup import d24_exact_substring_spans

    df = d24_exact_substring_spans(spark, SF_SMOKE)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    # every hash exchange after the anchor explode keys on the md5 digest
    # or doc_id — never on gram/token text (grep the partitioning
    # expressions for the raw text column)
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "text#" not in line and "nrm#" not in line, line
    # the dup-digest test is min/max, not count-distinct: no expand node
    assert "Expand" not in plan


def test_t23_is_a_pure_projection(spark):
    from floorist_spark.operators.text import t23_encoding_anomalies

    plan = _plan(t23_encoding_anomalies(spark, SF_SMOKE))
    # one per-row map: no hash exchange, no join, no explode, no window
    assert plan.count("Exchange hashpartitioning") == 0
    assert "Join" not in plan
    assert "Generate" not in plan
    assert "Window" not in plan


def test_c19_train_side_reduced_by_broadcast(spark):
    from floorist_spark.operators.curation import c19_contamination_report

    plan = _plan(c19_contamination_report(spark, SF_SMOKE))
    # both the eval n-gram set and the hit set ride broadcasts (never a
    # sort-merge join); the only ng-keyed exchanges are the two distincts
    # on EVAL-bounded sides. Train-side text/token arrays never shuffle.
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "text#" not in line and "toks#" not in line, line


def test_s19_single_partial_aggregate_no_join(spark):
    from floorist_spark.operators.similarity import s19_tombstone_compaction

    plan = _plan(s19_tombstone_compaction(spark, SF_SMOKE))
    # one map-side-combinable aggregate to <=2^8 cells; no join anywhere
    assert "Join" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("Exchange hashpartitioning") <= 1
    assert "partial" in plan  # partial_count/partial_sum before the exchange


def test_e33_topk_is_window_group_limit(spark):
    from floorist_spark.operators.events_analytics import e33_outage_gaps

    plan = _plan(e33_outage_gaps(spark, SF_SMOKE))
    # the rank<=K filter compiles to WindowGroupLimit: no partition ever
    # materializes its full gap list
    assert "WindowGroupLimit" in plan
    assert "Join" not in plan
    assert "CartesianProduct" not in plan


def test_m16_median_join_broadcasts_and_no_payload_shuffle(spark):
    from floorist_spark.operators.multimodal import m16_payload_size_census

    plan = _plan(m16_payload_size_census(spark, SF_SMOKE))
    # the per-source median side is bounded -> broadcast; exchanges carry
    # (n_bytes, dg) — the binary payload column never shuffles
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "payload#" not in line, line


def test_c20_no_corpus_wide_single_partition_window(spark):
    from floorist_spark.operators.curation import c20_shard_manifest

    plan = _plan(c20_shard_manifest(spark, SF_SMOKE))
    # the two-level prefix sum: the only SinglePartition exchanges are
    # the 1-row bucket-width aggregate (evaluated once per consumer
    # branch, uncached by choice — a 1-row agg is cheaper than a
    # corpus-sized cache) and the ~sqrt(N)-row BUCKET-TOTAL window —
    # the corpus-sized running sum runs windowed PER BUCKET
    assert plan.count("Exchange SinglePartition") <= 3
    assert "BroadcastHashJoin" in plan  # offsets join back
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_e34_two_bounded_aggregates_no_join(spark):
    from floorist_spark.operators.events_analytics import e34_conversion_lag

    plan = _plan(e34_conversion_lag(spark, SF_SMOKE))
    # user fold + bucket histogram; share/cum windows run on <=49 rows
    assert "Join" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("Exchange hashpartitioning") <= 2
    assert "partial" in plan


def test_s20_single_partial_aggregate_no_join(spark):
    from floorist_spark.operators.similarity import s20_cell_rebalance

    plan = _plan(s20_cell_rebalance(spark, SF_SMOKE))
    assert "Join" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("Exchange hashpartitioning") <= 1
    assert "partial" in plan


def test_t24_no_text_shuffle_and_broadcast_totals(spark):
    from floorist_spark.operators.text import t24_source_divergence

    plan = _plan(t24_source_divergence(spark, SF_SMOKE))
    # source totals and the grand total ride broadcasts; exchanges carry
    # dictionary rows (source, tok, counts) — never document text
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "text#" not in line, line


def test_d25_candidates_stay_bucket_joined(spark):
    from floorist_spark.operators.dedup import d25_lsh_recall_audit

    plan = _plan(d25_lsh_recall_audit(spark, SF_SMOKE))
    # the stratum all-pairs is by-design bounded-quadratic; the CANDIDATE
    # side must remain an equi-join on (band, sig) — no text or shingle
    # array ever shuffles
    assert "Join [band" in plan or "band#" in plan
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "text#" not in line and "nrm#" not in line, line


def test_m17_digest_only_exchanges_single_scan(spark):
    from floorist_spark.operators.multimodal import m17_block_size_sweep

    plan = _plan(m17_block_size_sweep(spark, SF_SMOKE))
    # width fan-out is in-plan (one scan); exchanges carry
    # (width, digest, bytes) — never hex/payload text
    assert "Join" not in plan
    assert "CartesianProduct" not in plan
    assert "partial" in plan
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "hx#" not in line and "payload#" not in line, line
