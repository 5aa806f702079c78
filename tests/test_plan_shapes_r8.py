"""Executed-plan pins for the round-8 work: the duplicate-id hardening
must keep the d15/m12 digest-only + map-side-combine shuffle discipline
(the extra DISTINCT spreads on the full (doc_id, idx, d) tuple — skew-
safe — and must NOT plan as a repartition-by-d hotspot), c20's prefix
sum must stay two-level (no corpus-wide single-partition window), and
the round-8 births must hold their docstrings' scale claims."""

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


def test_d15_distinct_is_partial_aggregated_and_digest_only(spark):
    from floorist_spark.operators.dedup import d15_passage_dedup

    plan = _plan(d15_passage_dedup(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    # the dup-id DISTINCT: a partial HashAggregate BEFORE its exchange
    # (duplicates collapse map-side; a hot passage digest still spreads
    # across partitions because the exchange keys on the FULL tuple)
    assert "HashAggregate(keys=[doc_id" in plan
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "text#" not in line and "toks#" not in line, line


def test_m12_distinct_keeps_hex_out_of_exchanges(spark):
    from floorist_spark.operators.multimodal import m12_block_dedup_census

    plan = _plan(m12_block_dedup_census(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    # exchanges carry (digest, doc_id, idx) — never the hex payload blob
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "hx#" not in line and "payload#" not in line, line


def test_c20_preagg_keeps_two_level_prefix(spark):
    from floorist_spark.operators.curation import c20_shard_manifest

    plan = _plan(c20_shard_manifest(spark, SF_SMOKE))
    # the per-doc_id pre-aggregation must not collapse the two-level
    # prefix sum back into one corpus-wide window: exactly two Window
    # nodes, and the DOC-level one stays partitioned by bkt (the
    # unpartitioned one sees only the ~sqrt(N) bucket totals).
    # SinglePartition exchanges: one under the bucket window plus two
    # 1-row width/offset aggregates — never a doc-level sort.
    import re

    windows = [ln for ln in plan.splitlines() if "+- Window " in ln]
    assert len(windows) == 2, windows
    # the doc-level window: partition list [bkt#..], sort list [doc_id#..]
    doc_level = [
        ln for ln in windows if re.search(r"\], \[bkt#\d+L\], \[doc_id#", ln)
    ]
    assert len(doc_level) == 1, windows
    # the other window (bucket running sum) must NOT sort by doc_id —
    # it sees only the ~sqrt(N) bucket totals
    other = [ln for ln in windows if ln not in doc_level]
    assert "doc_id#" not in other[0], other
    assert plan.count("Exchange SinglePartition") <= 3


def test_m22_classifier_is_scan_side_no_python(spark):
    from floorist_spark.operators.multimodal import m22_magic_byte_census

    plan = _plan(m22_magic_byte_census(spark, SF_SMOKE))
    # constant CASE chain in the projection: no Python/Arrow eval, no
    # dictionary join for the signature table, map-side-combinable rollup
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "partial" in plan
    # the only join is the broadcast of the K-row per-source totals
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_s24_no_corpus_sized_join_inputs(spark):
    from floorist_spark.operators.similarity import s24_centroid_separation

    plan = _plan(s24_centroid_separation(spark, SF_SMOKE))
    # the K x K centroid matrix rides broadcasts; the corpus appears only
    # in the s03 assignment scan feeding the K-row cell-size aggregate
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastExchange") >= 2  # centroid matrix + median
    # per-cell sizes are partial-aggregated before their exchange
    assert "partial_count" in plan
