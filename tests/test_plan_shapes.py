"""Executed-plan regression tests for the round-4 operators — pins the
physical properties the docstrings claim, so a refactor that silently
degrades the plan (extra corpus scan, lost top-k pushdown, lost
broadcast) fails CI instead of only showing up in a bench regression."""

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


def test_s10_knn_graph_partial_topk(spark):
    from floorist_spark.operators.similarity import s10_knn_graph

    plan = _plan(s10_knn_graph(spark, SF_SMOKE))
    # per-node top-k must push below the rank filter as WindowGroupLimit
    # (partial top-k per partition before the final window sort)
    assert "WindowGroupLimit" in plan
    # the self-join keys on the bucket — no cartesian anywhere
    assert "CartesianProduct" not in plan


def test_e14_single_corpus_scan(spark):
    from floorist_spark.operators.events_analytics import e14_hourly_anomaly

    df = e14_hourly_anomaly(spark, SF_SMOKE)
    plan = _plan(df)
    # the hourly rollup feeds both the moments and the scoring join via
    # the persisted cache; both consumers must read InMemoryTableScan
    assert plan.count("InMemoryTableScan") == 2
    # the 1-row moments side broadcasts
    assert "BroadcastExchange" in plan


def test_e13_one_corpus_shuffle(spark):
    from floorist_spark.operators.events_analytics import e13_event_transitions

    plan = _plan(e13_event_transitions(spark, SF_SMOKE))
    # corpus-sized data shuffles exactly once (on user_id for the lead
    # window); the remaining exchanges operate on the tiny (type, next)
    # aggregate. Guard the total so a new corpus-sized exchange can't
    # sneak in unnoticed.
    assert plan.count("Exchange hashpartitioning(user_id") == 1
    assert plan.count("Exchange") <= 5


def test_d14_no_ngram_text_in_exchanges(spark):
    from floorist_spark.operators.dedup import d14_ngram_containment

    plan = _plan(d14_ngram_containment(spark, SF_SMOKE))
    # every exchange must carry digests (h) — the n-gram strings die in
    # the md5 projection before any shuffle
    import re

    for m in re.finditer(r"Exchange hashpartitioning\([^\n]*", plan):
        assert ", g#" not in m.group(0) and "(g#" not in m.group(0), m.group(0)
    assert "CartesianProduct" not in plan


def test_t11_single_shuffle_after_partial_agg(spark):
    from floorist_spark.operators.text import t11_feature_hashing

    plan = _plan(t11_feature_hashing(spark, SF_SMOKE))
    # explode → hash → one (doc_id, dim) aggregate with map-side combine;
    # besides the fan-out repartition and the output sort there is only
    # the aggregate exchange, and HashAggregate appears on both sides
    assert plan.count("Exchange hashpartitioning(doc_id") == 1
    assert plan.count("HashAggregate") >= 2


def test_c08_digest_only_shuffle(spark):
    from floorist_spark.operators.curation import c08_snapshot_diff

    plan = _plan(c08_snapshot_diff(spark, SF_SMOKE))
    # the diff join must shuffle (doc_id, md5) projections — if a plan
    # change starts shuffling document bodies, the exchange input would
    # carry a `text` column
    import re

    for m in re.finditer(r"Exchange hashpartitioning\(doc_id[^\n]*", plan):
        assert "text" not in m.group(0)
    assert "SortMergeJoin" in plan and "FullOuter" in plan


def test_s11_pq_argmin_is_aggregate_not_window(spark):
    from floorist_spark.operators.similarity import s11_pq_quantize

    plan = _plan(s11_pq_quantize(spark, SF_SMOKE))
    # the per-subspace argmin is min(struct(dist,k)) — a map-side
    # combinable aggregate; a Window here would force a full shuffle of
    # the exploded corpus before any reduction
    assert "Window" not in plan
    # the M x K codebook broadcasts; the corpus side never does
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_memoized_pair_chain_reuses_cached_tables(spark):
    """The verified-pairs memo must hand every consumer (d04's ordered
    output, d09's edge list) the SAME persisted table — one near-dup
    pipeline run per dataset — and consumers must read it as an
    InMemoryTableScan rather than re-deriving the shingle+digest
    pipeline."""
    from floorist_spark.operators._cache import release_memos
    from floorist_spark.operators.dedup import (
        _verified_pairs,
        d04_lsh_jaccard_dedup,
    )

    release_memos()
    try:
        p1 = _verified_pairs(spark, SF_SMOKE)
        p2 = _verified_pairs(spark, SF_SMOKE)
        assert p1 is p2  # memo hit, not a rebuild
        # d04's output must read the memoized pairs from cache (the plan
        # string still PRINTS the cached subtree's lineage, so asserting
        # on its contents would be vacuous — the load-bearing node is the
        # InMemoryTableScan at the top)
        plan = _plan(d04_lsh_jaccard_dedup(spark, SF_SMOKE))
        assert "InMemoryTableScan" in plan
    finally:
        release_memos()


def test_scored_pairs_memo_values_and_reuse(spark):
    """The r11 scored-pairs memo: (1) its per-pair set arithmetic must be
    bit-identical to the spelled-out jaccard_spark expression it replaced
    (array_intersect/array_union already dedup, so dropping the
    array_distinct wrappers is a no-op — this pins that premise); (2) the
    sweep-family consumers must read it as an InMemoryTableScan instead of
    re-running the band self-join + per-pair array math."""
    from pyspark.sql import functions as F

    from floorist_spark.functions import textfrag as tf
    from floorist_spark.operators._cache import release_memos
    from floorist_spark.operators.dedup import (
        _cand_pairs,
        _hashed_shingles,
        _scored_pairs,
        d13_minhash_calibration,
        d27_threshold_sweep,
        d28_candidate_score_histogram,
        d31_containment_audit,
    )

    release_memos()
    try:
        scored = _scored_pairs(spark, SF_SMOKE)
        assert scored is _scored_pairs(spark, SF_SMOKE)  # memo hit
        hashed = _hashed_shingles(spark, SF_SMOKE)
        ref = (
            _cand_pairs(spark, SF_SMOKE)
            .join(hashed.alias("da"), F.col("doc_a") == F.col("da.doc_id"))
            .join(hashed.alias("db"), F.col("doc_b") == F.col("db.doc_id"))
            .select(
                "doc_a",
                "doc_b",
                F.expr(tf.jaccard_spark("da.sh", "db.sh")).alias("j_ref"),
                F.expr(
                    "size(array_intersect(array_distinct(da.sh), "
                    "array_distinct(db.sh)))"
                ).alias("i_ref"),
                F.expr("size(array_union(da.sh, db.sh))").alias("u_ref"),
            )
        )
        diff = (
            scored.join(ref, ["doc_a", "doc_b"], "full_outer")
            .filter(
                "i IS DISTINCT FROM i_ref OR u IS DISTINCT FROM u_ref "
                "OR j IS DISTINCT FROM j_ref"
            )
            .count()
        )
        assert diff == 0
        for build in (
            d13_minhash_calibration,
            d27_threshold_sweep,
            d28_candidate_score_histogram,
            d31_containment_audit,
        ):
            assert "InMemoryTableScan" in _plan(build(spark, SF_SMOKE))
    finally:
        release_memos()


def test_d15_digest_only_exchanges(spark):
    from floorist_spark.operators.dedup import d15_passage_dedup

    plan = _plan(d15_passage_dedup(spark, SF_SMOKE))
    # ownership groupBy, survivor join, and per-doc fold all exchange
    # (digest, doc_id, idx) — passage text must die in the md5 projection
    # inside the scan stage (clean_digest is a digest-of-digests for
    # exactly this reason)
    import re

    for m in re.finditer(r"Exchange hashpartitioning[^\n]*", plan):
        assert "toks#" not in m.group(0) and "text#" not in m.group(0), m.group(0)
    assert "CartesianProduct" not in plan


def test_t12_lm_single_corpus_scan(spark):
    from floorist_spark.operators.text import t12_bigram_lm_score

    plan = _plan(t12_bigram_lm_score(spark, SF_SMOKE))
    # the tokenized corpus is persisted: vocab count + both bigram walks
    # (training aggregate, scoring join) must read the cache, never
    # re-scan documents; LM/context/vocab tables all broadcast
    assert plan.count("InMemoryTableScan") >= 3
    assert plan.count("BroadcastExchange") >= 3
    assert "CartesianProduct" not in plan


def test_e19_sessionization_cached_once(spark):
    from floorist_spark.operators.events_analytics import e19_cooccurrence_lift

    plan = _plan(e19_cooccurrence_lift(spark, SF_SMOKE))
    # the (session, type) table is persisted; its four consumers (two
    # pair sides, per-type counts, session total) read InMemoryTableScan
    # instead of replaying the sessionization window
    assert plan.count("InMemoryTableScan") >= 4
    # corpus-sized exchanges: the window's user_id shuffle + the distinct
    # — the pair self-join must NOT add a third corpus repartitioning
    import re

    uniq = set(
        re.findall(
            r"Exchange hashpartitioning\(user_id[^\n]*\[plan_id=(\d+)\]", plan
        )
    )
    assert len(uniq) <= 2, uniq
    assert "CartesianProduct" not in plan


def test_e20_hll_register_bounded_exchange(spark):
    from floorist_spark.operators.events_analytics import e20_hll_distinct

    plan = _plan(e20_hll_distinct(spark, SF_SMOKE))
    # the sketch path must partial-aggregate map-side so the exchange
    # carries at most |types|*64 register rows; the (event_type, reg)
    # grouping shuffles exactly once
    assert plan.count("Exchange hashpartitioning(event_type") >= 1
    # partial + final HashAggregate on both the register and rollup levels
    assert plan.count("HashAggregate") >= 4
    assert "CartesianProduct" not in plan


def test_e21_cms_sketch_broadcasts(spark):
    from floorist_spark.operators.events_analytics import e21_cms_heavy_hitters

    plan = _plan(e21_cms_heavy_hitters(spark, SF_SMOKE))
    # the <=1024-row sketch grid must broadcast to the candidate side
    assert "BroadcastExchange" in plan
    # global top-20 must be TakeOrdered (per-partition partial top-k),
    # never a full global Sort of the estimates
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_t13_gopher_no_shuffle(spark):
    from floorist_spark.operators.text import t13_gopher_rules

    plan = _plan(t13_gopher_rules(spark, SF_SMOKE))
    # a pure per-row filter map: no hash exchange, no join, no aggregate —
    # only the fan-out repartition and the output order's range exchange
    assert "Exchange hashpartitioning" not in plan
    assert "Join" not in plan
    assert "HashAggregate" not in plan


def test_c11_bloom_broadcasts_filter_not_corpus(spark):
    from floorist_spark.operators.curation import c11_bloom_decontaminate

    plan = _plan(c11_bloom_decontaminate(spark, SF_SMOKE))
    # the position table (bounded by BLOOM_M) and the eval n-gram audit
    # side broadcast; the train side must never be the built side
    assert plan.count("BroadcastHashJoin") >= 3
    # the only corpus-sized hash exchange is the per-doc rollup
    assert plan.count("Exchange hashpartitioning(doc_id") == 1
    assert "CartesianProduct" not in plan


def test_c12_chunking_no_shuffle(spark):
    from floorist_spark.operators.curation import c12_passage_chunks

    plan = _plan(c12_passage_chunks(spark, SF_SMOKE))
    # a pure per-row flatMap: posexplode fans out chunks with no hash
    # exchange, join, or aggregate; only the output order's range exchange
    assert "Exchange hashpartitioning" not in plan
    assert "Join" not in plan
    assert "HashAggregate" not in plan
    assert "Generate" in plan  # the chunk fan-out is a Generate, not a join


def test_e22_zorder_broadcast_bounds_single_rollup(spark):
    from floorist_spark.operators.events_analytics import e22_zorder_layout

    plan = _plan(e22_zorder_layout(spark, SF_SMOKE))
    # the 1-row day-span bounds must broadcast to the corpus side
    assert "BroadcastExchange" in plan or "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan
    # the rollup shuffles on file_id only: one expand-phase exchange for
    # the distinct-bucket counts (keys bounded by the 16x16 grid) plus
    # the final per-file aggregate — nothing keyed on raw events
    assert plan.count("Exchange hashpartitioning(file_id") == 2
    assert plan.count("Exchange hashpartitioning") == 2


def test_t14_confusion_cells_bounded_window(spark):
    from floorist_spark.operators.text import t14_langid_confusion

    plan = _plan(t14_langid_confusion(spark, SF_SMOKE))
    # per-doc prediction is shuffle-free; the only exchanges are the cell
    # rollup and the tiny per-gold window over <=|langs|^2 cells
    assert plan.count("Exchange hashpartitioning") <= 2
    assert "Join" not in plan
    assert "CartesianProduct" not in plan


def test_m10_pairs_broadcast_count_no_cartesian(spark):
    from floorist_spark.operators.multimodal import m10_contrastive_pairs

    plan = _plan(m10_contrastive_pairs(spark, SF_SMOKE))
    # the 1-row corpus count must broadcast; negative fan-out is a
    # Generate (arithmetic, not a sampling shuffle); no cross product
    assert "BroadcastExchange" in plan or "BroadcastNestedLoopJoin" in plan
    assert "Generate" in plan
    assert "CartesianProduct" not in plan


def test_t17_fold_is_shuffle_free(spark):
    from floorist_spark.operators.text import t17_token_diversity

    plan = _plan(t17_token_diversity(spark, SF_SMOKE))
    # the diversity fold is per-row: NO hash-partitioned exchange at all —
    # only the ingest fan-out (round-robin) and the output sort's range
    # exchange may appear. A (doc_id, token) groupBy sneaking back in
    # would show up as hashpartitioning.
    assert plan.count("Exchange hashpartitioning") == 0
    assert "Join" not in plan
    # the per-doc histogram must never materialize
    assert "Generate" not in plan  # no explode


def test_s14_exchanges_carry_bucket_counts_only(spark):
    from floorist_spark.operators.similarity import s14_index_health

    plan = _plan(s14_index_health(spark, SF_SMOKE))
    # one partial->final aggregate chain on the bucket key; the embedding
    # array dies in the bucket projection before any exchange
    import re

    for m in re.finditer(r"Exchange hashpartitioning\([^\n]*", plan):
        assert "embedding" not in m.group(0), m.group(0)
    assert plan.count("HashAggregate") >= 2
    assert "Join" not in plan


def test_e25_single_corpus_shuffle(spark):
    from floorist_spark.operators.events_analytics import e25_attribution

    plan = _plan(e25_attribution(spark, SF_SMOKE))
    # corpus-sized data shuffles exactly once, on user_id for the
    # carry-forward window; the channel aggregate then operates on
    # purchase rows keyed by a <=4-value column
    assert plan.count("Exchange hashpartitioning(user_id") == 1
    assert "CartesianProduct" not in plan


def test_d16_reuses_memoized_chain_one_added_shuffle(spark):
    from floorist_spark.operators.dedup import (
        d09_dedup_clusters,
        d16_soft_dedup_weights,
    )

    # warm the session memo exactly as a catalog consumer would
    d09_dedup_clusters(spark, SF_SMOKE).count()
    plan = _plan(d16_soft_dedup_weights(spark, SF_SMOKE))
    # the only NEW work over d09's label table is the cluster-size window
    assert plan.count("Exchange hashpartitioning(cluster_id") == 1


def test_d17_asymmetric_probe_no_cartesian(spark):
    from floorist_spark.operators.dedup import d17_incremental_dedup

    plan = _plan(d17_incremental_dedup(spark, SF_SMOKE))
    # the batch-vs-index candidate join keys on (band, sig) — a plan
    # regression to a cross product would be quadratic in the index
    assert "CartesianProduct" not in plan
    # exchanges never carry shingle arrays (sh dies before any shuffle of
    # the candidate pair table)
    import re

    for m in re.finditer(r"Exchange hashpartitioning\(band[^\n]*", plan):
        assert ", sh#" not in m.group(0)


def test_d18_wedge_join_keyed(spark):
    from floorist_spark.operators.dedup import d18_dup_graph_triangles

    plan = _plan(d18_dup_graph_triangles(spark, SF_SMOKE))
    # wedge build and triangle close are equi-joins; the 1-row count
    # tables broadcast
    assert "CartesianProduct" not in plan
    assert "BroadcastExchange" in plan or "BroadcastNestedLoopJoin" in plan


def test_m11_scene_cuts_single_canon_shuffle(spark):
    from floorist_spark.operators.multimodal import m11_scene_cuts

    plan = _plan(m11_scene_cuts(spark, SF_SMOKE))
    # per-ASSET frame pass over the MEMOIZED canonical docs table: the
    # identity-resolution aggregate (map-side combinable min(struct))
    # lives inside the session-cached build and amortizes across every
    # canonical consumer; the operator itself adds no join, no explode
    assert "InMemoryTableScan" in plan  # reads the canon memo, not the scan
    assert "partial_min" in plan  # the cached build pre-reduces map-side
    assert "Join" not in plan
    assert "Generate" not in plan


def test_d19_tuning_reuses_memo_no_pairs_materialized(spark):
    from floorist_spark.operators.dedup import TUNING_CONFIGS, d19_lsh_tuning_curve

    plan = _plan(d19_lsh_tuning_curve(spark, SF_SMOKE))
    # every config reads the memoized signature table (the nested
    # InMemoryRelation text repeats per scan, so >=, not ==), and
    # candidate pairs are COUNTED from bucket sizes, never joined into
    # existence: a join-free, cartesian-free plan
    assert plan.count("InMemoryTableScan") >= len(TUNING_CONFIGS)
    assert "CartesianProduct" not in plan
    assert "Join" not in plan


def test_e27_single_corpus_shuffle(spark):
    from floorist_spark.operators.events_analytics import e27_dwell_histogram

    plan = _plan(e27_dwell_histogram(spark, SF_SMOKE))
    # corpus-sized data shuffles once (user_id for the lead window); the
    # share window runs over the tiny (type, bucket) aggregate
    assert plan.count("Exchange hashpartitioning(user_id") == 1
    assert plan.count("Exchange") <= 5


def test_m12_block_exchanges_carry_digests_not_hex(spark):
    import re

    from floorist_spark.operators.multimodal import m12_block_dedup_census

    plan = _plan(m12_block_dedup_census(spark, SF_SMOKE))
    # the hex payload dies in the md5 projection before any shuffle:
    # exchanges key on the digest column d / doc_id, never carry hx
    for m in re.finditer(r"Exchange hashpartitioning\([^\n]*", plan):
        assert "hx#" not in m.group(0), m.group(0)
    assert "CartesianProduct" not in plan


def test_t18_scrub_is_shuffle_free(spark):
    from floorist_spark.operators.text import t18_pii_scrub

    plan = _plan(t18_pii_scrub(spark, SF_SMOKE))
    # narrow per-row regex map: no hash shuffle at all — only the
    # fan-out repartition and the output sort's range exchange
    assert plan.count("Exchange hashpartitioning") == 0


def test_c15_phases_broadcast_back_no_doc_keyed_shuffle(spark):
    from floorist_spark.operators.curation import c15_curriculum_phases

    plan = _plan(c15_curriculum_phases(spark, SF_SMOKE))
    # phase boundaries come from the difficulty histogram; docs get them
    # via broadcast — the corpus is never shuffled on doc_id, and the
    # running-count window runs post-aggregate (bounded table)
    assert "BroadcastExchange" in plan
    assert plan.count("Exchange hashpartitioning(doc_id") == 0
    assert plan.count("Exchange hashpartitioning(difficulty") >= 1
    assert "CartesianProduct" not in plan


def test_s15_frontier_broadcasts_probes_no_corpus_shuffle(spark):
    from floorist_spark.operators.similarity import s15_probe_frontier

    plan = _plan(s15_probe_frontier(spark, SF_SMOKE))
    # every radius joins probe keys via broadcast; the corpus embedding
    # table is never hash-shuffled on the bucket
    assert "BroadcastHashJoin" in plan
    assert plan.count("Exchange hashpartitioning(bucket") == 0
    assert "CartesianProduct" not in plan


def test_e28_prefix_scan_no_corpus_wide_window(spark):
    import re

    from floorist_spark.operators.events_analytics import e28_lateness_audit

    plan = _plan(e28_lateness_audit(spark, SF_SMOKE))
    # the two-level prefix max: corpus windows are PARTITIONED by blk;
    # the only single-partition exchange feeds the tiny per-block table
    # (the classic scan decomposition), so no unpartitioned sort ever
    # sees corpus rows
    assert plan.count("Exchange SinglePartition") <= 2
    for mt in re.finditer(r"Window \[[^\n]*", plan):
        line = mt.group(0)
        assert "blk#" in line or "windowspecdefinition(blk" in line or "partitionBy" not in line
    assert "CartesianProduct" not in plan


def test_d20_exchanges_carry_digests_not_text(spark):
    import re

    from floorist_spark.operators.dedup import d20_source_dup_overlap

    plan = _plan(d20_source_dup_overlap(spark, SF_SMOKE))
    # every shuffle keys on the 16-byte digest and/or the source label —
    # raw document text dies in the md5 projection before any exchange
    for m in re.finditer(r"Exchange hashpartitioning\([^\n]*", plan):
        assert "text#" not in m.group(0), m.group(0)
    assert "CartesianProduct" not in plan


def test_t19_affinity_broadcasts_total_no_cartesian(spark):
    from floorist_spark.operators.text import t19_distribution_outliers

    plan = _plan(t19_distribution_outliers(spark, SF_SMOKE))
    # the 1-row corpus total joins in as a broadcast (never a driver
    # collect), and nothing degenerates to a cartesian pairing
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan
    # shuffles key on (doc_id), (doc_id, tok) and (tok) only
    import re

    for m in re.finditer(r"Exchange hashpartitioning\([^\n]*", plan):
        assert "text#" not in m.group(0), m.group(0)


def test_s16_rounds_reuse_cached_pool_no_cartesian(spark):
    from floorist_spark.operators.similarity import s16_mmr_diversify

    plan = _plan(s16_mmr_diversify(spark, SF_SMOKE))
    # the corpus-sized brute-force scan happens once inside the cached
    # pool build; every greedy round reads the cache (pool + pairs), so
    # the final plan shows only InMemoryTableScans over Q·N-row data
    assert plan.count("InMemoryTableScan") >= 2
    assert "CartesianProduct" not in plan


def test_d21_novelty_reuses_shingle_memo_hash_keyed(spark):
    from floorist_spark.operators.dedup import d21_shingle_novelty

    plan = _plan(d21_shingle_novelty(spark, SF_SMOKE))
    # the shingle pass comes from the session memo (no fresh corpus
    # shingling), and every exchange keys on the 8-byte hash or doc_id —
    # shingle text never shuffles
    assert "InMemoryTableScan" in plan
    import re

    for m in re.finditer(r"Exchange hashpartitioning\([^\n]*", plan):
        assert "text#" not in m.group(0) and "sh#" not in m.group(0), m.group(0)
    assert "CartesianProduct" not in plan


def test_e30_single_user_shuffle(spark):
    from floorist_spark.operators.events_analytics import e30_bot_regularity

    plan = _plan(e30_bot_regularity(spark, SF_SMOKE))
    # one corpus shuffle on user_id feeds BOTH the lag window and the
    # per-user aggregate (the groupBy reuses the window's partitioning);
    # the only other exchange is the output range sort
    assert plan.count("Exchange hashpartitioning(user_id") == 1
    assert plan.count("Exchange") <= 3
    assert "CartesianProduct" not in plan
