"""Crafted-case semantics for the round-7 wave (q43 semi join, d28
candidate-score histogram, s22 nprobe cost frontier, t26 hapax census,
c22 split-leakage audit, e36 burst windows, m19 modality-mix manifest):
planted inputs with hand-computable answers, plus executed-plan pins for
each op's scale-shape claim.
"""

from __future__ import annotations

import datetime as dt

import pytest

from tests.conftest import SF_SMOKE

DOCS_SCHEMA = (
    "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _write(spark, tmp_path, table, rows, schema):
    df = spark.createDataFrame(rows, schema)
    out = str(tmp_path)
    df.coalesce(1).write.mode("overwrite").parquet(f"{out}/{table}.parquet")
    return out


def _write_docs(spark, tmp_path, rows):
    return _write(
        spark,
        tmp_path,
        "documents",
        [(i, t, "en", src, len(t)) for i, t, src in rows],
        DOCS_SCHEMA,
    )


@pytest.fixture(autouse=True)
def _release(spark):
    yield
    from floorist_spark.operators._cache import release_caches

    release_caches()


# ---------------------------------------------------------------------------
# q43 — semi join
# ---------------------------------------------------------------------------


def test_q43_semi_join_no_duplication(spark, tmp_path):
    """The load-bearing semi-join property: a part with MANY matching
    heavy lineitems still counts ONCE (an inner join + count would
    double-count p3)."""
    from floorist_spark.operators.relational import q43_semi_join

    out = _write(
        spark,
        tmp_path,
        "part",
        [(1, "BrandA"), (2, "BrandA"), (3, "BrandB")],
        "p_partkey BIGINT, p_brand STRING",
    )
    _write(
        spark,
        tmp_path,
        "lineitem",
        [
            (1, 1, 50.0),   # p1: one heavy -> BrandA counts it
            (2, 2, 10.0),   # p2: light only -> not counted
            (3, 3, 46.0),   # p3: TWO heavy lineitems ...
            (4, 3, 99.0),   # ... still ONE part
        ],
        "l_orderkey BIGINT, l_partkey BIGINT, l_quantity DOUBLE",
    )
    got = {r["p_brand"]: r["n_parts"] for r in q43_semi_join(spark, out).collect()}
    assert got == {"BrandA": 1, "BrandB": 1}


def test_q43_plan_semi_join_no_cartesian(spark):
    from floorist_spark.operators.relational import q43_semi_join

    plan = _plan(q43_semi_join(spark, SF_SMOKE))
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan
    # the quantity filter must reach the lineitem scan
    assert "PushedFilters" in plan or "Filter" in plan


# ---------------------------------------------------------------------------
# d28 — candidate-score histogram
# ---------------------------------------------------------------------------


def test_d28_identical_pair_lands_in_top_bucket(spark, tmp_path):
    from floorist_spark.operators.dedup import (
        d28_candidate_score_histogram,
    )

    base = "the quick brown fox jumps over the lazy dog " * 4
    rows = [
        (1, base, "s0"),
        (2, base, "s0"),       # identical twin: jaccard 1 -> bucket 20
        (3, "completely different words entirely here " * 4, "s0"),
        (4, "another unrelated document body text " * 4, "s0"),
    ]
    out = _write_docs(spark, tmp_path, rows)
    got = {r["bucket"]: r for r in d28_candidate_score_histogram(spark, out).collect()}
    assert 20 in got, f"identical pair missing from top bucket: {got}"
    top = got[20]
    assert top["n_pairs"] == 1
    assert top["n_verified"] == 1
    assert top["min_jaccard"] == 1.0 and top["max_jaccard"] == 1.0
    # shares sum to 1 over whatever candidates LSH produced
    assert abs(sum(r["pair_frac"] for r in got.values()) - 1.0) < 1e-12
    # every verified pair lives in a bucket >= 0.8 * RES (floor) - boundary
    for r in got.values():
        if r["n_verified"] > 0:
            assert r["bucket"] >= 15


def test_d28_histogram_totals_match_candidate_count(spark):
    from floorist_spark.operators.dedup import (
        d03_minhash_lsh_candidates,
        d28_candidate_score_histogram,
    )

    n_cand = d03_minhash_lsh_candidates(spark, SF_SMOKE).count()
    hist = d28_candidate_score_histogram(spark, SF_SMOKE).collect()
    assert sum(r["n_pairs"] for r in hist) == n_cand
    assert all(0 <= r["bucket"] <= 20 for r in hist)


def test_d28_plan_reuses_memo_no_cartesian(spark):
    from floorist_spark.operators.dedup import d28_candidate_score_histogram

    plan = _plan(d28_candidate_score_histogram(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    # candidates + verify ride the memoized band/shingle tables
    assert "InMemoryTableScan" in plan


# ---------------------------------------------------------------------------
# s22 — nprobe cost frontier
# ---------------------------------------------------------------------------


def test_s22_frontier_monotone_and_exhaustive_at_full_probe(spark):
    """Hand-checkable invariants on the real table: candidate volume is
    nondecreasing in nprobe, and probing ALL 8 cells touches exactly the
    whole corpus (cells partition the corpus)."""
    from floorist_spark.operators.similarity import (
        s22_nprobe_cost_frontier,
    )

    rows = s22_nprobe_cost_frontier(spark, SF_SMOKE).collect()
    assert [r["nprobe"] for r in rows] == [1, 2, 4, 8]
    totals = [r["total_candidates"] for r in rows]
    assert totals == sorted(totals)
    maxes = [r["max_candidates"] for r in rows]
    assert maxes == sorted(maxes)
    full = rows[-1]
    assert full["corpus_frac"] == 1.0
    assert full["max_candidates"] * full["n_queries"] >= full["total_candidates"]
    assert all(r["n_queries"] == rows[0]["n_queries"] for r in rows)


def test_s22_plan_broadcasts_small_sides(spark):
    from floorist_spark.operators.similarity import s22_nprobe_cost_frontier

    plan = _plan(s22_nprobe_cost_frontier(spark, SF_SMOKE))
    # centroid set, cell-size table, and probe list all broadcast; the
    # corpus is scanned for assignment but never cartesian-joined
    assert "CartesianProduct" not in plan
    assert "BroadcastExchange" in plan


# ---------------------------------------------------------------------------
# t26 — hapax census
# ---------------------------------------------------------------------------


def test_t26_hand_computed(spark, tmp_path):
    from floorist_spark.operators.text import t26_hapax_census

    rows = [
        (1, "a a b", "A"),      # A: tokens a,a,b
        (2, "x y", "B"),        # B: x,y + y,z -> total 4, vocab 3, hapax x,z
        (3, "y z", "B"),
    ]
    out = _write_docs(spark, tmp_path, rows)
    got = {r["source"]: r for r in t26_hapax_census(spark, out).collect()}
    a, b = got["A"], got["B"]
    assert (a["total_tokens"], a["vocab_size"], a["n_hapax"]) == (3, 2, 1)
    assert a["hapax_frac"] == 1 / 2 and a["ttr"] == 2 / 3
    assert (b["total_tokens"], b["vocab_size"], b["n_hapax"]) == (4, 3, 2)
    assert b["hapax_frac"] == 2 / 3 and b["ttr"] == 3 / 4


def test_t26_plan_digest_only_exchange(spark):
    from floorist_spark.operators.text import t26_hapax_census

    plan = _plan(t26_hapax_census(spark, SF_SMOKE))
    import re

    # the (source, token) count shuffle must carry md5 digests, never the
    # token strings themselves
    for m in re.finditer(r"Exchange hashpartitioning[^\n]*", plan):
        assert "tok#" not in m.group(0) and "text#" not in m.group(0), m.group(0)
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# c22 — split-leakage audit
# ---------------------------------------------------------------------------


def test_c22_planted_leak_across_train_and_test(spark, tmp_path):
    """doc 0 hashes to train, doc 1 to test (buckets precomputed from the
    c01 hash); identical long texts force them into one near-dup cluster,
    so the audit must report a 'test|train' straddle with exactly one
    eval doc at risk. Docs 3-6 (train) and 43 (test) are singleton
    non-dups and must NOT appear."""
    from floorist_spark.operators.curation import c22_split_leakage_audit

    dup = "identical leaked document body repeated for shingles " * 5
    rows = [
        (0, dup, "s"),              # bucket 44  -> train
        (1, dup, "s"),              # bucket 97  -> test
        (3, "unique text one about gardens and rivers " * 5, "s"),
        (4, "unique text two about engines and metals " * 5, "s"),
        (43, "unique text three about planets and moons " * 5, "s"),
    ]
    out = _write_docs(spark, tmp_path, rows)
    got = c22_split_leakage_audit(spark, out).collect()
    assert len(got) == 1
    row = got[0]
    assert row["splits_sig"] == "test|train"
    assert row["n_clusters"] == 1
    assert row["n_docs"] == 2
    assert row["n_eval_docs_at_risk"] == 1


def test_c22_no_leak_when_cluster_stays_in_train(spark, tmp_path):
    from floorist_spark.operators.curation import c22_split_leakage_audit

    dup = "identical leaked document body repeated for shingles " * 5
    rows = [
        (0, dup, "s"),   # train
        (2, dup, "s"),   # train (bucket 13)
        (43, "unique text three about planets and moons " * 5, "s"),
    ]
    out = _write_docs(spark, tmp_path, rows)
    assert c22_split_leakage_audit(spark, out).count() == 0


# ---------------------------------------------------------------------------
# e36 — burst windows
# ---------------------------------------------------------------------------


def test_e36_hand_computed_burst(spark, tmp_path):
    from floorist_spark.operators.events_analytics import e36_burst_windows

    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)

    def ev(i, minute, second=0):
        return (
            i,
            t0 + dt.timedelta(minutes=minute, seconds=second),
            i % 3,
            "click",
            1.0,
            "{}",
        )

    # window [0,5): 10 events; [5,10): 1; [10,15): 1  -> avg 4/window
    rows = (
        [ev(i, 0, i) for i in range(10)]
        + [ev(10, 6), ev(11, 12)]
    )
    out = _write(
        spark,
        tmp_path,
        "events",
        rows,
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
        "event_type STRING, value DOUBLE, props STRING",
    )
    got = e36_burst_windows(spark, out).collect()
    assert [r["rank"] for r in got] == [1, 2, 3]
    top = got[0]
    assert top["n_events"] == 10
    assert top["window_start"] == t0
    assert top["burst_ratio"] == 10 * 3 / 12  # 2.5x the mean window load
    # ties below rank 1 (two 1-event windows) break by window_start asc
    assert got[1]["window_start"] < got[2]["window_start"]
    assert got[1]["n_events"] == got[2]["n_events"] == 1


def test_e36_plan_no_corpus_window(spark):
    from floorist_spark.operators.events_analytics import e36_burst_windows

    plan = _plan(e36_burst_windows(spark, SF_SMOKE))
    # the rank window runs over (type, window) AGGREGATE rows — the plan
    # must aggregate before the Window operator, and the stats join
    # broadcasts
    assert plan.index("HashAggregate") < plan.index("Window") or (
        "WindowGroupLimit" in plan
    )
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# m19 — modality-mix manifest
# ---------------------------------------------------------------------------


def test_m19_balanced_take_and_missing_modality(spark, tmp_path):
    from floorist_spark.operators.multimodal import m19_modality_mix_manifest

    rows = [
        # source 'full': doc_ids 0..5 -> image{0,3} audio{1,4} video{2,5}
        (0, "aa", "full"),
        (3, "bb", "full"),
        (1, "cc", "full"),
        (4, "dd", "full"),
        (2, "ee", "full"),
        (5, "ff", "full"),
        # source 'novid': ids 6,9 image; 7 audio; none video
        (6, "gg", "novid"),
        (9, "hh", "novid"),
        (7, "ii", "novid"),
    ]
    out = _write_docs(spark, tmp_path, rows)
    got = {
        (r["source"], r["media_type"]): r
        for r in m19_modality_mix_manifest(spark, out).collect()
    }
    for mt in ("image", "audio", "video"):
        r = got[("full", mt)]
        assert r["n_assets"] == 2
        assert r["balanced_take"] == 2 and r["sample_frac"] == 1.0
    img = got[("novid", "image")]
    assert img["n_assets"] == 2
    assert img["balanced_take"] == 0 and img["sample_frac"] == 0.0
    assert ("novid", "video") not in got
    # byte shares per source sum to 1
    for src in ("full", "novid"):
        assert (
            abs(
                sum(r["byte_share"] for k, r in got.items() if k[0] == src)
                - 1.0
            )
            < 1e-12
        )


def test_m19_plan_single_scan_window_rollup(spark):
    from floorist_spark.operators.multimodal import m19_modality_mix_manifest

    plan = _plan(m19_modality_mix_manifest(spark, SF_SMOKE))
    # the source rollup is a window over the AGGREGATED cells — a
    # separate groupBy + join re-derives the aggregation subtree and
    # scans the corpus twice (the first draft's bug)
    assert plan.count("FileScan parquet") == 1
    assert "Window" in plan
    assert "CartesianProduct" not in plan
