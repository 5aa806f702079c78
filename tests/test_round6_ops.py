"""Crafted-case semantics for the round-6 operators (d19, e27, m12, t18,
c15, s15) — the oracle gate pins Spark==DuckDB; these pin INTENT on inputs
engineered to hit each rule (planted duplicates, exact bucket boundaries,
tie handling). t18's planted-PII parity lives in test_new_ops_semantics."""

from __future__ import annotations

import datetime as dt

import pytest


def _write_docs(spark, tmp_path, rows, name="documents"):
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    out = str(tmp_path / "docs")
    df.coalesce(1).write.parquet(f"{out}/{name}.parquet")
    return out


# -- m12: block-level first-ownership ----------------------------------------


def test_m12_planted_duplicate_payloads_first_owned_once(spark, tmp_path):
    from floorist_spark.operators.multimodal import BLOCK_BYTES, m12_block_dedup_census

    body = "x" * (BLOCK_BYTES * 3)  # exactly 3 identical-content blocks? no:
    # 3 blocks of 'x'*256 -> all three blocks IDENTICAL within the doc
    rows = [
        (1, body),          # first owner of the xxx block
        (2, body),          # exact payload dup: owns nothing
        (3, "y" * BLOCK_BYTES),  # distinct content: owns its one block
        (4, ""),            # empty payload: one empty block, first-owned
        (5, ""),            # second empty payload: owns nothing
    ]
    out = _write_docs(spark, tmp_path, rows)
    got = {r["doc_id"]: r for r in m12_block_dedup_census(spark, out).collect()}
    assert got[1]["n_blocks"] == 3
    assert got[1]["n_distinct_blocks"] == 1  # all three blocks identical
    assert got[1]["n_first_owned"] == 1      # owns the shared block once
    assert got[2]["n_blocks"] == 3 and got[2]["n_first_owned"] == 0
    assert got[3]["n_blocks"] == 1 and got[3]["n_first_owned"] == 1
    assert got[4]["n_blocks"] == 1 and got[4]["n_first_owned"] == 1
    assert got[5]["n_blocks"] == 1 and got[5]["n_first_owned"] == 0


# -- e27: exact bucket boundaries --------------------------------------------


def test_e27_bucket_boundaries(spark, tmp_path):
    from floorist_spark.operators.events_analytics import e27_dwell_histogram

    t0 = dt.datetime(2024, 6, 1, 12, 0, 0)
    us = lambda n: t0 + dt.timedelta(microseconds=n)
    # one user, consecutive gaps: 0 (same ts), 1, 2, 3, 2**20
    times = [0, 0, 1, 3, 6, 6 + (1 << 20)]
    rows = [
        (i, us(t), 7, "view", 0.0)
        for i, t in enumerate(times)
    ]
    df = spark.createDataFrame(
        rows, "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE"
    )
    out = str(tmp_path / "ev")
    df.coalesce(1).write.parquet(f"{out}/events.parquet")
    got = {
        r["gap_bucket"]: r for r in e27_dwell_histogram(spark, out).collect()
    }
    # gap 0 -> bucket -1 with lo=hi=0
    assert got[-1]["n_gaps"] == 1 and got[-1]["bucket_lo_us"] == 0
    # gap 1 -> bucket 0 [1, 1]; gaps 2 and 3 -> bucket 1 [2, 3]
    assert got[0]["n_gaps"] == 1
    assert (got[0]["bucket_lo_us"], got[0]["bucket_hi_us"]) == (1, 1)
    assert got[1]["n_gaps"] == 2
    assert (got[1]["bucket_lo_us"], got[1]["bucket_hi_us"]) == (2, 3)
    # gap 2^20 -> bucket 20, bounds [2^20, 2^21 - 1]
    assert got[20]["n_gaps"] == 1
    assert (got[20]["bucket_lo_us"], got[20]["bucket_hi_us"]) == (
        1 << 20,
        (1 << 21) - 1,
    )
    # shares sum to 1 within the type
    assert sum(r["share_of_type"] for r in got.values()) == pytest.approx(1.0)


# -- c15: phase boundaries from the histogram, ties share a phase ------------


def test_c15_phase_split_and_tie_sharing(spark, tmp_path):
    from floorist_spark.operators.curation import c15_curriculum_phases

    # difficulties: 4 docs of 1 token, 4 of 2, 4 of 3, 4 of 4 -> exact
    # quartiles align with values; every doc of a value shares its phase
    rows = []
    did = 0
    for ntok in (1, 2, 3, 4):
        for _ in range(4):
            rows.append((did, " ".join(["w"] * ntok)))
            did += 1
    out = _write_docs(spark, tmp_path, rows)
    got = {r["doc_id"]: r for r in c15_curriculum_phases(spark, out).collect()}
    for doc_id, r in got.items():
        assert r["phase"] == r["difficulty"] - 1, (doc_id, r)

    # skewed corpus: 13 docs of difficulty 1, 3 of difficulty 9 — the
    # value-1 cohort spans multiple quartiles but must NOT split
    rows2 = [(i, "w") for i in range(13)] + [
        (100 + i, " ".join(["w"] * 9)) for i in range(3)
    ]
    out2 = _write_docs(spark, tmp_path / "b", rows2)
    got2 = {r["doc_id"]: r for r in c15_curriculum_phases(spark, out2).collect()}
    assert {got2[i]["phase"] for i in range(13)} == {0}
    # the difficulty-9 cohort starts at cum_prev=13 of 16 -> phase 3
    assert {got2[100 + i]["phase"] for i in range(3)} == {3}


# -- d19: tuning-curve invariants on a planted near-dup corpus ---------------


def test_d19_monotone_candidates_and_recall(spark, tmp_path):
    from floorist_spark.operators._cache import release_memos
    from floorist_spark.operators.dedup import d19_lsh_tuning_curve

    # 20 distinct docs + 5 exact duplicates of doc 0 (identical signatures
    # collide in EVERY banding config)
    rows = [(i, f"document body number {i} with shared vocabulary") for i in range(20)]
    rows += [(100 + i, rows[0][1]) for i in range(5)]
    out = _write_docs(spark, tmp_path, rows)
    release_memos()
    try:
        curve = {r["n_rows"]: r for r in d19_lsh_tuning_curve(spark, out).collect()}
    finally:
        release_memos()
    # more rows per band => stricter bands => candidate count never rises
    rows_axis = sorted(curve)
    for a, b in zip(rows_axis, rows_axis[1:]):
        assert curve[a]["n_candidate_pairs"] >= curve[b]["n_candidate_pairs"]
    # the 6 identical docs (doc 0 + 5 dups) pair up under EVERY config:
    # C(6,2) = 15 is a floor for candidate pairs
    for r in curve.values():
        assert r["n_candidate_pairs"] >= 15
    # analytic recall at threshold decreases with r (b shrinks as r grows)
    for a, b in zip(rows_axis, rows_axis[1:]):
        assert curve[a]["est_recall_at_08"] >= curve[b]["est_recall_at_08"]


# -- s15: frontier invariants ------------------------------------------------


def test_s15_frontier_monotone(spark):
    from tests.conftest import SF_SMOKE

    from floorist_spark.operators.similarity import s15_probe_frontier

    rows = {r["probe_radius"]: r for r in s15_probe_frontier(spark, SF_SMOKE).collect()}
    assert sorted(rows) == [0, 1, 2]
    assert [rows[r]["n_probes"] for r in (0, 1, 2)] == [1, 9, 37]
    # wider probing can only ADD candidates and can never lose recall
    assert rows[0]["n_candidates"] <= rows[1]["n_candidates"] <= rows[2]["n_candidates"]
    assert rows[0]["recall_at_k"] <= rows[1]["recall_at_k"] <= rows[2]["recall_at_k"]
    for r in rows.values():
        assert 0.0 <= r["recall_at_k"] <= 1.0
        assert r["n_truth"] > 0


# -- e28: planted out-of-order arrivals, cross-block prefix ------------------


def test_e28_lateness_from_arrival_order(spark, tmp_path):
    from floorist_spark.operators.events_analytics import e28_lateness_audit

    t0 = dt.datetime(2024, 6, 1, 12, 0, 0)
    m = lambda mins: t0 + dt.timedelta(minutes=mins)
    rows = [
        (0, m(0), 1, "view", 0.0),     # first arrival -> late 0
        (1, m(60), 1, "view", 0.0),    # hi becomes m60
        (2, m(5), 1, "view", 0.0),     # 55 min behind hi -> LATE
        (3, m(55), 1, "view", 0.0),    # 5 min behind -> within watermark
        (4, m(120), 1, "view", 0.0),   # hi becomes m120
        # different arrival BLOCK (id 5000 with ARRIVAL_BLOCK=1024): its
        # prefix max must come from the cross-block running max (m120)
        (5000, m(30), 1, "view", 0.0),  # 90 min behind -> LATE
    ]
    df = spark.createDataFrame(
        rows, "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE"
    )
    out = str(tmp_path / "ev")
    df.coalesce(1).write.parquet(f"{out}/events.parquet")
    got = {r["hour"].hour: r for r in e28_lateness_audit(spark, out).collect()}
    h12 = got[12]
    assert h12["n_events"] == 4            # m0, m5, m55, m30
    assert h12["n_late"] == 2              # 55-min and 90-min stragglers
    assert h12["max_late_us"] == 90 * 60 * 1_000_000
    assert h12["late_frac"] == pytest.approx(0.5)
    assert got[13]["n_late"] == 0 and got[13]["max_late_us"] == 0
    assert got[14]["n_late"] == 0


# -- c16: dedup-aware mixture deflation --------------------------------------


def test_c16_duplicate_heavy_language_deflates(spark, tmp_path):
    from floorist_spark.operators._cache import release_memos
    from floorist_spark.operators.curation import c16_dedup_aware_mixture

    # lang 'aa': 4 IDENTICAL docs (one near-dup cluster of 4 -> each
    # weighted 1/4 -> effective = raw/4); lang 'bb': 4 distinct docs
    # (no clusters -> effective == raw). Equal token counts per doc.
    dup_body = "the same duplicated document body shared by every copy"
    rows = [(i, dup_body, "aa") for i in range(4)]
    rows += [
        (10 + i, f"unique document number {i} about topic {chr(65 + i)} entirely", "bb")
        for i in range(4)
    ]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING, lang STRING")
    out = str(tmp_path / "docs")
    df.coalesce(1).write.parquet(f"{out}/documents.parquet")
    release_memos()
    try:
        got = {r["lang"]: r for r in c16_dedup_aware_mixture(spark, out).collect()}
    finally:
        release_memos()
    assert got["aa"]["dedup_deflation"] == pytest.approx(0.25)
    assert got["bb"]["dedup_deflation"] == 1.0
    assert got["bb"]["effective_tokens"] == got["bb"]["raw_tokens"]
    # the dup-heavy language's mixture weight falls below the clean one's
    assert got["aa"]["mix_weight"] < got["bb"]["mix_weight"]
    assert got["aa"]["eff_share"] + got["bb"]["eff_share"] == pytest.approx(1.0)


# -- d20: per-source duplicate-overlap census --------------------------------


def test_d20_planted_source_overlap(spark, tmp_path):
    from floorist_spark.operators.dedup import d20_source_dup_overlap

    rows = [
        # srcA: 1 and 2 are the same doc modulo case (normalized dup),
        # 3 is shared verbatim with srcB (cross-source dup)
        (1, "alpha beta gamma", "srcA"),
        (2, "ALPHA  beta GAMMA", "srcA"),
        (3, "shared page body", "srcA"),
        # srcB: 4 duplicates srcA's page, 5 is unique
        (4, "shared page body", "srcB"),
        (5, "entirely unique content", "srcB"),
    ]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING, source STRING")
    out = str(tmp_path / "docs")
    df.coalesce(1).write.parquet(f"{out}/documents.parquet")
    got = {r["source"]: r for r in d20_source_dup_overlap(spark, out).collect()}
    a, b = got["srcA"], got["srcB"]
    assert a["n_docs"] == 3 and a["n_distinct_digests"] == 2
    assert a["n_dup_docs"] == 3          # 1,2 (internal) + 3 (cross)
    assert a["n_cross_docs"] == 1        # only the shared page
    assert a["dup_frac"] == 1.0 and a["cross_frac"] == pytest.approx(1 / 3)
    assert b["n_docs"] == 2 and b["n_distinct_digests"] == 2
    assert b["n_dup_docs"] == 1 and b["n_cross_docs"] == 1
    assert b["dup_frac"] == 0.5 and b["cross_frac"] == 0.5


# -- t19: planted distribution outlier ---------------------------------------


def test_t19_gibberish_doc_flagged(spark, tmp_path):
    import math

    from floorist_spark.operators.text import t19_distribution_outliers

    common = "the cat sat on the mat"  # 6 tokens, vocabulary shared 4x
    rows = [(i, common) for i in range(4)]
    rows.append((9, "zzz qqq xxx www"))  # 4 tokens, each corpus-unique
    out = _write_docs(spark, tmp_path, rows)
    got = {r["doc_id"]: r for r in t19_distribution_outliers(spark, out).collect()}
    # gibberish: every token has c_d = c_c = 1, n_doc = 4, total = 28
    assert got[9]["bc_affinity"] == pytest.approx(4 / math.sqrt(4 * 28))
    assert got[9]["is_outlier"] is True
    # common docs: num = sqrt(2*8) + 4*sqrt(1*4) = 12, n_doc = 6
    assert got[0]["bc_affinity"] == pytest.approx(12 / math.sqrt(6 * 28))
    for i in range(4):
        assert got[i]["is_outlier"] is False
        assert got[i]["bc_affinity"] > got[9]["bc_affinity"]
    assert got[0]["hellinger_sq"] == pytest.approx(1 - 12 / math.sqrt(6 * 28))


# -- s16: MMR diversification vs a pure-Python reference ---------------------


def _py_cos(a, b):
    import math

    dot = 0.0
    na = 0.0
    nb = 0.0
    for x, y in zip(a, b):
        dot += x * y
    for x in a:
        na += x * x
    for y in b:
        nb += y * y
    return dot / (math.sqrt(na) * math.sqrt(nb))


def _py_mmr(vecs, query_ids, pool_n, k, lam):
    """Reference greedy MMR with the engine's tie-breaks."""
    out = {}
    for q in query_ids:
        cands = sorted(
            ((-_py_cos(vecs[q], vecs[c]), c) for c in vecs if c != q)
        )[:pool_n]
        rel = {c: -negrel for negrel, c in cands}
        picked = []
        for _ in range(k):
            best = None
            for c in rel:
                if c in picked:
                    continue
                msim = max(
                    (_py_cos(vecs[c], vecs[p]) for p in picked), default=0.0
                )
                score = lam * rel[c] - (1 - lam) * msim
                key = (-score, c)
                if best is None or key < best:
                    best = key
            picked.append(best[1])
        out[q] = picked
    return out


def test_s16_mmr_matches_python_reference_and_diversifies(spark, tmp_path):
    import numpy as np

    from floorist_spark.operators.similarity import (
        MMR_K,
        MMR_POOL,
        s16_mmr_diversify,
    )

    raw = {
        0: [1.0, 0.0, 0.0],
        1: [0.0, 1.0, 0.0],
        2: [0.0, 0.0, 1.0],
        3: [0.5, 0.5, 0.0],
        4: [0.3, 0.3, 0.3],
        10: [0.98, 0.19899, 0.0],   # most relevant to q0
        11: [1.96, 0.39798, 0.0],   # exact direction dup of 10
        12: [0.96, 0.0, 0.28],      # slightly less relevant, diverse
        13: [0.0, 0.7, 0.7],
        14: [0.2, 0.9, 0.1],
    }
    # float32 storage rounding, then exact float64 math — as the engine does
    vecs = {
        k: [float(np.float32(x)) for x in v] for k, v in raw.items()
    }
    rows = [(k, v, 0) for k, v in raw.items()]
    df = spark.createDataFrame(
        rows, "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT"
    )
    out = str(tmp_path / "emb")
    df.coalesce(1).write.parquet(f"{out}/embeddings.parquet")
    expect = _py_mmr(vecs, range(5), MMR_POOL, MMR_K, 0.7)
    got = s16_mmr_diversify(spark, out).collect()
    by_q = {}
    for r in sorted(got, key=lambda r: (r["query_id"], r["pick"])):
        by_q.setdefault(r["query_id"], []).append(r["neighbor_id"])
    assert by_q == expect
    # diversification is real for q0: relevance alone would keep the dup 11
    # adjacent to 10; MMR swaps in the diverse 12 before it
    assert by_q[0][0] == 10 and by_q[0][1] == 12 and 11 not in by_q[0][:2]


# -- d21: planted novelty curve ----------------------------------------------


def test_d21_novelty_first_owner_by_doc_id(spark, tmp_path):
    from floorist_spark.operators.dedup import d21_shingle_novelty

    rows = [
        (1, "abcdefgh"),   # 4 shingles, all first-owned here
        (2, "abcdefgh"),   # exact re-crawl: zero novelty
        (3, "defghijk"),   # shares 'defgh' with doc 1: 3 of 4 novel
    ]
    out = _write_docs(spark, tmp_path, rows)
    got = {r["doc_id"]: r for r in d21_shingle_novelty(spark, out).collect()}
    assert got[1]["n_shingles"] == 4 and got[1]["novelty_frac"] == 1.0
    assert got[2]["n_shingles"] == 4 and got[2]["n_novel"] == 0
    assert got[3]["n_novel"] == 3 and got[3]["novelty_frac"] == 0.75


# -- e30: planted cadences ---------------------------------------------------


def test_e30_timer_bot_vs_bursty_human(spark, tmp_path):
    from floorist_spark.operators.events_analytics import e30_bot_regularity

    t0 = dt.datetime(2024, 6, 1, 12, 0, 0)
    rows = []
    eid = 0
    # user 1: timer bot — 13 events exactly 1s apart (12 zero-variance gaps)
    for i in range(13):
        rows.append((eid, t0 + dt.timedelta(seconds=i), 1, "ping", 0.0))
        eid += 1
    # user 2: bursty human — 13 events, gaps alternating 1s / 60s
    t = t0
    rows.append((eid, t, 2, "view", 0.0)); eid += 1
    for i in range(12):
        t = t + dt.timedelta(seconds=1 if i % 2 == 0 else 60)
        rows.append((eid, t, 2, "view", 0.0)); eid += 1
    # user 3: regular but only 3 events — too few gaps to score as bot
    for i in range(3):
        rows.append((eid, t0 + dt.timedelta(seconds=i), 3, "view", 0.0))
        eid += 1
    # user 4: two events at the SAME timestamp — sg = 0, cv2 undefined
    rows.append((eid, t0, 4, "view", 0.0)); eid += 1
    rows.append((eid, t0, 4, "view", 0.0)); eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
        "event_type STRING, value DOUBLE",
    )
    out = str(tmp_path / "ev")
    df.coalesce(1).write.parquet(f"{out}/events.parquet")
    got = {r["user_id"]: r for r in e30_bot_regularity(spark, out).collect()}
    assert got[1]["cv2"] == 0.0 and bool(got[1]["is_bot"]) is True
    # exact integer-formula expectation for the alternating cadence
    gaps = [1_000_000 if i % 2 == 0 else 60_000_000 for i in range(12)]
    n, sg, ssg = len(gaps), sum(gaps), sum(g * g for g in gaps)
    assert got[2]["cv2"] == pytest.approx((n * ssg - sg * sg) / (sg * sg))
    assert bool(got[2]["is_bot"]) is False
    assert got[3]["n_gaps"] == 2 and bool(got[3]["is_bot"]) is False
    assert got[4]["cv2"] is None and bool(got[4]["is_bot"]) is False


def test_s16_matches_python_reference_on_seeded_random_sets(spark, tmp_path):
    import numpy as np

    from floorist_spark.operators.similarity import (
        MMR_K,
        MMR_POOL,
        s16_mmr_diversify,
    )

    for seed in (7, 23, 91):
        rng = np.random.RandomState(seed)
        ids = list(range(5)) + [10 + i for i in range(7)]
        raw = {
            i: (rng.uniform(-2, 2, size=4) + 0.1).tolist() for i in ids
        }
        vecs = {
            k: [float(np.float32(x)) for x in v] for k, v in raw.items()
        }
        rows = [(k, v, 0) for k, v in raw.items()]
        df = spark.createDataFrame(
            rows, "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT"
        )
        out = str(tmp_path / f"emb{seed}")
        df.coalesce(1).write.parquet(f"{out}/embeddings.parquet")
        expect = _py_mmr(vecs, range(5), MMR_POOL, MMR_K, 0.7)
        by_q = {}
        for r in sorted(
            s16_mmr_diversify(spark, out).collect(),
            key=lambda r: (r["query_id"], r["pick"]),
        ):
            by_q.setdefault(r["query_id"], []).append(r["neighbor_id"])
        assert by_q == expect, f"seed {seed}"
