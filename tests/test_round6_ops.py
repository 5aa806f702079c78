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
