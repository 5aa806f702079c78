"""Crafted-case semantics for the round-6 late additions (e31, t20, t21,
c17, s17, m13) — the oracle gate pins Spark==DuckDB; these pin INTENT on
inputs engineered to hit each rule (planted seasonality, exact Flesch
arithmetic, capped water-filling, label-excluding negatives, VAD runs)."""

from __future__ import annotations

import datetime as dt

import pytest


def _write_docs(spark, tmp_path, rows, extra=""):
    schema = "doc_id BIGINT, text STRING" + extra
    df = spark.createDataFrame(rows, schema)
    out = str(tmp_path / "docs")
    df.coalesce(1).write.parquet(f"{out}/documents.parquet")
    return out


def _write_events(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows,
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
        "event_type STRING, value DOUBLE",
    )
    out = str(tmp_path / "ev")
    df.coalesce(1).write.parquet(f"{out}/events.parquet")
    return out


# -- e31: planted flat vs peaky weekly profiles ------------------------------


def test_e31_flat_week_vs_single_cell_spike(spark, tmp_path):
    from floorist_spark.operators.events_analytics import (
        HOW_CELLS,
        e31_seasonality_profile,
    )

    sat = dt.datetime(2024, 6, 1, 0, 0, 0)  # a Saturday (dow 6)
    rows = []
    eid = 0
    # "flat": one event in every hour-of-week cell (168 hourly events)
    for h in range(HOW_CELLS):
        rows.append((eid, sat + dt.timedelta(hours=h), 1, "flat", 0.0))
        eid += 1
    # "peaky": 168 events all inside ONE cell (Saturday 12:00-12:59)
    for s in range(HOW_CELLS):
        rows.append(
            (eid, sat + dt.timedelta(hours=12, seconds=s), 2, "peaky", 0.0)
        )
        eid += 1
    out = _write_events(spark, tmp_path, rows)
    got = {
        r["event_type"]: r
        for r in e31_seasonality_profile(spark, out).collect()
    }
    flat, peaky = got["flat"], got["peaky"]
    assert flat["n_events"] == HOW_CELLS
    assert flat["n_cells_active"] == HOW_CELLS
    assert flat["chi2_uniform"] == 0.0
    # ties broken toward the smallest (dow, hour): Sunday 00:00
    assert (flat["peak_dow"], flat["peak_hour"]) == (0, 0)
    assert flat["peak_share"] == pytest.approx(1.0 / HOW_CELLS)
    assert peaky["n_cells_active"] == 1
    assert (peaky["peak_dow"], peaky["peak_hour"]) == (6, 12)
    assert peaky["peak_share"] == 1.0
    # closed form: all T events in one cell -> chi2 = (HOW_CELLS-1) * T
    assert peaky["chi2_uniform"] == float((HOW_CELLS - 1) * HOW_CELLS)


# -- t20: exact Flesch arithmetic on a tiny crafted doc ----------------------


def test_t20_flesch_exact_counts(spark, tmp_path):
    from floorist_spark.operators.text import t20_readability

    rows = [
        (1, "The cat sat."),          # 3 words, 1 sentence, 3 syllables
        (2, "grr psst"),              # vowel-free words still count 1 each
        (3, "no terminator here"),    # 0 terminators -> min 1 sentence
    ]
    out = _write_docs(spark, tmp_path, rows)
    got = {r["doc_id"]: r for r in t20_readability(spark, out).collect()}
    r1 = got[1]
    assert (r1["n_words"], r1["n_sentences"], r1["n_syllables"]) == (3, 1, 3)
    assert r1["flesch_ease"] == pytest.approx(
        206.835 - 1.015 * 3.0 - 84.6 * 1.0
    )
    assert r1["band"] == "easy"
    r2 = got[2]
    assert (r2["n_words"], r2["n_syllables"]) == (2, 2)
    assert got[3]["n_sentences"] == 1


# -- t21: coverage curve is monotone and exact on planted counts -------------


def test_t21_full_coverage_on_tiny_vocab(spark, tmp_path):
    from floorist_spark.operators.text import VOCAB_SIZES, t21_vocab_coverage

    rows = [(1, "a a a b b c")]
    out = _write_docs(spark, tmp_path, rows)
    res = t21_vocab_coverage(spark, out).collect()
    assert [r["vocab_size"] for r in res] == sorted(VOCAB_SIZES)
    for r in res:  # 3 types, 6 occurrences — every budget covers all
        assert r["n_types"] == 3
        assert r["total_tokens"] == 6
        assert r["n_types_used"] == 3
        assert r["covered_tokens"] == 6
        assert r["coverage"] == 1.0


def test_t21_monotone_on_real_corpus(spark):
    from floorist_spark.operators.text import t21_vocab_coverage

    res = t21_vocab_coverage(spark, "/root/testdata/sf0.001").collect()
    cov = [r["coverage"] for r in res]
    assert cov == sorted(cov)  # non-decreasing in vocab budget
    assert all(0.0 < c <= 1.0 for c in cov)
    for r in res:
        assert r["covered_tokens"] <= r["total_tokens"]
        assert r["n_types_used"] <= min(r["vocab_size"], r["n_types"])


# -- c17: capped prefix + water level sums exactly to the budget -------------


def test_c17_small_source_caps_large_gets_residual(spark, tmp_path):
    from floorist_spark.operators.curation import c17_budget_waterfill

    rows = []
    # s_small: 5 docs x 1 token  (cap 5,  w 5, cap/w = 1)
    for i in range(5):
        rows.append((i, "tok", "en", "s_small"))
    # s_large: 5 docs x 19 tokens (cap 95, w 5, cap/w = 19)
    for i in range(5):
        rows.append((100 + i, " ".join(["w"] * 19), "en", "s_large"))
    df = spark.createDataFrame(
        rows, "doc_id BIGINT, text STRING, lang STRING, source STRING"
    )
    out = str(tmp_path / "docs")
    df.coalesce(1).write.parquet(f"{out}/documents.parquet")
    got = {r["source"]: r for r in c17_budget_waterfill(spark, out).collect()}
    # corpus 100 tokens -> budget 50; s_small caps at 5, s_large gets 45
    assert got["s_small"]["budget"] == 50
    assert bool(got["s_small"]["is_capped"]) is True
    assert got["s_small"]["alloc_tokens"] == 5.0
    assert got["s_small"]["fill_frac"] == 1.0
    assert bool(got["s_large"]["is_capped"]) is False
    assert got["s_large"]["alloc_tokens"] == 45.0
    assert got["s_large"]["fill_frac"] == pytest.approx(45.0 / 95.0)
    assert sum(r["alloc_tokens"] for r in got.values()) == 50.0


def test_c17_single_source_gets_exact_budget(spark, tmp_path):
    from floorist_spark.operators.curation import c17_budget_waterfill

    rows = [(i, "a b c d", "en", "only") for i in range(4)]  # 16 tokens
    df = spark.createDataFrame(
        rows, "doc_id BIGINT, text STRING, lang STRING, source STRING"
    )
    out = str(tmp_path / "docs")
    df.coalesce(1).write.parquet(f"{out}/documents.parquet")
    (r,) = c17_budget_waterfill(spark, out).collect()
    assert r["budget"] == 8 and r["alloc_tokens"] == 8.0
    assert bool(r["is_capped"]) is False
    assert r["fill_frac"] == 0.5


# -- s17: same-label neighbors are never negatives ---------------------------


def test_s17_excludes_own_label(spark, tmp_path):
    from floorist_spark.operators.similarity import s17_hard_negatives

    def vec(scale, tilt=0.0):
        # all-positive first 8 dims -> every vector lands in bucket 255
        v = [1.0] * 8 + [0.0] * 56
        v[8] = tilt
        return [float(x * scale) for x in v]

    rows = [
        (0, vec(1.0), 0),          # the query
        (1, vec(1.0), 0),          # identical but SAME label: excluded
        (2, vec(1.0, 0.1), 1),     # near-identical, different label
        (3, vec(1.0, 2.0), 2),     # tilted away, different label
        (60, vec(1.0), 3),         # vec_id >= 50: corpus-only row
    ]
    df = spark.createDataFrame(
        rows, "vec_id BIGINT, embedding ARRAY<FLOAT>, label BIGINT"
    )
    out = str(tmp_path / "emb")
    df.coalesce(1).write.parquet(f"{out}/embeddings.parquet")
    res = s17_hard_negatives(spark, out).collect()
    by_q = {}
    for r in res:
        by_q.setdefault(r["query_id"], []).append(r)
    q0 = sorted(by_q[0], key=lambda r: r["rank"])
    ids = [r["neighbor_id"] for r in q0]
    assert 1 not in ids  # same-label twin never mined as a negative
    # vec 60 is an exact-direction copy (cosine 1), then 2, then 3
    assert ids[0] == 60 and ids[1] == 2 and ids[2] == 3
    assert q0[0]["cosine"] == pytest.approx(1.0)
    assert all(r["n_candidates"] == 3 for r in q0)


# -- m13: planted voiced/silent frame runs -----------------------------------


def test_m13_segment_census_on_planted_runs(spark, tmp_path):
    from floorist_spark.operators.multimodal import (
        ENERGY_WINDOW,
        m13_vad_segments,
    )

    loud, quiet = "z" * ENERGY_WINDOW, " " * ENERGY_WINDOW
    rows = [
        (1, loud + quiet + loud),   # voiced, silent, voiced -> 2 segments
        (2, loud + loud),           # one unbroken 2-frame segment
        (3, quiet),                 # all silence
        (4, ""),                    # empty payload -> zero frames
        (5, "z" * 10),              # short tail frame: still voiced
    ]
    out = _write_docs(spark, tmp_path, rows)
    got = {r["doc_id"]: r for r in m13_vad_segments(spark, out).collect()}
    r1 = got[1]
    assert (r1["n_frames"], r1["n_voiced"]) == (3, 2)
    assert (r1["n_segments"], r1["longest_run"]) == (2, 1)
    assert r1["voiced_frac"] == pytest.approx(2.0 / 3.0)
    assert (got[2]["n_segments"], got[2]["longest_run"]) == (1, 2)
    assert (got[3]["n_voiced"], got[3]["n_segments"]) == (0, 0)
    assert got[4]["n_frames"] == 0 and got[4]["voiced_frac"] is None
    assert got[5]["n_frames"] == 1 and got[5]["n_voiced"] == 1
