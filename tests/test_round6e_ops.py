"""Crafted-case semantics for the round-6 fifth wave (d24, t23, c19,
s19, e33, m16) — the oracle gate pins Spark==DuckDB; these pin INTENT on
inputs engineered to hit each rule (planted duplicated spans with a
known merge geometry, planted encoding anomalies checked against a pure
python reference, a planted eval leak, hash-derived tombstones, gap
tie-breaks, exact medians and dedup ratios)."""

from __future__ import annotations

import datetime as dt
import hashlib


def _write_docs(spark, tmp_path, rows, schema="doc_id BIGINT, text STRING"):
    df = spark.createDataFrame(rows, schema)
    out = str(tmp_path / "docs")
    df.coalesce(1).write.parquet(f"{out}/documents.parquet")
    return out


def _bucket(salt: str, ident: int, mod: int = 100) -> int:
    return int(hashlib.md5(f"{salt}:{ident}".encode()).hexdigest()[:4], 16) % mod


# -- d24: planted duplicated spans with known merge geometry ------------------


def test_d24_single_shared_anchor_and_unique_doc(spark, tmp_path):
    from floorist_spark.operators.dedup import d24_exact_substring_spans

    rows = [
        (1, "a b c d e f g h x y z"),
        (2, "a b c d e f g h q r s"),
        (3, "completely unique text with nothing shared here at all ok"),
    ]
    out = _write_docs(spark, tmp_path, rows)
    got = {r["doc_id"]: r for r in d24_exact_substring_spans(spark, out).collect()}
    for d in (1, 2):
        r = got[d]
        assert (r["n_tokens"], r["n_anchors"]) == (11, 4)
        assert (r["n_dup_anchors"], r["n_spans"], r["covered_tokens"]) == (1, 1, 8)
        assert r["dup_span_frac"] == 8 / 11
    r3 = got[3]
    assert (r3["n_dup_anchors"], r3["n_spans"], r3["covered_tokens"]) == (0, 0, 0)
    assert r3["dup_span_frac"] == 0.0


def test_d24_overlapping_anchors_merge_and_disjoint_spans_do_not(spark, tmp_path):
    from floorist_spark.operators.dedup import d24_exact_substring_spans

    rows = [
        # 4 and 5 share a 9-token prefix -> anchors at pos 1 AND 2 merge
        (4, "p q r s t u v w x m1 m2"),
        (5, "p q r s t u v w x n1 n2"),
        # 6 shares the 8-token prefix with 4/5 AND the a..h block with 7,
        # separated by two unique tokens -> two disjoint spans
        (6, "p q r s t u v w z1 z2 a b c d e f g h"),
        (7, "a b c d e f g h k1 k2"),
    ]
    out = _write_docs(spark, tmp_path, rows)
    got = {r["doc_id"]: r for r in d24_exact_substring_spans(spark, out).collect()}
    for d in (4, 5):
        r = got[d]
        # anchor pos1 (p..w, shared 3 ways) and pos2 (q..x, shared with the
        # other of 4/5): overlapping -> ONE merged span of 9 tokens
        assert (r["n_dup_anchors"], r["n_spans"], r["covered_tokens"]) == (2, 1, 9)
    r6 = got[6]
    assert r6["n_tokens"] == 18 and r6["n_anchors"] == 11
    assert (r6["n_dup_anchors"], r6["n_spans"], r6["covered_tokens"]) == (2, 2, 16)
    r7 = got[7]
    assert (r7["n_dup_anchors"], r7["n_spans"], r7["covered_tokens"]) == (1, 1, 8)


def test_d24_within_doc_repetition_is_not_a_duplicate(spark, tmp_path):
    from floorist_spark.operators.dedup import d24_exact_substring_spans

    # the same 8-gram twice in ONE doc is t09's business, not d24's
    rows = [(1, "a b c d e f g h a b c d e f g h"), (2, "x y z w v u t s r")]
    out = _write_docs(spark, tmp_path, rows)
    got = {r["doc_id"]: r for r in d24_exact_substring_spans(spark, out).collect()}
    assert got[1]["n_dup_anchors"] == 0 and got[1]["covered_tokens"] == 0


# -- t23: planted anomalies vs a pure-python reference ------------------------


def _t23_expected(text: str) -> dict:
    from floorist_spark.operators.text import (
        _T23_ASCII,
        _T23_CTRL,
        _T23_MOJI_LEAD,
        _T23_MOJI_PAIR,
        _T23_REPL,
        _T23_ZW,
    )

    t = text or ""
    n = len(t)
    n_repl = t.count(_T23_REPL)
    n_ctrl = sum(1 for ch in t if ch in _T23_CTRL)
    n_zw = sum(1 for ch in t if ch in _T23_ZW)
    n_na = sum(1 for ch in t if ch not in _T23_ASCII)
    n_moji = t.count(_T23_MOJI_PAIR) + t.count(_T23_MOJI_LEAD)
    return {
        "n_chars": n,
        "n_repl": n_repl,
        "n_ctrl": n_ctrl,
        "n_zero_width": n_zw,
        "n_non_ascii": n_na,
        "n_mojibake": n_moji,
        "non_ascii_frac": n_na / max(n, 1),
        "suspicious": n_repl > 0 or n_ctrl > 0 or n_moji > 0,
    }


def test_t23_matches_python_reference_on_planted_anomalies(spark, tmp_path):
    from floorist_spark.operators.text import t23_encoding_anomalies

    texts = {
        1: "hello world",
        2: "bad\x01text\x1f",
        3: "café résumé",
        4: "caffÃ¨ â€” dash",
        5: "�broken� page",
        6: "zero​width﻿",
        7: None,
        8: "",
    }
    out = _write_docs(spark, tmp_path, list(texts.items()))
    got = {r["doc_id"]: r for r in t23_encoding_anomalies(spark, out).collect()}
    assert set(got) == set(texts)
    for doc_id, text in texts.items():
        exp = _t23_expected(text)
        row = got[doc_id]
        for k, v in exp.items():
            assert row[k] == v, (doc_id, k, row[k], v)
    assert got[2]["suspicious"] and got[4]["suspicious"] and got[5]["suspicious"]
    assert not got[1]["suspicious"] and not got[6]["suspicious"]
    assert not got[7]["suspicious"] and got[7]["n_chars"] == 0


# -- c19: planted eval leak ----------------------------------------------------


def test_c19_planted_leak_and_clean_eval_item(spark, tmp_path):
    from floorist_spark.operators.curation import (
        VAL_UPTO,
        TRAIN_UPTO,
        c19_contamination_report,
    )

    eval_ids = [i for i in range(1, 4000) if _bucket("split", i) >= VAL_UPTO]
    train_ids = [i for i in range(1, 4000) if _bucket("split", i) < TRAIN_UPTO]
    leak_id, clean_id = eval_ids[0], eval_ids[1]
    leaked_text = "the quick brown fox jumps over the lazy dog"
    rows = [
        (leak_id, leaked_text),
        (clean_id, "zebras quietly hum ultraviolet melodies backwards"),
        (train_ids[0], leaked_text),
        (train_ids[1], "some unrelated training prose goes here"),
    ]
    out = _write_docs(spark, tmp_path, rows)
    got = {r["doc_id"]: r for r in c19_contamination_report(spark, out).collect()}
    assert set(got) == {leak_id, clean_id}
    leak = got[leak_id]
    assert leak["n_hit"] == leak["n_ngrams"] > 0
    assert leak["hit_frac"] == 1.0 and leak["contaminated"]
    clean = got[clean_id]
    assert clean["n_hit"] == 0 and clean["hit_frac"] == 0.0
    assert not clean["contaminated"]


# -- s19: hash-derived tombstones over one planted cell ------------------------


def test_s19_counts_bytes_and_compaction_verdict(spark, tmp_path):
    from floorist_spark.operators.similarity import (
        TOMB_MOD,
        s19_tombstone_compaction,
    )

    # all-positive 8-dim vectors -> every sign bit set -> bucket 255
    ids = list(range(1, 21))
    dead = {i for i in ids if _bucket("tomb", i, TOMB_MOD) == 0}
    rows = [(i, [1.0] * 8, 0) for i in ids]
    df = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT")
    out = str(tmp_path / "emb")
    df.coalesce(1).write.parquet(f"{out}/embeddings.parquet")
    res = s19_tombstone_compaction(spark, out).collect()
    assert len(res) == 1
    r = res[0]
    assert r["bucket"] == 255
    assert r["n_total"] == 20 and r["n_dead"] == len(dead)
    assert r["n_live"] == 20 - len(dead)
    assert r["reclaim_bytes"] == len(dead) * 8 * 4
    assert r["dead_frac"] == len(dead) / 20
    assert r["needs_compaction"] == (5 * len(dead) >= 20)


# -- e33: exact gaps, ties, and the top-K cut ----------------------------------


def test_e33_gap_values_tiebreak_and_topk(spark, tmp_path):
    from floorist_spark.operators.events_analytics import e33_outage_gaps

    base = dt.datetime(2024, 5, 1, 0, 0, 0)
    offs = [0, 10, 70, 80, 140]  # gaps: 10, 60, 10, 60 (two ties of each)
    rows = [
        (i, base + dt.timedelta(seconds=s), 1, "a", 0.0)
        for i, s in enumerate(offs)
    ]
    rows.append((99, base, 2, "lonely", 0.0))  # single event: no gaps
    df = spark.createDataFrame(
        rows,
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
        "event_type STRING, value DOUBLE",
    )
    out = str(tmp_path / "ev")
    df.coalesce(1).write.parquet(f"{out}/events.parquet")
    res = e33_outage_gaps(spark, out).collect()
    assert {r["event_type"] for r in res} == {"a"}
    a = [r for r in res if r["event_type"] == "a"]
    assert [r["gap_rank"] for r in a] == [1, 2, 3, 4]
    # equal gaps order by gap END ascending
    assert [r["gap_us"] for r in a] == [60_000_000, 60_000_000, 10_000_000, 10_000_000]
    assert a[0]["gap_end"] == base + dt.timedelta(seconds=70)
    assert a[1]["gap_end"] == base + dt.timedelta(seconds=140)
    assert (a[0]["start_event_id"], a[0]["end_event_id"]) == (1, 2)


def test_e33_topk_cut_is_applied(spark, tmp_path):
    from floorist_spark.operators.events_analytics import (
        OUTAGE_TOP_K,
        e33_outage_gaps,
    )

    base = dt.datetime(2024, 5, 1)
    # 20 events with strictly increasing gaps 1..19 minutes
    rows, t = [], base
    for i in range(20):
        rows.append((i, t, 1, "b", 0.0))
        t += dt.timedelta(minutes=i + 1)
    df = spark.createDataFrame(
        rows,
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
        "event_type STRING, value DOUBLE",
    )
    out = str(tmp_path / "ev")
    df.coalesce(1).write.parquet(f"{out}/events.parquet")
    res = e33_outage_gaps(spark, out).collect()
    assert len(res) == OUTAGE_TOP_K
    assert [r["gap_us"] for r in res] == [
        m * 60_000_000 for m in range(19, 19 - OUTAGE_TOP_K, -1)
    ]


# -- m16: exact medians, byte totals, dedup ratio ------------------------------


def test_m16_median_bytes_and_dedup_ratio(spark, tmp_path):
    from floorist_spark.operators.multimodal import m16_payload_size_census

    rows = [
        (1, "aa", "x"),
        (2, "aa", "x"),      # exact duplicate payload
        (3, "bbbb", "x"),
        (4, "ééé", "y"),     # 6 utf-8 bytes
        (5, None, "y"),      # NULL -> empty payload, 0 bytes
    ]
    out = _write_docs(
        spark, tmp_path, rows, schema="doc_id BIGINT, text STRING, source STRING"
    )
    got = {r["source"]: r for r in m16_payload_size_census(spark, out).collect()}
    x = got["x"]
    assert (x["n_docs"], x["total_bytes"], x["max_bytes"]) == (3, 8, 4)
    # sizes sorted [2, 2, 4]: lower median is rank (3+1)//2 = 2 -> 2
    assert x["median_bytes"] == 2
    assert x["n_distinct_payloads"] == 2
    assert x["dedup_ratio"] == 2 / 3
    y = got["y"]
    assert (y["n_docs"], y["total_bytes"], y["max_bytes"]) == (2, 6, 6)
    # sizes [0, 6]: lower median rank (2+1)//2 = 1 -> 0
    assert y["median_bytes"] == 0
    assert y["n_distinct_payloads"] == 2 and y["dedup_ratio"] == 1.0
