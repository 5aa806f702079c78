"""Crafted-case semantics tests for the round-5 additions (e23 rolling
actives, e24 growth accounting, c13 data card, t16 Zipf audit, s13
filtered ANN) — the oracle gate pins Spark==DuckDB; these pin the INTENT
on inputs engineered to hit each classification rule."""

from __future__ import annotations

import datetime as dt

import pytest

from floorist_spark.operators.curation import c13_data_card
from floorist_spark.operators.events_analytics import (
    e23_rolling_active,
    e24_growth_accounting,
)
from floorist_spark.operators.similarity import s13_filtered_ann
from floorist_spark.operators.text import t16_zipf_audit


def _d(day: int) -> dt.date:
    return dt.date(2024, 1, 1) + dt.timedelta(days=day)


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """events.parquet covering every e23/e24 branch. 2024-01-01 is a
    Monday, so day offsets 0/7/14/21 are exact ISO week starts."""
    rows = [
        # e23: u1 active day0 and day2 (twice on day2 — distinct must
        # collapse), u2 active day0 only
        (1, dt.datetime(2024, 1, 1, 1), 1, "view"),
        (2, dt.datetime(2024, 1, 3, 1), 1, "view"),
        (3, dt.datetime(2024, 1, 3, 2), 1, "click"),
        (4, dt.datetime(2024, 1, 1, 2), 2, "view"),
        # e24: u1 weeks 0,1,3 (retained then gap-resurrected);
        # u2 week 0 only (churned at week 1). u1's day-2 event already
        # lands in week 0; add week-1 and week-3 activity:
        (5, dt.datetime(2024, 1, 8, 1), 1, "view"),
        (6, dt.datetime(2024, 1, 22, 1), 1, "view"),
    ]
    df = spark.createDataFrame(
        rows, "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING"
    )
    out = str(tmp_path_factory.mktemp("events_r5b"))
    df.coalesce(1).write.parquet(f"{out}/events.parquet")
    return out


def test_rolling_active_distinct_window(spark, events_dir):
    got = {r["day"]: r for r in e23_rolling_active(spark, events_dir).collect()}
    # report days = activity days only
    assert set(got) == {_d(0), _d(2), _d(7), _d(21)}
    # day0: both users active; trailing window is just day0
    assert got[_d(0)]["dau"] == 2 and got[_d(0)]["wau_7d"] == 2
    assert got[_d(0)]["stickiness"] == 1.0
    # day2: only u1 active, but u2's day0 activity is inside the trailing
    # 7-day window — and u1 counts ONCE despite being active day0 AND day2
    assert got[_d(2)]["dau"] == 1 and got[_d(2)]["wau_7d"] == 2
    assert got[_d(2)]["stickiness"] == 0.5
    # day7: trailing window [day1, day7] — u2's day0 has aged out, and
    # u1's day2+day7 activity collapses to one distinct user
    assert got[_d(7)]["dau"] == 1 and got[_d(7)]["wau_7d"] == 1
    # day21: everything else is out of the window
    assert got[_d(21)]["dau"] == 1 and got[_d(21)]["wau_7d"] == 1


def test_growth_accounting_lifecycle(spark, events_dir):
    rows = {r["week"]: r for r in e24_growth_accounting(spark, events_dir).collect()}
    wk = {i: _d(7 * i) for i in range(4)}
    # week0: both users first seen
    assert rows[wk[0]]["n_new"] == 2
    # week1: u1 consecutive -> retained; u2 absent -> churned at week1
    assert rows[wk[1]]["n_retained"] == 1
    assert rows[wk[1]]["n_churned"] == 1
    # week2: u1 absent -> churned at week2 (gap week)
    assert rows[wk[2]]["n_churned"] == 1
    assert rows[wk[2]]["n_new"] == 0 and rows[wk[2]]["n_retained"] == 0
    # week3: u1 returns after a gap -> resurrected, NOT new/retained
    assert rows[wk[3]]["n_resurrected"] == 1 and rows[wk[3]]["n_new"] == 0
    # week4 never appears: u1's absence after week3 is beyond the last
    # observed week, so the data cannot attest a churn there
    assert _d(28) not in rows


@pytest.fixture(scope="module")
def docs_dir(spark, tmp_path_factory):
    """documents.parquet with one 4-doc (lang,source) slice with known
    lengths and a 1-doc slice, plus Zipf-friendly token counts."""
    rows = [
        # en/web: n_chars 10,20,30,40 -> p50=25.0, p90=37.0
        (1, "a a a", "en", "web", 10),
        (2, "a a b", "en", "web", 20),
        (3, "a b c", "en", "web", 30),
        (4, "b c d", "en", "web", 40),
        # de/books: single doc
        (5, "x y", "de", "books", 99),
    ]
    df = spark.createDataFrame(
        rows, "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
    )
    out = str(tmp_path_factory.mktemp("docs_r5b"))
    df.coalesce(1).write.parquet(f"{out}/documents.parquet")
    return out


def test_data_card_slices(spark, docs_dir):
    rows = {(r["lang"], r["source"]): r for r in c13_data_card(spark, docs_dir).collect()}
    en = rows[("en", "web")]
    assert en["n_docs"] == 4 and en["total_tokens"] == 12
    assert en["mean_tokens"] == 3.0
    assert en["p50_chars"] == 25.0 and en["p90_chars"] == 37.0
    assert en["doc_share"] == 4 / 5 and en["token_share"] == 12 / 14
    de = rows[("de", "books")]
    assert de["n_docs"] == 1 and de["total_tokens"] == 2
    assert de["p50_chars"] == 99.0 and de["p90_chars"] == 99.0


def test_zipf_audit_head(spark, docs_dir):
    rows = t16_zipf_audit(spark, docs_dir).collect()
    # counts: a=6 b=3 c=2 d=1 x=1 y=1; ties break by token asc
    head = [(r["rank"], r["token"], r["cnt"]) for r in rows]
    assert head == [
        (1, "a", 6),
        (2, "b", 3),
        (3, "c", 2),
        (4, "d", 1),
        (5, "x", 1),
        (6, "y", 1),
    ]
    by_tok = {r["token"]: r for r in rows}
    assert by_tok["b"]["zipf_product"] == 6  # rank 2 x count 3
    assert by_tok["a"]["share"] == 6 / 14


@pytest.fixture(scope="module")
def emb_dir(spark, tmp_path_factory):
    """embeddings.parquet where label and bucket prune independently."""
    rows = [
        # q0 and v1: same label, same all-positive sign bucket (15)
        (0, [1.0, 1.0, 1.0, 1.0], 0),
        (1, [2.0, 2.0, 2.0, 2.0], 0),
        # v2: same bucket, DIFFERENT label -> must be label-pruned
        (2, [1.0, 1.0, 1.0, 0.9], 1),
        # v3: same label, different bucket (first coord negative)
        (3, [-1.0, 1.0, 1.0, 1.0], 0),
    ]
    df = spark.createDataFrame(
        rows, "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT"
    )
    out = str(tmp_path_factory.mktemp("emb_r5b"))
    df.coalesce(1).write.parquet(f"{out}/embeddings.parquet")
    return out


def test_filtered_ann_prunes_by_label_and_bucket(spark, emb_dir):
    rows = s13_filtered_ann(spark, emb_dir).collect()
    q0 = [r for r in rows if r["query_id"] == 0]
    # v2 (wrong label) and v3 (wrong bucket) are both pruned pre-search
    assert [r["neighbor_id"] for r in q0] == [1]
    assert q0[0]["cosine"] == 1.0 and q0[0]["label"] == 0
    # pre-filtering means NO cross-label row anywhere in the output
    for r in rows:
        assert r["label"] == {0: 0, 1: 0, 2: 1, 3: 0}[r["query_id"]]
