"""Crafted-case semantics tests for the funnel (e09) and retention (e10)
operators — the oracle-parity gate pins Spark==DuckDB on the synthetic
corpus, but not the INTENT; these cases pin the strict-ordering rules on
inputs engineered to hit every edge."""

from __future__ import annotations

import datetime as dt

import pytest

from floorist_spark.operators.events_analytics import e09_funnel, e10_retention


def _ts(day: int, hour: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, 1 + day, hour, 0, 0)


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """events.parquet with one user per funnel edge case."""
    rows = [
        # u1: full ordered funnel
        (1, _ts(0, 1), 1, "view"),
        (2, _ts(0, 2), 1, "click"),
        (3, _ts(0, 3), 1, "purchase"),
        # u2: click BEFORE the first view only -> stage 1
        (4, _ts(0, 1), 2, "click"),
        (5, _ts(0, 2), 2, "view"),
        # u3: purchase after view but NO click -> stage 1 (strict order)
        (6, _ts(0, 1), 3, "view"),
        (7, _ts(0, 2), 3, "purchase"),
        # u4: click at the SAME instant as the view -> not strictly after
        (8, _ts(0, 1), 4, "view"),
        (9, _ts(0, 1), 4, "click"),
        # u5: never views -> absent from the funnel entirely
        (10, _ts(0, 1), 5, "click"),
        (11, _ts(0, 2), 5, "purchase"),
        # u6: retries — earliest qualifying event wins at each stage
        (12, _ts(0, 1), 6, "view"),
        (13, _ts(0, 2), 6, "click"),
        (14, _ts(0, 3), 6, "click"),
        (15, _ts(0, 4), 6, "purchase"),
        # u6 activity two days later (retention offset 2)
        (16, _ts(2, 1), 6, "view"),
    ]
    df = spark.createDataFrame(
        rows, "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING"
    )
    out = str(tmp_path_factory.mktemp("events_sem"))
    df.coalesce(1).write.parquet(f"{out}/events.parquet")
    return out


def test_funnel_strict_ordering(spark, events_dir):
    got = {
        r["user_id"]: r for r in e09_funnel(spark, events_dir).collect()
    }
    assert set(got) == {1, 2, 3, 4, 6}  # u5 never viewed
    assert got[1]["funnel_stage"] == 3
    assert got[2]["funnel_stage"] == 1 and got[2]["t_click"] is None
    assert got[3]["funnel_stage"] == 1 and got[3]["t_purchase"] is None
    assert got[4]["funnel_stage"] == 1  # same-instant click is not "after"
    assert got[6]["funnel_stage"] == 3
    assert got[6]["t_click"] == _ts(0, 2)  # earliest qualifying click
    assert got[1]["t_view"] == _ts(0, 1)


def test_retention_offsets(spark, events_dir):
    cells = {
        (r["cohort_day"], r["day_offset"]): r["active_users"]
        for r in e10_retention(spark, events_dir).collect()
    }
    # every user is in the day-0 cohort; all 6 active at offset 0
    assert cells[(dt.date(2024, 1, 1), 0)] == 6
    # only u6 returns two days later
    assert cells[(dt.date(2024, 1, 1), 2)] == 1
    assert set(cells) == {(dt.date(2024, 1, 1), 0), (dt.date(2024, 1, 1), 2)}
