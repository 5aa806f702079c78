"""Crafted-case semantics for the sketch/filter operators (e20 HLL, e21
count-min, t13 Gopher rules, c11 Bloom decontamination) — the oracle gate
pins Spark==DuckDB; these pin the INTENT against independent Python
reimplementations and planted inputs."""

from __future__ import annotations

import datetime as dt
import hashlib

import pytest

from floorist_spark.operators.curation import (
    c05_decontamination,
    c11_bloom_decontaminate,
)
from floorist_spark.operators.events_analytics import (
    _CMS_TOP,
    _HLL_M,
    _HLL_WBITS,
    e20_hll_distinct,
    e21_cms_heavy_hitters,
)
from floorist_spark.operators.text import t13_gopher_rules
from tests.conftest import SF_SMOKE


# -- e20: full Python reimplementation on a crafted corpus -------------------


def _base_hash(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:7], 16)


def _rank(w: int) -> int:
    for j in range(1, _HLL_WBITS + 1):
        if w % (1 << j) == 1 << (j - 1):
            return j
    return _HLL_WBITS + 1


@pytest.fixture(scope="module")
def hll_events_dir(spark, tmp_path_factory):
    """40 distinct users, one event each, one type — the register state is
    fully determined by the md5 family, so the exact estimate is
    recomputable in pure Python."""
    base = dt.datetime(2024, 5, 1)
    rows = [
        (u, base + dt.timedelta(minutes=u), u, "view", 1.0, "{}")
        for u in range(1, 41)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, "
        "value DOUBLE, props STRING",
    )
    out = str(tmp_path_factory.mktemp("ev_hll"))
    df.coalesce(1).write.parquet(f"{out}/events.parquet")
    return out


def test_hll_matches_python_reimplementation(spark, hll_events_dir):
    [row] = e20_hll_distinct(spark, hll_events_dir).collect()
    regs: dict[int, int] = {}
    for u in range(1, 41):
        h = _base_hash(f"hll:{u}")
        reg, w = h % _HLL_M, h // _HLL_M
        regs[reg] = max(regs.get(reg, 0), _rank(w))
    s = sum(2.0 ** -m for m in regs.values()) + (_HLL_M - len(regs))
    expected = (0.709 * 4096.0) / s
    assert row["exact_distinct"] == 40
    assert row["zero_registers"] == _HLL_M - len(regs)
    assert row["hll_estimate"] == pytest.approx(expected, rel=1e-12)
    # 40 distinct « 2.5·m = 160 is the small-range regime where the raw
    # alpha·m²/S estimate is biased high BY DESIGN (the operator skips the
    # ln()-based correction because ln is not correctly-rounded-pinned
    # cross-engine). zero_registers exists exactly so a consumer can apply
    # linear counting: E = m·ln(m/V) — verify THAT estimator lands close.
    import math

    lc = _HLL_M * math.log(_HLL_M / row["zero_registers"])
    assert abs(lc - 40) / 40 < 0.25


def test_hll_register_sum_is_exact_any_order(spark, hll_events_dir):
    """The double register sum must be exact (every addend is a power of
    two spanning < 53 exponent bits) — re-running the operator yields the
    bit-identical estimate regardless of partition scheduling."""
    a = e20_hll_distinct(spark, hll_events_dir).collect()[0]["hll_estimate"]
    b = e20_hll_distinct(spark, hll_events_dir).collect()[0]["hll_estimate"]
    assert a == b


# -- e21: one-sided error + planted heavy hitter -----------------------------


@pytest.fixture(scope="module")
def cms_events_dir(spark, tmp_path_factory):
    """User 999 owns 50 events; users 1..30 one each — 999 must surface as
    the top estimated heavy hitter."""
    base = dt.datetime(2024, 5, 1)
    rows = [
        (i, base + dt.timedelta(minutes=i), 999, "view", 1.0, "{}")
        for i in range(50)
    ] + [
        (100 + u, base + dt.timedelta(minutes=u), u, "view", 1.0, "{}")
        for u in range(1, 31)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, "
        "value DOUBLE, props STRING",
    )
    out = str(tmp_path_factory.mktemp("ev_cms"))
    df.coalesce(1).write.parquet(f"{out}/events.parquet")
    return out


def test_cms_one_sided_and_planted_heavy_hitter(spark, cms_events_dir):
    rows = e21_cms_heavy_hitters(spark, cms_events_dir).collect()
    assert 0 < len(rows) <= _CMS_TOP
    # CMS never underestimates (one-sided error)
    assert all(r["overestimate"] >= 0 for r in rows)
    assert all(r["cms_estimate"] >= r["exact_count"] for r in rows)
    # the planted heavy hitter is the top row
    top = rows[0]
    assert top["user_id"] == 999
    assert top["exact_count"] == 50
    assert top["cms_estimate"] >= 50


def test_cms_one_sided_on_real_data(spark):
    rows = e21_cms_heavy_hitters(spark, SF_SMOKE).collect()
    assert all(r["overestimate"] >= 0 for r in rows)


# -- t13: each rule trips on its engineered document -------------------------


@pytest.fixture(scope="module")
def gopher_docs_dir(spark, tmp_path_factory):
    rows = [
        (1, "short doc"),  # 2 words -> fails word count
        # 25 words but every word is 12+ chars -> mean word length > 10
        (2, " ".join(["extraordinarily"] * 25)),
        # 25 numeric tokens -> alpha fraction 0
        (3, " ".join(str(1000 + i) for i in range(25))),
        # healthy: 30 ordinary words
        (4, " ".join(["plain", "words", "about", "data", "systems"] * 6)),
        # boundary: alpha_frac exactly 0.8 passes (>= threshold); 20 words
        (5, " ".join(["word"] * 16 + ["1234"] * 4)),
    ]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    out = str(tmp_path_factory.mktemp("docs_gopher"))
    df.coalesce(1).write.parquet(f"{out}/documents.parquet")
    return out


def test_gopher_rules_flag_each_failure_mode(spark, gopher_docs_dir):
    got = {r["doc_id"]: r for r in t13_gopher_rules(spark, gopher_docs_dir).collect()}
    assert got[1]["pass_word_count"] == 0 and got[1]["keep"] == 0
    assert got[2]["pass_mean_len"] == 0 and got[2]["keep"] == 0
    assert got[2]["pass_word_count"] == 1
    assert got[3]["pass_alpha"] == 0 and got[3]["keep"] == 0
    assert got[4] is not None
    assert (
        got[4]["pass_word_count"]
        == got[4]["pass_mean_len"]
        == got[4]["pass_alpha"]
        == got[4]["keep"]
        == 1
    )
    assert got[5]["alpha_frac"] == 0.8 and got[5]["pass_alpha"] == 1


# -- c11: Bloom one-sided error + agreement with the exact join (c05) --------


def test_bloom_never_misses_and_counts_false_positives(spark):
    bloom = {r["doc_id"]: r for r in c11_bloom_decontaminate(spark, SF_SMOKE).collect()}
    exact = {r["doc_id"]: r for r in c05_decontamination(spark, SF_SMOKE).collect()}
    assert set(bloom) == set(exact)
    for doc_id, b in bloom.items():
        e = exact[doc_id]
        # same train-side n-gram universe as the exact operator
        assert b["n_ngrams"] == e["n_ngrams"]
        # the Bloom exact-audit column IS the c05 exact count
        assert b["n_exact_hits"] == e["n_contaminated"]
        # one-sided error: every exact hit is a Bloom hit
        assert b["n_bloom_hits"] >= b["n_exact_hits"]
        assert b["n_false_pos"] == b["n_bloom_hits"] - b["n_exact_hits"]
    # the deliberately-small filter must actually produce false positives
    # somewhere on the smoke corpus (otherwise the audit columns are dead)
    assert any(b["n_false_pos"] > 0 for b in bloom.values())
