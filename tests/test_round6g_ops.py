"""Crafted-case semantics for the round-6 seventh wave (d26 cluster-size
census, t25 code detection, c21 context-length sweep, e35 seasonal
anomaly): planted inputs with hand-computable answers, plus the
executed-plan pins for each op's scale-shape claim."""

from __future__ import annotations

import datetime as dt
import math

import pytest

from tests.conftest import SF_SMOKE

DOCS_SCHEMA = "doc_id BIGINT, text STRING, n_chars BIGINT"


def _write_docs(spark, tmp_path, rows):
    df = spark.createDataFrame(rows, DOCS_SCHEMA)
    out = str(tmp_path / "docs")
    df.coalesce(1).write.parquet(f"{out}/documents.parquet")
    return out


@pytest.fixture(autouse=True)
def _release(spark):
    yield
    from floorist_spark.operators._cache import release_caches

    release_caches()


def test_d26_buckets_savings_and_cumulative_head(spark, tmp_path):
    from floorist_spark.operators.dedup import d26_cluster_size_census

    rows = [
        # cluster A: 5 copies -> bucket 2 [4,7]; keeper is doc 1 (11 chars)
        (1, "dup dup dup", 11),
        (2, "dup dup dup", 13),
        (3, "dup dup dup", 17),
        (4, "dup dup dup", 19),
        (5, "dup dup dup", 23),
        # cluster B: 2 copies -> bucket 1 [2,3]; keeper is doc 6 (9 chars)
        (6, "pair text", 9),
        (7, "pair text", 10),
        # three singletons -> bucket 0 [1,1]
        (8, "alpha words", 5),
        (9, "bravo words", 6),
        (10, "charlie words", 7),
    ]
    out = _write_docs(spark, tmp_path, rows)
    got = {r["bucket"]: r for r in d26_cluster_size_census(spark, out).collect()}
    assert set(got) == {0, 1, 2}

    b2 = got[2]
    assert (b2["copies_lo"], b2["copies_hi"]) == (4, 7)
    assert b2["n_clusters"] == 1
    assert b2["n_docs"] == 5
    assert b2["n_dup_docs"] == 4
    assert b2["chars_total"] == 11 + 13 + 17 + 19 + 23  # 83
    assert b2["chars_dup"] == 83 - 11  # everything but the keeper
    assert b2["cum_dup_docs"] == 4  # head of the curve: largest bucket only
    assert b2["cum_chars_dup"] == 72

    b1 = got[1]
    assert (b1["copies_lo"], b1["copies_hi"]) == (2, 3)
    assert b1["n_clusters"] == 1
    assert b1["n_docs"] == 2
    assert b1["n_dup_docs"] == 1
    assert b1["chars_total"] == 19
    assert b1["chars_dup"] == 19 - 9
    assert b1["cum_dup_docs"] == 4 + 1
    assert b1["cum_chars_dup"] == 72 + 10

    b0 = got[0]
    assert (b0["copies_lo"], b0["copies_hi"]) == (1, 1)
    assert b0["n_clusters"] == 3
    assert b0["n_docs"] == 3
    assert b0["n_dup_docs"] == 0
    assert b0["chars_total"] == 18
    assert b0["chars_dup"] == 0
    assert b0["cum_dup_docs"] == 5  # tail adds nothing
    assert b0["cum_chars_dup"] == 82

    corpus_docs, corpus_chars = 10, 83 + 19 + 18
    assert b2["doc_frac"] == 5 / corpus_docs
    assert b2["dup_char_frac"] == 72 / corpus_chars
    assert b0["dup_char_frac"] == 0.0


def test_d26_normalization_folds_case_and_whitespace(spark, tmp_path):
    """The census runs on the NORMALIZED digest (d02 semantics): copies
    differing only in case/whitespace land in one cluster."""
    from floorist_spark.operators.dedup import d26_cluster_size_census

    rows = [
        (1, "Same   Text", 11),
        (2, "same text", 9),
        (3, "SAME TEXT ", 10),
    ]
    out = _write_docs(spark, tmp_path, rows)
    got = {r["bucket"]: r for r in d26_cluster_size_census(spark, out).collect()}
    assert set(got) == {1}
    assert got[1]["n_clusters"] == 1
    assert got[1]["n_docs"] == 3
    assert got[1]["chars_dup"] == (11 + 9 + 10) - 11  # keeper is doc 1


def test_d26_mass_duplicated_corpus_lands_in_one_high_bucket(spark, tmp_path):
    """20k identical docs -> one cluster in bucket 14 [16384, 32767];
    savings = (n-1) x chars; the hot digest key never pairs (single
    aggregate row), so the op is skew-immune by construction."""
    from floorist_spark.operators.dedup import d26_cluster_size_census

    n = 20_000
    rows = [(i, "mass duplicated payload", 23) for i in range(n)]
    rows += [(n + 1, "lonely document", 15)]
    out = _write_docs(spark, tmp_path, rows)
    got = {r["bucket"]: r for r in d26_cluster_size_census(spark, out).collect()}
    assert set(got) == {0, 14}
    hot = got[14]
    assert hot["n_clusters"] == 1
    assert hot["n_docs"] == n
    assert hot["n_dup_docs"] == n - 1
    assert hot["chars_dup"] == (n - 1) * 23
    assert hot["cum_dup_docs"] == n - 1
    assert got[0]["cum_dup_docs"] == n - 1


def test_d26_exchanges_carry_digests_not_text(spark):
    from floorist_spark.operators.dedup import d26_cluster_size_census

    df = d26_cluster_size_census(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # the corpus-totals side rides a broadcast, not a shuffle join
    assert "BroadcastNestedLoopJoin" in plan
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "text#" not in line and "nrm#" not in line, line


# -- t25: code-vs-prose detection ---------------------------------------------


def test_t25_python_shaped_doc_flags_via_indent_and_keywords(spark, tmp_path):
    from floorist_spark.operators.text import t25_code_detect

    code = "def f(x):\n  return x + 1\n\nimport os\n  y = f(2);\n"
    rows = [(1, code, 0)]
    out = _write_docs(spark, tmp_path, rows)
    r = t25_code_detect(spark, out).collect()[0]
    # lines: ["def f(x):", "  return x + 1", "", "import os",
    #         "  y = f(2);", ""]
    assert r["n_lines"] == 6
    assert r["n_semi"] == 1
    assert r["n_punct"] == 5  # ( ) in line 1; = ( ) in line 5
    assert r["indent_lines"] == 2
    assert r["kw_hits"] == 3  # "def ", "return ", "import "
    assert r["punct_per_line"] == 6 / 6
    assert r["indent_frac"] == 2 / 6
    # indent path: frac >= 0.25 and kw_hits >= 2
    assert bool(r["looks_code"]) is True


def test_t25_punct_density_path_and_prose_negative(spark, tmp_path):
    from floorist_spark.operators.text import t25_code_detect

    rows = [
        # dense statement punctuation, zero keywords -> punct path
        (1, "a=1;b=2;c=3;", 0),
        # plain prose -> everything near zero
        (2, "This is a plain sentence about nothing in particular.", 0),
        # a stray prose "return " alone (kw_hits 1 < 2) must not flip it
        (3, "  We return to the topic.\n  More prose here.", 0),
        # empty text is total: one line, all counters zero
        (4, "", 0),
        (5, None, 0),
    ]
    out = _write_docs(spark, tmp_path, rows)
    got = {r["doc_id"]: r for r in t25_code_detect(spark, out).collect()}
    assert got[1]["n_semi"] == 3
    assert got[1]["n_punct"] == 3
    assert got[1]["punct_per_line"] == 6.0
    assert bool(got[1]["looks_code"]) is True
    assert bool(got[2]["looks_code"]) is False
    # doc 3: indent_frac = 1.0 but only one keyword hit
    assert got[3]["indent_lines"] == 2
    assert got[3]["kw_hits"] == 1
    assert bool(got[3]["looks_code"]) is False
    for d in (4, 5):
        assert got[d]["n_lines"] == 1
        assert got[d]["n_semi"] == 0
        assert bool(got[d]["looks_code"]) is False


def test_t25_is_a_pure_projection(spark):
    from floorist_spark.operators.text import t25_code_detect

    plan = (
        t25_code_detect(spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 0
    assert "Join" not in plan
    assert "Generate" not in plan


# -- c21: context-length padding/split sweep ----------------------------------


def test_c21_exact_padding_and_split_accounting(spark, tmp_path):
    from floorist_spark.operators.curation import CTX_WIDTHS, c21_ctx_length_sweep

    assert CTX_WIDTHS[0] == 256
    rows = [
        (1, " ".join(["tok"] * 100), 0),
        (2, " ".join(["tok"] * 300), 0),
        (3, "tok", 0),
    ]
    out = _write_docs(spark, tmp_path, rows)
    got = {r["ctx_len"]: r for r in c21_ctx_length_sweep(spark, out).collect()}
    assert set(got) == set(CTX_WIDTHS)

    r256 = got[256]
    assert r256["n_docs"] == 3
    assert r256["total_tokens"] == 401
    # chunks: ceil(100/256)=1, ceil(300/256)=2, ceil(1/256)=1
    assert r256["n_chunks"] == 4
    assert r256["pad_tokens"] == (256 - 100) + (2 * 256 - 300) + (256 - 1)
    assert r256["n_split_docs"] == 1
    assert r256["pad_frac"] == r256["pad_tokens"] / (4 * 256)
    assert r256["split_frac"] == 1 / 3

    r512 = got[512]
    assert r512["n_chunks"] == 3
    assert r512["pad_tokens"] == (512 - 100) + (512 - 300) + (512 - 1)
    assert r512["n_split_docs"] == 0
    assert r512["split_frac"] == 0.0

    # monotonicity across the sweep: pad never decreases with width once
    # nothing splits; splits never increase with width
    widths = sorted(CTX_WIDTHS)
    for a, b in zip(widths, widths[1:]):
        assert got[a]["n_split_docs"] >= got[b]["n_split_docs"]
        assert got[a]["n_chunks"] >= got[b]["n_chunks"]


def test_c21_single_corpus_scan_and_tiny_shuffle(spark):
    from floorist_spark.operators.curation import c21_ctx_length_sweep

    df = c21_ctx_length_sweep(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # tokenizer runs before the width fan-out: ONE scan of documents
    assert plan.count("FileScan parquet") == 1
    # the only exchange is the 5-group aggregate on ctx_len
    assert "Join" not in plan
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "text#" not in line and "ctx_len" in line, line


# -- e35: seasonally-adjusted anomaly -----------------------------------------


def test_e35_planted_spike_dominates_and_flat_cells_are_filtered(
    spark, tmp_path
):
    from floorist_spark.operators.events_analytics import e35_seasonal_anomaly

    # three exact weeks starting on a Sunday 00:00; one event per hour,
    # plus 9 extra in week 1 at hour-of-week cell 40 -> that cell's
    # counts are [1, 10, 1]: n=3, s=12, ss=102, mean=4, var=34-16=18.
    # Every other cell is [1,1,1] (variance 0 -> exact-filtered).
    base = dt.datetime(2024, 6, 2)  # a Sunday
    rows = []
    eid = 0
    for w in range(3):
        for c in range(168):
            ts = base + dt.timedelta(hours=w * 168 + c)
            n = 10 if (w == 1 and c == 40) else 1
            for _ in range(n):
                eid += 1
                rows.append((eid, ts, 1, "view", 0.0))
    df = spark.createDataFrame(
        rows,
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
        "event_type STRING, value DOUBLE",
    )
    out = str(tmp_path / "ev")
    df.coalesce(1).write.parquet(f"{out}/events.parquet")

    got = e35_seasonal_anomaly(spark, out).collect()
    # only cell 40's three hours survive the variance filter
    assert len(got) == 3
    assert all(r["cell"] == 40 for r in got)
    top = got[0]
    assert top["n_events"] == 10
    assert top["cell_mean"] == 4.0
    assert top["z"] == 6 / math.sqrt(18.0)
    for r in got[1:]:
        assert r["n_events"] == 1
        assert r["z"] == -3 / math.sqrt(18.0)
    # ranked by |z| desc then hour: the two -0.707 hours in time order
    assert got[1]["hour"] < got[2]["hour"]


# -- d27: Jaccard-threshold operating-point sweep -----------------------------


def test_d27_mid_jaccard_pair_crosses_only_low_thresholds(spark, tmp_path):
    """A planted prefix pair whose exact shingle Jaccard lands in
    [0.75, 0.80) — counted at tau 0.70/0.75, absent at 0.80+ — plus a
    disjoint doc that never pairs. Seeded construction verified to be
    surfaced by the LSH bands (81/104-char prefix: j ~ 77/100)."""
    import random
    import string

    from floorist_spark.operators.dedup import d27_threshold_sweep

    rng = random.Random()
    rng.seed(7)
    base = "".join(rng.choice(string.ascii_lowercase) for _ in range(104))
    prefix = base[:81]
    other = "".join(rng.choice(string.ascii_lowercase) for _ in range(80))
    rows = [(1, base, 0), (2, prefix, 0), (3, other, 0)]
    out = _write_docs(spark, tmp_path, rows)
    got = {r["tau"]: r for r in d27_threshold_sweep(spark, out).collect()}
    assert sorted(got) == [0.70, 0.75, 0.80, 0.85, 0.90]
    for tau in (0.70, 0.75):
        r = got[tau]
        assert r["n_pairs"] == 1
        assert r["n_docs_in_pairs"] == 2
        assert r["n_droppable"] == 1  # doc 2, the higher id of the pair
        assert r["survivors"] == 2
        assert r["drop_frac"] == 1 / 3
    for tau in (0.80, 0.85, 0.90):
        r = got[tau]
        assert r["n_pairs"] == 0
        assert r["n_docs_in_pairs"] == 0
        assert r["n_droppable"] == 0
        assert r["survivors"] == 3  # empty thresholds keep their row
        assert r["drop_frac"] == 0.0


def test_d27_exact_duplicates_count_at_every_threshold(spark, tmp_path):
    from floorist_spark.operators.dedup import d27_threshold_sweep

    rows = [
        (1, "identical payload text here", 0),
        (2, "identical payload text here", 0),
        (3, "completely different content", 0),
    ]
    out = _write_docs(spark, tmp_path, rows)
    got = {r["tau"]: r for r in d27_threshold_sweep(spark, out).collect()}
    # identical docs share every band signature: candidate with j = 1.0
    for r in got.values():
        assert r["n_pairs"] == 1
        assert r["n_droppable"] == 1
        assert r["survivors"] == 2


def test_d27_fanout_multiplies_candidates_not_corpus(spark):
    from floorist_spark.operators.dedup import d27_threshold_sweep

    df = d27_threshold_sweep(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # corpus totals ride a broadcast; no text column in any exchange
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "text#" not in line and "nrm#" not in line, line


# -- m18: caption-rate audit --------------------------------------------------


def test_m18_flags_match_python_reference_and_skip_non_audio(spark, tmp_path):
    """25 audio-slot docs with varied caption lengths; expected wps and
    rank-based flags replicated in pure Python (durations via the same
    md5 intrinsic as m02); non-audio slots must not appear."""
    import hashlib

    from floorist_spark.operators.multimodal import (
        M18_TOP_K,
        m18_caption_rate_audit,
    )

    audio_ids = [3 * i + 1 for i in range(25)]
    rows = [(i, " ".join(["w"] * (5 + 7 * k)), 0) for k, i in enumerate(audio_ids)]
    rows += [(0, "image slot doc", 0), (2, "video slot doc", 0)]
    out = _write_docs(spark, tmp_path, rows)

    exp = {}
    for k, i in enumerate(audio_ids):
        text = " ".join(["w"] * (5 + 7 * k))
        dur = int(hashlib.md5(text.encode()).hexdigest()[:4], 16) % 3600 + 1
        exp[i] = (5 + 7 * k, dur, (5 + 7 * k) / dur)
    wps_sorted = sorted(exp.items(), key=lambda kv: (-kv[1][2], kv[0]))
    kth_hi = wps_sorted[M18_TOP_K - 1][1][2]
    wps_asc = sorted(exp.items(), key=lambda kv: (kv[1][2], kv[0]))
    kth_lo = wps_asc[M18_TOP_K - 1][1][2]

    got = {r["doc_id"]: r for r in m18_caption_rate_audit(spark, out).collect()}
    assert set(got) == set(audio_ids)  # image/video slots excluded
    for i, (ntok, dur, wps) in exp.items():
        r = got[i]
        assert r["n_tokens"] == ntok
        assert r["duration_s"] == dur
        assert r["wps"] == wps
        want = (
            "too_fast"
            if wps >= kth_hi
            else ("too_slow" if wps <= kth_lo else "ok")
        )
        assert r["flag"] == want, (i, wps, kth_hi, kth_lo)
    flags = [r["flag"] for r in got.values()]
    assert flags.count("too_fast") == M18_TOP_K
    assert flags.count("too_slow") == M18_TOP_K
    assert flags.count("ok") == 5


def test_m18_kth_probes_are_takeordered_with_broadcast_back(spark):
    from floorist_spark.operators.multimodal import m18_caption_rate_audit

    df = m18_caption_rate_audit(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastNestedLoopJoin" in plan  # 1-row threshold sides
    assert "CartesianProduct" not in plan
    # no global window: the flags come from broadcast Kth values
    assert "Window" not in plan


# -- q42: full outer join with null-side accounting ---------------------------


def test_q42_all_three_match_classes_on_planted_tables(spark, tmp_path):
    from floorist_spark.operators.relational import q42_full_outer_join

    # customers 1-3 positive balance (in scope), 4 negative (excluded ->
    # its orders become right_only); customer 3 has no orders (left_only)
    cust = spark.createDataFrame(
        [(1, 10.0), (2, 5.0), (3, 1.0), (4, -2.0)],
        "c_custkey BIGINT, c_acctbal DOUBLE",
    )
    orders = spark.createDataFrame(
        [(100, 1), (101, 1), (102, 2), (103, 4)],
        "o_orderkey BIGINT, o_custkey BIGINT",
    )
    out = str(tmp_path / "t")
    cust.coalesce(1).write.parquet(f"{out}/customer.parquet")
    orders.coalesce(1).write.parquet(f"{out}/orders.parquet")

    got = {r["match_type"]: r for r in q42_full_outer_join(spark, out).collect()}
    assert set(got) == {"both", "left_only", "right_only"}
    b = got["both"]
    assert (b["n_rows"], b["total_orders"]) == (2, 3)  # cust 1 (2) + 2 (1)
    assert (b["min_custkey"], b["max_custkey"]) == (1, 2)
    lo = got["left_only"]
    assert (lo["n_rows"], lo["total_orders"]) == (1, 0)  # customer 3
    assert (lo["min_custkey"], lo["max_custkey"]) == (3, 3)
    ro = got["right_only"]
    assert (ro["n_rows"], ro["total_orders"]) == (1, 1)  # excluded cust 4
    assert (ro["min_custkey"], ro["max_custkey"]) == (4, 4)


# -- s21: embedding-hygiene audit ---------------------------------------------


def test_s21_planted_zero_dup_and_conflict_vectors(spark, tmp_path):
    from floorist_spark.operators.similarity import s21_embedding_hygiene

    rows = [
        # label 0: a 3-4-5 vector twice (within-label dup, also crosses
        # into label 1), and the zero vector
        (1, [3.0, 4.0], 0),
        (2, [3.0, 4.0], 0),
        (3, [0.0, 0.0], 0),
        # label 1: one clean vector and one copy of label 0's dup
        (4, [6.0, 8.0], 1),
        (5, [3.0, 4.0], 1),
    ]
    df = spark.createDataFrame(
        rows, "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT"
    )
    out = str(tmp_path / "emb")
    df.coalesce(1).write.parquet(f"{out}/embeddings.parquet")

    got = {r["label"]: r for r in s21_embedding_hygiene(spark, out).collect()}
    assert set(got) == {0, 1}

    l0 = got[0]
    assert l0["n_vecs"] == 3
    assert l0["n_zero_norm"] == 1
    assert l0["n_dup_vecs"] == 2  # both copies of [3,4]
    assert l0["n_conflict_vecs"] == 2  # [3,4] also lives under label 1
    assert l0["min_norm"] == 0.0
    # norms sorted: 0, 5, 5 -> rank (3+1)//2 = 2 -> 5.0
    assert l0["median_norm"] == 5.0
    assert l0["max_norm"] == 5.0

    l1 = got[1]
    assert l1["n_vecs"] == 2
    assert l1["n_zero_norm"] == 0
    assert l1["n_dup_vecs"] == 0  # no within-label copy
    assert l1["n_conflict_vecs"] == 1  # its [3,4] row
    assert (l1["min_norm"], l1["max_norm"]) == (5.0, 10.0)
    # rank (2+1)//2 = 1 -> the smaller norm
    assert l1["median_norm"] == 5.0


def test_s21_value_join_is_one_row_per_distinct_value(spark):
    from floorist_spark.operators.similarity import s21_embedding_hygiene

    df = s21_embedding_hygiene(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # both flag aggregates are hash aggregates with map-side partials,
    # and the final stats/flags join keys on the tiny label column
    assert "HashAggregate" in plan


def test_e35_single_corpus_scan_with_broadcast_moments(spark):
    from floorist_spark.operators.events_analytics import e35_seasonal_anomaly

    df = e35_seasonal_anomaly(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # hourly rollup feeds both moments and scoring; the cell-moments
    # side rides a broadcast hash join, and the top-K is TakeOrdered,
    # not a global sort of the corpus
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    # ONE corpus scan: bounds and scoring both read the PERSISTED hourly
    # rollup (every reference is an InMemoryTableScan — the raw FileScan
    # appears only inside the printed cached subtree, the e14 replay
    # lesson). Four references: bounds->calendar and the rollup join
    # side, each under the twice-expanded hourly subtree.
    assert plan.count("InMemoryTableScan") >= 2
