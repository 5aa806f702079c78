"""Crafted-case semantics tests for the second round-5 analytics batch
(e25 attribution, t17 token diversity, s14 index health, c14 epoch
allocation, d16 soft-dedup weights) — the oracle gate pins Spark==DuckDB;
these pin the INTENT on inputs engineered to hit each rule."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from floorist_spark.operators.curation import c14_epoch_allocation
from floorist_spark.operators.dedup import d16_soft_dedup_weights
from floorist_spark.operators.events_analytics import e25_attribution
from floorist_spark.operators.similarity import s14_index_health
from floorist_spark.operators.text import t17_token_diversity


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """Events covering every e25 attribution branch."""
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        # u1: view then click then purchase -> LAST touch (click) wins,
        # delay exactly 90 s
        (1, t0, 1, "view"),
        (2, t0 + dt.timedelta(seconds=60), 1, "click"),
        (3, t0 + dt.timedelta(seconds=150), 1, "purchase"),
        # u2: purchase with no prior touch at all -> 'none' (the later
        # view must NOT attribute backwards in time)
        (4, t0, 2, "purchase"),
        (5, t0 + dt.timedelta(hours=1), 2, "view"),
        # u3: only touch is 8 days before the purchase -> 'expired'
        (6, t0, 3, "view"),
        (7, t0 + dt.timedelta(days=8), 3, "purchase"),
        # u4: view exactly at the 7-day boundary -> still attributed
        # (<= lookback), delay = 7 days
        (8, t0, 4, "view"),
        (9, t0 + dt.timedelta(days=7), 4, "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING"
    )
    out = str(tmp_path_factory.mktemp("events_r5c"))
    df.coalesce(1).write.parquet(f"{out}/events.parquet")
    return out


def test_attribution_channels(spark, events_dir):
    got = {r["channel"]: r for r in e25_attribution(spark, events_dir).collect()}
    assert set(got) == {"click", "view", "none", "expired"}
    assert got["click"]["n_conversions"] == 1
    assert got["click"]["avg_delay_s"] == 90.0
    # u4's boundary purchase: inclusive lookback, 7-day delay
    assert got["view"]["n_conversions"] == 1
    assert got["view"]["avg_delay_s"] == 7 * 86400.0
    # unattributed rows carry NULL delay, not 0
    assert got["none"]["n_conversions"] == 1
    assert got["none"]["total_delay_us"] is None
    assert got["expired"]["n_conversions"] == 1
    assert got["expired"]["avg_delay_s"] is None


@pytest.fixture(scope="module")
def docs_dir(spark, tmp_path_factory):
    rows = [
        (1, "a a b", "en", "web", 5),  # n=3 types=2
        (2, "x x x x", "en", "web", 7),  # fully repetitive
        (3, "p q r s", "de", "web", 7),  # fully diverse
        (4, "", "de", "web", 0),  # empty doc
    ]
    df = spark.createDataFrame(
        rows, "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
    )
    out = str(tmp_path_factory.mktemp("docs_r5c"))
    df.coalesce(1).write.parquet(f"{out}/documents.parquet")
    return out


def test_token_diversity_values(spark, docs_dir):
    got = {r["doc_id"]: r for r in t17_token_diversity(spark, docs_dir).collect()}
    d1 = got[1]
    assert d1["n_tokens"] == 3 and d1["n_types"] == 2
    assert d1["ttr"] == 2 / 3
    # counts 2,1 -> sum2 = 5 -> simpson = 1 - 5/9
    assert d1["simpson"] == 1.0 - 5.0 / 9.0
    # fully repetitive doc: simpson 0 (two draws always equal)
    assert got[2]["simpson"] == 1.0 - 16.0 / 16.0 == 0.0
    # fully diverse doc: simpson = 1 - n/n^2 = 3/4
    assert got[3]["simpson"] == 1.0 - 4.0 / 16.0
    # the catalog tokenizer maps '' to [''] (both engines agree), so an
    # empty doc is ONE empty-string token — degenerate but well-defined,
    # and never the NULL/inf divide the zero-guard protects against
    assert got[4]["n_tokens"] == 1 and got[4]["n_types"] == 1
    assert got[4]["ttr"] == 1.0 and got[4]["simpson"] == 0.0


@pytest.fixture(scope="module")
def emb_dir(spark, tmp_path_factory):
    """Two occupied sign-buckets: one with 3 vectors, one with 1."""
    rows = [
        (0, [1.0] * 8, 0),
        (1, [0.5] * 8, 0),
        (2, [2.0] * 8, 0),
        (3, [-1.0] + [1.0] * 7, 1),
    ]
    df = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT")
    out = str(tmp_path_factory.mktemp("emb_r5c"))
    df.coalesce(1).write.parquet(f"{out}/embeddings.parquet")
    return out


def test_index_health_summary(spark, emb_dir):
    row = s14_index_health(spark, emb_dir).collect()[0]
    assert row["n_buckets"] == 2 and row["n_vectors"] == 4
    assert row["max_bucket"] == 3
    # bucket sizes {1, 3}: interpolated p50 = 2.0, p90 = 2.8
    assert row["p50_bucket"] == 2.0
    assert abs(row["p90_bucket"] - 2.8) < 1e-12
    assert row["mean_occupancy"] == 2.0
    assert row["skew_ratio"] == 1.5
    # pairs: 3*2/2 = 3 from the hot bucket, 0 from the singleton
    assert row["cand_pairs"] == 3
    assert row["top_bucket_pair_share"] == 1.0


@pytest.fixture(scope="module")
def mix_docs_dir(spark, tmp_path_factory):
    """en: 12 tokens (cap slack), de: 1 token (cap binds at 4 epochs)."""
    rows = [
        (1, "w1 w2 w3 w4 w5 w6", "en", "web", 17),
        (2, "w1 w2 w3 w4 w5 w6", "en", "web", 17),
        (3, "solo", "de", "web", 4),
    ]
    df = spark.createDataFrame(
        rows, "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
    )
    out = str(tmp_path_factory.mktemp("mix_r5c"))
    df.coalesce(1).write.parquet(f"{out}/documents.parquet")
    return out


def test_epoch_allocation_cap(spark, mix_docs_dir):
    got = {r["lang"]: r for r in c14_epoch_allocation(spark, mix_docs_dir).collect()}
    # budget = 13 tokens, L = 2 -> ideal 6 each (integer division)
    en, de = got["en"], got["de"]
    assert en["lang_tokens"] == 12 and de["lang_tokens"] == 1
    assert en["ideal_alloc"] == 6 and de["ideal_alloc"] == 6
    # en: cap 4*12 = 48 not binding -> full 6, under one epoch
    assert en["capped_alloc"] == 6 and en["deficit"] == 0
    assert en["epochs"] == 0.5
    # de: cap 4*1 = 4 binds -> 4 allocated, 2 unfilled, exactly MAX_EPOCHS
    assert de["capped_alloc"] == 4 and de["deficit"] == 2
    assert de["epochs"] == 4.0


@pytest.fixture(scope="module")
def dup_docs_dir(spark, tmp_path_factory):
    """Planted near-dup clusters: docs 0-2 identical, 3-4 identical, 5
    unique — 40-word texts so the 5-token shingle chain has material."""
    base = (
        "concat_ws(' ', transform(sequence(1, 40), j -> "
        "substring(md5(concat(CAST({k} AS STRING), ':', CAST(j AS STRING))), 1, 8)))"
    )
    docs = spark.range(6).select(
        F.col("id").alias("doc_id"),
        F.expr(
            f"CASE WHEN id <= 2 THEN {base.format(k=100)} "
            f"WHEN id <= 4 THEN {base.format(k=200)} "
            f"ELSE {base.format(k=300)} END"
        ).alias("text"),
        F.lit("en").alias("lang"),
        F.lit("synthetic").alias("source"),
        F.lit(359).cast("bigint").alias("n_chars"),
    )
    out = str(tmp_path_factory.mktemp("dup_r5c"))
    docs.coalesce(1).write.parquet(f"{out}/documents.parquet")
    return out


def test_soft_dedup_weights(spark, dup_docs_dir):
    got = {r["doc_id"]: r for r in d16_soft_dedup_weights(spark, dup_docs_dir).collect()}
    assert len(got) == 6  # soft dedup DROPS nothing
    for i in (0, 1, 2):
        assert got[i]["cluster_id"] == 0 and got[i]["n_members"] == 3
        assert got[i]["weight"] == 1.0 / 3.0
    for i in (3, 4):
        assert got[i]["cluster_id"] == 3 and got[i]["n_members"] == 2
        assert got[i]["weight"] == 0.5
    assert got[5]["n_members"] == 1 and got[5]["weight"] == 1.0
    # expected training mass per cluster = exactly one document
    assert sum(r["weight"] for r in got.values()) == 3.0


def test_incremental_dedup_arrivals_vs_index(spark, dup_docs_dir):
    from floorist_spark.operators.dedup import d17_incremental_dedup

    rows = {r["doc_id"]: r for r in d17_incremental_dedup(spark, dup_docs_dir).collect()}
    # arrivals are doc_id % 5 == 0 -> docs 0 and 5; the rest is the index
    assert set(rows) == {0, 5}
    # doc0 duplicates indexed docs 1 and 2 (identical text, jaccard 1.0);
    # best match ties break to the LOWEST index id
    assert rows[0]["is_dup"] is True
    assert rows[0]["dup_of"] == 1 and rows[0]["best_jaccard"] == 1.0
    # doc5 is unique -> passes through with NULLs
    assert rows[5]["is_dup"] is False
    assert rows[5]["dup_of"] is None and rows[5]["best_jaccard"] is None


@pytest.fixture(scope="module")
def throttle_events_dir(spark, tmp_path_factory):
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        # u1/click: kept at t0; +1h suppressed; exactly +72h kept again
        (1, t0, 1, "click"),
        (2, t0 + dt.timedelta(hours=1), 1, "click"),
        (3, t0 + dt.timedelta(hours=72), 1, "click"),
        # u1/view: independent key -> kept despite u1/click's cooldown
        (4, t0 + dt.timedelta(hours=1), 1, "view"),
        # u2/click: single event inside the final watermark hold
        # (10 min before max ts) -> must NOT be emitted
        (5, t0 + dt.timedelta(days=30, minutes=-5), 2, "click"),
        # watermark driver: pushes max(ts) so earlier anchors flush
        (6, t0 + dt.timedelta(days=30), 3, "view"),
    ]
    df = spark.createDataFrame(
        rows, "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING"
    )
    out = str(tmp_path_factory.mktemp("thr_r5c"))
    df.coalesce(1).write.parquet(f"{out}/events.parquet")
    return out


def test_alert_throttle_cooldown_and_watermark(spark, throttle_events_dir):
    from floorist_spark.streaming.stateful import e26_alert_throttle

    rows = e26_alert_throttle(spark, throttle_events_dir).collect()
    kept = {(r["user_id"], r["event_type"], r["event_id"]) for r in rows}
    # u1/click: first kept, +1h suppressed, +72h (boundary inclusive) kept
    assert (1, "click", 1) in kept and (1, "click", 3) in kept
    assert (1, "click", 2) not in kept
    # per-key independence
    assert (1, "view", 4) in kept
    # u2's anchor sits above the final watermark (max ts - 10 min): held
    assert (2, "click", 5) not in kept
    # the watermark driver itself is held too (its ts IS max ts)
    assert (3, "view", 6) not in kept


@pytest.fixture(scope="module")
def video_docs_dir(spark, tmp_path_factory):
    from floorist_spark.operators.multimodal import FRAME_CHARS

    # doc1: two IDENTICAL frames -> zero signature delta -> no cut
    # doc2: one frame -> no deltas at all
    # doc3: two frames of unrelated content -> cut iff hamming >= CUT_BITS
    #       (expected value computed in the test with the same public rule)
    rows = [
        (1, "a" * FRAME_CHARS + "a" * FRAME_CHARS, "en", "web", 512),
        (2, "b" * 10, "en", "web", 10),
        (3, "c" * FRAME_CHARS + "d" * FRAME_CHARS, "en", "web", 512),
    ]
    df = spark.createDataFrame(
        rows, "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
    )
    out = str(tmp_path_factory.mktemp("vid_r5c"))
    df.coalesce(1).write.parquet(f"{out}/documents.parquet")
    return out


def test_scene_cuts(spark, video_docs_dir):
    import hashlib

    from floorist_spark.operators.multimodal import (
        CUT_BITS,
        FRAME_CHARS,
        m11_scene_cuts,
    )

    got = {r["doc_id"]: r for r in m11_scene_cuts(spark, video_docs_dir).collect()}
    # identical frames: no cut, one 2-frame shot
    assert got[1]["n_frames"] == 2 and got[1]["n_cuts"] == 0
    assert got[1]["mean_shot_frames"] == 2.0
    assert got[1]["cuts_md5"] == hashlib.md5(b"").hexdigest()
    # single frame: trivially cutless
    assert got[2]["n_frames"] == 1 and got[2]["n_cuts"] == 0
    # unrelated frames: expected from the definition itself
    sig = lambda s: int(hashlib.md5(s.encode()).hexdigest()[:7], 16)
    ham = bin(sig("c" * FRAME_CHARS) ^ sig("d" * FRAME_CHARS)).count("1")
    want = 1 if ham >= CUT_BITS else 0
    assert got[3]["n_cuts"] == want


def test_dup_graph_triangles(spark, dup_docs_dir):
    from floorist_spark.operators.dedup import d18_dup_graph_triangles

    row = d18_dup_graph_triangles(spark, dup_docs_dir).collect()[0]
    # cluster {0,1,2} -> 3 edges + 1 triangle; cluster {3,4} -> 1 edge
    assert row["n_edges"] == 4
    # degrees 2,2,2,1,1 -> wedges = 3x1
    assert row["n_wedges"] == 3
    assert row["n_triangles"] == 1
    # the triangle closes every wedge: perfect clique cohesion
    assert row["clustering_coeff"] == 1.0


def test_scene_cuts_empty_doc_survives(spark, tmp_path_factory):
    import hashlib

    from floorist_spark.operators.multimodal import m11_scene_cuts

    rows = [(1, "", "en", "web", 0), (2, "x" * 10, "en", "web", 10)]
    df = spark.createDataFrame(
        rows, "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
    )
    out = str(tmp_path_factory.mktemp("vid_empty_r5c"))
    df.coalesce(1).write.parquet(f"{out}/documents.parquet")
    got = {r["doc_id"]: r for r in m11_scene_cuts(spark, out).collect()}
    # the zero-frame doc is EMITTED, not dropped (oracle LEFT JOINs to match)
    assert got[1]["n_frames"] == 0 and got[1]["n_cuts"] == 0
    assert got[1]["mean_shot_frames"] is None
    assert got[1]["cuts_md5"] == hashlib.md5(b"").hexdigest()
    assert got[2]["n_frames"] == 1


def test_token_diversity_null_text(spark, tmp_path_factory):
    rows = [(1, None, "en", "web", 0), (2, "a b", "en", "web", 3)]
    df = spark.createDataFrame(
        rows, "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
    )
    out = str(tmp_path_factory.mktemp("nulltext_r5c"))
    df.coalesce(1).write.parquet(f"{out}/documents.parquet")
    got = {r["doc_id"]: r for r in t17_token_diversity(spark, out).collect()}
    # NULL text reports ZERO counts (the oracle's LEFT JOIN convention),
    # with the ratio columns NULL via the zero-token guard
    assert got[1]["n_tokens"] == 0 and got[1]["n_types"] == 0
    assert got[1]["ttr"] is None and got[1]["simpson"] is None
    assert got[2]["n_tokens"] == 2


def test_triangles_edge_free_graph(spark, tmp_path_factory):
    from pyspark.sql import functions as F2

    from floorist_spark.operators.dedup import d18_dup_graph_triangles

    base = (
        "concat_ws(' ', transform(sequence(1, 40), j -> "
        "substring(md5(concat(CAST({k} AS STRING), ':', CAST(j AS STRING))), 1, 8)))"
    )
    docs = spark.range(3).select(
        F2.col("id").alias("doc_id"),
        F2.expr(
            f"CASE WHEN id = 0 THEN {base.format(k=1)} "
            f"WHEN id = 1 THEN {base.format(k=2)} ELSE {base.format(k=3)} END"
        ).alias("text"),
        F2.lit("en").alias("lang"),
        F2.lit("synthetic").alias("source"),
        F2.lit(359).cast("bigint").alias("n_chars"),
    )
    out = str(tmp_path_factory.mktemp("nodup_r5c"))
    docs.coalesce(1).write.parquet(f"{out}/documents.parquet")
    row = d18_dup_graph_triangles(spark, out).collect()[0]
    # all-unique corpus: zero everything, coefficient NULL (not NaN/inf),
    # and wedges 0 (not NULL) to match the oracle's coalesce
    assert row["n_edges"] == 0 and row["n_wedges"] == 0
    assert row["n_triangles"] == 0 and row["clustering_coeff"] is None
