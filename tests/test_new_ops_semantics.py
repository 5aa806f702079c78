"""Crafted-case semantics tests for the round-4 operators (c08, d13, e13,
e14) — the oracle gate pins Spark==DuckDB; these pin the INTENT on inputs
engineered to hit each rule."""

from __future__ import annotations

import datetime as dt

import pytest

from floorist_spark.operators.curation import c08_snapshot_diff
from floorist_spark.operators.dedup import d13_minhash_calibration
from floorist_spark.operators.events_analytics import (
    e13_event_transitions,
    e14_hourly_anomaly,
)


@pytest.fixture(scope="module")
def docs_dir(spark, tmp_path_factory):
    """documents.parquet hitting every c08 branch: doc 11/22 removed,
    doc 7/14 changed, doc 13 spawns an added doc, others unchanged. Doc 91
    (7*13) is changed AND spawns. Includes one exact-dup pair for d13."""
    rows = [(i, f"document body number {i} with some shared words") for i in
            (1, 2, 7, 11, 13, 14, 22, 91)]
    rows.append((200, rows[0][1]))  # exact dup of doc 1 -> jaccard 1.0 pair
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    out = str(tmp_path_factory.mktemp("docs_c08"))
    df.coalesce(1).write.parquet(f"{out}/documents.parquet")
    return out


def test_snapshot_diff_statuses(spark, docs_dir):
    got = {r["doc_id"]: r["status"] for r in c08_snapshot_diff(spark, docs_dir).collect()}
    assert got == {
        7: "changed",
        14: "changed",
        91: "changed",
        11: "removed",
        22: "removed",
        10000013: "added",
        10000091: "added",
    }


def test_minhash_calibration_exact_dup(spark, docs_dir):
    rows = {(r["doc_a"], r["doc_b"]): r for r in
            d13_minhash_calibration(spark, docs_dir).collect()}
    # the planted exact duplicate must be an LSH candidate with perfect
    # signature agreement AND perfect exact Jaccard -> zero error
    assert (1, 200) in rows
    r = rows[(1, 200)]
    assert r["est_jaccard"] == 1.0 and r["exact_jaccard"] == 1.0
    assert r["abs_err"] == 0.0
    # estimator and truth live in [0,1] everywhere
    for r in rows.values():
        assert 0.0 <= r["est_jaccard"] <= 1.0
        assert 0.0 <= r["exact_jaccard"] <= 1.0


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """Two users with known transition paths + one spike hour for e14.

    u1: view->click->purchase; u2: view->view (same-ts tie broken by
    event_id: 20 then 21). Hours: 24 quiet hours with 1 event each, one
    spike hour with many — the spike is the single z-outlier."""
    base = dt.datetime(2024, 5, 1)
    rows = [
        (1, base + dt.timedelta(hours=0, minutes=1), 1, "view", 1.0),
        (2, base + dt.timedelta(hours=0, minutes=2), 1, "click", 1.0),
        (3, base + dt.timedelta(hours=0, minutes=3), 1, "purchase", 1.0),
        (20, base + dt.timedelta(hours=1, minutes=5), 2, "view", 1.0),
        (21, base + dt.timedelta(hours=1, minutes=5), 2, "view", 1.0),
    ]
    eid = 100
    for h in range(2, 24):  # quiet hours, 1 event each
        rows.append((eid, base + dt.timedelta(hours=h), 3, "view", 1.0))
        eid += 1
    for m in range(30):  # spike hour
        rows.append((eid, base + dt.timedelta(hours=24, minutes=m), 4, "view", 1.0))
        eid += 1
    df = spark.createDataFrame(
        rows, "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE"
    )
    out = str(tmp_path_factory.mktemp("events_e13"))
    df.coalesce(1).write.parquet(f"{out}/events.parquet")
    return out


def test_event_transitions(spark, events_dir):
    got = {(r["event_type"], r["next_type"]): r for r in
           e13_event_transitions(spark, events_dir).collect()}
    # u1 contributes view->click->purchase; u2 contributes view->view
    # (event_id tiebreak); users 3 and 4 are single-type chains
    assert got[("view", "click")]["n_transitions"] == 1
    assert got[("click", "purchase")]["n_transitions"] == 1
    assert got[("view", "view")]["n_transitions"] == 1 + 21 + 29
    # outgoing shares per source type sum to 1
    from collections import defaultdict

    by_src = defaultdict(float)
    for (src, _), r in got.items():
        by_src[src] += r["p_next"]
    for src, total in by_src.items():
        assert abs(total - 1.0) < 1e-12, (src, total)


def test_hourly_anomaly_flags_spike(spark, events_dir):
    rows = e14_hourly_anomaly(spark, events_dir).collect()
    spike = dt.datetime(2024, 5, 2, 0, 0)
    assert [r["hour"] for r in rows] == [spike]
    assert rows[0]["n_events"] == 30 and rows[0]["z"] > 2.5


def test_ngram_containment_finds_excerpt(spark, tmp_path_factory):
    """A short doc quoted verbatim inside a much larger one: Jaccard is
    tiny (symmetric d04 misses it) but containment is 1.0 — exactly the
    relation d14 exists to catch."""
    from floorist_spark.operators.dedup import d14_ngram_containment

    quote = "the quick brown fox jumps over the lazy dog near the river bank"
    filler = " ".join(f"unrelated filler token{i} appears here" for i in range(40))
    rows = [
        (1, quote),
        (2, filler + " " + quote + " " + filler.replace("token", "word")),
        (3, "a completely different document about parquet shuffles and joins"),
    ]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    out = str(tmp_path_factory.mktemp("docs_d14"))
    df.coalesce(1).write.parquet(f"{out}/documents.parquet")
    got = {(r["doc_a"], r["doc_b"]): r for r in
           d14_ngram_containment(spark, out).collect()}
    assert set(got) == {(1, 2)}
    r = got[(1, 2)]
    assert r["containment_a"] == 1.0  # every 3-gram of the quote is in doc 2
    assert r["containment_b"] < 0.5  # doc 2 is NOT contained in the quote


def test_feature_hashing_conserves_tokens(spark, docs_dir):
    from pyspark.sql import functions as F

    from floorist_spark.operators.text import t01_token_stats, t11_feature_hashing

    feats = t11_feature_hashing(spark, docs_dir)
    # hashed dims stay in range; per-doc weights sum to the token count
    assert feats.filter("dim < 0 OR dim >= 64").count() == 0
    got = {
        r["doc_id"]: r["s"]
        for r in feats.groupBy("doc_id").agg(F.sum("weight").alias("s")).collect()
    }
    want = {
        r["doc_id"]: r["n_tokens"] for r in t01_token_stats(spark, docs_dir).collect()
    }
    assert got == want


def test_stride_interleave_prefix_mixture(spark):
    """Every prefix of the c09 order matches the c06 mixture to within
    one document per language — the property stride scheduling exists
    for (checked on the real sf0.001 corpus)."""
    from floorist_spark.operators.curation import (
        c06_mixture_weights,
        c09_stride_interleave,
    )

    sf = "/root/testdata/sf0.001"
    weights = {r["lang"]: r["mix_weight"] for r in c06_mixture_weights(spark, sf).collect()}
    rows = c09_stride_interleave(spark, sf).collect()
    order = [r["lang"] for r in rows]
    total = {l: order.count(l) for l in weights}
    seen = {lang: 0 for lang in weights}
    for k, lang in enumerate(order, start=1):
        seen[lang] += 1
        if any(seen[l] == total[l] for l in weights):
            # a temperature-upweighted rare language ran out of documents;
            # beyond this point its share necessarily lags the target (a
            # real loader cycles that language's stream per epoch)
            break
        for l, w in weights.items():
            # stride scheduling keeps per-lang drift O(1) at every prefix
            assert abs(seen[l] - w * k) <= 2.0, (k, l, seen[l], w * k)
    assert k > len(order) * 0.5, "exhaustion too early to exercise prefixes"


def test_knn_graph_shape(spark, tmp_path_factory):
    from floorist_spark.operators.similarity import s10_knn_graph

    # two sign-buckets of 3 vectors each: edges must stay within a bucket,
    # every node with bucket mates emits <= TOP_K ranked edges, no self-edges
    vecs = [
        (1, [1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0]),
        (2, [1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 2.0]),
        (3, [2.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0]),
        (4, [-1.0, -1.0, -1.0, -1.0, -1.0, -1.0, -1.0, -1.0]),
        (5, [-1.0, -1.0, -1.0, -1.0, -1.0, -1.0, -1.0, -2.0]),
        (6, [-2.0, -1.0, -1.0, -1.0, -1.0, -1.0, -1.0, -1.0]),
    ]
    df = spark.createDataFrame(vecs, "vec_id BIGINT, embedding ARRAY<DOUBLE>")
    out = str(tmp_path_factory.mktemp("emb_s10"))
    df.coalesce(1).write.parquet(f"{out}/embeddings.parquet")
    rows = s10_knn_graph(spark, out).collect()
    pos, neg = {1, 2, 3}, {4, 5, 6}
    for r in rows:
        assert r["src_id"] != r["neighbor_id"]
        assert 1 <= r["rank"] <= 3
        same = {r["src_id"], r["neighbor_id"]}
        assert same <= pos or same <= neg, "edge crossed an LSH bucket"
    # each node has exactly 2 bucket mates -> exactly 2 edges each
    from collections import Counter

    assert Counter(r["src_id"] for r in rows) == {i: 2 for i in range(1, 7)}


# ---------------------------------------------------------------------------
# round-5 additions: s11 product quantization, e17 path analysis
# ---------------------------------------------------------------------------


def test_s11_codebook_members_reconstruct_exactly(spark):
    """Every codebook vector (vec_id < PQ_K) must encode to ITSELF in all
    subspaces (its own subvector is at distance exactly 0) -> recon_mse
    0.0 and a codes digest of [id]*M."""
    import hashlib
    import json

    from floorist_spark.operators.similarity import PQ_K, PQ_M, s11_pq_quantize
    from tests.conftest import SF_SMOKE

    res = (
        s11_pq_quantize(spark, SF_SMOKE)
        .filter(f"vec_id < {PQ_K}")
        .collect()
    )
    assert len(res) == PQ_K
    for r in res:
        assert r["recon_mse"] == 0.0
        expect = json.dumps([r["vec_id"]] * PQ_M, separators=(",", ":"))
        assert r["codes_digest"] == hashlib.md5(expect.encode()).hexdigest()


def test_e17_paths_are_bounded_and_ranked(spark):
    from floorist_spark.operators.events_analytics import (
        PATH_LEN,
        PATH_TOP,
        e17_path_analysis,
    )
    from tests.conftest import SF_SMOKE

    rows = e17_path_analysis(spark, SF_SMOKE).collect()
    assert 0 < len(rows) <= PATH_TOP
    counts = [r["n_sessions"] for r in rows]
    assert counts == sorted(counts, reverse=True)  # ranked by frequency
    for r in rows:
        assert 1 <= len(r["path"].split(">")) <= PATH_LEN


def test_e17_path_splits_on_session_gap(spark, tmp_path):
    """Two bursts 40 min apart for one user must produce TWO sessions
    whose paths are the bursts' event orders, not one merged path."""
    import datetime as dt

    from floorist_spark.operators.events_analytics import e17_path_analysis

    t0 = dt.datetime(2024, 6, 1, 12, 0, 0)
    m = lambda mins: t0 + dt.timedelta(minutes=mins)
    rows = [
        (1, m(0), 1, "view", 1.0),
        (2, m(1), 1, "click", 1.0),
        (3, m(41), 1, "buy", 1.0),   # 40 min gap -> new session
    ]
    df = spark.createDataFrame(
        rows, "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE"
    )
    d = str(tmp_path)
    df.coalesce(1).write.parquet(f"{d}/events.parquet")
    paths = {r["path"]: r["n_sessions"] for r in e17_path_analysis(spark, d).collect()}
    assert paths == {"view>click": 1, "buy": 1}


def test_m08_identical_payloads_share_phash(spark, tmp_path):
    from floorist_spark.operators.multimodal import PHASH_BITS, m08_perceptual_hash

    rows = [
        (1, "the exact same payload body for perceptual hashing"),
        (2, "the exact same payload body for perceptual hashing"),
        (3, "a completely different document with other content entirely"),
    ]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    d = str(tmp_path)
    df.coalesce(1).write.parquet(f"{d}/documents.parquet")
    got = {r["doc_id"]: r["phash"] for r in m08_perceptual_hash(spark, d).collect()}
    assert got[1] == got[2]                      # exact dup -> identical hash
    assert got[1] != got[3]                      # different content differs
    assert all(0 <= h < (1 << PHASH_BITS) for h in got.values())


def test_e18_attributes_clicks_within_window_only(spark, tmp_path):
    """A click matches every SAME-user view in the preceding 10 minutes —
    not older views, not other users' views, and not views after it."""
    import datetime as dt

    from floorist_spark.operators.events_analytics import e18_stream_stream_join

    t0 = dt.datetime(2024, 6, 1, 12, 0, 0)
    m = lambda mins: t0 + dt.timedelta(minutes=mins)
    rows = [
        (1, m(0), 1, "view", 1.0),     # matched by click 3 (5 min later)
        (2, m(30), 1, "view", 1.0),    # AFTER click 3, within window of none
        (3, m(5), 1, "click", 1.0),    # matches view 1 only
        (4, m(40), 1, "click", 1.0),   # view 2 is 10 min earlier -> boundary
        (5, m(4), 2, "view", 1.0),     # other user: never matches user 1
    ]
    df = spark.createDataFrame(
        rows, "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE"
    )
    # the streaming file source does not recurse into non-partition
    # subdirectories, so the table must be ONE flat parquet file (same
    # trick as test_custom_sessionizer._write)
    import glob
    import shutil

    d = str(tmp_path)
    df.coalesce(1).write.parquet(f"{d}/_tmp_ev")
    shutil.move(glob.glob(f"{d}/_tmp_ev/part-*.parquet")[0], f"{d}/events.parquet")
    shutil.rmtree(f"{d}/_tmp_ev")
    pairs = {
        (r["user_id"], r["view_id"], r["click_id"]): r["gap_us"]
        for r in e18_stream_stream_join(spark, d).collect()
    }
    # view 2 at m(30) is exactly 10 min before click 4 -> inclusive bound
    assert pairs == {(1, 1, 3): 5 * 60 * 1_000_000, (1, 2, 4): 10 * 60 * 1_000_000}


# ---------------------------------------------------------------------------
# round-5 additions: d15 / t12 / c10 / s12 / e19 / m09
# ---------------------------------------------------------------------------


def test_d15_drops_repeated_passages(spark, tmp_path):
    """Doc 1 and doc 2 share an 8-token passage; the later doc loses it,
    while each doc's unique passages survive. A doc that is ALL duplicate
    passages keeps nothing and digests the empty string."""
    from floorist_spark.operators.dedup import PASSAGE_W, d15_passage_dedup

    shared = " ".join(f"tok{i}" for i in range(PASSAGE_W))
    uniq1 = " ".join(f"one{i}" for i in range(PASSAGE_W))
    uniq2 = " ".join(f"two{i}" for i in range(PASSAGE_W))
    rows = [
        (1, f"{shared} {uniq1}"),
        (2, f"{shared} {uniq2}"),  # loses `shared` to doc 1
        (3, shared),               # entirely duplicate -> keeps nothing
    ]
    out = str(tmp_path / "docs")
    spark.createDataFrame(rows, "doc_id BIGINT, text STRING").coalesce(
        1
    ).write.parquet(f"{out}/documents.parquet")

    got = {r["doc_id"]: r for r in d15_passage_dedup(spark, out).collect()}
    assert (got[1]["n_passages"], got[1]["n_kept"]) == (2, 2)
    assert (got[2]["n_passages"], got[2]["n_kept"]) == (2, 1)
    assert (got[3]["n_passages"], got[3]["n_kept"]) == (1, 0)
    import hashlib

    assert got[3]["clean_digest"] == hashlib.md5(b"").hexdigest()


def test_t12_repetitive_doc_scores_higher(spark, tmp_path):
    """A document made of one repeated bigram gets a higher average bigram
    probability than a same-length document of corpus-unique bigrams —
    the filter direction the LM-quality signal is used for."""
    from floorist_spark.operators.text import t12_bigram_lm_score

    rows = [
        (1, "spam spam spam spam spam spam spam spam"),
        (2, "quaint zephyr jumbles vexing wizard gnome quartz fjord"),
    ]
    out = str(tmp_path / "docs")
    spark.createDataFrame(rows, "doc_id BIGINT, text STRING").coalesce(
        1
    ).write.parquet(f"{out}/documents.parquet")

    got = {r["doc_id"]: r for r in t12_bigram_lm_score(spark, out).collect()}
    assert got[1]["n_bigrams"] == got[2]["n_bigrams"] == 7
    assert got[1]["avg_p"] > got[2]["avg_p"]


def test_c10_weight_monotonicity(spark, tmp_path):
    """With the hash bucket held constant (same doc_id), keep/drop depends
    only on the diversity weight: an all-distinct doc is kept whenever a
    fully-repetitive doc with the same id would be, never the reverse.
    Verified exhaustively over both corpora variants."""
    from floorist_spark.operators.curation import c10_quality_weighted_sample

    ids = list(range(40))
    distinct_rows = [
        (i, " ".join(f"w{i}x{j}" for j in range(10))) for i in ids
    ]
    repeat_rows = [(i, " ".join(["dup"] * 10)) for i in ids]
    kept = {}
    for tag, rows in (("distinct", distinct_rows), ("repeat", repeat_rows)):
        out = str(tmp_path / tag)
        spark.createDataFrame(rows, "doc_id BIGINT, text STRING").coalesce(
            1
        ).write.parquet(f"{out}/documents.parquet")
        kept[tag] = {
            r["doc_id"] for r in c10_quality_weighted_sample(spark, out).collect()
        }
    # all-distinct docs have weight 1.0 -> kept for every bucket value
    assert kept["distinct"] == set(ids)
    # weight 1/10 keeps a strict subset
    assert kept["repeat"] < kept["distinct"]


def test_s12_majority_vote_and_tiebreak(spark):
    """On the real table: every prediction must equal the modal label of
    that query's top-5 bucket neighbors (ties -> lowest label), recomputed
    here INDEPENDENTLY in numpy (sign buckets, float64 cosines, the same
    (cosine DESC, id ASC) ranking and (votes DESC, label ASC) vote)."""
    from collections import Counter

    import numpy as np
    import pandas as pd

    from floorist_spark.operators.similarity import (
        KNN_VOTE_K,
        s12_knn_classify,
    )
    from tests.conftest import SF_SMOKE

    got = {r["query_id"]: r for r in s12_knn_classify(spark, SF_SMOKE).collect()}
    assert got, "classifier returned no rows"

    emb = pd.read_parquet(f"{SF_SMOKE}/embeddings.parquet")
    vecs = {
        int(r.vec_id): np.asarray(r.embedding, dtype=np.float64)
        for r in emb.itertuples()
    }
    labels = {int(r.vec_id): int(r.label) for r in emb.itertuples()}
    bucket = {
        vid: sum(1 << j for j in range(8) if v[j] > 0) for vid, v in vecs.items()
    }

    def cos(a, b):
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    expected = {}
    for qid in (v for v in vecs if v < 50):
        cand = sorted(
            (
                (-cos(vecs[qid], vecs[nid]), nid)
                for nid in vecs
                if nid != qid and bucket[nid] == bucket[qid]
            )
        )[:KNN_VOTE_K]
        if not cand:
            continue
        votes = Counter(labels[nid] for _, nid in cand)
        pred = min(votes, key=lambda lb: (-votes[lb], lb))
        expected[qid] = (pred, votes[pred])

    assert set(got) == set(expected)
    for qid, (pred, nvotes) in expected.items():
        assert got[qid]["pred_label"] == pred, qid
        assert got[qid]["votes"] == nvotes, qid
        assert got[qid]["true_label"] == labels[qid]
        assert got[qid]["correct"] == (pred == labels[qid])


def test_e19_lift_detects_planted_cooccurrence(spark, tmp_path):
    """Users alternate A/B within one session while C fires alone in its
    own sessions: lift(A,B) must be the maximum and exceed 1; C never
    co-occurs, so no (A,C)/(B,C) rows exist."""
    import datetime as dtmod

    from floorist_spark.operators.events_analytics import e19_cooccurrence_lift

    base = dtmod.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for u in range(10):
        for k, t in enumerate(("A", "B", "A", "B")):
            rows.append((eid, base + dtmod.timedelta(hours=u, minutes=k), u, t, 1.0, "{}"))
            eid += 1
    for u in range(10, 15):
        rows.append((eid, base + dtmod.timedelta(hours=u), u, "C", 1.0, "{}"))
        eid += 1
    out = str(tmp_path / "events")
    spark.createDataFrame(
        rows,
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE, props STRING",
    ).coalesce(1).write.parquet(f"{out}/events.parquet")

    got = {(r["type_a"], r["type_b"]): r for r in e19_cooccurrence_lift(spark, out).collect()}
    assert set(got) == {("A", "B")}
    r = got[("A", "B")]
    # 15 sessions total, A and B each in 10, together in 10 -> lift 1.5
    assert r["n_ab"] == 10 and r["n_a"] == 10 and r["n_b"] == 10
    assert r["lift"] == pytest.approx(1.5)


def test_m09_batches_are_single_bucket_and_bounded(spark):
    """Every (bucket, shard, batch) group holds at most AR_BATCH items and
    batch ids are dense from 0 within each (bucket, shard)."""
    from collections import Counter, defaultdict

    from floorist_spark.operators.multimodal import (
        AR_BATCH,
        m09_aspect_bucket_batches,
    )
    from tests.conftest import SF_SMOKE

    rows = m09_aspect_bucket_batches(spark, SF_SMOKE).collect()
    groups = defaultdict(list)
    for r in rows:
        assert r["bucket"] in {"1:2", "3:4", "1:1", "4:3", "2:1"}
        groups[(r["bucket"], r["shard"])].append(r["batch_id"])
    for ids in groups.values():
        c = Counter(ids)
        assert all(v <= AR_BATCH for v in c.values())
        assert set(c) == set(range(max(c) + 1))


# -- round-5 additions: c12 chunking, e22 z-order, t14 confusion ------------


def test_c12_chunk_geometry(spark, tmp_path):
    """A 40-token doc chunks at starts 1/17/33 with lengths 32/24/8
    (window 32, stride 16): full coverage, 16-token overlap between
    consecutive full windows, and the digest is md5 of the chunk text."""
    import hashlib

    from floorist_spark.operators.curation import c12_passage_chunks

    words = [f"w{i:02d}" for i in range(40)]
    df = spark.createDataFrame(
        [(1, " ".join(words))], "doc_id BIGINT, text STRING"
    )
    out = str(tmp_path / "docs")
    df.coalesce(1).write.parquet(f"{out}/documents.parquet")
    rows = c12_passage_chunks(spark, out).collect()
    assert [(r.chunk_idx, r.start_tok, r.n_tokens) for r in rows] == [
        (0, 1, 32),
        (1, 17, 24),
        (2, 33, 8),
    ]
    first = " ".join(words[:32])
    assert rows[0].chunk_digest == hashlib.md5(first.encode()).hexdigest()


def test_e22_zorder_locality(spark):
    """The property the layout exists for: every file covers at most a
    4x4 tile of the 16x16 (day, user) bucket grid, and zkey ranges are
    the disjoint 16-key intervals [16*file_id, 16*file_id+15]."""
    from floorist_spark.operators.events_analytics import e22_zorder_layout

    rows = e22_zorder_layout(spark, "/root/testdata/sf0.001").collect()
    assert rows, "no files assigned"
    for r in rows:
        assert 1 <= r.n_day_buckets <= 4
        assert 1 <= r.n_user_buckets <= 4
        assert 16 * r.file_id <= r.min_zkey <= r.max_zkey <= 16 * r.file_id + 15


def test_e22_morton_bijection(spark):
    """The arithmetic interleave matches the reference Morton code for
    every (d, u) pair in the 16x16 grid — and is therefore a bijection."""
    from floorist_spark.operators.events_analytics import _z_interleave

    def py_morton(d, u):
        z = 0
        for j in range(4):
            z |= ((d >> j) & 1) << (2 * j + 1)
            z |= ((u >> j) & 1) << (2 * j)
        return z

    expr = _z_interleave("d_bucket", "u_bucket", "div")
    got = {
        (r.d, r.u): r.z
        for r in spark.sql(
            "SELECT d_bucket AS d, u_bucket AS u, "
            f"{expr} AS z "
            "FROM (SELECT explode(sequence(0, 15)) AS d_bucket) "
            "CROSS JOIN (SELECT explode(sequence(0, 15)) AS u_bucket)"
        ).collect()
    }
    want = {(d, u): py_morton(d, u) for d in range(16) for u in range(16)}
    assert got == want
    assert len(set(want.values())) == 256


def test_t14_confusion_is_a_partition(spark):
    """Cell counts partition the corpus: per-gold fractions sum to 1,
    gold_total is consistent across a gold class, and the matrix total
    equals the document count."""
    from floorist_spark.operators.text import t14_langid_confusion
    from floorist_spark.session import load_table

    rows = t14_langid_confusion(spark, "/root/testdata/sf0.001").collect()
    n_docs = load_table(spark, "/root/testdata/sf0.001", "documents").count()
    assert sum(r.n_docs for r in rows) == n_docs
    by_gold: dict = {}
    for r in rows:
        by_gold.setdefault(r.gold_lang, []).append(r)
    for gold, cells in by_gold.items():
        assert len({c.gold_total for c in cells}) == 1
        assert sum(c.n_docs for c in cells) == cells[0].gold_total
        assert abs(sum(c.frac_of_gold for c in cells) - 1.0) < 1e-12


def test_m10_negative_coverage_and_validity(spark):
    """Every anchor gets exactly NEG_K negatives ranked 0..K-1, no
    negative equals its anchor, and the choice is deterministic across
    runs (hash arithmetic, not sampling)."""
    from floorist_spark.operators.multimodal import (
        NEG_K,
        m10_contrastive_pairs,
    )

    rows = m10_contrastive_pairs(spark, "/root/testdata/sf0.001").collect()
    by_anchor: dict = {}
    for r in rows:
        assert r.neg_id != r.doc_id
        by_anchor.setdefault(r.doc_id, []).append(r.neg_rank)
    assert all(sorted(v) == list(range(NEG_K)) for v in by_anchor.values())
    again = m10_contrastive_pairs(spark, "/root/testdata/sf0.001").collect()
    assert [(r.doc_id, r.neg_rank, r.neg_id) for r in rows] == [
        (r.doc_id, r.neg_rank, r.neg_id) for r in again
    ]


def test_t15_bpe_merge_sequence(spark, tmp_path):
    """A tiny corpus with a known merge order: round 1 ties on count=2
    between (cat,sat) and (the,cat) and must break to (cat,sat) by the
    lexicographic (a,b) rule; round 2's best involves the round-1 merged
    symbol, proving merges compose hierarchically."""
    from floorist_spark.operators.text import t15_bpe_merges

    docs = [
        (1, "the cat sat"),
        (2, "the cat ran"),
        (3, "a cat sat"),
    ]
    df = spark.createDataFrame(docs, "doc_id BIGINT, text STRING")
    out = str(tmp_path / "docs")
    df.coalesce(1).write.parquet(f"{out}/documents.parquet")
    rows = t15_bpe_merges(spark, out).collect()
    assert (rows[0].tok_a, rows[0].tok_b, rows[0].pair_count) == (
        "cat",
        "sat",
        2,
    )
    assert rows[0].merged == "cat@@sat"
    assert (rows[1].tok_a, rows[1].tok_b, rows[1].pair_count) == (
        "a",
        "cat@@sat",
        1,
    )


def test_t15_apply_merge_edge_cases(spark):
    """The position-parallel merge application matches greedy leftmost
    scan on the overlap-adjacent shapes: 'a b b', 'a b a b', 'a a b'."""
    from floorist_spark.operators.text import _bpe_apply_spark

    cases = {
        ("a", "b", "b"): ["a@@b", "b"],
        ("a", "b", "a", "b"): ["a@@b", "a@@b"],
        ("a", "a", "b"): ["a", "a@@b"],
        ("x", "a", "b", "y"): ["x", "a@@b", "y"],
        ("b", "a"): ["b", "a"],
    }
    import pyspark.sql.functions as F

    for toks, want in cases.items():
        got = (
            spark.createDataFrame([(list(toks),)], "toks array<string>")
            .select(F.expr(_bpe_apply_spark("a", "b", "a@@b")).alias("out"))
            .collect()[0]["out"]
        )
        assert got == want, (toks, got, want)


# -- t18 PII scrub (round 6) --------------------------------------------------


def test_t18_planted_pii_counts_and_cross_engine_digest(spark, tmp_path):
    """The synthetic corpus contains no PII, so the oracle gate only
    proves the zero path; this plants every class — emails, IPv4s, long
    digit runs — and checks counts, placeholder substitution, and that
    DuckDB's RE2 produces the SAME scrubbed digest as Spark's Java regex
    (the cross-dialect claim in the operator docstring)."""
    import duckdb

    from floorist_spark.operators.text import T18_SQL, t18_pii_scrub

    rows = [
        (1, "contact alice@example.com or bob.smith+x@corp.co.uk today"),
        (2, "server 10.0.0.1 talked to 192.168.100.200 at dawn"),
        (3, "card 12345678901234 and id 987654321 leaked"),
        (4, "mixed: eve@ex.org from 8.8.8.8 ref 1234567890"),
        (5, "clean prose with no identifiers at all"),
        (6, None),
    ]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    out = str(tmp_path / "docs_pii")
    df.coalesce(1).write.parquet(f"{out}/documents.parquet")

    got = {r["doc_id"]: r for r in t18_pii_scrub(spark, out).collect()}
    assert (got[1]["n_emails"], got[1]["n_ipv4"], got[1]["n_long_nums"]) == (2, 0, 0)
    assert (got[2]["n_emails"], got[2]["n_ipv4"], got[2]["n_long_nums"]) == (0, 2, 0)
    assert (got[3]["n_emails"], got[3]["n_ipv4"], got[3]["n_long_nums"]) == (0, 0, 2)
    assert (got[4]["n_emails"], got[4]["n_ipv4"], got[4]["n_long_nums"]) == (1, 1, 1)
    assert (got[5]["n_emails"], got[5]["n_ipv4"], got[5]["n_long_nums"]) == (0, 0, 0)
    assert (got[6]["n_emails"], got[6]["n_ipv4"], got[6]["n_long_nums"]) == (0, 0, 0)

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{out}/documents.parquet/*.parquet')"
    )
    oracle = {r[0]: r for r in con.execute(T18_SQL).fetchall()}
    for doc_id, r in got.items():
        o = oracle[doc_id]
        assert (r["n_emails"], r["n_ipv4"], r["n_long_nums"]) == (o[1], o[2], o[3])
        assert r["scrubbed_md5"] == o[4], f"digest diverged for doc {doc_id}"
