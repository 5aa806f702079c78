"""Crafted-case semantics for the round-6 sixth wave (c20, e34, s20,
t24, d25) — planted inputs with hand-computable answers: shard
boundaries that straddle, exact conversion lags incl. the cap bucket,
cells engineered into split/merge/keep, a two-source corpus whose TVD is
a known fraction, and a planted near-dup pair the LSH bands must
surface."""

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


# -- c20: straddling docs and exact shard arithmetic --------------------------


def test_c20_two_level_prefix_sum_matches_hand_computation(spark, tmp_path):
    from floorist_spark.operators.curation import (
        SHARD_BUCKET_W,
        SHARD_TOKENS,
        c20_shard_manifest,
    )

    # doc i has exactly 1000 tokens ("t" * 1000 words); SHARD_TOKENS=4096
    # -> start offsets 0,1000,...; shard = start DIV 4096: docs 0-4 in
    # shard 0 (starts 0..4000), docs 5-8 in shard 1 (5000..8000), ...
    # doc_ids span two prefix-sum buckets (0..99 and 100..) to force the
    # offset join path.
    ids = list(range(98, 110))  # crosses the SHARD_BUCKET_W=100 boundary
    assert SHARD_BUCKET_W == 100
    rows = [(i, " ".join(["tok"] * 1000)) for i in ids]
    out = _write_docs(spark, tmp_path, rows)
    got = {r["shard_id"]: r for r in c20_shard_manifest(spark, out).collect()}
    # 12 docs * 1000 tokens, start offsets 0..11000
    exp = {}
    for pos, i in enumerate(ids):
        exp.setdefault(pos * 1000 // SHARD_TOKENS, []).append(i)
    assert set(got) == set(exp)
    for sid, members in exp.items():
        r = got[sid]
        assert r["n_docs"] == len(members)
        assert r["tokens"] == 1000 * len(members)
        assert (r["min_doc"], r["max_doc"]) == (min(members), max(members))
        assert r["fill_ratio"] == 1000 * len(members) / SHARD_TOKENS


# -- e34: exact lags, ordering filter, cap bucket ------------------------------


def test_e34_lags_caps_and_reversed_order_excluded(spark, tmp_path):
    from floorist_spark.operators.events_analytics import (
        CONV_LAG_CAP_HOURS,
        e34_conversion_lag,
    )

    base = dt.datetime(2024, 6, 1)
    rows = [
        # user 1: view then purchase 90 min later -> bucket 1
        (1, base, 1, "view", 0.0),
        (2, base + dt.timedelta(minutes=90), 1, "purchase", 0.0),
        # user 2: instant conversion (same ts) -> bucket 0
        (3, base, 2, "view", 0.0),
        (4, base, 2, "purchase", 0.0),
        # user 3: purchase BEFORE first view -> excluded
        (5, base, 3, "purchase", 0.0),
        (6, base + dt.timedelta(hours=1), 3, "view", 0.0),
        # user 4: converts after 100h -> capped bucket
        (7, base, 4, "view", 0.0),
        (8, base + dt.timedelta(hours=100), 4, "purchase", 0.0),
        # user 5: views only -> excluded
        (9, base, 5, "view", 0.0),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
        "event_type STRING, value DOUBLE",
    )
    out = str(tmp_path / "ev")
    df.coalesce(1).write.parquet(f"{out}/events.parquet")
    got = {r["lag_hours_bucket"]: r for r in e34_conversion_lag(spark, out).collect()}
    assert set(got) == {0, 1, CONV_LAG_CAP_HOURS}
    assert all(r["n_users"] == 1 for r in got.values())
    assert got[0]["share"] == 1 / 3
    assert got[0]["cum_share"] == 1 / 3
    assert got[1]["cum_share"] == 2 / 3
    assert got[CONV_LAG_CAP_HOURS]["cum_share"] == 1.0


# -- s20: engineered split/merge/keep cells ------------------------------------


def test_s20_actions_and_estimated_parts(spark, tmp_path):
    from floorist_spark.operators.similarity import s20_cell_rebalance

    # three cells via the first 8 coordinate signs:
    #   cell A (all positive -> 255): 16 vectors  -> split
    #   cell B (all negative -> 0):    5 vectors  -> keep
    #   cell C (first pos -> 1):       1 vector   -> merge
    # total 22, 3 cells -> target 7
    rows = []
    vid = 0
    for _ in range(16):
        rows.append((vid, [1.0] * 8, 0)); vid += 1
    for _ in range(5):
        rows.append((vid, [-1.0] * 8, 0)); vid += 1
    rows.append((vid, [1.0] + [-1.0] * 7, 0))
    df = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT")
    out = str(tmp_path / "emb")
    df.coalesce(1).write.parquet(f"{out}/embeddings.parquet")
    got = {r["bucket"]: r for r in s20_cell_rebalance(spark, out).collect()}
    assert set(got) == {0, 1, 255}
    a, b, c = got[255], got[0], got[1]
    assert a["target"] == b["target"] == c["target"] == 7
    assert (a["action"], a["est_parts"]) == ("split", (16 + 6) // 7)
    assert (b["action"], b["est_parts"]) == ("keep", 1)
    assert (c["action"], c["est_parts"]) == ("merge", 1)
    assert a["load_factor"] == 16 / 7


# -- t24: hand-computable TVD on a two-source corpus ---------------------------


def test_t24_exact_tvd_on_planted_sources(spark, tmp_path):
    from floorist_spark.operators.text import t24_source_divergence

    # source A: 4 tokens "x x x y"; source B: 4 tokens "y y y z"
    # corpus: x=3, y=4, z=1, T=8; T_A = T_B = 4
    # num_A = |3*8-3*4| + |1*8-4*4| + |0*8-1*4| = 12+8+4 = 24
    # tvd_A = 24 / (2*4*8) = 0.375 ; symmetric for B
    rows = [
        (1, "x x x y", "A"),
        (2, "y y y z", "B"),
    ]
    out = _write_docs(
        spark, tmp_path, rows, schema="doc_id BIGINT, text STRING, source STRING"
    )
    got = {r["source"]: r for r in t24_source_divergence(spark, out).collect()}
    a, b = got["A"], got["B"]
    assert a["n_corpus_types"] == b["n_corpus_types"] == 3
    assert a["n_types"] == 2 and b["n_types"] == 2
    assert a["total_tokens"] == b["total_tokens"] == 4
    assert a["tvd_num"] == "24" and b["tvd_num"] == "24"
    assert a["tvd"] == 0.375 and b["tvd"] == 0.375


def test_t24_identical_sources_have_zero_tvd(spark, tmp_path):
    from floorist_spark.operators.text import t24_source_divergence

    rows = [(1, "a b c", "A"), (2, "a b c", "B")]
    out = _write_docs(
        spark, tmp_path, rows, schema="doc_id BIGINT, text STRING, source STRING"
    )
    for r in t24_source_divergence(spark, out).collect():
        assert r["tvd_num"] == "0" and r["tvd"] == 0.0


# -- d25: planted near-dup inside the stratum ----------------------------------


def test_d25_planted_neardup_recalled_and_disjoint_pair_not(spark, tmp_path):
    from floorist_spark.operators.dedup import (
        AUDIT_MOD,
        d25_lsh_recall_audit,
    )

    # 3-doc corpus -> effective mod = max(AUDIT_MOD, ceil(3/500)) =
    # AUDIT_MOD; membership is the 32-bit (8-hex) salted md5 gate
    def _h32(i: int) -> int:
        return int(hashlib.md5(f"audit:{i}".encode()).hexdigest()[:8], 16)

    in_stratum = [i for i in range(1, 30000) if _h32(i) % AUDIT_MOD == 0]
    a, b, c = in_stratum[0], in_stratum[1], in_stratum[2]
    body = (
        "the quick brown fox jumps over the lazy dog while the band plays "
        "a long and winding tune about distributed systems and their woes"
    )
    rows = [
        (a, body),
        (b, body + " extra"),  # near-identical -> high-jaccard truth pair
        (c, "entirely different content about gardening and soil acidity"),
    ]
    out = _write_docs(spark, tmp_path, rows)
    res = d25_lsh_recall_audit(spark, out).collect()
    by_bucket = {r["jac_bucket"]: r for r in res}
    # 3 stratum docs -> 3 truth pairs; the (a,b) pair sits in a high
    # ventile and MUST be surfaced by the bands (j ~ 0.95 >> 0.8 design
    # point); the two disjoint pairs sit in ventile 0
    assert sum(r["n_truth"] for r in res) == 3
    hi = max(by_bucket)
    assert hi >= 16
    assert by_bucket[hi]["n_found"] == by_bucket[hi]["n_truth"] == 1
    assert by_bucket[hi]["recall"] == 1.0
    assert by_bucket[0]["n_truth"] == 2 and by_bucket[0]["n_found"] == 0


# -- m17: hand-computable savings on planted identical payloads ----------------


def test_m17_savings_per_width_on_planted_corpus(spark, tmp_path):
    from floorist_spark.operators.multimodal import (
        SWEEP_WIDTHS,
        m17_block_size_sweep,
    )

    assert SWEEP_WIDTHS == (64, 256, 1024)
    rows = [(1, "a" * 128), (2, "a" * 128), (3, None)]  # NULL -> empty payload
    out = _write_docs(spark, tmp_path, rows)
    got = {r["block_w"]: r for r in m17_block_size_sweep(spark, out).collect()}
    assert set(got) == {64, 256, 1024}
    w64 = got[64]
    # two identical 128-byte docs -> 2 blocks of 64 each, all one digest,
    # plus the empty doc's one empty block
    assert (w64["total_blocks"], w64["distinct_blocks"]) == (5, 2)
    assert (w64["total_bytes"], w64["unique_bytes"]) == (256, 64)
    assert w64["savings_frac"] == 1 - 64 / 256
    assert w64["metadata_ratio"] == 2 / 5
    for w in (256, 1024):
        r = got[w]
        # one short 128-byte block per doc, shared digest, plus the empty
        assert (r["total_blocks"], r["distinct_blocks"]) == (3, 2)
        assert (r["total_bytes"], r["unique_bytes"]) == (256, 128)
        assert r["savings_frac"] == 0.5
