"""Semantics tests for the round-8 wave-15 operators (d31, s26, c25, t29):
crafted corpora exercise the arms the shipped testdata cannot reach
(a short doc verbatim-contained in a long one for d31), and the
monotonicity/boundary laws each curve's design-input role depends on are
pinned as invariants (recall and retention can only shrink as the knob
tightens; the 100% prefix carries the whole vocabulary).
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE


@pytest.fixture(autouse=True)
def _release():
    yield
    from floorist_spark.operators._cache import release_caches

    release_caches()


# ---------------------------------------------------------------------------
# d31 — containment audit
# ---------------------------------------------------------------------------

def test_d31_flags_contained_pair_jaccard_misses(spark, tmp_path):
    """A doc embedded verbatim in a modestly longer one: containment of
    the smaller side is 1.0 while symmetric Jaccard (~0.6 here) is below
    the 0.8 verify threshold — exactly the ``subset_only`` arm. The
    dilution is kept moderate ON PURPOSE: banding hits with probability
    jaccard^R per band, so a heavily diluted pair never becomes a
    candidate (the documented recall bound — that regime belongs to
    d24's span anchors). An unrelated doc must not pair at all."""
    from floorist_spark.operators.dedup import d31_containment_audit

    short = " ".join(f"alpha{i}" for i in range(20))
    long_ = short + " " + " ".join(f"beta{i}" for i in range(12))
    other = " ".join(f"gamma{i}" for i in range(30))
    rows = [
        (1, short, "en", "a", len(short)),
        (2, long_, "en", "a", len(long_)),
        (3, other, "en", "b", len(other)),
    ]
    df = spark.createDataFrame(
        rows, "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
    )
    df.write.parquet(str(tmp_path / "documents.parquet"))
    out = {
        (r["doc_a"], r["doc_b"]): r
        for r in d31_containment_audit(spark, str(tmp_path)).collect()
    }
    assert (1, 2) in out, "contained pair must be flagged"
    pair = out[(1, 2)]
    assert pair["containment"] == 1.0
    assert pair["jaccard"] < 0.8
    assert pair["subset_only"] is True
    assert all(3 not in k for k in out), "unrelated doc must not pair"


# ---------------------------------------------------------------------------
# s26 — quantized recall
# ---------------------------------------------------------------------------

def test_s26_recall_bounds_and_int8_fidelity(spark):
    """Recall is a true fraction over a width-invariant truth set; int8
    stays near the exact top-k (a single near-tie flip is legitimate —
    reconstruction perturbs scores), and no coarser width exceeds a
    finer one on this corpus."""
    from floorist_spark.operators.similarity import s26_quantized_recall

    rows = s26_quantized_recall(spark, SF_SMOKE).collect()
    assert [r["bits"] for r in rows] == [8, 4, 2]
    assert len({r["n_truth"] for r in rows}) == 1
    for r in rows:
        assert 0.0 <= r["recall_at_k"] <= 1.0
        assert r["recall_at_k"] == r["n_hit"] / r["n_truth"]
    assert rows[0]["recall_at_k"] >= 0.9, "int8 must stay near the exact top-k"
    recalls = [r["recall_at_k"] for r in rows]
    assert recalls == sorted(recalls, reverse=True)


# ---------------------------------------------------------------------------
# c25 — quality-threshold sweep
# ---------------------------------------------------------------------------

def test_c25_retention_monotone_and_anchored(spark):
    """Raising the bar can only shrink the kept set; threshold 0.0 keeps
    the whole corpus (both fractions exactly 1.0); the shipped
    QUALITY_MIN row agrees with c07's funnel entry count."""
    from floorist_spark.operators.curation import (
        QUALITY_MIN,
        c25_quality_threshold_sweep,
    )

    rows = c25_quality_threshold_sweep(spark, SF_SMOKE).collect()
    ths = [r["threshold"] for r in rows]
    assert ths == sorted(ths)
    assert rows[0]["threshold"] == 0.0
    assert rows[0]["doc_frac"] == 1.0 and rows[0]["token_frac"] == 1.0
    docs = [r["n_docs_kept"] for r in rows]
    toks = [r["tokens_kept"] for r in rows]
    assert docs == sorted(docs, reverse=True)
    assert toks == sorted(toks, reverse=True)
    assert any(r["threshold"] == QUALITY_MIN for r in rows), (
        "the sweep must price the shipped operating point"
    )


# ---------------------------------------------------------------------------
# t29 — vocabulary growth curve
# ---------------------------------------------------------------------------

def test_t29_vocab_monotone_and_complete_at_100(spark):
    """Vocabulary only grows with the prefix; the 100% row carries the
    whole corpus vocabulary (vocab_frac exactly 1.0) and its
    prefix_tokens equals the corpus token total; prefix TTR can only
    fall as the prefix grows (repetition accumulates)."""
    from floorist_spark.operators.text import t29_vocab_growth_curve

    rows = t29_vocab_growth_curve(spark, SF_SMOKE).collect()
    pcts = [r["pct"] for r in rows]
    assert pcts == sorted(pcts) and pcts[-1] == 100
    vocab = [r["vocab_size"] for r in rows]
    assert vocab == sorted(vocab)
    assert rows[-1]["vocab_frac"] == 1.0
    prefixes = [r["prefix_tokens"] for r in rows]
    assert prefixes == sorted(prefixes)
    ttrs = [r["prefix_ttr"] for r in rows if r["prefix_ttr"] is not None]
    assert ttrs == sorted(ttrs, reverse=True)


def test_t29_positions_match_global_window(spark, tmp_path):
    """The two-level prefix sum assigns the same first-occurrence
    boundary behavior as the naive global order: with 3 docs of 4 tokens
    each and a vocabulary introduced one doc at a time, the 50% prefix
    (6 of 12 tokens) sees exactly the first doc's vocabulary plus the
    second doc's first two tokens."""
    from floorist_spark.operators.text import t29_vocab_growth_curve

    rows = [
        (1, "a b c d", "en", "x", 7),
        (2, "e f g h", "en", "x", 7),
        (3, "i j k l", "en", "x", 7),
    ]
    df = spark.createDataFrame(
        rows, "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
    )
    df.write.parquet(str(tmp_path / "documents.parquet"))
    out = {r["pct"]: r for r in t29_vocab_growth_curve(spark, str(tmp_path)).collect()}
    assert out[100]["prefix_tokens"] == 12 and out[100]["vocab_size"] == 12
    assert out[50]["prefix_tokens"] == 6
    assert out[50]["vocab_size"] == 6  # a b c d + e f
    assert out[25]["prefix_tokens"] == 3
    assert out[25]["vocab_size"] == 3  # a b c


@pytest.mark.parametrize("seed", [7, 23, 99])
def test_t29_matches_pure_python_reference(spark, tmp_path, seed):
    """Randomized cross-check of the distributed first-occurrence curve
    against a brute-force single-threaded reference: sparse shuffled
    doc_ids, repeated vocabulary, and empty docs included. Seeded, so
    failures reproduce."""
    import random

    from floorist_spark.operators.text import T29_PCTS, t29_vocab_growth_curve

    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(30)]
    ids = rng.sample(range(0, 500), 25)
    rows = []
    for doc_id in ids:
        n = rng.randint(0, 12)
        text = " ".join(rng.choice(vocab) for _ in range(n))
        rows.append((doc_id, text, "en", "x", len(text)))
    df = spark.createDataFrame(
        rows, "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
    )
    root = str(tmp_path / f"s{seed}")
    df.repartition(3).write.parquet(f"{root}/documents.parquet")

    # reference: global doc_id order, 0-based positions, first occurrence
    stream = []
    for doc_id, text, *_ in sorted(rows):
        stream.extend(t for t in text.split(" ") if t != "")
    total = len(stream)
    first = {}
    for pos, tok in enumerate(stream):
        first.setdefault(tok, pos)

    out = {r["pct"]: r for r in t29_vocab_growth_curve(spark, root).collect()}
    assert set(out) == set(T29_PCTS)
    for pct in T29_PCTS:
        boundary = (total * pct) // 100
        expect = sum(1 for p in first.values() if p < boundary)
        assert out[pct]["prefix_tokens"] == boundary, pct
        assert out[pct]["vocab_size"] == expect, pct


# ---------------------------------------------------------------------------
# e39 — watermark-delay sweep
# ---------------------------------------------------------------------------

def test_e39_drop_curve_monotone_and_anchored(spark, tmp_path):
    """Exact drop accounting on a crafted out-of-order stream: event 3
    arrives (by event_id) after a high-water mark 400 s ahead of its
    event time, so delays 0/60/300 drop it and 600/900 keep it; event 5
    lags 700 s, surviving only the 900 s delay. The shipped 600 s
    operating point is one of the swept rows. (The sf0.001 stream is
    perfectly arrival-ordered — every delay drops zero there, which is
    itself the e28-verified baseline — so the sweep arms need a crafted
    stream.)"""
    from floorist_spark.operators.events_analytics import (
        E39_DELAYS_S,
        e39_watermark_delay_sweep,
    )

    base = 1_700_000_000  # epoch seconds
    rows = [
        (1, base + 0, 1, "view"),
        (2, base + 1000, 1, "view"),
        (3, base + 600, 2, "view"),    # 400 s late vs the mark at id 2
        (4, base + 2000, 2, "view"),
        (5, base + 1300, 3, "view"),   # 700 s late
    ]
    df = spark.createDataFrame(
        [(i, t, u, e, 1.0, "{}") for i, t, u, e in rows],
        "event_id BIGINT, sec BIGINT, user_id BIGINT, event_type STRING, "
        "value DOUBLE, props STRING",
    ).selectExpr(
        "event_id", "timestamp_seconds(sec) AS ts", "user_id", "event_type",
        "value", "props",
    )
    df.write.parquet(str(tmp_path / "events.parquet"))
    out = {
        r["delay_s"]: r
        for r in e39_watermark_delay_sweep(spark, str(tmp_path)).collect()
    }
    assert set(out) == set(E39_DELAYS_S) and 600 in out
    assert all(r["n_events"] == 5 for r in out.values())
    assert out[0]["n_dropped"] == 2
    assert out[60]["n_dropped"] == 2
    assert out[300]["n_dropped"] == 2
    assert out[600]["n_dropped"] == 1   # only the 700 s straggler
    assert out[900]["n_dropped"] == 0
    for r in out.values():
        assert r["drop_frac"] == r["n_dropped"] / 5


# ---------------------------------------------------------------------------
# d32 — cosine-threshold sweep
# ---------------------------------------------------------------------------

def test_d32_curve_monotone_and_conserving(spark):
    """A higher cosine bar can only keep fewer pairs; droppables plus
    survivors always reconstruct the corpus; d07/d11's shipped 0.35
    operating point is one of the priced rows."""
    from floorist_spark.operators.dedup import d32_cosine_threshold_sweep

    rows = d32_cosine_threshold_sweep(spark, SF_SMOKE).collect()
    taus = [r["tau"] for r in rows]
    assert taus == sorted(taus)
    assert any(abs(t - 0.35) < 1e-12 for t in taus)
    pairs = [r["n_pairs"] for r in rows]
    drops = [r["n_droppable"] for r in rows]
    assert pairs == sorted(pairs, reverse=True)
    assert drops == sorted(drops, reverse=True)
    corpus = rows[0]["n_droppable"] + rows[0]["survivors"]
    for r in rows:
        assert r["n_droppable"] + r["survivors"] == corpus
        assert r["n_vecs_in_pairs"] >= r["n_droppable"]


# ---------------------------------------------------------------------------
# m24 — cross-source duplicate assets
# ---------------------------------------------------------------------------

def test_m24_overlap_matrix_exact(spark, tmp_path):
    """Three sources: a and b share exactly one payload (within-source
    duplicates of it collapse — DISTINCT digests, not rows); c shares
    nothing but still appears with zero overlap (the matrix includes
    zero pairs)."""
    from floorist_spark.operators.multimodal import m24_cross_source_assets

    rows = [
        (1, "shared asset bytes", "en", "a", 18),
        (2, "only in a", "en", "a", 9),
        (3, "shared asset bytes", "en", "b", 18),
        (4, "shared asset bytes", "en", "b", 18),  # within-b duplicate row
        (5, "only in b", "en", "b", 9),
        (6, "only in c", "en", "c", 9),
    ]
    df = spark.createDataFrame(
        rows, "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
    )
    df.write.parquet(str(tmp_path / "documents.parquet"))
    out = {
        (r["source_a"], r["source_b"]): r
        for r in m24_cross_source_assets(spark, str(tmp_path)).collect()
    }
    assert set(out) == {("a", "b"), ("a", "c"), ("b", "c")}
    ab = out[("a", "b")]
    assert ab["n_a"] == 2 and ab["n_b"] == 2  # distinct digests, not rows
    assert ab["shared_assets"] == 1
    assert ab["overlap_frac"] == 0.5
    assert out[("a", "c")]["shared_assets"] == 0
    assert out[("a", "c")]["overlap_frac"] == 0.0
    assert out[("b", "c")]["shared_assets"] == 0
