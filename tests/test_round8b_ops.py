"""Semantics tests for the round-8 wave-14 operators (q45, e38, t28, m23,
d30, c24, s25): each operator's DOCUMENTED behavior is pinned on corpora
crafted to exercise the arms the shipped testdata cannot reach (zero-fill
months, whale-dominated event types, magic-byte container matches,
identical/disjoint source shingle sets), plus the monotonicity laws the
sweep operators' design-input role depends on.

Cross-engine agreement is covered by the oracle gate (selfcheck /
test_llm_operators); these tests pin the VALUES.
"""

from __future__ import annotations

import math

import pytest

from tests.conftest import SF_SMOKE


@pytest.fixture(autouse=True)
def _release():
    yield
    from floorist_spark.operators._cache import release_caches

    release_caches()


# ---------------------------------------------------------------------------
# q45 — recursive gap-fill
# ---------------------------------------------------------------------------

def test_q45_spine_dense_on_testdata(spark):
    """The month spine is contiguous day-1 months spanning [min, max] and
    conserves the order count (no drops, no duplicates from the join)."""
    from floorist_spark.operators.relational import q45_recursive_gapfill

    rows = q45_recursive_gapfill(spark, SF_SMOKE).collect()
    keys = [r["month_start"].year * 12 + r["month_start"].month - 1 for r in rows]
    assert keys == list(range(keys[0], keys[-1] + 1)), "spine has holes"
    assert all(r["month_start"].day == 1 for r in rows)
    total = sum(r["n_orders"] for r in rows)
    exact = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").count()
    assert total == exact, "gap-fill must not drop or duplicate orders"


def test_q45_zero_fills_empty_months(spark, tmp_path):
    """Months with NO orders appear as explicit (0, 0.0) rows — pinned on
    a crafted corpus whose orders skip 1995-02 through 1995-04 (the
    shipped sf dirs happen to cover every month, so the zero-fill arm
    needs a gapped corpus)."""
    from floorist_spark.operators.relational import q45_recursive_gapfill

    rows = [
        (1, 1, "O", 10.0, "1995-01-15 00:00:00", "1-URGENT"),
        (2, 1, "O", 20.0, "1995-01-20 00:00:00", "1-URGENT"),
        (3, 2, "F", 30.0, "1995-05-02 00:00:00", "2-HIGH"),
    ]
    df = spark.createDataFrame(
        rows,
        "o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING, "
        "o_totalprice DOUBLE, o_orderdate STRING, o_orderpriority STRING",
    ).selectExpr(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "CAST(o_orderdate AS TIMESTAMP) AS o_orderdate", "o_orderpriority",
    )
    df.write.parquet(str(tmp_path / "orders.parquet"))
    out = q45_recursive_gapfill(spark, str(tmp_path)).collect()
    assert [str(r["month_start"]) for r in out] == [
        "1995-01-01", "1995-02-01", "1995-03-01", "1995-04-01", "1995-05-01",
    ]
    assert [r["n_orders"] for r in out] == [2, 0, 0, 0, 1]
    assert [r["revenue"] for r in out] == [30.0, 0.0, 0.0, 0.0, 30.0]


# ---------------------------------------------------------------------------
# e38 — user concentration
# ---------------------------------------------------------------------------

def test_e38_hhi_extremes(spark, tmp_path):
    """A whale-dominated type lands near HHI=1 / effective_users~1; a
    perfectly uniform type lands at HHI=1/U exactly (integer arithmetic
    end-to-end, so the equality is exact, not approximate)."""
    from floorist_spark.operators.events_analytics import e38_user_concentration

    rows = []
    eid = 0
    # 'whale': user 1 fires 98 events, users 2..3 one each
    for _ in range(98):
        rows.append((eid, "2024-01-01 00:00:00", 1, "whale", 1.0, "{}")); eid += 1
    for u in (2, 3):
        rows.append((eid, "2024-01-01 00:00:00", u, "whale", 1.0, "{}")); eid += 1
    # 'uniform': 10 users x 5 events
    for u in range(10, 20):
        for _ in range(5):
            rows.append((eid, "2024-01-01 00:00:00", u, "uniform", 1.0, "{}")); eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id BIGINT, ts STRING, user_id BIGINT, event_type STRING, "
        "value DOUBLE, props STRING",
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) AS ts", "user_id", "event_type",
        "value", "props",
    )
    root = str(tmp_path / "events.parquet")
    df.write.parquet(root)
    out = {
        r["event_type"]: r
        for r in e38_user_concentration(spark, str(tmp_path)).collect()
    }
    whale, uni = out["whale"], out["uniform"]
    assert whale["n_events"] == 100 and whale["n_users"] == 3
    assert whale["top_user_events"] == 98
    assert whale["top_user_share"] == 0.98
    assert whale["hhi"] == (98 * 98 + 1 + 1) / 10000
    assert uni["hhi"] == pytest.approx(1 / 10, abs=0)  # exact: 250/2500
    assert uni["effective_users"] == 10.0
    assert uni["top_user_share"] == 0.1


# ---------------------------------------------------------------------------
# t28 — token rarity
# ---------------------------------------------------------------------------

def test_t28_rarity_separates_common_from_unique(spark, tmp_path):
    """A stopword-soup doc scores ABOVE the corpus mean (ratio > 1, not
    rare); an all-unique-vocabulary doc scores mean frequency exactly 1
    (every token is a hapax) and flags rare; an untokenizable doc
    survives with n_tokens=0 and NULL scores."""
    from floorist_spark.operators.text import t28_token_rarity

    common = " ".join(["the quick brown fox"] * 10)  # 4 tokens x 10
    unique = " ".join(f"zzz{i}" for i in range(10))
    rows = [
        (1, common, "en", "a", len(common)),
        (2, common, "en", "a", len(common)),
        (3, unique, "en", "b", len(unique)),
        (4, "", "en", "b", 0),
    ]
    df = spark.createDataFrame(
        rows, "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
    )
    df.write.parquet(str(tmp_path / "documents.parquet"))
    out = {r["doc_id"]: r for r in t28_token_rarity(spark, str(tmp_path)).collect()}
    assert set(out) == {1, 2, 3, 4}
    # each of the 4 common tokens occurs 20x corpus-wide
    assert out[1]["mean_tok_freq"] == 20.0
    assert out[1]["rarity_ratio"] > 1.0 and out[1]["is_rare"] is False
    assert out[3]["mean_tok_freq"] == 1.0
    assert out[3]["is_rare"] is True
    assert out[4]["n_tokens"] == 0
    assert out[4]["mean_tok_freq"] is None and out[4]["is_rare"] is None


# ---------------------------------------------------------------------------
# m23 — declared-vs-sniffed consistency
# ---------------------------------------------------------------------------

def test_m23_verdict_arms(spark, tmp_path):
    """Planted ASCII-representable magic bytes drive every verdict arm:
    a declared image that sniffs GIF matches; a declared video that
    sniffs PDF mismatches; plain prose is text_like. (PNG/JPEG magics
    are non-ASCII and cannot survive the utf-8 payload stand-in — the
    ASCII container signatures cover the CASE arms.)"""
    from floorist_spark.operators.multimodal import m23_label_sniff_consistency

    rows = [
        # doc_id % 3 == 0 -> declared image
        (0, "GIF89a-pretend-gif-bytes", "en", "a", 24),
        # declared image but the bytes say PDF -> container_mismatch
        (3, "%PDF-1.7 pretend pdf", "en", "a", 20),
        # doc_id % 3 == 1 -> declared audio; OggS matches
        (1, "OggS pretend vorbis stream", "en", "a", 26),
        # doc_id % 3 == 2 -> declared video; RIFF matches (avi)
        (2, "RIFF pretend avi container", "en", "a", 26),
        # prose under every declared modality -> text_like
        (6, "just some words", "en", "a", 15),
        (7, "more plain words", "en", "a", 16),
        (8, "and a third doc", "en", "a", 15),
    ]
    df = spark.createDataFrame(
        rows, "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
    )
    df.write.parquet(str(tmp_path / "documents.parquet"))
    out = {
        (r["declared_type"], r["verdict"]): r["n_docs"]
        for r in m23_label_sniff_consistency(spark, str(tmp_path)).collect()
    }
    assert out[("image", "container_match")] == 1       # GIF
    assert out[("image", "container_mismatch")] == 1    # PDF-as-image
    assert out[("audio", "container_match")] == 1       # OggS
    assert out[("video", "container_match")] == 1       # RIFF
    assert out[("image", "text_like")] == 1
    assert out[("audio", "text_like")] == 1
    assert out[("video", "text_like")] == 1


# ---------------------------------------------------------------------------
# d30 — source-pair similarity
# ---------------------------------------------------------------------------

def test_d30_identical_and_disjoint_sources(spark, tmp_path):
    """Two sources with IDENTICAL shingle sets read exact and estimated
    Jaccard 1.0 (equal sets give equal signatures — no estimator noise
    possible); a disjoint third source reads exact 0.0."""
    from floorist_spark.operators.dedup import d30_source_pair_similarity

    body1 = "alpha beta gamma delta epsilon zeta eta theta"
    body2 = "one two three four five six seven eight nine"
    rows = [
        (1, body1, "en", "a", len(body1)),
        (2, body1, "en", "b", len(body1)),
        (3, body2, "en", "c", len(body2)),
    ]
    df = spark.createDataFrame(
        rows, "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
    )
    df.write.parquet(str(tmp_path / "documents.parquet"))
    out = {
        (r["source_a"], r["source_b"]): r
        for r in d30_source_pair_similarity(spark, str(tmp_path)).collect()
    }
    ab = out[("a", "b")]
    assert ab["exact_jaccard"] == 1.0
    assert ab["est_jaccard"] == 1.0 and ab["abs_err"] == 0.0
    ac = out[("a", "c")]
    assert ac["n_inter"] == 0 and ac["exact_jaccard"] == 0.0


# ---------------------------------------------------------------------------
# c24 — decontamination width sweep
# ---------------------------------------------------------------------------

def test_c24_flag_rate_monotone(spark):
    """Any shared n-gram contains shared (n-1)-grams computed from the
    same eval split, so the flagged-doc set can only SHRINK as the width
    grows — the monotonicity that makes the sweep a meaningful operating
    curve. Train-doc count is width-invariant."""
    from floorist_spark.operators.curation import c24_decon_width_sweep

    rows = c24_decon_width_sweep(spark, SF_SMOKE).collect()
    widths = [r["ngram_width"] for r in rows]
    assert widths == sorted(widths)
    flagged = [r["n_flagged"] for r in rows]
    assert flagged == sorted(flagged, reverse=True), (
        "wider n-grams must not flag more docs"
    )
    assert len({r["n_train_docs"] for r in rows}) == 1
    for r in rows:
        assert r["flag_rate"] == r["n_flagged"] / r["n_train_docs"]


# ---------------------------------------------------------------------------
# s25 — quantization width sweep
# ---------------------------------------------------------------------------

def test_s25_distortion_grows_as_bits_shrink(spark):
    """Coarser widths cannot distort LESS: threshold exceedance counts
    and max MSE are non-decreasing from int8 to int2, every vector is
    counted at every width, and int8's worst-case error is small."""
    from floorist_spark.operators.similarity import s25_quantization_width_sweep

    rows = s25_quantization_width_sweep(spark, SF_SMOKE).collect()
    assert [r["bits"] for r in rows] == [8, 4, 2]
    assert len({r["n_vecs"] for r in rows}) == 1
    maxes = [r["max_mse"] for r in rows]
    assert maxes == sorted(maxes), "max distortion must grow as bits shrink"
    for col in ("n_gt_0", "n_gt_1", "n_gt_2"):
        vals = [r[col] for r in rows]
        assert vals == sorted(vals), f"{col} must grow as bits shrink"
    assert rows[0]["max_mse"] < 1e-3
    assert all(not math.isnan(r["max_mse"]) for r in rows)


def test_q45_empty_orders_yields_empty_calendar(spark, tmp_path):
    """An empty orders table produces an EMPTY calendar with the stable
    output schema on both sides — not a crash from None-literals in the
    recursive SQL (Spark) or a single NULL-month row (the oracle's
    scalar-subquery anchor would emit one; the table-form anchor with
    the NULL guard emits zero)."""
    import duckdb

    from floorist_spark.operators.relational import Q45_SQL, q45_recursive_gapfill

    spark.createDataFrame(
        [],
        "o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING, "
        "o_totalprice DOUBLE, o_orderdate TIMESTAMP, o_orderpriority STRING",
    ).write.parquet(str(tmp_path / "orders.parquet"))
    df = q45_recursive_gapfill(spark, str(tmp_path))
    assert df.count() == 0
    assert [f.name for f in df.schema] == ["month_start", "n_orders", "revenue"]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW orders AS SELECT * FROM read_parquet("
        f"'{tmp_path}/orders.parquet/*.parquet')"
    )
    assert con.execute(Q45_SQL).fetchall() == []
