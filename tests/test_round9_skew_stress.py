"""Planted-skew stress for the round-8 births (round-8 verdict task 7):
d30 under a dominant source, t28 under a hot token, e38 under a single
whale user — each at a synthetic 10-50x multiplier over the smoke corpus
with EXACT expected outputs (the corpora are constructed so the right
answer is closed-form, making correctness-under-skew a value check, not
a tolerance), plus the plan-shape guarantees the operators' docstrings
claim.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "extended"
    )


# ---------------------------------------------------------------------------
# d30 — dominant source: 95% of rows in one source, tiny twin + disjoint
# ---------------------------------------------------------------------------

N_DOM = 50_000  # dominant-source rows (~100x the smoke corpus's per-source)
N_TEXTS = 40    # distinct texts inside the dominant source


@pytest.mark.slow
def test_d30_exact_under_dominant_source(spark, tmp_path):
    """Source A holds 50k rows over 40 distinct texts; source B holds ONE
    copy of each of those texts; source C is disjoint. Shingle SETS are
    therefore A == B and A ∩ C == ∅: exact_jaccard must be exactly 1.0
    and 0.0 — mass duplication inside the dominant source must not leak
    into the per-source distinct-set math (the (source, digest) DISTINCT
    is the skew absorber)."""
    from floorist_spark.operators.catalog import all_queries

    texts = [
        f"dominant corpus text number {i} with shared tokens alpha beta gamma {i}"
        for i in range(N_TEXTS)
    ]
    dom = spark.range(N_DOM).select(
        F.col("id").alias("doc_id"),
        F.expr(
            "element_at(array({}), CAST(pmod(id, {}) + 1 AS INT))".format(
                ", ".join(f"'{t}'" for t in texts), N_TEXTS
            )
        ).alias("text"),
        F.lit("en").alias("lang"),
        F.lit("srcA").alias("source"),
        F.lit(64).cast("bigint").alias("n_chars"),
    )
    twin = spark.createDataFrame(
        [(N_DOM + i, t, "en", "srcB", len(t)) for i, t in enumerate(texts)],
        "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT",
    )
    disjoint = spark.createDataFrame(
        [
            (N_DOM + N_TEXTS + i, f"completely different material {i} zeta", "en",
             "srcC", 30)
            for i in range(10)
        ],
        "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT",
    )
    dom.unionByName(twin).unionByName(disjoint).write.parquet(
        str(tmp_path / "documents.parquet")
    )

    df = all_queries()["d30_source_pair_similarity"](spark, str(tmp_path))
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    rows = {(r["source_a"], r["source_b"]): r for r in df.collect()}
    assert rows[("srcA", "srcB")]["exact_jaccard"] == 1.0
    assert rows[("srcA", "srcB")]["n_sig_match"] == 32  # identical signatures
    assert rows[("srcA", "srcC")]["exact_jaccard"] == 0.0
    assert rows[("srcB", "srcC")]["exact_jaccard"] == 0.0

    from floorist_spark.operators._cache import release_caches, release_memos

    release_caches()
    release_memos()


# ---------------------------------------------------------------------------
# t28 — hot token: one token in EVERY doc, the rest hapax
# ---------------------------------------------------------------------------

N_T28_DOCS = 60_000


@pytest.mark.slow
def test_t28_exact_under_hot_token(spark, tmp_path):
    """60k docs, each 'hot uniq<i>': the token 'hot' appears 60k times
    (a vocabulary whale) while every 'uniq<i>' is hapax. Expected values
    are closed-form: every doc has n_tokens=2, mean_tok_freq
    = (60000 + 1) / 2 exactly. The frequency join must stay a
    digest-co-partitioned shuffle join — the docstring's explicit
    NOT-broadcast contract — because a real vocab does not fit a
    broadcast."""
    from floorist_spark.operators.catalog import all_queries

    spark.range(N_T28_DOCS).select(
        F.col("id").alias("doc_id"),
        F.expr("concat('hot uniq', CAST(id AS STRING))").alias("text"),
        F.lit("en").alias("lang"),
        F.lit("src0").alias("source"),
        F.lit(12).cast("bigint").alias("n_chars"),
    ).write.parquet(str(tmp_path / "documents.parquet"))

    # the frequency join carries no broadcast HINT: with auto-broadcast
    # disabled (what a billion-row vocab effectively does via sizes) the
    # plan must degrade to a digest-co-partitioned shuffle join, and the
    # exact values must be identical either way
    before = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = all_queries()["t28_token_rarity"](spark, str(tmp_path))
        plan = _plan(df)
        assert "SortMergeJoin [d#" in plan or "SortMergeJoin [[]d#" in plan or (
            "SortMergeJoin" in plan and "BroadcastHashJoin" not in plan
        ), plan[:2000]
        expected = (N_T28_DOCS + 1) / 2
        sample = df.filter(F.col("doc_id") < 100).collect()
        assert len(sample) == 100
        for r in sample:
            assert r["n_tokens"] == 2
            assert r["mean_tok_freq"] == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", before)

    from floorist_spark.operators._cache import release_caches, release_memos

    release_caches()
    release_memos()


# ---------------------------------------------------------------------------
# e38 — whale user: one user owns exactly half of one event type
# ---------------------------------------------------------------------------

N_COLD = 500
PER_COLD = 100
N_WHALE = N_COLD * PER_COLD  # whale matches the cold mass → share 1/2


@pytest.mark.slow
def test_e38_exact_under_whale_user(spark, tmp_path):
    """100k 'click' events: user 0 owns exactly half, 500 cold users own
    100 each. HHI is exact rational arithmetic: (n/2)² + 500·100² over
    n², and top_user_share is exactly 0.5 — the DECIMAL(38,0) squared
    sums must survive a squared count of 2.5e9 without overflow or
    float drift."""
    from floorist_spark.operators.catalog import all_queries

    total = 2 * N_WHALE
    spark.range(total).select(
        F.col("id").alias("event_id"),
        F.expr("timestamp_seconds(1700000000 + id)").alias("ts"),
        F.expr(
            f"IF(id < {N_WHALE}, CAST(0 AS BIGINT), "
            f"pmod(id, {N_COLD}) + 1)"
        ).alias("user_id"),
        F.lit("click").alias("event_type"),
        F.lit(1.0).alias("value"),
        F.lit("{}").alias("props"),
    ).write.parquet(str(tmp_path / "events.parquet"))

    df = all_queries()["e38_user_concentration"](spark, str(tmp_path))
    rows = {r["event_type"]: r for r in df.collect()}
    r = rows["click"]
    assert r["n_events"] == total
    assert r["n_users"] == N_COLD + 1
    assert r["top_user_events"] == N_WHALE
    assert r["top_user_share"] == 0.5
    hhi_num = N_WHALE * N_WHALE + N_COLD * PER_COLD * PER_COLD
    assert r["hhi"] == hhi_num / (total * total)

    from floorist_spark.operators._cache import release_caches, release_memos

    release_caches()
    release_memos()
