"""Crafted-case semantics for d26 (duplicate-cluster size census):
planted clusters of known sizes/chars with hand-computed bucket rows,
the head-first cumulative savings, a mass-duplicated stress corpus, and
the executed-plan pin for the digest-only exchange claim."""

from __future__ import annotations

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
