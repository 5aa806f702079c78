"""Crafted-corpus semantics for the round-8 additions (s24; d15c planted
shape) beyond the testdata cross-engine gate.

s24's merge flag can never fire on the shipped synthetic embeddings (the
first-K centroids are well separated), so the flag arm is exercised here
with a planted geometry: two centroids nearly coincident, the rest far
apart — the redundant pair must be the ONLY merge candidates, mutually
nearest, and the audit must agree with DuckDB value-for-value on the
crafted table too.
"""

from __future__ import annotations

import duckdb
import pytest

from tests.oracle_compare import compare_results

EMB_DIM = 64
N_CENTROIDS = 8


def _vec(base: float, bump_at: int = -1, bump: float = 0.0) -> list[float]:
    v = [base] * EMB_DIM
    if bump_at >= 0:
        v[bump_at] += bump
    return v


@pytest.fixture(scope="module")
def planted_dir(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("s24_planted")
    rows = []
    # base 1.0 everywhere — a zero vector would zero-norm s03's cosine.
    # centroids 0 and 1: nearly coincident (margin = 0.01^2 on one dim);
    # centroids 2..7: spread on distinct axes, pairwise margin >= 100
    rows.append((0, _vec(1.0), 0))
    rows.append((1, _vec(1.0, 0, 0.01), 0))
    for c in range(2, N_CENTROIDS):
        rows.append((c, _vec(1.0, c, 10.0 * c), c % 3))
    # a few corpus vectors so cell sizes are nonzero and uneven
    for i in range(N_CENTROIDS, N_CENTROIDS + 12):
        rows.append((i, _vec(1.0, i % 6 + 2, 10.0 * (i % 6 + 2) + 0.5), i % 3))
    df = spark.createDataFrame(
        rows, "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT"
    )
    df.coalesce(1).write.parquet(f"{root}/embeddings.parquet")
    return str(root)


@pytest.fixture(autouse=True)
def _release():
    yield
    from floorist_spark.operators._cache import release_caches

    release_caches()


def test_s24_merge_flag_on_planted_geometry(spark, planted_dir):
    from floorist_spark.operators.similarity import s24_centroid_separation

    out = {
        r["centroid_id"]: r
        for r in s24_centroid_separation(spark, planted_dir).collect()
    }
    assert len(out) == N_CENTROIDS
    # the coincident pair: mutually nearest, tiny margin, flagged
    assert out[0]["nn_centroid"] == 1 and out[1]["nn_centroid"] == 0
    assert out[0]["merge_candidate"] and out[1]["merge_candidate"]
    assert out[0]["margin"] < 0.001
    # every spread centroid: unflagged, margin ratio >= 1 of the median
    for c in range(2, N_CENTROIDS):
        assert not out[c]["merge_candidate"], c
        assert out[c]["margin"] > 1.0
    # cell sizes cover the whole corpus exactly once
    assert sum(r["cell_size"] for r in out.values()) == N_CENTROIDS + 12


def test_s24_cross_engine_on_planted_geometry(spark, planted_dir):
    from floorist_spark.operators.similarity import (
        S24_SQL,
        s24_centroid_separation,
    )

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS "
        f"SELECT * FROM read_parquet('{planted_dir}/embeddings.parquet/*.parquet')"
    )
    compare_results(
        s24_centroid_separation(spark, planted_dir).toPandas(),
        con.execute(S24_SQL).fetchdf(),
        "s24 planted",
    )
    con.close()


def test_d15c_counts_planted_duplicates(spark, tmp_path):
    """d15c on a corpus with known multiplicity: 6 rows, 4 ids, 2 ids
    duplicated (2+2 rows), 5 distinct texts."""
    from floorist_spark.operators.dedup import d15c_multiplicity_census

    rows = [
        (1, "a"), (1, "a"),          # same-text duplicate
        (2, "b"), (2, "c"),          # different-text duplicate
        (3, "d"), (4, "e"),
    ]
    df = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in rows],
        "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT",
    )
    root = str(tmp_path)
    df.coalesce(1).write.parquet(f"{root}/documents.parquet")
    r = d15c_multiplicity_census(spark, root).collect()[0]
    assert (
        r["n_rows"],
        r["n_doc_ids"],
        r["n_texts"],
        r["n_rows_with_dup_id"],
    ) == (6, 4, 5, 4)
