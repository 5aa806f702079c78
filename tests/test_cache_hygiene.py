"""Persisted-intermediate hygiene: operator caches (d04's hashed/cand,
d09's pairs) must not accumulate across a catalog sweep — the catalog
boundary releases the previous entry's caches, and release_caches() empties
the persistent-RDD map (VERDICT r2 item 5)."""

from __future__ import annotations

from floorist_spark.operators._cache import release_caches
from floorist_spark.operators.catalog import all_queries

from tests.conftest import SF_SMOKE


def _n_persisted(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def test_catalog_boundary_releases_previous_entry_caches(spark):
    release_caches()  # clean slate regardless of test order
    qs = all_queries()

    df = qs["d04_lsh_jaccard_dedup"](spark, SF_SMOKE)
    df.count()
    assert _n_persisted(spark) >= 2  # hashed-shingle table + candidate pairs

    # building the NEXT catalog entry frees them (the sweep pattern every
    # harness follows: build N, action N, build N+1, ...)
    qs["d01_exact_dedup"](spark, SF_SMOKE).count()
    assert _n_persisted(spark) == 0


def test_release_caches_is_idempotent_and_complete(spark):
    qs = all_queries()
    qs["d09_dedup_clusters"](spark, SF_SMOKE).count()  # persists pairs (+d04's two)
    assert _n_persisted(spark) >= 1
    release_caches()
    assert _n_persisted(spark) == 0
    release_caches()  # second call is a no-op
    assert _n_persisted(spark) == 0
