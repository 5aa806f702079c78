"""Scale-up stress test: the dedup pipeline at 50k documents (10x the
sf0.1 corpus) with PLANTED duplicates, so recall is checkable exactly.

Corpus: every 10th doc (id % 10 == 0, id > 0) is an exact copy of its
predecessor; all other docs are unique (40 words derived from the doc id
via md5). Verifies:

* exact dedup finds precisely the planted copies;
* MinHash-LSH candidates include every identical pair (identical docs
  share all band signatures — recall 1.0 by construction);
* connected components merge exactly the planted pairs and nothing
  transitively wrong (cluster count == distinct-text count).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

N_DOCS = 50_000
N_DUPS = (N_DOCS - 1) // 10  # ids 10, 20, ... < N_DOCS


@pytest.fixture(scope="module")
def corpus_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("dedup50k")
    docs = spark.range(N_DOCS).select(
        F.col("id").alias("doc_id"),
        F.expr(
            "concat_ws(' ', transform(sequence(1, 40), j -> "
            "substring(md5(concat(CAST(IF(id > 0 AND pmod(id, 10) = 0, id - 1, id) "
            "AS STRING), ':', CAST(j AS STRING))), 1, 8)))"
        ).alias("text"),
        F.lit("en").alias("lang"),
        F.lit("synthetic").alias("source"),
        F.length(
            F.expr(
                "concat_ws(' ', transform(sequence(1, 40), j -> "
                "substring(md5(concat(CAST(IF(id > 0 AND pmod(id, 10) = 0, id - 1, id) "
                "AS STRING), ':', CAST(j AS STRING))), 1, 8)))"
            )
        ).alias("n_chars"),
    )
    docs.write.parquet(f"file://{d}/documents.parquet")
    return str(d)


@pytest.mark.slow
def test_exact_dedup_finds_planted_copies(spark, corpus_dir):
    from floorist_spark.operators.dedup import d01_exact_dedup

    res = d01_exact_dedup(spark, corpus_dir)
    assert res.count() == N_DOCS - N_DUPS
    dups = res.filter(F.col("n_copies") == 2)
    assert dups.count() == N_DUPS


@pytest.mark.slow
def test_lsh_candidates_have_full_recall_on_identical_pairs(spark, corpus_dir):
    from floorist_spark.operators.dedup import d03_minhash_lsh_candidates

    cand = d03_minhash_lsh_candidates(spark, corpus_dir)
    planted = cand.filter(
        (F.col("doc_b") - F.col("doc_a") == 1) & (F.col("doc_b") % 10 == 0)
    ).count()
    assert planted == N_DUPS  # identical docs share every band signature


@pytest.mark.slow
def test_simhash_pairs_are_exactly_the_planted_dups(spark, corpus_dir):
    # 60-bit fingerprint: random 50k docs produce ~0 spurious hamming<=3
    # pairs (expected ~4e-5), so the pair set is exactly the planted copies
    from floorist_spark.operators.dedup import d06_simhash_near_pairs

    pairs = d06_simhash_near_pairs(spark, corpus_dir)
    assert pairs.count() == N_DUPS
    assert pairs.filter(F.col("hamming") != 0).count() == 0


@pytest.mark.slow
def test_cluster_count_matches_distinct_texts(spark, corpus_dir):
    from floorist_spark.operators.dedup import d09_dedup_clusters

    clusters = d09_dedup_clusters(spark, corpus_dir)
    assert clusters.count() == N_DOCS
    n_clusters = clusters.select("cluster_id").distinct().count()
    # clustering runs on the Jaccard-VERIFIED graph: exactly the planted
    # pairs merge, nothing else (random docs never reach jaccard 0.8)
    assert n_clusters == N_DOCS - N_DUPS


N_DEGEN = 10_000  # identical copies — one band bucket of 10k without the cap
N_UNIQUE = 1_000


@pytest.fixture(scope="module")
def degenerate_dir(spark, tmp_path_factory):
    """Adversarial corpus: a 10k-member identical cohort (every doc the
    same text) plus 1k unique docs. Without MAX_BAND_BUCKET the cohort is
    one bucket per band -> 8 x 10k^2/2 = 400M candidate rows; with it the
    cohort is quarantined and candidates stay near zero."""
    d = tmp_path_factory.mktemp("dedup_degen")
    docs = spark.range(N_DEGEN + N_UNIQUE).select(
        F.col("id").alias("doc_id"),
        F.expr(
            f"IF(id < {N_DEGEN}, "
            "'the same boilerplate document body repeated verbatim everywhere', "
            "concat_ws(' ', transform(sequence(1, 40), j -> "
            "substring(md5(concat(CAST(id AS STRING), ':', CAST(j AS STRING))), 1, 8))))"
        ).alias("text"),
        F.lit("en").alias("lang"),
        F.lit("synthetic").alias("source"),
        F.lit(64).alias("n_chars"),
    )
    docs.write.parquet(f"file://{d}/documents.parquet")
    return str(d)


def test_degenerate_bucket_is_quarantined_not_joined(spark, degenerate_dir):
    """The bucket-size cap keeps the candidate count bounded on a planted
    mass-identical cohort, and the quarantine surface reports the capped
    buckets. (Without the cap this corpus would generate ~400M candidate
    pairs; the bounded-count assert doubles as a does-it-even-finish
    guard.)"""
    from floorist_spark.operators.dedup import (
        NBANDS,
        d01_exact_dedup,
        d03_minhash_lsh_candidates,
        lsh_overflow_buckets,
    )

    over = lsh_overflow_buckets(spark, degenerate_dir)
    rows = over.collect()
    # the identical cohort shares every band signature -> one over-cap
    # bucket per band, each of exactly the cohort size
    assert len(rows) == NBANDS
    assert all(r["bucket_size"] == N_DEGEN for r in rows)

    cand = d03_minhash_lsh_candidates(spark, degenerate_dir)
    # unique docs essentially never collide; the cohort is excluded -> the
    # candidate set stays trivially small instead of ~400M
    assert cand.count() < 1_000

    # the quarantine story: exact dedup collapses the cohort for cents
    exact = d01_exact_dedup(spark, degenerate_dir)
    cohort = exact.filter(F.col("n_copies") == N_DEGEN)
    assert cohort.count() == 1
    assert exact.count() == N_UNIQUE + 1
