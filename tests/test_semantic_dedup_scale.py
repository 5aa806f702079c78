"""Scale-up stress for semantic dedup (d11) at 5k vectors (10x sf0.01)
with PLANTED exact-duplicate embeddings, so pruning is checkable exactly.

Corpus: every 10th vector (id % 10 == 0, id > 0) is a bit-exact copy of
its predecessor; all others are unique pseudo-random 64-dim vectors
derived from the id. At the PRODUCTION threshold (cosine >= 0.95) random
64-dim pairs sit ~7 sigma below the bar, so the expected prune set is
exactly the planted copies — the same planted-recall method that caught
the 32-bit SimHash birthday effect in test_dedup_scale.py."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from floorist_spark.operators.dedup import COSINE_DUP_THRESHOLD, d11_semantic_dedup

N_VECS = 5_000
DIM = 64

#: element j of vector id: md5-derived uniform in [-0.5, 0.5); copies take
#: their predecessor's id as seed
_SEED = "IF(id > 0 AND pmod(id, 10) = 0, id - 1, id)"
_EMB = (
    f"transform(sequence(1, {DIM}), j -> CAST("
    f"conv(substring(md5(concat(CAST({_SEED} AS STRING), ':', CAST(j AS STRING))), 1, 4), 16, 10) "
    f"/ 65536.0 - 0.5 AS FLOAT))"
)


@pytest.fixture(scope="module")
def emb_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("semdedup5k")
    spark.range(N_VECS).select(
        F.col("id").alias("vec_id"),
        F.expr(_EMB).alias("embedding"),
        F.lit(0).alias("label"),
    ).write.parquet(f"file://{d}/embeddings.parquet")
    return str(d)


@pytest.mark.slow
def test_semantic_dedup_prunes_exactly_the_planted_copies(spark, emb_dir):
    out = d11_semantic_dedup(spark, emb_dir, threshold=COSINE_DUP_THRESHOLD)
    rows = out.collect()
    assert len(rows) == N_VECS
    dropped = {r["vec_id"] for r in rows if not r["is_kept"]}
    planted = {i for i in range(10, N_VECS, 10)}
    # identical vectors share the nearest centroid (deterministic argmax),
    # so every planted copy lands in its original's cluster and is pruned;
    # nothing else crosses the 0.95 bar
    assert dropped == planted


@pytest.mark.slow
def test_semantic_dedup_plan_is_cluster_bounded(spark, emb_dir):
    plan = (
        d11_semantic_dedup(spark, emb_dir, threshold=COSINE_DUP_THRESHOLD)
        ._jdf.queryExecution()
        .sparkPlan()
        .toString()
    )
    # pairing must equi-join the cluster key, never cross-join the corpus
    assert "CartesianProduct" not in plan
    # the only cross join is the broadcast of the tiny centroid set
    assert "BroadcastNestedLoopJoin" in plan
