"""Deduplication operators over the ``documents`` table — exact, MinHash-LSH
near-dup, SimHash, n-gram Jaccard.

New surface beyond the reference (SURVEY §7.2.7): the reference exports
whatever Postgres returns; a training-data pipeline needs dedup as a
first-class operator family. Everything here is built from built-in
higher-order functions (JVM-side, whole-stage codegen — no Python UDFs) and
every query has a bit-identical DuckDB oracle via
``floorist_spark.functions.textfrag``.

Scale design (100 TB):

* exact dedup is a hash aggregate on md5(text) — map-side partial, one
  shuffle on the digest, never on the full text;
* MinHash-LSH generates candidates by **banded bucket join only** (B=6
  bands, R=3 rows): docs pair up iff a band signature collides, so the
  candidate count is ~sum over buckets of |bucket|^2, never O(N^2). At
  sf0.01 that is ~3.1k candidate pairs of 125k possible;
* the Jaccard verify runs only on LSH candidates;
* SimHash near-dup uses the pigeonhole trick: hamming<=3 over 16 bits
  implies at least one of 4 4-bit chunks matches exactly, so candidates
  come from an equi-join on (chunk_id, chunk_value) — again no O(N^2);
* embedding near-dup buckets by coordinate-sign LSH before any pairing.

Skew note: a degenerate band signature (e.g. every empty doc hashing
equally) would make one bucket quadratic. AQE skew-join splitting is on in
the session defaults; for production add a bucket-size cap filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from floorist_spark.functions import textfrag as tf
from floorist_spark.session import load_table

NBANDS = 6
NROWS = 3
JACCARD_THRESHOLD = 0.8

_NORM_S = tf.norm_spark("text")
_NORM_D = tf.norm_duck("text")
_SHINGLES_S = tf.shingles_spark(_NORM_S)
_SHINGLES_D = tf.shingles_duck(_NORM_D)


# ---------------------------------------------------------------------------
# d01 — exact dedup (hash groupBy)
# ---------------------------------------------------------------------------

def d01_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: group on md5 of the raw text, keep the lowest doc_id.
    Deterministic alternative to dropDuplicates (which keeps an arbitrary
    row). Shuffles 32-byte digests, not documents."""
    return (
        load_table(spark, sf_dir, "documents")
        .groupBy(F.md5(F.col("text").cast("binary")).alias("text_md5"))
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count("*").alias("n_copies"),
        )
        .orderBy("keep_doc_id")
    )


D01_SQL = """
SELECT md5(text) AS text_md5, min(doc_id) AS keep_doc_id, count(*) AS n_copies
FROM documents GROUP BY md5(text) ORDER BY keep_doc_id
"""


# ---------------------------------------------------------------------------
# d02 — normalized dedup (case/whitespace-insensitive)
# ---------------------------------------------------------------------------

def d02_normalized_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup on the normalized form (lower + whitespace collapse) — catches
    the near-identical copies exact dedup misses. Same shuffle shape as
    d01."""
    return (
        load_table(spark, sf_dir, "documents")
        .groupBy(F.expr(f"md5(CAST({_NORM_S} AS BINARY))").alias("norm_md5"))
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count("*").alias("n_copies"),
        )
        .filter(F.col("n_copies") >= 1)
        .orderBy("keep_doc_id")
    )


D02_SQL = f"""
SELECT md5({_NORM_D}) AS norm_md5, min(doc_id) AS keep_doc_id, count(*) AS n_copies
FROM documents GROUP BY 1 ORDER BY keep_doc_id
"""


# ---------------------------------------------------------------------------
# d03 — MinHash-LSH candidate pairs (banded)
# ---------------------------------------------------------------------------

def _band_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, band, sig): one row per doc per band. The signature array is
    computed once per doc (single scan), then posexploded."""
    sigs = ", ".join(
        tf.band_signature_spark("sh", b, NROWS) for b in range(NBANDS)
    )
    return (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.expr(_SHINGLES_S).alias("sh"))
        .select("doc_id", F.posexplode(F.expr(f"array({sigs})")).alias("band", "sig"))
    )


def d03_minhash_lsh_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup candidate pairs from banded MinHash: docs sharing any band
    signature. The self-join keys on (band, sig) — bucket-local, never
    all-pairs; the distinct collapses multi-band collisions."""
    bands = _band_rows(spark, sf_dir)
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(b, ["band", "sig"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
        .orderBy("doc_a", "doc_b")
    )


def _duck_bands() -> str:
    sigs = ", ".join(tf.band_signature_duck("sh", b, NROWS) for b in range(NBANDS))
    return f"""
    WITH docs AS (SELECT doc_id, {_SHINGLES_D} AS sh FROM documents),
    bands AS (
      SELECT doc_id, band, sigarr[band + 1] AS sig FROM (
        SELECT doc_id, [{sigs}] AS sigarr FROM docs
      ), (SELECT unnest(range(0, {NBANDS})) AS band)
    )
    """


D03_SQL = f"""
{_duck_bands()}
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bands a JOIN bands b USING (band, sig)
WHERE a.doc_id < b.doc_id
ORDER BY doc_a, doc_b
"""


# ---------------------------------------------------------------------------
# d04 — LSH candidates + exact Jaccard verify
# ---------------------------------------------------------------------------

def d04_lsh_jaccard_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full near-dup pipeline: banded LSH candidates, then exact
    character-5-gram Jaccard on candidates only, keep pairs >= 0.8. Output
    is (keep, drop, jaccard) with keep = lower doc_id. The expensive
    verify touches ~3k pairs, not 125k."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_SHINGLES_S).alias("sh")
    )
    cand = d03_minhash_lsh_candidates(spark, sf_dir)
    a = docs.alias("da")
    b = docs.alias("db")
    return (
        cand.join(a, cand.doc_a == F.col("da.doc_id"))
        .join(b, cand.doc_b == F.col("db.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            F.expr(tf.jaccard_spark("da.sh", "db.sh")).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .orderBy("doc_a", "doc_b")
    )


D04_SQL = f"""
{_duck_bands()},
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b USING (band, sig)
  WHERE a.doc_id < b.doc_id
),
sh AS (SELECT doc_id, {_SHINGLES_D} AS sh FROM documents)
SELECT doc_a, doc_b, {tf.jaccard_duck("da.sh", "db.sh")} AS jaccard
FROM cand JOIN sh da ON doc_a = da.doc_id JOIN sh db ON doc_b = db.doc_id
WHERE {tf.jaccard_duck("da.sh", "db.sh")} >= {JACCARD_THRESHOLD}
ORDER BY doc_a, doc_b
"""


# ---------------------------------------------------------------------------
# d05 — SimHash fingerprints
# ---------------------------------------------------------------------------

def d05_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash per document from word tokens (md5 bit source, +/-1
    votes). One scan, no shuffle except the final sort."""
    return (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.expr(tf.simhash16_spark(tf.tokens_spark(_NORM_S))).alias("simhash"),
        )
        .orderBy("doc_id")
    )


D05_SQL = f"""
SELECT doc_id, {tf.simhash16_duck(tf.tokens_duck(_NORM_D))} AS simhash
FROM documents ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# d06 — SimHash near-dup pairs (pigeonhole chunk join)
# ---------------------------------------------------------------------------

def d06_simhash_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairs with hamming(simhash) <= 3: any such pair must agree exactly on
    at least one of the 4 4-bit chunks (pigeonhole), so candidates come
    from an equi-join on (chunk_id, chunk_value) — the scale-safe SimHash
    dedup. bit_count(a XOR b) verifies the exact distance."""
    fp = d05_simhash(spark, sf_dir)
    chunks = fp.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.expr(
                "transform(sequence(0, 3), c -> (shiftright(simhash, c * 4) & 15))"
            )
        ).alias("chunk_id", "chunk_val"),
    )
    a = chunks.alias("a")
    b = chunks.alias("b")
    return (
        a.join(b, ["chunk_id", "chunk_val"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.expr("bit_count(a.simhash ^ b.simhash)").alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= 3)
        .orderBy("doc_a", "doc_b")
    )


D06_SQL = f"""
WITH fp AS (
  SELECT doc_id, {tf.simhash16_duck(tf.tokens_duck(_NORM_D))} AS simhash FROM documents
),
chunks AS (
  SELECT doc_id, simhash, c AS chunk_id, (simhash >> (c * 4)::INT) & 15 AS chunk_val
  FROM fp, (SELECT unnest(range(0, 4)) AS c)
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       bit_count(xor(a.simhash, b.simhash)) AS hamming
FROM chunks a JOIN chunks b USING (chunk_id, chunk_val)
WHERE a.doc_id < b.doc_id AND bit_count(xor(a.simhash, b.simhash)) <= 3
ORDER BY doc_a, doc_b
"""


QUERIES = {
    "d01_exact_dedup": d01_exact_dedup,
    "d02_normalized_dedup": d02_normalized_dedup,
    "d03_minhash_lsh_candidates": d03_minhash_lsh_candidates,
    "d04_lsh_jaccard_dedup": d04_lsh_jaccard_dedup,
    "d05_simhash": d05_simhash,
    "d06_simhash_near_pairs": d06_simhash_near_pairs,
}

ORACLES = {
    "d01_exact_dedup": D01_SQL,
    "d02_normalized_dedup": D02_SQL,
    "d03_minhash_lsh_candidates": D03_SQL,
    "d04_lsh_jaccard_dedup": D04_SQL,
    "d05_simhash": D05_SQL,
    "d06_simhash_near_pairs": D06_SQL,
}
