"""Adversarial cross-engine parity for the textfrag SQL fragments.

The oracle strategy (`functions/textfrag.py`) rests on each fragment
producing BIT-IDENTICAL values in Spark and DuckDB. The catalog checks
that on the synthetic corpus; this suite attacks the fragments directly
with hostile inputs — empty strings, single chars, unicode, SQL-quote
chars, whitespace runs, long repeats — plus a seeded random corpus.
"""

from __future__ import annotations

import random
import string

import pandas as pd
import pytest

from floorist_spark.functions import textfrag as tf

EDGE_CASES = [
    "",
    " ",
    "a",
    "ab",
    "     ",
    "\t\n  mixed \t whitespace \n",
    "UPPER lower MiXeD",
    "it's a quote ' and a \" double",
    "semi; colon -- comment 'quote",
    "héllo wörld çafé",
    "日本語のテキストです",
    "emoji 🎉 test",
    "repeat " * 50,
    "x" * 500,
    "1234567890 numbers 42",
    "punct!@#$%^&*()_+-=[]{}|;:,.<>?/~`",
    "trailing space ",
    " leading space",
    "a  b   c    d",
]


def _corpus() -> list[str]:
    rng = random.Random(20260813)
    alphabet = string.ascii_letters + string.digits + "  \t'\"-éü."
    randoms = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 120)))
        for _ in range(80)
    ]
    return EDGE_CASES + randoms


@pytest.fixture(scope="module")
def frames(spark):
    import duckdb

    pdf = pd.DataFrame(
        {"doc_id": range(len(_corpus())), "text": _corpus()}
    )
    sdf = spark.createDataFrame(pdf)
    sdf.createOrReplaceTempView("frag_docs")
    con = duckdb.connect()
    con.register("frag_docs", pdf)
    yield spark, con
    con.close()


def _compare(spark, con, spark_expr: str, duck_expr: str, name: str) -> None:
    sp = (
        spark.sql(f"SELECT doc_id, {spark_expr} AS v FROM frag_docs ORDER BY doc_id")
        .toPandas()["v"]
        .tolist()
    )
    du = con.execute(
        f"SELECT {duck_expr} AS v FROM frag_docs ORDER BY doc_id"
    ).fetchdf()["v"].tolist()
    for i, (a, b) in enumerate(zip(sp, du)):
        if isinstance(a, list) or hasattr(a, "__len__") and not isinstance(a, str):
            a, b = list(a), list(b)
        assert a == b, (
            f"{name}: mismatch on doc {i} ({_corpus()[i]!r}): spark={a!r} duck={b!r}"
        )


NORM_S, NORM_D = tf.norm_spark("text"), tf.norm_duck("text")


def test_norm_parity(frames):
    _compare(*frames, NORM_S, NORM_D, "norm")


def test_shingle_parity(frames):
    spark, con = frames
    # materialize nrm per the fragment contract (lambda re-eval rule)
    sp = spark.sql(
        f"SELECT doc_id, {tf.shingles_spark('nrm')} AS v FROM "
        f"(SELECT doc_id, {NORM_S} AS nrm FROM frag_docs) ORDER BY doc_id"
    ).toPandas()["v"].tolist()
    du = con.execute(
        f"SELECT {tf.shingles_duck(NORM_D)} AS v FROM frag_docs ORDER BY doc_id"
    ).fetchdf()["v"].tolist()
    for i, (a, b) in enumerate(zip(sp, du)):
        assert list(a) == list(b), f"shingles: doc {i}: {a!r} != {b!r}"


def test_base_hash_parity(frames):
    _compare(
        *frames,
        tf.base_hash_spark("text"),
        tf.base_hash_duck("text"),
        "base_hash",
    )


def test_affine_minhash_parity(frames):
    spark, con = frames
    for i in (0, 7, 31):
        sp_expr = (
            f"min({tf.affine_spark('h', i)})"
        )
        sp = spark.sql(
            f"SELECT doc_id, {sp_expr} AS v FROM ("
            f"  SELECT doc_id, {tf.base_hash_spark('s')} AS h FROM ("
            f"    SELECT doc_id, explode({tf.shingles_spark('nrm')}) AS s FROM ("
            f"      SELECT doc_id, {NORM_S} AS nrm FROM frag_docs)))"
            f" GROUP BY doc_id ORDER BY doc_id"
        ).toPandas()["v"].tolist()
        du = con.execute(
            f"SELECT {tf.minhash_duck(tf.hashes_duck(tf.shingles_duck(NORM_D)), i)} AS v "
            f"FROM frag_docs ORDER BY doc_id"
        ).fetchdf()["v"].tolist()
        assert sp == [int(x) for x in du], f"minhash fn {i} mismatch"


def test_simhash_parity(frames):
    spark, con = frames
    bits = 16
    votes = ", ".join(
        f"{tf.simhash_vote_spark('d', j, bits)} AS v{j}" for j in range(bits)
    )
    add = " + ".join(
        f"IF(v{j} > 0, CAST({1 << j} AS BIGINT), CAST(0 AS BIGINT))"
        for j in range(bits)
    )
    sp = spark.sql(
        f"SELECT doc_id, {add} AS v FROM ("
        f"  SELECT doc_id, {votes} FROM ("
        f"    SELECT doc_id, md5(t) AS d FROM ("
        f"      SELECT doc_id, explode({tf.tokens_spark(NORM_S)}) AS t FROM frag_docs))"
        f"  GROUP BY doc_id) ORDER BY doc_id"
    ).toPandas()["v"].tolist()
    du = con.execute(
        f"SELECT {tf.simhash_duck(tf.digests_duck(tf.tokens_duck(NORM_D)), bits)} AS v "
        f"FROM frag_docs ORDER BY doc_id"
    ).fetchdf()["v"].tolist()
    assert sp == [int(x) for x in du]


def test_cosine_parity(frames):
    spark, con = frames
    rng = random.Random(7)
    vecs = [[rng.uniform(-1, 1) for _ in range(16)] for _ in range(40)]
    pdf = pd.DataFrame(
        {
            "i": range(20),
            "a": [[float(f"{x:.6g}") for x in v] for v in vecs[:20]],
            "b": [[float(f"{x:.6g}") for x in v] for v in vecs[20:]],
        }
    )
    spark.createDataFrame(pdf).createOrReplaceTempView("vec_pairs")
    con.register("vec_pairs", pdf)
    sp = spark.sql(
        f"SELECT i, {tf.cosine_spark('a', 'b')} AS v FROM vec_pairs ORDER BY i"
    ).toPandas()["v"].tolist()
    du = con.execute(
        f"SELECT {tf.cosine_duck('a', 'b')} AS v FROM vec_pairs ORDER BY i"
    ).fetchdf()["v"].tolist()
    assert sp == du  # exact float equality — strict left-fold on both sides


def test_decimal_sum_render_parity_beyond_2pow53(frames):
    """Regression for the q11 sum_charge 1-ulp drift found at sf0.1: a
    decimal whose scaled integer exceeds 2^53 converts to double in ONE
    rounding on the JVM but TWO in DuckDB (double(int128)/10^scale), so a
    direct decimal→double cast may differ by 1 ulp between engines. The
    engine therefore renders decimal aggregates via an exact decimal
    STRING (correctly-rounded parse on both sides) — this pins that route
    on adversarial magnitudes, including the original failing value."""
    spark, con = frames
    values = [
        "2786415501.094158600000",   # the sf0.1 q11 failure, scale 12
        "9007199254740993.000001",   # 2^53 + 1 territory
        "1234567890123.456789999999",
        "999999999999999.999999999999",
        "0.000000000001",
        "-2786415501.094158600000",
    ]
    for v in values:
        frag = f"CAST(CAST(CAST('{v}' AS DECIMAL(38,12)) AS STRING) AS DOUBLE)"
        sp = spark.sql(f"SELECT {frag} AS x").collect()[0]["x"]
        du = con.execute(f"SELECT {frag} AS x").fetchone()[0]
        assert sp == du and sp is not None, f"{v}: spark={sp!r} duck={du!r}"
