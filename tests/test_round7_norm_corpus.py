"""Planted divergence-character corpus vs the token-count-sensitive
operators (round-7 judge task 5).

The local testdata is pure ASCII at every scale, which is why two rounds
of green selfcheck sweeps proved nothing about the Java-vs-DuckDB norm
divergence that made d15/c20 driver-red (U+000B under ``\\s``;
``lower('İ')``; final-Σ folding — see functions/textfrag.py). This suite
plants exactly those characters into a crafted documents table and runs
the affected catalog entries through BOTH engines, asserting the driver's
own comparison discipline (count + schema + order-insensitive values),
plus hand-computed token counts for the census probe.
"""

from __future__ import annotations

import duckdb
import pytest

from tests.oracle_compare import compare_results

#: (doc_id, text, expected token count under the ASCII-fold norm).
#: Counts are computed by hand: the canonical form folds A-Z only,
#: treats exactly {TAB LF VT FF CR SPACE} as whitespace, collapses runs,
#: and trims — İ/Σ/ß/NBSP/em-space/U+2028/U+3000/U+200B pass through.
PLANTED = [
    (0, "a\x0bb", 2),                      # VT is a separator in both engines
    (1, "a\x0b\x0c\r\n\tb c", 3),
    (2, "İstanbul ile ı I", 4),            # Turkish dotted/dotless i
    (3, "ΟΣ ΒΑΣΙΛΕΥΣ ΤΕΛΟΣ.", 3),          # final-sigma contexts
    (4, "nb\u00a0sp stays", 2),                # NBSP is NOT whitespace → 1 glued token
    (5, "em\u2003wide", 1),                    # em space glues too
    (6, "line sep", 1),               # U+2028 line separator
    (7, "ideo　space", 1),                 # U+3000
    (8, "zero​width", 1),                  # U+200B
    (9, "straße GROSS ß", 3),
    (10, "combining á mark", 3),
    (11, "  plain ASCII Text\t with  runs \n", 5),
    (12, "ΣΣΣ İİİ", 2),
    (13, "", 1),                           # split('') → [''] in both engines
    (14, "\x0b\x0c\r\n\t", 1),             # all-whitespace → trim → ['']
]


@pytest.fixture(scope="module")
def corpus_dir(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("norm_corpus")
    rows = [
        (doc_id, text, "xx" if doc_id % 2 else "en", f"src{doc_id % 3}", len(text))
        for doc_id, text, _ in PLANTED
    ]
    df = spark.createDataFrame(
        rows, "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
    )
    df.coalesce(1).write.parquet(f"{root}/documents.parquet")
    return str(root)


@pytest.fixture(scope="module")
def duck_planted(corpus_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE OR REPLACE VIEW documents AS "
        f"SELECT * FROM read_parquet('{corpus_dir}/documents.parquet/*.parquet')"
    )
    yield con
    con.close()


@pytest.fixture(autouse=True)
def _release():
    yield
    from floorist_spark.operators._cache import release_caches

    release_caches()


def test_d15a_token_census_hand_computed(spark, corpus_dir, duck_planted):
    """Token counts on the planted corpus match the hand-derived values in
    BOTH engines — the exact integer whose drift made d15/c20 red."""
    from floorist_spark.operators.dedup import D15A_SQL, d15a_token_census

    want = {doc_id: ntok for doc_id, _, ntok in PLANTED}
    sp = {
        r["doc_id"]: r["ntok"]
        for r in d15a_token_census(spark, corpus_dir).collect()
    }
    du = dict(duck_planted.execute(D15A_SQL).fetchall())
    assert sp == want, f"spark census drifted: {sp} != {want}"
    assert du == want, f"duck census drifted: {du} != {want}"


@pytest.mark.parametrize(
    "entry",
    [
        "d15a_token_census",
        "d15b_norm_digest",
        "d15_passage_dedup",
        "c20_shard_manifest",
        "c12_passage_chunks",
        "c21_ctx_length_sweep",
        "t17_token_diversity",
        "d02_normalized_dedup",
    ],
)
def test_token_sensitive_entries_cross_engine(entry, spark, corpus_dir, duck_planted):
    """Every gated entry whose output is an exact function of per-doc
    token counts or norm digests must hash-match DuckDB on the planted
    divergence corpus — the check the driver effectively runs on ITS
    corpus, reproduced locally."""
    from floorist_spark.operators.catalog import all_oracles, all_queries

    df = all_queries()[entry](spark, corpus_dir)
    duck_pdf = duck_planted.execute(all_oracles()[entry]).fetchdf()
    compare_results(df.toPandas(), duck_pdf, entry)
