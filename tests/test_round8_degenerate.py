"""Degenerate-corpus cross-engine parity for the round-8 review fixes.

A medium-effort review pass executed the new operators against corpora the
shipped testdata never produces and found four real divergences (plus two
latent zero-denominator ratios): t29 emitted ZERO rows on a zero-token
corpus while its oracle's constant-select curve always emits |T29_PCTS|;
d15c summed to NULL on an empty table where its oracle renders 0; the
e28/e39 lateness helper clamped the high-water mark at epoch zero,
scoring pre-1970 corpora as late where the oracle scored 0; and q45's
recursion died at Spark's default 100-level limit on a >8-year calendar
the oracle handles unbounded. Each fix is pinned here by running the
REAL operator against the REAL oracle on the degenerate corpus.
"""

from __future__ import annotations

import hashlib

import duckdb
import pytest

from tests.oracle_compare import compare_results


@pytest.fixture(autouse=True)
def _release():
    yield
    from floorist_spark.operators._cache import release_caches

    release_caches()


def _docs_parquet(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows, "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
    )
    df.write.parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def _duck_for(root: str, table: str = "documents") -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW {table} AS SELECT * FROM read_parquet("
        f"'{root}/{table}.parquet/*.parquet')"
    )
    return con


def _entry(name: str):
    from floorist_spark.operators.catalog import all_oracles, all_queries

    return all_queries()[name], all_oracles()[name]


@pytest.mark.parametrize("texts", [[], ["", ""]], ids=["empty-table", "zero-token"])
def test_t29_curve_row_count_invariant(spark, tmp_path, texts):
    """t29 must emit one row per T29_PCTS even when the corpus has no
    tokens at all — the groupBy that silently dropped to zero rows is
    now a global aggregate with driver-collected boundaries."""
    from floorist_spark.operators.text import T29_PCTS

    rows = [(i, t, "en", "x", len(t)) for i, t in enumerate(texts)]
    root = _docs_parquet(spark, tmp_path, rows)
    fn, sql = _entry("t29_vocab_growth_curve")
    spark_pdf = fn(spark, root).toPandas()
    assert len(spark_pdf) == len(T29_PCTS)
    duck_pdf = _duck_for(root).execute(sql).fetchdf()
    compare_results(spark_pdf, duck_pdf, "t29_degenerate")


def test_d15c_zero_corpus_renders_zero(spark, tmp_path):
    """The corpus-shape probe must read (0, 0, 0, 0) on an empty corpus
    — not NULL in the dup-rows slot — or the probe itself gates red on
    exactly the degenerate corpus it exists to diagnose."""
    root = _docs_parquet(spark, tmp_path, [])
    fn, sql = _entry("d15c_multiplicity_census")
    spark_pdf = fn(spark, root).toPandas()
    assert spark_pdf.iloc[0].tolist() == [0, 0, 0, 0]
    compare_results(spark_pdf, _duck_for(root).execute(sql).fetchdf(), "d15c_empty")


def test_d32_empty_embeddings_keeps_tau_spine(spark, tmp_path):
    """The tau dimension is a constant spine: an empty embeddings table
    still yields one row per threshold, with NULL drop_frac on BOTH
    engines (zero-denominator guard), zero pairs, zero survivors."""
    spark.createDataFrame(
        [], "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT"
    ).write.parquet(str(tmp_path / "embeddings.parquet"))
    fn, sql = _entry("d32_cosine_threshold_sweep")
    spark_pdf = fn(spark, str(tmp_path)).toPandas()
    assert len(spark_pdf) == 5
    assert spark_pdf["drop_frac"].isna().all()
    con = _duck_for(str(tmp_path), "embeddings")
    compare_results(spark_pdf, con.execute(sql).fetchdf(), "d32_empty")


def test_c24_zero_train_split_is_null_not_nan(spark, tmp_path):
    """A corpus whose every doc hashes into the eval split leaves zero
    train docs: flag_rate must be NULL on both engines, not a
    0/0-dependent NULL-vs-NaN coin flip."""

    def bucket(doc_id: int) -> int:
        return int(hashlib.md5(f"split:{doc_id}".encode()).hexdigest()[:4], 16) % 100

    eval_ids = [i for i in range(3000) if bucket(i) >= 90][:6]
    assert len(eval_ids) == 6
    rows = [(i, f"tok{i} alpha beta gamma", "en", "x", 20) for i in eval_ids]
    root = _docs_parquet(spark, tmp_path, rows)
    fn, sql = _entry("c24_decon_width_sweep")
    spark_pdf = fn(spark, root).toPandas()
    assert (spark_pdf["n_train_docs"] == 0).all()
    assert spark_pdf["flag_rate"].isna().all()
    compare_results(spark_pdf, _duck_for(root).execute(sql).fetchdf(), "c24_zero_train")


def test_lateness_pre1970_matches_oracle(spark, tmp_path):
    """Pre-epoch event times: the old coalesce-to-0 floor invented an
    epoch-zero high-water mark and scored every pre-1970 event as late;
    both e28 and e39 must now agree with the oracle's NULL-propagating
    window max (first arrival is never late; only genuine reordering
    is)."""
    rows = [
        # arrival order = event_id; all event times in 1960
        (1, -315619200, 1, "view"),        # first arrival: never late
        (2, -315618200, 1, "view"),        # forward in time: not late
        (3, -315618500, 2, "view"),        # 300 s behind the mark: late
    ]
    df = spark.createDataFrame(
        [(i, s, u, e, 1.0, "{}") for i, s, u, e in rows],
        "event_id BIGINT, sec BIGINT, user_id BIGINT, event_type STRING, "
        "value DOUBLE, props STRING",
    ).selectExpr(
        "event_id", "timestamp_seconds(sec) AS ts", "user_id", "event_type",
        "value", "props",
    )
    df.write.parquet(str(tmp_path / "events.parquet"))
    con = _duck_for(str(tmp_path), "events")
    for name in ("e28_lateness_audit", "e39_watermark_delay_sweep"):
        fn, sql = _entry(name)
        compare_results(
            fn(spark, str(tmp_path)).toPandas(),
            con.execute(sql).fetchdf(),
            f"{name}_pre1970",
        )
    fn, _ = _entry("e39_watermark_delay_sweep")
    out = {r["delay_s"]: r for r in fn(spark, str(tmp_path)).collect()}
    assert out[0]["n_dropped"] == 1      # only the genuine straggler
    assert out[600]["n_dropped"] == 0    # 300 s lateness survives 600 s


def test_q45_calendar_beyond_recursion_default(spark, tmp_path):
    """A 120-month order span exceeds Spark's default 100-level
    recursion limit; q45 must raise the limit to the span and return
    the full dense calendar instead of throwing."""
    rows = [
        (1, 1, "O", 10.0, "1990-01-15 00:00:00", "1-URGENT"),
        (2, 2, "F", 20.0, "1999-12-20 00:00:00", "2-HIGH"),
    ]
    df = spark.createDataFrame(
        rows,
        "o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING, "
        "o_totalprice DOUBLE, o_orderdate STRING, o_orderpriority STRING",
    ).selectExpr(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "CAST(o_orderdate AS TIMESTAMP) AS o_orderdate", "o_orderpriority",
    )
    df.write.parquet(str(tmp_path / "orders.parquet"))
    fn, sql = _entry("q45_recursive_gapfill")
    before = spark.conf.get("spark.sql.cteRecursionLevelLimit")
    df = fn(spark, str(tmp_path))
    # the raise must be scoped: the session conf is already back to its
    # pre-call value by the time the DataFrame is handed out, and the
    # result still materializes the full 120-month calendar afterwards
    assert spark.conf.get("spark.sql.cteRecursionLevelLimit") == before
    spark_pdf = df.toPandas()
    assert len(spark_pdf) == 120
    con = _duck_for(str(tmp_path), "orders")
    compare_results(spark_pdf, con.execute(sql).fetchdf(), "q45_long_calendar")
