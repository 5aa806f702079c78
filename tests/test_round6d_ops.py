"""Crafted-case semantics for the round-6 second wave (e32, t22, c18,
s18, m14) — the oracle gate pins Spark==DuckDB; these pin INTENT on
inputs engineered to hit each rule (dyadic EWMA closed forms, exact RAKE
degree/frequency arithmetic, repeat caps, a planted RRF double winner,
CDC chunking vs an independent pure-python reference)."""

from __future__ import annotations

import datetime as dt


def _write_docs(spark, tmp_path, rows, schema="doc_id BIGINT, text STRING"):
    df = spark.createDataFrame(rows, schema)
    out = str(tmp_path / "docs")
    df.coalesce(1).write.parquet(f"{out}/documents.parquet")
    return out


# -- e32: dyadic EWMA closed forms on planted daily series -------------------


def test_e32_flat_vs_spike_series(spark, tmp_path):
    from floorist_spark.operators.events_analytics import (
        TREND_DAYS,
        e32_ewma_trend,
    )

    base = dt.datetime(2024, 3, 1, 12, 0, 0)
    rows = []
    eid = 0
    # "flat": 5 events on each of the last TREND_DAYS+5 days (older days
    # must fall out of the window)
    for d in range(TREND_DAYS + 5):
        for k in range(5):
            rows.append(
                (eid, base + dt.timedelta(days=d, seconds=k), 1, "flat", 0.0)
            )
            eid += 1
    # "spike": 1/day except 100 on the final day
    last = TREND_DAYS + 4
    for d in range(TREND_DAYS + 5):
        n = 100 if d == last else 1
        for k in range(n):
            rows.append(
                (eid, base + dt.timedelta(days=d, seconds=k), 2, "spike", 0.0)
            )
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
        "event_type STRING, value DOUBLE",
    )
    out = str(tmp_path / "ev")
    df.coalesce(1).write.parquet(f"{out}/events.parquet")
    got = {r["event_type"]: r for r in e32_ewma_trend(spark, out).collect()}
    half = 1 << (TREND_DAYS - 1)
    flat = got["flat"]
    assert flat["n_days_active"] == TREND_DAYS
    assert flat["window_total"] == 5 * TREND_DAYS
    assert flat["last_day_count"] == 5
    # num = 5 * (2^TREND_DAYS - 1): the geometric sum of all dyadic weights
    num_flat = 5 * ((1 << TREND_DAYS) - 1)
    assert flat["ewma"] == num_flat / half
    assert flat["trend_ratio"] == (5 * half) / float(num_flat)
    spike = got["spike"]
    num_spike = 100 * half + ((1 << (TREND_DAYS - 1)) - 1)
    assert spike["last_day_count"] == 100
    assert spike["ewma"] == num_spike / half
    # the spike dominates: trend ratio close to 1, far above flat's ~0.5
    assert spike["trend_ratio"] == (100 * half) / float(num_spike)
    assert spike["trend_ratio"] > 0.95 > flat["trend_ratio"]


# -- t22: exact RAKE deg/freq arithmetic -------------------------------------


def test_t22_exact_deg_freq_on_crafted_docs(spark, tmp_path):
    from floorist_spark.operators.text import t22_rake_keyphrases

    rows = [
        (1, "deep learning of deep learning"),  # 'of' delimits two phrases
        (2, "the deep networks"),               # leading stopword dropped
    ]
    out = _write_docs(spark, tmp_path, rows)
    got = {r["phrase"]: r for r in t22_rake_keyphrases(spark, out).collect()}
    # freq: deep 3, learning 2, networks 1; deg: deep 6, learning 4,
    # networks 2 (every phrase has 2 words)
    dl = got["deep learning"]
    assert (dl["n_words"], dl["n_occurrences"], dl["n_docs"]) == (2, 2, 1)
    assert (dl["sum_deg"], dl["sum_freq"]) == (10, 5)
    assert dl["score"] == 2.0
    dn = got["deep networks"]
    assert (dn["sum_deg"], dn["sum_freq"]) == (8, 4)
    assert dn["score"] == 2.0
    # equal scores tie-break on phrase text ascending
    res = t22_rake_keyphrases(spark, out).collect()
    assert [r["phrase"] for r in res] == ["deep learning", "deep networks"]


def test_t22_stopword_only_doc_yields_no_phrases(spark, tmp_path):
    from floorist_spark.operators.text import t22_rake_keyphrases

    out = _write_docs(spark, tmp_path, [(1, "the of and to"), (2, "")])
    assert t22_rake_keyphrases(spark, out).collect() == []


# -- c18: repeat caps and exact integer plan ---------------------------------


def test_c18_repeat_factors_and_cap(spark, tmp_path):
    from floorist_spark.operators.curation import (
        MAX_REPEAT,
        c18_oversample_plan,
    )

    rows = [
        (1, " ".join(["w"] * 80), "big", "s"),   # 80 tokens
        (2, " ".join(["w"] * 8), "small", "s"),  # 8 tokens
        (3, "w w", "tiny", "s"),                 # 2 tokens
    ]
    out = _write_docs(
        spark, tmp_path, rows,
        schema="doc_id BIGINT, text STRING, lang STRING, source STRING",
    )
    got = {r["lang"]: r for r in c18_oversample_plan(spark, out).collect()}
    # total 90, 3 langs -> target 30
    assert all(r["target_tokens"] == 30 for r in got.values())
    # big: 30//80 = 0 -> floor 1; small: 30//8 = 3; tiny: 30//2 = 15 -> cap
    assert got["big"]["repeat_factor"] == 1
    assert bool(got["big"]["capped"]) is False
    assert got["small"]["repeat_factor"] == 3
    assert got["tiny"]["repeat_factor"] == MAX_REPEAT
    assert bool(got["tiny"]["capped"]) is True
    eff = {k: r["effective_tokens"] for k, r in got.items()}
    assert eff == {"big": 80, "small": 24, "tiny": 2 * MAX_REPEAT}
    tot_eff = sum(eff.values())
    for k, r in got.items():
        assert r["achieved_share"] == eff[k] / float(tot_eff)
        assert r["natural_share"] == r["tokens"] / 90.0


# -- s18: planted double winner and the exact RRF formula --------------------


def test_s18_double_winner_and_formula(spark, tmp_path):
    from floorist_spark.operators.similarity import (
        RRF_K,
        s18_rrf_fusion,
    )

    def vec(head, tail):
        return [float(x) for x in head + tail]

    pos8 = [1.0] * 8  # all-positive first 8 dims -> bucket 255
    rows = [
        (0, vec(pos8, [1.0] * 8), 0),            # the query
        (10, vec(pos8, [1.0] * 8), 0),           # identical: wins BOTH ranks
        (11, vec(pos8, [-1.0] * 8), 0),          # same bucket, signs differ
        (12, vec(pos8, [2.0] * 8), 0),           # same signs, lower cosine
    ]
    df = spark.createDataFrame(
        rows, "vec_id BIGINT, embedding ARRAY<FLOAT>, label BIGINT"
    )
    out = str(tmp_path / "emb")
    df.coalesce(1).write.parquet(f"{out}/embeddings.parquet")
    res = [r for r in s18_rrf_fusion(spark, out).collect() if r["query_id"] == 0]
    res.sort(key=lambda r: r["fused_rank"])
    # the identical vector wins both rankers, hence fusion
    assert res[0]["neighbor_id"] == 10
    assert (res[0]["rank_cos"], res[0]["rank_sign"]) == (1, 1)
    assert res[0]["sign_agree"] == 16
    for r in res:
        assert r["rrf_score"] == 1.0 / (RRF_K + r["rank_cos"]) + 1.0 / (
            RRF_K + r["rank_sign"]
        )
    # fused order is exactly (rrf desc, neighbor asc)
    keys = [(-r["rrf_score"], r["neighbor_id"]) for r in res]
    assert keys == sorted(keys)


# -- m14: CDC census vs an independent pure-python reference -----------------


def _cdc_reference(payload: bytes):
    from floorist_spark.operators.multimodal import (
        CDC_DIV,
        CDC_MULT,
        CDC_WIN,
    )

    n = len(payload)
    if n == 0:
        return (0, 0, 0, 0)
    ends = []
    if n >= CDC_WIN:
        for i in range(3, n):
            w = (
                payload[i - 3] * 16777216
                + payload[i - 2] * 65536
                + payload[i - 1] * 256
                + payload[i]
            )
            if (w * CDC_MULT) % (1 << 32) < (1 << 32) // CDC_DIV:
                ends.append(i)
    if not ends or ends[-1] != n - 1:
        ends.append(n - 1)
    starts = [0] + [e + 1 for e in ends[:-1]]
    chunks = [payload[s : e + 1] for s, e in zip(starts, ends)]
    return (
        len(chunks),
        max(len(c) for c in chunks),
        len(set(chunks)),
        n,
    )


def test_m14_matches_pure_python_reference(spark, tmp_path):
    from floorist_spark.operators.multimodal import m14_cdc_chunks

    texts = {
        1: "aabocdefgh" * 40,       # 'aabo' is a boundary window -> one
                                    # boundary per repeat, duplicate chunks
        2: "The quick brown fox jumps over the lazy dog. " * 12,
        3: "xy",                    # shorter than the window: one chunk
        4: "",                      # empty payload
        5: "".join(chr(32 + (i * 17) % 90) for i in range(600)),
    }
    out = _write_docs(spark, tmp_path, list(texts.items()))
    got = {r["doc_id"]: r for r in m14_cdc_chunks(spark, out).collect()}
    for doc_id, text in texts.items():
        n_chunks, max_len, n_unique, n_bytes = _cdc_reference(
            text.encode("utf-8")
        )
        r = got[doc_id]
        assert r["n_chunks"] == n_chunks, doc_id
        assert r["max_chunk_len"] == max_len if n_chunks else True
        assert r["n_unique_chunks"] == n_unique
        assert r["n_bytes"] == n_bytes if n_chunks else r["n_bytes"] == 0
        if n_chunks:
            assert r["avg_chunk_len"] == n_bytes / float(n_chunks)
            assert r["dup_chunk_frac"] == (n_chunks - n_unique) / float(
                n_chunks
            )
        else:
            assert r["avg_chunk_len"] is None
    # the repeated-pattern doc actually exercises the dedup path: its
    # boundaries re-synchronize, so duplicate chunks must appear
    assert got[1]["n_chunks"] > 1
    assert got[1]["n_unique_chunks"] < got[1]["n_chunks"]


def test_m14_boundaries_resynchronize_after_insertion(spark, tmp_path):
    """The CDC property itself: inserting one byte near the front shifts
    at most the chunks before the next boundary — the chunk sets re-align
    afterwards, which fixed-width blocking (m12) can never do."""
    from floorist_spark.operators.multimodal import m14_cdc_chunks

    base = "The quick brown fox jumps over the lazy dog. " * 12
    edited = "X" + base
    out = _write_docs(spark, tmp_path, [(1, base), (2, edited)])
    got = {r["doc_id"]: r for r in m14_cdc_chunks(spark, out).collect()}
    # both documents chunk; the edit changes byte count by exactly 1
    assert got[2]["n_bytes"] == got[1]["n_bytes"] + 1
    assert got[1]["n_chunks"] > 2  # enough chunks for re-sync to matter


# -- d22: planted template vs all-unique sources -----------------------------


def test_d22_planted_template_source(spark, tmp_path):
    from floorist_spark.operators.dedup import d22_boilerplate_census

    rows = []
    # "tpl": 8 docs sharing a long common header + a unique tail
    for i in range(8):
        rows.append(
            (i, f"common header boilerplate line uniquetail{i}", "en", "tpl")
        )
    # "uniq": 8 docs with disjoint single-char alphabets (no shared
    # 5-gram anywhere, and each doc's one shingle has docs_with = 1)
    for i in range(8):
        rows.append((100 + i, chr(97 + i) * 30, "en", "uniq"))
    df = spark.createDataFrame(
        rows, "doc_id BIGINT, text STRING, lang STRING, source STRING"
    )
    out = str(tmp_path / "docs")
    df.coalesce(1).write.parquet(f"{out}/documents.parquet")
    got = {r["source"]: r for r in d22_boilerplate_census(spark, out).collect()}
    uniq = got["uniq"]
    assert uniq["n_docs"] == 8
    assert uniq["n_distinct_shingles"] == 8
    assert uniq["n_occurrences"] == 8
    assert uniq["n_boiler_shingles"] == 0
    assert uniq["boiler_frac"] == 0.0
    tpl = got["tpl"]
    # the shared header dominates each doc's shingle mass
    assert tpl["n_boiler_shingles"] > 0
    assert tpl["boiler_occurrences"] == tpl["n_boiler_shingles"] * 8
    assert tpl["boiler_frac"] > 0.5


# -- d23: hand-computable fixed-point PageRank on planted cliques ------------


def test_d23_pagerank_exact_on_planted_cliques(spark, tmp_path):
    from floorist_spark.operators.dedup import (
        PR_ALPHA_DEN,
        PR_ALPHA_NUM,
        PR_ITERS,
        PR_SCALE,
        d23_dup_graph_pagerank,
    )

    x = "the quick brown fox jumps over the lazy dog again and again"
    y = "a completely different second sentence about spark and parquet"
    rows = [
        (1, x), (2, x), (3, x),      # K3 clique of identical docs
        (10, y), (11, y),            # K2 pair
        (20, "unique text that matches nothing else in this corpus"),
    ]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    out = str(tmp_path / "docs")
    df.coalesce(1).write.parquet(f"{out}/documents.parquet")
    got = {r["doc_id"]: r for r in d23_dup_graph_pagerank(spark, out).collect()}
    assert set(got) == {1, 2, 3, 10, 11}  # the unique doc is not a node

    base = (PR_SCALE * (PR_ALPHA_DEN - PR_ALPHA_NUM)) // PR_ALPHA_DEN

    def regular_rank(deg):
        # in a k-regular symmetric component every node stays equal:
        # r' = base + deg * ((alpha_num * (r // deg)) // alpha_den)
        r = PR_SCALE
        for _ in range(PR_ITERS):
            r = base + deg * ((PR_ALPHA_NUM * (r // deg)) // PR_ALPHA_DEN)
        return r

    for d in (1, 2, 3):
        assert got[d]["deg"] == 2
        assert got[d]["pr_scaled"] == regular_rank(2)
        assert got[d]["pr"] == regular_rank(2) / float(PR_SCALE)
    for d in (10, 11):
        assert got[d]["deg"] == 1
        assert got[d]["pr_scaled"] == regular_rank(1)


# -- m15: insertion-shifted version pair shares re-synced chunks -------------


def _cdc_chunk_set(payload: bytes):
    from floorist_spark.operators.multimodal import (
        CDC_DIV,
        CDC_MULT,
        CDC_WIN,
    )

    n = len(payload)
    if n == 0:
        return set()
    ends = []
    if n >= CDC_WIN:
        for i in range(3, n):
            w = (
                payload[i - 3] * 16777216
                + payload[i - 2] * 65536
                + payload[i - 1] * 256
                + payload[i]
            )
            if (w * CDC_MULT) % (1 << 32) < (1 << 32) // CDC_DIV:
                ends.append(i)
    if not ends or ends[-1] != n - 1:
        ends.append(n - 1)
    starts = [0] + [e + 1 for e in ends[:-1]]
    return {payload[s : e + 1] for s, e in zip(starts, ends)}


def test_m15_version_pair_shares_resynced_chunks(spark, tmp_path):
    from floorist_spark.operators.multimodal import m15_chunk_overlap_pairs

    base = "The quick brown fox jumps over the lazy dog. " * 12
    edited = "X" + base  # one-byte insertion at the front
    other = "".join(chr(32 + (i * 13) % 90) for i in range(500))
    out = _write_docs(spark, tmp_path, [(1, base), (2, edited), (3, other)])
    res = m15_chunk_overlap_pairs(spark, out).collect()
    pairs = {(r["doc_a"], r["doc_b"]): r for r in res}
    a = _cdc_chunk_set(base.encode())
    b = _cdc_chunk_set(edited.encode())
    expected_shared = len(a & b)
    assert expected_shared >= 2  # CDC re-sync makes the test meaningful
    r = pairs[(1, 2)]
    assert r["n_shared"] == expected_shared
    assert (r["n_a"], r["n_b"]) == (len(a), len(b))
    assert r["containment"] == expected_shared / float(min(len(a), len(b)))
    # the unrelated doc pairs with nobody
    assert all(3 not in k for k in pairs)


def test_c18_whitespace_only_language_floor(spark, tmp_path):
    """The shared tokenizer never yields zero tokens (split('') = ['']),
    so every language has tokens >= n_docs and the DIV in the repeat
    rule is always well-defined; the operator additionally guards
    tokens = 0 defensively (greatest()'s NULL handling is
    engine-version-dependent — the d15 portability lesson). This pins
    the 1-token floor a whitespace-only doc actually gets."""
    from floorist_spark.operators.curation import c18_oversample_plan

    rows = [
        (1, "w w w w w w w w", "en", "s"),   # 8 tokens
        (2, "   ", "blankish", "s"),          # normalizes to one '' token
    ]
    out = _write_docs(
        spark, tmp_path, rows,
        schema="doc_id BIGINT, text STRING, lang STRING, source STRING",
    )
    got = {r["lang"]: r for r in c18_oversample_plan(spark, out).collect()}
    b = got["blankish"]
    assert b["tokens"] == 1           # the tokenizer floor, not zero
    # total 9, target 4 -> 4 // 1 = 4 = MAX_REPEAT exactly, not capped
    assert b["repeat_factor"] == 4
    assert bool(b["capped"]) is False
    assert b["effective_tokens"] == 4


def test_m14_m15_oracle_survives_non_ascii_payloads(spark, tmp_path):
    """Regression: the CDC oracle's 4-byte window product overflowed
    INT32 for any byte >= 0x80 (the all-ASCII testdata sits exactly at
    the 2^31-1 edge and masked it) — the first multibyte UTF-8 char made
    DuckDB throw 'Overflow in multiplication of INT32'. The shared
    _cdc_ctes() chain now widens to BIGINT first; this pins engine ==
    oracle on a multibyte corpus for both m14 and m15."""
    import duckdb

    from floorist_spark.operators.multimodal import (
        M14_SQL,
        M15_SQL,
        m14_cdc_chunks,
        m15_chunk_overlap_pairs,
    )
    from tests.oracle_compare import compare_results

    body = "héllo wörld — ünïcode pâyload " * 40
    texts = [(1, body), (2, body + " v2 tail"), (3, "plain ascii text " * 30)]
    # full production schema: the m14/m15 oracles canonicalize on the
    # complete payload column list (round-9 _canon contract)
    rows = [(i, t, "en", "src0", len(t)) for i, t in texts]
    out = _write_docs(
        spark, tmp_path, rows,
        schema="doc_id BIGINT, text STRING, lang STRING, source STRING, "
        "n_chars BIGINT",
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{out}/documents.parquet/*.parquet')"
    )
    compare_results(
        m14_cdc_chunks(spark, out).toPandas(),
        con.execute(M14_SQL).fetchdf(),
        "m14-nonascii",
    )
    spark_15 = m15_chunk_overlap_pairs(spark, out).toPandas()
    compare_results(spark_15, con.execute(M15_SQL).fetchdf(), "m15-nonascii")
    # the two versions genuinely share re-synced chunks
    assert len(spark_15) == 1 and spark_15.iloc[0]["n_shared"] >= 2
    con.close()
