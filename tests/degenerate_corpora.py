"""Crafted degenerate-corpus generator for cross-engine parity sweeps.

Round-8's review pass found four real cross-engine defects (t29
zero-token, d15c empty-table NULL, e28/e39 pre-1970 lateness, q45
>100-month span) by running REAL catalog operators against their REAL
DuckDB oracles on corpora the shipped testdata never produces. This
module institutionalizes that: deterministic generators for the full
10-table star schema under the corpus shapes that historically break
engines — empty tables, single rows, duplicated primary keys, pre-epoch
timestamps, zero-token documents, unicode extremes, and a seeded random
mixer of all of the above.

Every profile writes ALL TEN tables with the production schemas (the
same column names/types as `/root/testdata/sf*`), so any catalog entry
can run unmodified against any profile. Two consumers:

* ``tests/test_degenerate_harness.py`` — in-suite rotating sample (each
  entry runs against one round-rotated profile per suite run).
* ``tools/degenerate_sweep.py`` — the full entries x profiles matrix,
  recorded as a committed artifact.

Values are parity-safe by construction, mirroring the driver generator's
discipline: money-like DOUBLEs are quantized to cents (so the engines'
shared DECIMAL(_,4) render never lands on a rounding tie) and embedding
components to 1/1024 grains (exact in float32). Randomness is a seeded
``random.Random`` only — corpora are bit-stable across runs.
"""

from __future__ import annotations

import datetime as dt
import random

SCHEMAS = {
    "region": "r_regionkey INT, r_name STRING",
    "nation": "n_nationkey INT, n_name STRING, n_regionkey INT",
    "customer": (
        "c_custkey BIGINT, c_name STRING, c_nationkey INT, "
        "c_acctbal DOUBLE, c_mktsegment STRING"
    ),
    "supplier": "s_suppkey BIGINT, s_name STRING, s_nationkey INT, s_acctbal DOUBLE",
    "part": (
        "p_partkey BIGINT, p_name STRING, p_brand STRING, p_type STRING, "
        "p_size INT, p_retailprice DOUBLE"
    ),
    "orders": (
        "o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING, "
        "o_totalprice DOUBLE, o_orderdate TIMESTAMP, o_orderpriority STRING"
    ),
    "lineitem": (
        "l_orderkey BIGINT, l_partkey BIGINT, l_suppkey BIGINT, "
        "l_linenumber INT, l_quantity DOUBLE, l_extendedprice DOUBLE, "
        "l_discount DOUBLE, l_tax DOUBLE, l_returnflag STRING, "
        "l_linestatus STRING, l_shipdate TIMESTAMP"
    ),
    "events": (
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, "
        "value DOUBLE, props STRING"
    ),
    "documents": "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT",
    "embeddings": "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT",
}

TABLES = tuple(SCHEMAS)

PROFILES = (
    "empty",
    "single",
    "dup_ids",
    "pre1970",
    "zero_token",
    "unicode",
    "random",
    # round-10 adversarial-float profiles (verdict task 4): the two
    # historical engine-vs-oracle float defects were magnitude-dependent
    # (decimal→double render drift r3; 1-ulp double-sum divergence past
    # 2^53, q11 r5) — these shapes force exactly those magnitudes.
    "sum_2p53",
    "signed_zero",
    "tie_render",
)

#: operators hard-code the embedding dimensionality in both engines' SQL
#: (similarity.EMB_DIM) — degenerate corpora vary everything EXCEPT this.
EMB_DIM = 64

_STATUS = ["P", "O", "F"]
_PRIO = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
_SEGMENT = ["MACHINERY", "HOUSEHOLD", "FURNITURE", "AUTOMOBILE", "BUILDING"]
_RF = ["A", "N", "R"]
_LS = ["O", "F"]
_ETYPE = ["view", "click", "purchase", "signup", "error"]
_LANG = ["en", "de", "fr", "es", "zh"]
_WORDS = (
    "the fast key order sort table scan merge part window small hash join "
    "batch stream spark dup query row data slow filter customer line value "
    "agg column big vector a"
).split()

_UNICODE_TEXTS = [
    "emoji soup \U0001f600\U0001f680\U0001f409 and flags \U0001f1e9\U0001f1ea",
    "中文文本混合 tokens と日本語",
    "العربية rtl עברית mixed",
    "combining áéí marks and zero​width‍joins",
    "x" * 400,  # one very long single token
    "tabs\tand\nnewlines\r\nand  double  spaces",
    "ßæœ latin extras İı dotted/dotless",
]

_ZERO_TOKEN_TEXTS = ["", " ", "   ", "\t", "\n\n", "!!!", "...", " , ; ", "​"]


def _cents(rng: random.Random, lo: float, hi: float) -> float:
    return rng.randint(int(lo * 100), int(hi * 100)) / 100.0


def _grain(rng: random.Random) -> float:
    return rng.randint(-1024, 1024) / 1024.0


def _ts(rng: random.Random, year_lo: int, year_hi: int) -> dt.datetime:
    base = dt.datetime(year_lo, 1, 1)
    span = (dt.datetime(year_hi, 12, 31) - base).days * 86400
    return base + dt.timedelta(seconds=rng.randint(0, span), microseconds=rng.randint(0, 999999))


def _text(rng: random.Random, n_words: int) -> str:
    return " ".join(rng.choice(_WORDS) for _ in range(n_words))


def _vec(rng: random.Random) -> list[float]:
    return [_grain(rng) for _ in range(EMB_DIM)]


def _doc_row(doc_id: int, text: str, lang: str, source: str) -> tuple:
    return (doc_id, text, lang, source, len(text))


def _base_tables(rng: random.Random, *, n_docs=10, n_events=40, n_orders=12,
                 n_lines=24, n_vecs=12, year_lo=2024, year_hi=2024) -> dict:
    """A small but fully-populated consistent corpus the shape profiles
    then distort. Foreign keys resolve; domains match the shipped data."""
    rows = {
        "region": [(i, f"REGION{i}") for i in range(3)],
        "nation": [(i, f"NATION{i}", i % 3) for i in range(5)],
        "customer": [
            (i, f"Customer#{i}", i % 5, _cents(rng, -999, 9999), rng.choice(_SEGMENT))
            for i in range(1, 7)
        ],
        "supplier": [
            (i, f"Supplier#{i}", i % 5, _cents(rng, -999, 9999)) for i in range(1, 5)
        ],
        "part": [
            (i, _text(rng, 3), f"Brand#{i % 4}", _text(rng, 2).upper(),
             rng.randint(1, 50), _cents(rng, 1, 2000))
            for i in range(1, 7)
        ],
        "orders": [
            (i, rng.randint(1, 6), rng.choice(_STATUS), _cents(rng, 1, 99999),
             _ts(rng, year_lo, year_hi), rng.choice(_PRIO))
            for i in range(1, n_orders + 1)
        ],
        "lineitem": [
            (rng.randint(1, n_orders), rng.randint(1, 6), rng.randint(1, 4),
             j % 7 + 1, float(rng.randint(1, 50)), _cents(rng, 1, 9999),
             rng.randint(0, 10) / 100.0, rng.randint(0, 8) / 100.0,
             rng.choice(_RF), rng.choice(_LS), _ts(rng, year_lo, year_hi))
            for j in range(n_lines)
        ],
        "events": [
            (j, _ts(rng, year_lo, year_hi), rng.randint(1, 8),
             rng.choice(_ETYPE), _cents(rng, 0, 500), f'{{"k": {rng.randint(0, 99)}}}')
            for j in range(1, n_events + 1)
        ],
        "documents": [
            _doc_row(i, _text(rng, rng.randint(5, 60)), rng.choice(_LANG),
                     f"src{i % 4}")
            for i in range(n_docs)
        ],
        "embeddings": [(i, _vec(rng), i % 10) for i in range(n_vecs)],
    }
    return rows


def gen_tables(profile: str, seed: int) -> dict:
    """table name -> list of row tuples for the given shape profile."""
    rng = random.Random((profile, seed).__repr__())
    if profile == "empty":
        return {t: [] for t in TABLES}

    if profile == "single":
        base = _base_tables(rng, n_docs=1, n_events=1, n_orders=1, n_lines=1, n_vecs=1)
        return {t: rows[:1] for t, rows in base.items()}

    if profile == "dup_ids":
        base = _base_tables(rng, n_docs=6, n_events=12, n_orders=6, n_lines=10, n_vecs=6)
        out = {}
        for t, rows in base.items():
            dup = []
            for r in rows:
                dup.append(r)
                copies = rng.randint(1, 2)
                for _ in range(copies):
                    if t == "documents" and rng.random() < 0.5:
                        # same doc_id, CONFLICTING payload — the nastier case
                        dup.append(_doc_row(r[0], _text(rng, 8), r[2], r[3]))
                    elif t == "events" and rng.random() < 0.4:
                        # same event_id, CONFLICTING payload, but PRE-EPOCH:
                        # the streaming domain gate (ts >= 1970) removes it
                        # on both engines BEFORE exactly-once dedup, pinning
                        # the gate-before-dedup ordering; batch identity
                        # consumers resolve it via _canon (least payload =
                        # this 1960s copy, deterministically, both engines).
                        # In-domain duplicate event_ids stay BYTE-IDENTICAL
                        # by design: the streaming contract models
                        # at-least-once REDELIVERY (same record bytes) —
                        # conflicting payloads under one event_id inside the
                        # domain are an upstream key collision, which only
                        # the batch canonical path resolves deterministically
                        # (streaming dropDuplicates keeps an arbitrary copy).
                        dup.append((
                            r[0], _ts(rng, 1960, 1969), rng.randint(1, 8),
                            rng.choice(_ETYPE), _cents(rng, 0, 500),
                            f'{{"k": {rng.randint(0, 99)}}}',
                        ))
                    else:
                        dup.append(r)
            out[t] = dup
        return out

    if profile == "pre1970":
        return _base_tables(rng, year_lo=1960, year_hi=1969)

    if profile == "zero_token":
        base = _base_tables(rng, n_docs=0)
        base["documents"] = [
            _doc_row(i, _ZERO_TOKEN_TEXTS[i % len(_ZERO_TOKEN_TEXTS)],
                     rng.choice(_LANG), f"src{i % 3}")
            for i in range(len(_ZERO_TOKEN_TEXTS))
        ]
        return base

    if profile == "unicode":
        base = _base_tables(rng, n_docs=0)
        base["documents"] = [
            _doc_row(i, t, rng.choice(_LANG + ["xx"]), f"srç{i % 3}")
            for i, t in enumerate(_UNICODE_TEXTS)
        ]
        base["customer"] = [
            (i, f"Künde#{i}ß", i % 5, _cents(rng, -999, 9999),
             rng.choice(_SEGMENT))
            for i in range(1, 4)
        ]
        base["part"] = [
            (i, "pièce élément", f"Brand#{i}", "MÉTAL",
             rng.randint(1, 50), _cents(rng, 1, 2000))
            for i in range(1, 4)
        ]
        return base

    if profile in ("sum_2p53", "signed_zero", "tie_render"):
        # All three mutate the money/value DOUBLE columns of a consistent
        # base corpus; positions are schema order.
        money = {
            "customer": (3,), "supplier": (3,), "part": (5,),
            "orders": (3,), "lineitem": (4, 5), "events": (4,),
        }
        if profile == "sum_2p53":
            # Cents values (binary-INEXACT doubles, unlike the usual
            # parity-safe quantized grains) at near-declared-width
            # magnitudes, over enough rows that the exact-DECIMAL sums'
            # scaled integers cross 2^53: lineitem money ~5e7 x 20k rows
            # -> sum ~1e12, x10^4 (scale 4) ~1e16 > 2^53; events value
            # ~5e8 x 2k rows -> x10^6 (scale 6) ~1e18 > 2^53. Past 2^53
            # the decimal->double render is where the round-5 q11 1-ulp
            # defect lived (the _dsum string-render fix); and any
            # leftover RAW double sum of 20k inexact addends differs by
            # ulps between Spark's 32-partition partial-sum tree and
            # DuckDB's sequential fold.
            base = _base_tables(rng, n_events=2000, n_lines=20000)
            ranges = {
                "customer": (1e6, 9.9e6), "supplier": (1e6, 9.9e6),
                "part": (1e6, 9.9e6), "orders": (1e6, 9.9e6),
                # both lineitem money columns cast to DECIMAL(12,4)
                # (< 1e8) in the engine's shared fragments - stay inside
                # the width while crossing 2^53 in the sum
                "lineitem": (1e7, 9.9e7),
                # events value casts to DECIMAL(18,6) (< 1e12)
                "events": (1e8, 9.9e8),
            }

            def mut(t: str, v: float) -> float:
                lo, hi = ranges[t]
                return _cents(rng, lo, hi)
        elif profile == "signed_zero":
            # IEEE -0.0: compares equal to +0.0 but renders "-0.0" - a
            # divergence can only surface through string renders (the
            # DECIMAL render path), min/max picks between equal-but-
            # differently-signed zeros, and string sort keys.
            base = _base_tables(rng, n_events=60, n_lines=40)

            def mut(t: str, v: float) -> float:
                return rng.choice([0.0, -0.0]) if rng.random() < 0.5 else v
        else:  # tie_render
            # Decimal expansions landing exactly on the DECIMAL(_,4)
            # round-half boundary (5 in the 5th fractional digit). The
            # nearest DOUBLE is a hair off the tie, so engines agree iff
            # both round the BINARY value; one that rounds the shortest
            # decimal repr would tie-break half-up/half-even and drift
            # by 1 at scale 4 - the round-3 render-drift defect class.
            base = _base_tables(rng, n_events=60, n_lines=40)

            def mut(t: str, v: float) -> float:
                return rng.randint(0, 9_999_999) / 1000.0 + 0.00005

        def fix(t: str, r: tuple) -> tuple:
            row = list(r)
            for i in money.get(t, ()):
                row[i] = mut(t, float(row[i]))
            return tuple(row)

        return {t: [fix(t, r) for r in rows] for t, rows in base.items()}

    if profile == "random":
        # seeded mixer: random row counts (possibly zero), duplicated ids,
        # a 1960-2030 time span, zero-token and unicode docs sprinkled in,
        # one hot user owning half the events (skew)
        n = {t: rng.randint(0, 40) for t in TABLES}
        base = _base_tables(
            rng,
            n_docs=n["documents"], n_events=max(n["events"], 0),
            n_orders=max(n["orders"], 1), n_lines=n["lineitem"],
            n_vecs=n["embeddings"], year_lo=1960, year_hi=2030,
        )
        base["orders"] = base["orders"][: n["orders"]]
        for t in ("region", "nation", "customer", "supplier", "part"):
            base[t] = base[t][: max(n[t] // 6, 0)] or base[t][:1]
        docs = []
        for i in range(n["documents"]):
            roll = rng.random()
            if roll < 0.15:
                text = rng.choice(_ZERO_TOKEN_TEXTS)
            elif roll < 0.3:
                text = rng.choice(_UNICODE_TEXTS)
            else:
                text = _text(rng, rng.randint(1, 80))
            doc_id = rng.randint(0, max(n["documents"] // 2, 1))  # forced dup ids
            docs.append(_doc_row(doc_id, text, rng.choice(_LANG + ["xx"]),
                                 f"src{rng.randint(0, 2)}"))
        base["documents"] = docs
        hot = [
            (10_000 + j, _ts(rng, 1960, 2030), 1, rng.choice(_ETYPE),
             _cents(rng, 0, 500), f'{{"k": {rng.randint(0, 99)}}}')
            for j in range(len(base["events"]))
        ]
        base["events"] = base["events"] + hot
        base["embeddings"] = [
            (rng.randint(0, max(n["embeddings"], 1)), _vec(rng), rng.randint(0, 9))
            for _ in range(n["embeddings"])
        ]
        return base

    raise ValueError(f"unknown profile {profile!r}")


def build_corpus(spark, root: str, profile: str, seed: int = 0) -> str:
    """Materialize every table of a profile as parquet under ``root``
    (layout identical to /root/testdata/sf*). Returns ``root``."""
    rows = gen_tables(profile, seed)
    for t in TABLES:
        df = spark.createDataFrame(rows[t], SCHEMAS[t])
        if not rows[t]:
            # an empty RDD has zero partitions and would write no part
            # files; one empty part keeps the dir readable by both engines
            df = df.repartition(1)
        df.write.mode("overwrite").parquet(f"{root}/{t}.parquet")
    return root


def duck_connect(root: str):
    """DuckDB connection with the 10 tables as views over the corpus —
    exactly how the grading driver registers the oracle side."""
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet("
            f"'{root}/{t}.parquet/*.parquet')"
        )
    return con
