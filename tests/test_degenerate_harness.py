"""In-suite rotating degenerate-corpus parity (round-8 verdict task 1).

The full entries x profiles matrix lives in ``tools/degenerate_sweep.py``
(committed evidence: ``DEGENERATE_r09.json``). Running all ~1.5k pairs in
the suite would blow the time budget, so here each catalog entry runs
against exactly ONE crafted profile per suite run, chosen by a stable
hash of ``(entry name, ROTATION_ROUND)`` — deterministic within a round
(failures reproduce), rotating across rounds (over ~7 rounds every entry
meets every profile even if the one-time full sweep is never re-run).

Each corpus is materialized once per session; the comparison is the
driver's gate verbatim (native type parity + row count + column names +
order-insensitive exact values via tests.oracle_compare).

The corpus SEED also tracks ROTATION_ROUND (round 11): every one of the
two times a fresh seed was introduced it caught real engine-vs-oracle
divergences on first contact (seed 9's float profiles in r10; seed 11's
random-profile duplicate ids broke s05/s16 in r11), so each rotation
bump now re-rolls the corpora automatically instead of waiting for a
one-off sweep. Within a round the seed is fixed — failures reproduce.
"""

from __future__ import annotations

import hashlib

import pytest

from tests.degenerate_corpora import PROFILES, build_corpus, duck_connect
from tests.oracle_compare import check_type_parity, compare_results


def _seed() -> int:
    from floorist_spark.operators.catalog import ROTATION_ROUND

    return ROTATION_ROUND


def _profile_for(name: str, rotation_round: int) -> str:
    h = hashlib.md5(f"{name}:{rotation_round}".encode()).hexdigest()
    return PROFILES[int(h[:8], 16) % len(PROFILES)]


def _entries():
    from floorist_spark.operators.catalog import ROTATION_ROUND, all_queries

    return [(n, _profile_for(n, ROTATION_ROUND)) for n in all_queries()]


@pytest.fixture(scope="module")
def corpora(spark, tmp_path_factory):
    """profile -> (corpus root, duckdb connection); built lazily so a
    prefix-filtered run only materializes the profiles it needs."""
    built: dict[str, tuple] = {}

    def get(profile: str):
        if profile not in built:
            root = str(tmp_path_factory.mktemp(f"degen_{profile}"))
            build_corpus(spark, root, profile, seed=_seed())
            built[profile] = (root, duck_connect(root))
        return built[profile]

    yield get
    for _, con in built.values():
        con.close()
    from floorist_spark.operators._cache import release_caches, release_memos

    release_caches()
    release_memos()


@pytest.mark.parametrize(
    "name,profile", _entries(), ids=[f"{n}-{p}" for n, p in _entries()]
)
def test_entry_on_degenerate_corpus(spark, corpora, name, profile):
    from floorist_spark.operators.catalog import all_oracles, all_queries

    root, con = corpora(profile)
    df = all_queries()[name](spark, root)
    sql = all_oracles()[name]  # round-10: every entry has an oracle twin
    check_type_parity(con.sql(sql), df.schema, name)
    compare_results(df.toPandas(), con.execute(sql).fetchdf(), f"{name}@{profile}")


def test_dup_ids_event_duplicates_respect_streaming_contract():
    """Generator-contract pin for the streaming ingest's exactly-once
    dedup (events_analytics._events_stream): duplicate event_ids INSIDE
    the streaming domain (ts >= epoch) must be byte-identical copies —
    dropDuplicates keeps an arbitrary one, so value-determinism rests on
    this redelivery model. Conflicting-payload duplicates are allowed
    only PRE-EPOCH, where the domain gate removes them on both engines
    before dedup. A generator change that emits in-domain conflicting
    event payloads would silently turn streaming parity into luck; this
    test makes it a loud failure instead."""
    import datetime as dt

    from tests.degenerate_corpora import gen_tables

    epoch = dt.datetime(1970, 1, 1)
    for seed in range(5):  # a few seeds: the conflict branch is random
        events = gen_tables("dup_ids", seed)["events"]
        in_domain: dict[int, tuple] = {}
        saw_conflict_pre_epoch = False
        for row in events:
            event_id, ts = row[0], row[1]
            if ts < epoch:
                saw_conflict_pre_epoch = True
                continue
            if event_id in in_domain:
                assert row == in_domain[event_id], (
                    f"seed {seed}: in-domain duplicate event_id {event_id} "
                    "has conflicting payloads — violates the streaming "
                    "redelivery contract (_events_stream dropDuplicates)"
                )
            else:
                in_domain[event_id] = row
        assert saw_conflict_pre_epoch, (
            f"seed {seed}: dup_ids emitted no pre-epoch conflicting event "
            "copy — the gate-before-dedup ordering is no longer exercised"
        )
