"""Property-based tests (hypothesis) for the pure-Python engine layers:
floorplan parsing, retry policy, path building, and the MinHash affine
hash family. No SparkSession — these run in milliseconds.
"""

from __future__ import annotations

from datetime import date

import yaml
from hypothesis import given
from hypothesis import strategies as st

from floorist_spark.executor import RETRYABLE_ERROR_PATTERNS, RetryPolicy, RetryResult
from floorist_spark.floorplan import (
    DEFAULT_CHUNKSIZE,
    parse_floorplan,
    spec_from_row,
)
from floorist_spark.functions.textfrag import MERSENNE31, _affine_coef

# printable-ASCII text: the roundtrip property targets floorplan
# semantics (order, keys, chunksize), not YAML's representation of
# control characters / surrogates
_txt = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), min_size=1, max_size=40
)
_row = st.fixed_dictionaries(
    {},
    optional={
        "prefix": _txt,
        "query": _txt,
        "chunksize": st.one_of(st.none(), st.integers(min_value=0, max_value=10**6)),
    },
)


@given(st.lists(_row, max_size=10))
def test_floorplan_roundtrip_preserves_order_and_keys(rows):
    parsed = parse_floorplan(yaml.safe_dump(rows))
    assert parsed == rows


@given(_row)
def test_spec_chunksize_semantics(row):
    """Missing chunksize → 1000; explicit 0/None → unchunked (None);
    positive passes through. Mirrors reference row.get('chunksize', 1000)
    or None (floorist.py:194)."""
    if "prefix" not in row or "query" not in row:
        try:
            spec_from_row(row)
            raise AssertionError("expected KeyError")
        except KeyError:
            return
    spec = spec_from_row(row)
    raw = row.get("chunksize", "MISSING")
    if raw == "MISSING":
        assert spec.effective_chunksize == DEFAULT_CHUNKSIZE
    elif not raw:
        assert spec.effective_chunksize is None
    else:
        assert spec.effective_chunksize == raw


@given(st.integers(min_value=0, max_value=10), st.integers(min_value=1, max_value=60))
def test_backoff_schedule(attempt, base):
    assert RetryPolicy(base_delay=base).backoff_delay(attempt) == base * 2**attempt


@given(st.text(max_size=80))
def test_non_matching_errors_never_retry(msg):
    if any(p in msg for p in RETRYABLE_ERROR_PATTERNS):
        return
    policy = RetryPolicy()
    for attempt in range(policy.max_retries):
        assert policy.evaluate(Exception(msg), attempt) == RetryResult.FAILURE


@given(st.sampled_from(RETRYABLE_ERROR_PATTERNS), st.text(max_size=20))
def test_matching_errors_retry_then_exhaust(pattern, padding):
    policy = RetryPolicy()
    ex = Exception(padding + pattern + padding)
    for attempt in range(policy.max_retries - 1):
        assert policy.evaluate(ex, attempt) == RetryResult.RETRY
    assert policy.evaluate(ex, policy.max_retries - 1) == RetryResult.EXHAUSTED


@given(st.dates(min_value=date(2000, 1, 1), max_value=date(2099, 12, 31)))
def test_make_path_unpadded(d):
    """F4: month/day render unpadded (reference %-m/%-d) for every date."""
    path = f"p/year_created={d.year}/month_created={d.month}/day_created={d.day}"
    assert f"month_created={d.month:02d}" not in path or d.month >= 10
    assert path.split("month_created=")[1].split("/")[0] == str(d.month)


@given(st.integers(min_value=0, max_value=255))
def test_affine_coefficients_valid(i):
    """Every hash function in the family is a proper affine map mod the
    Mersenne prime: a nonzero (bijective), both coefficients in range."""
    a, b = _affine_coef(i)
    assert 0 < a < MERSENNE31
    assert 0 <= b < MERSENNE31


@given(
    st.integers(min_value=0, max_value=63),
    st.integers(min_value=0, max_value=63),
)
def test_affine_family_distinct(i, j):
    if i != j:
        assert _affine_coef(i) != _affine_coef(j)
