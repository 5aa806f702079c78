"""F1 floorplan semantics (reference `tests/test_floorist.py:107-151` and
`src/floorist/floorist.py:194,283-287`)."""

from __future__ import annotations

import pytest

from floorist_spark.floorplan import (
    DEFAULT_CHUNKSIZE,
    FloorplanError,
    load_floorplan,
    parse_floorplan,
    spec_from_row,
)

YAML = """
- prefix: a/first
  query: SELECT 1 AS x
- prefix: a/second
  query: SELECT 2 AS y
  chunksize: 13
- prefix: a/third
  query: SELECT 3 AS z
  chunksize: 0
"""


def test_parse_preserves_order():
    rows = parse_floorplan(YAML)
    assert [r["prefix"] for r in rows] == ["a/first", "a/second", "a/third"]


def test_missing_chunksize_defaults_to_1000():
    # reference floorist.py:194: row.get('chunksize', 1000) or None
    spec = spec_from_row({"prefix": "p", "query": "q"})
    assert spec.chunksize == DEFAULT_CHUNKSIZE
    assert spec.effective_chunksize == 1000


def test_explicit_zero_chunksize_means_unchunked():
    spec = spec_from_row({"prefix": "p", "query": "q", "chunksize": 0})
    assert spec.effective_chunksize is None


def test_explicit_chunksize_kept():
    spec = spec_from_row({"prefix": "p", "query": "q", "chunksize": 13})
    assert spec.effective_chunksize == 13


def test_missing_prefix_raises_keyerror_at_spec_time():
    # Not a parse error: surfaces per-dump (reference tests/test_floorist.py:190-198)
    rows = parse_floorplan("- query: SELECT 1")
    with pytest.raises(KeyError):
        spec_from_row(rows[0])


def test_missing_query_raises_keyerror_at_spec_time():
    rows = parse_floorplan("- prefix: a/b")
    with pytest.raises(KeyError):
        spec_from_row(rows[0])


def test_non_list_floorplan_rejected():
    with pytest.raises(FloorplanError):
        parse_floorplan("prefix: a")


def test_empty_floorplan_is_empty_list():
    assert parse_floorplan("") == []


def test_load_floorplan_from_file(tmp_path):
    p = tmp_path / "plan.yaml"
    p.write_text(YAML)
    assert len(load_floorplan(str(p))) == 3
