"""F7/F8/F10 retry + isolation semantics, mocked (mirrors the reference's
standalone suite, `/root/reference/tests/test_floorist_standalone.py:13-267`)."""

from __future__ import annotations

from datetime import date

import pytest

from floorist_spark.executor import DumpExecutor, RetryPolicy, RetryResult


class FakeStorage:
    """Driver-side double: records sink calls, optionally fails them."""

    def __init__(self, cleanup_error: Exception | None = None):
        self.base_uri = "file:///fake"
        self.writes: list[tuple] = []
        self.cleanups: list[str] = []
        self.cleanup_error = cleanup_error

    def make_path(self, prefix, run_date=None):
        d = run_date or date(2026, 1, 2)
        path = f"{prefix}/year_created={d.year}/month_created={d.month}/day_created={d.day}"
        return path, f"{self.base_uri}/{path}"

    def write_parquet(self, df, target, chunksize=None, parity=True, dump_count=0):
        self.writes.append((df, target, chunksize))
        return 1

    def cleanup(self, target):
        if self.cleanup_error:
            raise self.cleanup_error
        self.cleanups.append(target)


class FlakyRunner:
    """Raises the queued exceptions once each, then returns a sentinel df."""

    def __init__(self, errors=()):
        self.errors = list(errors)
        self.calls = 0

    def __call__(self, query):
        self.calls += 1
        if self.errors:
            raise self.errors.pop(0)
        return f"df({query})"


def make_executor(storage, runner, sleeps=None):
    return DumpExecutor(
        storage,
        runner,
        RetryPolicy(),
        run_date=date(2026, 1, 2),
        sleep=(sleeps.append if sleeps is not None else lambda s: None),
    )


ROW = {"prefix": "data/x", "query": "SELECT 1 AS a"}


# -- RetryPolicy (F8) ----------------------------------------------------------

@pytest.mark.parametrize(
    "message",
    [
        "ERROR: SerializationFailure: could not serialize access",
        "canceling statement due to conflict with recovery",
        "PendingRollbackError: transaction rolled back",
        "This Session's transaction has been rolled back: invalid transaction",
    ],
)
def test_retryable_patterns(message):
    assert RetryPolicy.is_retryable(Exception(message))


def test_non_retryable():
    assert not RetryPolicy.is_retryable(Exception("syntax error at or near"))


def test_backoff_schedule_is_5_then_10():
    # pinned by reference tests/test_floorist_standalone.py:219-222
    p = RetryPolicy()
    assert p.backoff_delay(0) == 5
    assert p.backoff_delay(1) == 10


def test_evaluate_transitions():
    p = RetryPolicy(max_retries=3)
    retryable = Exception("SerializationFailure")
    assert p.evaluate(retryable, 0) == RetryResult.RETRY
    assert p.evaluate(retryable, 1) == RetryResult.RETRY
    assert p.evaluate(retryable, 2) == RetryResult.EXHAUSTED
    assert p.evaluate(Exception("boom"), 0) == RetryResult.FAILURE


# -- DumpExecutor (F10) ----------------------------------------------------------

def test_success_path_writes_once():
    storage, runner = FakeStorage(), FlakyRunner()
    assert make_executor(storage, runner).execute(ROW, 1) is True
    assert len(storage.writes) == 1
    assert storage.cleanups == []  # no retry -> no cleanup


def test_missing_prefix_fails_dump_without_raising():
    storage, runner = FakeStorage(), FlakyRunner()
    assert make_executor(storage, runner).execute({"query": "SELECT 1"}, 1) is False
    assert storage.writes == []


def test_missing_query_fails_dump_without_raising():
    storage, runner = FakeStorage(), FlakyRunner()
    assert make_executor(storage, runner).execute({"prefix": "p"}, 1) is False


def test_retryable_error_cleans_up_and_retries():
    # reference tests/test_floorist_standalone.py:162-200: chunks written
    # before a mid-stream failure are deleted before the retry
    storage = FakeStorage()
    runner = FlakyRunner([Exception("SerializationFailure mid-stream")])
    sleeps: list[float] = []
    assert make_executor(storage, runner, sleeps).execute(ROW, 1) is True
    assert runner.calls == 2
    assert len(storage.cleanups) == 1
    assert sleeps == [5]


def test_exhausted_retries_fail_with_full_backoff():
    storage = FakeStorage()
    runner = FlakyRunner([Exception("SerializationFailure")] * 3)
    sleeps: list[float] = []
    assert make_executor(storage, runner, sleeps).execute(ROW, 1) is False
    assert runner.calls == 3
    assert sleeps == [5, 10]  # reference backoff schedule
    assert len(storage.cleanups) == 2


def test_non_retryable_error_fails_immediately():
    storage = FakeStorage()
    runner = FlakyRunner([Exception("column does not exist")])
    sleeps: list[float] = []
    assert make_executor(storage, runner, sleeps).execute(ROW, 1) is False
    assert runner.calls == 1
    assert sleeps == []


def test_cleanup_failure_aborts_dump():
    # reference floorist.py:209-213 / standalone.py:92-113: if cleanup
    # fails, the dump is aborted (no second query attempt)
    storage = FakeStorage(cleanup_error=RuntimeError("s3 down"))
    runner = FlakyRunner([Exception("SerializationFailure")])
    assert make_executor(storage, runner).execute(ROW, 1) is False
    assert runner.calls == 1


def test_chunksize_missing_defaults_to_1000():
    storage, runner = FakeStorage(), FlakyRunner()
    make_executor(storage, runner).execute(ROW, 1)
    assert storage.writes[0][2] == 1000


def test_chunksize_zero_becomes_unchunked():
    storage, runner = FakeStorage(), FlakyRunner()
    make_executor(storage, runner).execute({**ROW, "chunksize": 0}, 1)
    assert storage.writes[0][2] is None


def test_commit_called_once_per_successful_dump():
    # F9 surface (reference floorist.py:216-218)
    storage, runner = FakeStorage(), FlakyRunner()
    commits: list[int] = []
    ex = DumpExecutor(
        storage, runner, RetryPolicy(), run_date=date(2026, 1, 2),
        commit=lambda: commits.append(1), sleep=lambda s: None,
    )
    ex.execute(ROW, 1)
    assert commits == [1]


def test_rollback_called_on_error():
    storage = FakeStorage()
    runner = FlakyRunner([Exception("boom")])
    rollbacks: list[int] = []
    ex = DumpExecutor(
        storage, runner, RetryPolicy(), run_date=date(2026, 1, 2),
        rollback=lambda: rollbacks.append(1), sleep=lambda s: None,
    )
    assert ex.execute(ROW, 1) is False
    assert rollbacks == [1]
