"""Storage client: partitioned Parquet sink + markers + cleanup (SURVEY §2
F4, F5, F6, F7, F12).

The reference talks to S3 through boto3/awswrangler
(`/root/reference/src/floorist/floorist.py:66-113`); here every path goes
through the Hadoop FileSystem API, so one code path serves ``file://`` in
tests and ``s3a://`` on a cluster, and the writes themselves are executed by
Spark tasks (distributed PUTs), not the driver.

Reference semantics reproduced:

* **F4 make_path** — ``prefix/year_created=Y/month_created=M/day_created=D``
  from the *job run date*, month/day non-zero-padded (the reference's
  ``%-m/%-d``, `floorist.py:94-97`). Date parts are path literals, not data
  columns — partition values live only in the path (`tests pin this at
  /root/reference/tests/test_floorist.py:166-168`).
* **F5 write_parquet** — gzip Parquet, append mode, one file per
  ``chunksize`` rows. Parity mode reproduces the reference's exact file
  counts (ceil(N/chunksize) — `tests/test_floorist.py:160-188`) via
  ``coalesce(1)`` + ``maxRecordsPerFile``; scale mode keeps the input
  partitioning (a 1000-executor cluster writes in parallel) and
  ``maxRecordsPerFile`` only bounds file size.
* **F6 empty-relation sink** — a 0-row (or 0-column) result writes a
  directory marker, NOT a Parquet file (`floorist.py:102-110`; on S3A
  ``mkdirs`` creates exactly the zero-byte trailing-slash object the
  reference PUTs). The Parquet writer must not run
  (`tests/test_floorist_standalone.py:436-441`).
* **F7 cleanup** — recursive delete of the target prefix before a retry so
  re-writing cannot duplicate rows (`floorist.py:112-113,209-213`).
* **F12 verify** — startup probe of the bucket root; on an access-denied
  style failure retry with a trailing slash (credentials without
  ListBuckets), otherwise fail fast (`floorist.py:81-92`).
"""

from __future__ import annotations

import logging
from datetime import date

from pyspark.sql import DataFrame, SparkSession


class StorageClient:
    """Hadoop-FS-backed sink rooted at ``base_uri`` (s3a://bucket, file:///dir)."""

    def __init__(self, spark: SparkSession, base_uri: str):
        self.spark = spark
        self.base_uri = base_uri.rstrip("/")

    # -- Hadoop FS plumbing -------------------------------------------------

    def _jpath(self, uri: str):
        return self.spark._jvm.org.apache.hadoop.fs.Path(uri)

    def _fs(self, uri: str):
        return self._jpath(uri).getFileSystem(self.spark._jsc.hadoopConfiguration())

    # -- F12 ---------------------------------------------------------------

    def verify(self) -> None:
        """Probe the sink root; the fallback mirrors the reference's
        AccessDenied retry for prefix-scoped credentials (`floorist.py:81-92`:
        credentials without ListBuckets can still LIST under the prefix).

        Hadoop Path normalization makes a trailing-slash re-probe a no-op, so
        the second attempt is a genuinely different call: a child glob
        (``<base>/*``), which S3A issues as a LIST with ``prefix=<base>/`` —
        the permission surface a prefix-scoped policy actually grants."""
        try:
            self._fs(self.base_uri).listStatus(self._jpath(self.base_uri))
        except Exception as ex:
            if "AccessDenied" in str(ex):
                fs = self._fs(self.base_uri)
                if fs.globStatus(self._jpath(self.base_uri.rstrip("/") + "/*")) is None:
                    raise
            else:
                raise

    # -- F4 ------------------------------------------------------------------

    def make_path(self, prefix: str, run_date: date | None = None) -> tuple[str, str]:
        """``(relative_path, full_target_uri)`` with unpadded month/day ints,
        byte-for-byte the reference layout (`floorist.py:94-97`)."""
        d = run_date or date.today()
        path = f"{prefix}/year_created={d.year}/month_created={d.month}/day_created={d.day}"
        return path, f"{self.base_uri}/{path}"

    # -- F5 / F6 -------------------------------------------------------------

    def write_parquet(
        self,
        df: DataFrame,
        target: str,
        chunksize: int | None = None,
        parity: bool = True,
        dump_count: int = 0,
    ) -> int:
        """Write one dump; returns the number of Parquet files written.

        Empty (0-row or 0-column) results take the F6 marker path and never
        invoke the Parquet writer. ``chunksize=None`` means unchunked — a
        single file in parity mode (`floorist.py:194`: falsy chunksize →
        one pandas chunk → one file).
        """
        if len(df.columns) == 0 or df.isEmpty():
            self.write_empty_marker(target)
            logging.info("[Dump #%d] Empty folder created for empty result", dump_count)
            return 0

        # Append mode can land on a prefix holding files from earlier dumps;
        # count only what THIS write produced (before/after listing diff), so
        # the chunk logs and the returned count match the reference's
        # per-dump chunk numbers, not the cumulative prefix contents.
        before = set(self.list_parquet_files(target))
        writer_df = df.coalesce(1) if parity else df
        (
            writer_df.write.mode("append")
            .option("compression", "gzip")
            .option("maxRecordsPerFile", chunksize or 0)
            .parquet(target)
        )
        files = [f for f in self.list_parquet_files(target) if f not in before]
        for chunk in range(1, len(files) + 1):
            logging.info("[Dump #%d] Written parquet chunk #%d", dump_count, chunk)
        return len(files)

    def write_empty_marker(self, target: str) -> None:
        """F6: directory marker instead of a Parquet file. On S3A `mkdirs`
        PUTs the zero-byte trailing-slash object (`floorist.py:102-110`);
        on local FS it creates the empty directory."""
        self._fs(target).mkdirs(self._jpath(target))

    # -- F7 ------------------------------------------------------------------

    def cleanup(self, target: str) -> None:
        """Delete everything under the target prefix (`floorist.py:112-113`).
        Recursive so partially-written chunks from a failed attempt vanish."""
        fs = self._fs(target)
        p = self._jpath(target)
        if fs.exists(p):
            fs.delete(p, True)

    # -- helpers -------------------------------------------------------------

    def exists(self, uri: str) -> bool:
        return self._fs(uri).exists(self._jpath(uri))

    def list_parquet_files(self, target: str) -> list[str]:
        """Recursive listing of data files under ``target`` (excludes
        _SUCCESS and hidden files) — the test surface for chunk-count
        parity (`tests/test_floorist.py:160-188`)."""
        fs = self._fs(target)
        root = self._jpath(target)
        if not fs.exists(root):
            return []
        out: list[str] = []
        it = fs.listFiles(root, True)
        while it.hasNext():
            status = it.next()
            name = status.getPath().getName()
            if not name.startswith("_") and not name.startswith("."):
                out.append(status.getPath().toString())
        return sorted(out)
