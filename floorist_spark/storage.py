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
import os
from datetime import date
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _hashable(dt: T.DataType) -> bool:
    """xxhash64 rejects MapType (anywhere in the tree); everything else the
    sink can carry hashes fine."""
    if isinstance(dt, T.MapType):
        return False
    if isinstance(dt, T.ArrayType):
        return _hashable(dt.elementType)
    if isinstance(dt, T.StructType):
        return all(_hashable(f.dataType) for f in dt.fields)
    return True


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
        writer_df = self._plan_writer(df, chunksize, parity)
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

    def _plan_writer(self, df: DataFrame, chunksize: int | None, parity: bool) -> DataFrame:
        """Shape the writer input so the gzip/Parquet encode runs in
        parallel instead of on one task (optimization guide §2.4/§2.6; was
        ``coalesce(1)`` in parity mode — the single biggest bench entry).

        Parity mode must still land EXACTLY ceil(N/chunksize) files. With
        ``maxRecordsPerFile`` each write task emits ceil(rows_in_task /
        chunksize) files, so the total equals the parity count iff every
        task holds a whole number of chunks with at most one task carrying
        the single global partial chunk. Assign each row a global chunk id
        (row_number over a deterministic total order — xxhash64 of the row,
        so a retried stage reproduces the same assignment, SPARK-38388
        class) and hash-repartition on that id: each chunk lands whole in
        one task, only the last chunk is partial, and the count telescopes
        back to ceil(N/chunksize) while ~cores tasks encode concurrently.
        The row_number pass IS single-partition, but it only shuffles and
        numbers rows — the expensive part (gzip + Parquet encode) is what
        gets parallelized. At real scale the parity contract itself is the
        serial constraint; scale mode below is the 100 TB path.

        Scale mode keeps the input partitioning (a well-partitioned
        cluster input already writes in parallel) and only spreads when the
        input arrives BELOW the session's parallelism (e.g. a single-file
        local scan or a broadcast-join result) — scale-adaptive, a no-op on
        a properly partitioned cluster.
        """
        if parity:
            if not chunksize:
                return df.coalesce(1)  # one-file contract: inherently serial
            order = (
                F.xxhash64(*df.columns)
                if all(_hashable(f.dataType) for f in df.schema.fields)
                else F.lit(1)  # map-typed rows: count-correct, order-arbitrary
            )
            rn = F.row_number().over(Window.orderBy(order))
            tag = "__floorist_chunk__"
            n_par = self.spark.sparkContext.defaultParallelism
            # Spark's FileFormatWriter makes TASK 0 write a file even when
            # its iterator is empty (schema preservation for empty jobs) —
            # so if no chunk hashes into partition 0 the parity count gains
            # a spurious 0-row file. Remap chunk 0 (always present) to a
            # value that provably lands in partition 0: `hash()` IS the
            # HashPartitioning expression (Murmur3 seed 42), so the
            # placement pmod(hash(v), n) is computable in-engine. A
            # collision with a real chunk id only merges two whole chunks
            # into one task — the file count still telescopes exactly.
            zero_chunk = self._partition_zero_preimage(n_par)
            chunk = ((rn - F.lit(1)) / F.lit(chunksize)).cast("long")
            return (
                df.withColumn(
                    tag,
                    F.when(chunk == 0, F.lit(zero_chunk)).otherwise(chunk),
                )
                .repartition(n_par, F.col(tag))
                .drop(tag)
            )
        n = self.spark.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() < n:
            return df.repartition(n)
        return df

    #: session-shared cache of pmod(hash(v), n)==0 preimages, keyed by n
    _zero_preimages: dict[int, int] = {}

    def _partition_zero_preimage(self, n: int) -> int:
        """Smallest nonnegative long v with pmod(hash(v), n) == 0, i.e. a
        value HashPartitioning places in partition 0. One tiny range scan,
        cached per partition count for the process lifetime."""
        cached = StorageClient._zero_preimages.get(n)
        if cached is not None:
            return cached
        lo = 0
        while True:
            found = (
                self.spark.range(lo, lo + 8 * n)
                .where(F.pmod(F.hash(F.col("id")), F.lit(n)) == 0)
                .agg(F.min("id"))
                .first()[0]
            )
            if found is not None:
                StorageClient._zero_preimages[n] = int(found)
                return int(found)
            lo += 8 * n

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
        parity (`tests/test_floorist.py:160-188`).

        ``file:`` URIs walk the tree in-process: the generic Hadoop
        ``listFiles`` RemoteIterator costs ~5 py4j round trips per file
        (measured 7.3s for a 1000-file export — driver-side overhead half
        as large as the write itself, guide §5/§7.3). Remote schemes (s3a)
        keep the Hadoop path, where the round trips are to the store, not
        py4j."""
        parsed = urlparse(target)
        if parsed.scheme in ("", "file"):
            base = parsed.path
            if not os.path.isdir(base):
                return []
            out: list[str] = []
            for root_dir, _dirs, files in os.walk(base):
                for name in files:
                    if not name.startswith("_") and not name.startswith("."):
                        # Hadoop Path renders local URIs as file:/abs/path
                        out.append("file:" + os.path.join(root_dir, name))
            return sorted(out)
        fs = self._fs(target)
        root = self._jpath(target)
        if not fs.exists(root):
            return []
        out = []
        it = fs.listFiles(root, True)
        while it.hasNext():
            status = it.next()
            name = status.getPath().getName()
            if not name.startswith("_") and not name.startswith("."):
                out.append(status.getPath().toString())
        return sorted(out)
