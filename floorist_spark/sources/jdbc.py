"""JDBC source — live-PostgreSQL parity mode (SURVEY §2 F2, F3).

The reference's only data source is one streaming PostgreSQL connection
(`/root/reference/src/floorist/floorist.py:123-146`): a single server-side
cursor pages the opaque SQL string into bounded-memory chunks. The Spark
equivalent is the built-in JDBC source with the ``query`` option; memory is
bounded by ``fetchsize`` (rows per round-trip) instead of pandas chunks.

Parity vs scale:

* **parity** (``numPartitions=1``): one connection ⇒ one snapshot per dump,
  matching the reference's per-dump transaction semantics (F9,
  `floorist.py:128,148-152`). This is the default, because correctness of
  the snapshot is part of the reference contract.
* **scale**: partitioned reads (``partitionColumn/lowerBound/upperBound/
  numPartitions``) open N connections ⇒ N snapshots. That relaxation is
  explicit opt-in; at 100 TB the JDBC source is the wrong tool anyway — a
  CDC feed or parquet landing zone replaces it, and the rest of the engine
  is source-agnostic.

F3 (uuid→string): Spark's built-in PostgresDialect already maps PG ``uuid``
to ``StringType`` — the custom OID-2950 type caster at
`floorist.py:27-29,117-139` is subsumed. :func:`coerce_unwritable_columns`
keeps a guard for *other* exotic source types so the Parquet writer can
never fail on an unmapped type, the same failure the caster existed to
prevent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from floorist_spark.config import Config

#: Spark's JDBC fetchsize default is 0 (driver-chosen); the reference pages
#: at the floorplan chunksize default (`floorist.py:194`), so match it.
DEFAULT_FETCHSIZE = 1000

#: Parquet-writable Spark SQL types; anything else is cast to string.
_WRITABLE = (
    T.NullType,
    T.BooleanType,
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.DecimalType,
    T.StringType,
    T.BinaryType,
    T.DateType,
    T.TimestampType,
    T.TimestampNTZType,
    T.DayTimeIntervalType,
    T.ArrayType,
    T.MapType,
    T.StructType,
)


#: Reference database driver (`floorist.py:123` — postgres-only). An
#: explicit ``config.jdbc_url``/``jdbc_driver`` overrides both, which is how
#: the e2e suite runs the identical read path on embedded Derby.
DEFAULT_DRIVER = "org.postgresql.Driver"


def jdbc_url(config: Config) -> str:
    if config.jdbc_url:
        return config.jdbc_url
    return f"jdbc:postgresql://{config.database_hostname}/{config.database_name}"


def build_jdbc_options(
    config: Config,
    query: str,
    fetchsize: int | None = None,
    parity: bool = True,
    num_partitions: int | None = None,
) -> dict[str, str]:
    """The options dict for ``spark.read.format("jdbc")`` — split out so the
    surface is unit-testable without a live PostgreSQL."""
    opts = {
        "url": jdbc_url(config),
        "query": query,
        "user": config.database_username or "",
        "password": config.database_password or "",
        "fetchsize": str(fetchsize or DEFAULT_FETCHSIZE),
        "driver": config.jdbc_driver or DEFAULT_DRIVER,
    }
    if parity:
        opts["numPartitions"] = "1"
    elif num_partitions:
        opts["numPartitions"] = str(num_partitions)
    return opts


def read_query(
    spark: SparkSession,
    config: Config,
    query: str,
    fetchsize: int | None = None,
    parity: bool = True,
) -> DataFrame:
    """F2: execute an opaque SQL string on PostgreSQL, lazily
    (`floorist.py:141-146`). Catalyst still prunes/pushes into the outer
    plan; the inner query runs verbatim on the server, exactly like the
    reference's ``pd.read_sql``."""
    reader = spark.read.format("jdbc")
    for k, v in build_jdbc_options(config, query, fetchsize, parity).items():
        reader = reader.option(k, v)
    return coerce_unwritable_columns(reader.load())


def coerce_unwritable_columns(df: DataFrame) -> DataFrame:
    """F3 guard: cast any non-Parquet-writable column to string, replacing
    the reference's psycopg2 uuid caster (`floorist.py:117-139`). A no-op
    for schemas the dialect already mapped (the common case)."""
    exotic = [f.name for f in df.schema.fields if not isinstance(f.dataType, _WRITABLE)]
    if not exotic:
        return df
    return df.select(
        *[
            F.col(f.name).cast("string").alias(f.name) if f.name in exotic else F.col(f.name)
            for f in df.schema.fields
        ]
    )


class JdbcQueryRunner:
    """Callable query runner for the DumpExecutor in jdbc mode, carrying the
    (no-op on Spark) commit/rollback hooks — JDBC reads auto-commit per
    connection, so per-dump snapshot isolation comes from ``numPartitions=1``
    (F9 relaxation, documented above)."""

    def __init__(self, spark: SparkSession, config: Config, parity: bool = True):
        self.spark = spark
        self.config = config
        self.parity = parity

    def __call__(self, query: str) -> DataFrame:
        return read_query(self.spark, self.config, query, parity=self.parity)

    def commit(self) -> None:
        return None

    def rollback(self) -> None:
        return None
