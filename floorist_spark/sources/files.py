"""File-format source dispatch — parquet / ORC / CSV / JSON landing zones.

The reference reads exactly one source (live PostgreSQL); this engine's
native mode reads files, and real landing zones arrive in more than one
format. ``read_any`` dispatches on the path's extension to the matching
Spark reader with sane defaults:

* parquet / orc: self-describing, read as-is;
* csv: ``header=true``; pass ``schema`` to avoid the inference scan (at
  100 TB, schema inference is a full extra pass — always provide one);
* json (lines): ``schema`` strongly recommended for the same reason.

Every format lands in the same DataFrame surface, so the whole operator
catalog and the export path work unchanged on top.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

_EXT_FORMAT = {
    ".parquet": "parquet",
    ".orc": "orc",
    ".csv": "csv",
    ".json": "json",
    ".jsonl": "json",
}


def format_for(path: str) -> str:
    """Infer the reader format from the path's extension (the directory
    name convention ``table.<ext>`` used by the testdata layout)."""
    ext = os.path.splitext(path.rstrip("/"))[1].lower()
    if ext not in _EXT_FORMAT:
        raise ValueError(
            f"unsupported source extension {ext!r} for {path!r} "
            f"(known: {sorted(_EXT_FORMAT)})"
        )
    return _EXT_FORMAT[ext]


def read_any(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    **options: str,
) -> DataFrame:
    """Read a table from any supported file format into a DataFrame."""
    fmt = format_for(path)
    reader = spark.read.format(fmt)
    if fmt == "csv":
        reader = reader.option("header", "true")
        if schema is None:
            reader = reader.option("inferSchema", "true")
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)
