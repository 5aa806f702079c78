"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001; ``queries()`` /
``oracle_sql()`` expose every implemented operator from SURVEY.md §2 plus
the scale-extension operators, each checked against a DuckDB oracle at
sf0.01 where SQL-expressible.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from floorist_spark.operators.relational import FLAGSHIP

    return FLAGSHIP(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (registry:
    ``floorist_spark.operators.catalog`` — explicit module list, broken
    imports fail loudly)."""
    from floorist_spark.operators.catalog import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL for each deterministic, SQL-expressible
    query; keys absent here get the driver's rows-only check."""
    from floorist_spark.operators.catalog import all_oracles

    return all_oracles()
