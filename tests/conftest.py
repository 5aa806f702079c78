from __future__ import annotations

import os
import sys

import pytest

REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_DIR not in sys.path:
    sys.path.insert(0, REPO_DIR)

# Live-PG e2e support: compile the pgwire stand-in JDBC driver (if the JDK
# is available) and export FLOORIST_EXTRA_JARS BEFORE any SparkSession is
# created — the driver classpath is fixed at JVM launch.
from tests.pgwire_build import export_extra_jars  # noqa: E402

export_extra_jars()

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECTNESS = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from floorist_spark.session import get_spark

    spark = get_spark("floorist_spark_tests")
    yield spark


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    from floorist_spark.session import TESTDATA_TABLES

    for t in TESTDATA_TABLES:
        path = os.path.join(SF_CORRECTNESS, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    yield con
    con.close()
