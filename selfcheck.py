"""Local mirror of the driver's correctness gate: run every queries() entry
and its oracle_sql() twin side-by-side, compare rows/schema/values.

Usage: python selfcheck.py [prefix ...]   (e.g. `python selfcheck.py d s t e`)
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> int:
    prefixes = tuple(sys.argv[1:])
    import duckdb

    from __spark_entry__ import oracle_sql, queries
    from floorist_spark.session import TESTDATA_TABLES, get_spark
    from tests.oracle_compare import compare_results

    spark = get_spark("selfcheck")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )

    qs, oracles = queries(), oracle_sql()
    failed = []
    for name, fn in qs.items():
        if prefixes and not name.startswith(prefixes):
            continue
        t0 = time.time()
        try:
            sp = fn(spark, SF_DIR).toPandas()
            if name not in oracles:
                print(f"  {name}: rows-only ({len(sp)} rows) [{time.time()-t0:.1f}s]")
                continue
            du = con.execute(oracles[name]).fetchdf()
            compare_results(sp, du, name)
            print(f"  {name}: OK ({len(sp)} rows) [{time.time()-t0:.1f}s]")
        except Exception as e:
            failed.append(name)
            msg = str(e).split("\n")[0][:300]
            print(f"  {name}: FAIL {type(e).__name__}: {msg}")
            if os.environ.get("SELFCHECK_TB"):
                traceback.print_exc()

    # entry N's build released entry N-1's caches; free the final one too
    # (and the session-lifetime memos — the shared dedup signature chain),
    # then assert the sweep left executor memory clean
    from floorist_spark.operators._cache import release_caches, release_memos

    release_caches()
    release_memos()
    leftover = spark.sparkContext._jsc.getPersistentRDDs().size()
    if leftover:
        failed.append(f"cache-leak({leftover})")
        print(f"  cache-leak: {leftover} persisted RDDs survived the sweep")
    print(f"\n{'FAILED: ' + ', '.join(failed) if failed else 'ALL OK'}")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
