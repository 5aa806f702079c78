"""Full degenerate-corpus matrix: every catalog entry against every
crafted corpus profile, Spark vs its DuckDB oracle (round-8 verdict
task 1 — the "run over every entry at least once" evidence pass).

Usage:
    python tools/degenerate_sweep.py [--out DEGENERATE_r09.json]
                                     [--seed 9] [--profiles p1,p2]
                                     [prefix ...]

For each profile in tests/degenerate_corpora.PROFILES a 10-table corpus
is materialized once under a temp dir, then the full catalog (optionally
prefix-filtered) runs against it exactly the way the grading driver
gates: Spark result vs oracle SQL, row count + column names + native
type parity + order-insensitive exact values. Every entry carries an
oracle (round 10 retired the last rows-only holdout). The JSON artifact maps
``profile -> entry -> {"ok": bool, "rows": n, "err": str|null, "sec": s}``
so round-over-round diffs show exactly which (entry, shape) pairs
regressed.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None, help="write JSON artifact here")
    ap.add_argument("--seed", type=int, default=9, help="corpus RNG seed")
    ap.add_argument("--profiles", default=None, help="comma-separated subset")
    ap.add_argument("prefixes", nargs="*", help="entry-name prefixes")
    args = ap.parse_args()

    from __spark_entry__ import oracle_sql, queries
    from floorist_spark.session import get_spark
    from tests.degenerate_corpora import PROFILES, build_corpus, duck_connect
    from tests.oracle_compare import check_type_parity, compare_results

    profiles = tuple(args.profiles.split(",")) if args.profiles else PROFILES
    prefixes = tuple(args.prefixes)
    spark = get_spark("degenerate_sweep")
    qs, oracles = queries(), oracle_sql()
    names = [n for n in qs if not prefixes or n.startswith(prefixes)]

    report: dict[str, dict] = {"_meta": {"seed": args.seed, "profiles": list(profiles)}}
    n_fail = 0
    for profile in profiles:
        with tempfile.TemporaryDirectory(prefix=f"degen_{profile}_") as root:
            build_corpus(spark, root, profile, seed=args.seed)
            con = duck_connect(root)
            prof_report: dict[str, dict] = {}
            for name in names:
                t0 = time.time()
                rec: dict = {"ok": True, "rows": None, "err": None}
                try:
                    df = qs[name](spark, root)
                    assert name in oracles, f"{name} has no oracle_sql() twin"
                    check_type_parity(con.sql(oracles[name]), df.schema, name)
                    sp = df.toPandas()
                    du = con.execute(oracles[name]).fetchdf()
                    compare_results(sp, du, f"{name}@{profile}")
                    rec["rows"] = len(sp)
                except Exception as e:  # noqa: BLE001 — sweep must finish
                    rec["ok"] = False
                    rec["err"] = f"{type(e).__name__}: {str(e).splitlines()[0][:300]}"
                    n_fail += 1
                    if os.environ.get("SELFCHECK_TB"):
                        traceback.print_exc()
                rec["sec"] = round(time.time() - t0, 2)
                status = "OK" if rec["ok"] else f"FAIL {rec['err']}"
                print(f"  {profile:>10s} {name}: {status} [{rec['sec']}s]", flush=True)
                prof_report[name] = rec
            con.close()
            report[profile] = prof_report

    from floorist_spark.operators._cache import release_caches, release_memos

    release_caches()
    release_memos()
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(report, fh, indent=1, sort_keys=True)
        print(f"wrote {args.out}")
    total = sum(len(v) for k, v in report.items() if k != "_meta")
    print(f"\n{total} runs, {n_fail} failures")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
