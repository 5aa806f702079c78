"""Build a committed correctness artifact from selfcheck sweep logs.

The round-6 review flagged an evidence-trail gap: catalog entries outside
the driver's 49-slot gate window were claimed green on the strength of
unrecorded local runs. This tool turns the actual sweep output into a
versioned JSON artifact (SELFCHECK_r{N}.json) so the claim is
reproducible: per entry, the row count and wall seconds at each swept
scale, plus the sweep verdict line.

Usage: python tools/selfcheck_artifact.py <round> <scale>=<logfile> ...
e.g.   python tools/selfcheck_artifact.py 7 \\
           sf0.01=/tmp/selfcheck_001.log sf0.1=/tmp/selfcheck_01.log
"""

from __future__ import annotations

import json
import re
import sys

LINE = re.compile(r"^\s+(\w+): (OK|rows-only) \((\d+) rows\) \[([0-9.]+)s\]")
FAIL = re.compile(r"^\s+(\w+): FAIL ")


def parse(path: str) -> dict:
    entries: dict[str, dict] = {}
    all_ok = False
    fails: list[str] = []
    for raw in open(path, encoding="utf-8", errors="replace"):
        m = LINE.match(raw)
        if m:
            entries[m.group(1)] = {
                "verdict": m.group(2),
                "rows": int(m.group(3)),
                "sec": float(m.group(4)),
            }
        elif "ALL OK" in raw:
            all_ok = True
        elif FAIL.match(raw):
            fails.append(raw.strip()[:200])
    return {
        "entries_checked": len(entries),
        "all_ok": all_ok,
        "failures": fails,
        "entries": entries,
    }


def main() -> int:
    rnd = int(sys.argv[1])
    sweeps = {}
    for arg in sys.argv[2:]:
        scale, path = arg.split("=", 1)
        sweeps[scale] = parse(path)
    out = {"round": rnd, "sweeps": sweeps}
    dest = f"SELFCHECK_r{rnd:02d}.json"
    with open(dest, "w", encoding="utf-8") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    for scale, sw in sweeps.items():
        print(
            f"{scale}: {sw['entries_checked']} entries, "
            f"all_ok={sw['all_ok']}, failures={len(sw['failures'])}"
        )
    print(f"wrote {dest}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
