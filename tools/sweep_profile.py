"""Aggregate a sweep log's per-query wall= suffixes into a JSON
profile: `python tools/sweep_profile.py SWEEP_LOG [OUT.json]`.

check_queries.py stamps every OK/FAIL line with wall=<sec> (round
13), so any sweep log doubles as the per-query time profile the
round record commits (VERDICT r12 item 4: know where the sf10 sweep
wall goes before optimizing it). Prints the top costs and the total.
"""

from __future__ import annotations

import json
import re
import sys


def main() -> None:
    log = sys.argv[1]
    out = sys.argv[2] if len(sys.argv) > 2 else None
    times: dict[str, float] = {}
    pat = re.compile(r"^(?:OK|FAIL)\s+(\S+?): .* wall=([0-9.]+)s$")
    with open(log) as f:
        for line in f:
            m = pat.match(line.strip())
            if m:
                times[m.group(1)] = float(m.group(2))
    total = sum(times.values())
    top = sorted(times.items(), key=lambda kv: -kv[1])[:20]
    print(f"{len(times)} timed queries, total {total / 60:.1f} min")
    for name, t in top:
        print(f"  {t:8.1f}s  {name}")
    if out:
        with open(out, "w") as f:
            json.dump(
                {"log": log, "total_s": round(total, 1), "n": len(times),
                 "queries": {k: round(v, 1) for k, v in sorted(times.items())}},
                f, indent=0,
            )
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
