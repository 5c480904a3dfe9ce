"""Vacuum regenerable run artifacts (round-13 hygiene, VERDICT r12
watch item 2): `.tmp` had grown to 5.8 GB and kept growing across
rounds/sfs because per-invocation artifacts outlive their runs.

What goes (all regenerated on demand by the queries that need them):
  - .tmp/checkpoints/*   — per-invocation streaming checkpoints; only
    a LIVE stream needs its checkpoint, and every query creates a
    fresh uuid-suffixed one. (548 leaked dirs, 1.6 GB, observed r13.)
  - .tmp/stream_src*, .tmp/stream_cdc, .tmp/stream_dedup — micro-
    batch staging dirs, rewritten at the start of each run.
  - .tmp/sinks/* — streaming/lakehouse sink outputs incl. the ANN
    ingest indexes; every producing query rmtree's and rebuilds its
    own sink, so nothing here is reread across runs without being
    rebuilt first.

What stays:
  - spark-warehouse/ — the persisted bucketed-join tables and the
    content-addressed sim/dedup index tables ARE reread across runs
    (tableExists fast path); dropping them only forces retraining.
    Bounded by construction: one db per (kind, sf tag).

Run it after a sweep (tools/sweep_runner.sh does) or standalone:
  python tools/vacuum_artifacts.py          # vacuum
  python tools/vacuum_artifacts.py --dry    # report only

NEVER run while a sweep/pytest/bench is executing — a live stream's
checkpoint or a mid-rebuild sink would be yanked from under it.
"""

from __future__ import annotations

import glob
import os
import shutil
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TMP = os.path.join(ROOT, ".tmp")

VICTIM_GLOBS = [
    "checkpoints",
    "stream_src*",
    "stream_cdc",
    "stream_dedup",
    "sinks",
]


def du(path: str) -> int:
    total = 0
    for dirpath, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(dirpath, f))
            except OSError:
                pass
    return total


def main() -> None:
    dry = "--dry" in sys.argv
    freed = 0
    for pat in VICTIM_GLOBS:
        for path in sorted(glob.glob(os.path.join(TMP, pat))):
            sz = du(path)
            freed += sz
            print(f"{'would remove' if dry else 'removing'} {path} "
                  f"({sz / 1e6:.0f} MB)")
            if not dry:
                shutil.rmtree(path, ignore_errors=True)
    left = du(TMP) if os.path.isdir(TMP) else 0
    print(f"freed {freed / 1e9:.2f} GB; .tmp now {left / 1e9:.2f} GB")


if __name__ == "__main__":
    main()
