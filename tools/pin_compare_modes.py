"""Pin digest-mode vs pandas-mode verdict equivalence over the catalog.

Runs every declared query through harness.compare twice — once in
"digest" mode (distributed O(1)-to-driver hash compare) and once in
"pandas" mode (the driver-replica full-collect compare) — and asserts
the verdicts agree per query. This is the gate that lets large-sf
sweeps run in digest mode without weakening the check in practice:
same sorted-column / order-insensitive convention, verdicts
empirically identical across the whole catalog. NOTE the float
tolerances are NOT identical in theory (ADVICE r12): digest mode's S
tier (|x| < 8e12) matches pandas mode's 6dp, but the M/L/H tiers
compare at ~7 significant digits RELATIVE tolerance while pandas
%.6f is near-ULP-exact at those magnitudes — a large-magnitude
discrepancy below the tier granularity would pass digest and fail
pandas. This pin is an empirical equivalence over the catalog at the
pinned sf, not a proof; tools/digest_audit.py sample-audits
large-magnitude digest PASSes with the pandas compare.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python tools/pin_compare_modes.py [names...]
Writes one line per query; exits nonzero on any verdict divergence or
any failure in either mode.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_rapids_ml_spark.harness import compare
from spark_rapids_ml_spark.registry import all_queries
from spark_rapids_ml_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark("pin_modes", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "16")),
                      shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_queries()
    names = sys.argv[1:] or list(specs)
    divergent, failed = [], []
    for name in names:
        spec = specs[name]
        try:
            t0 = time.time()
            okd, dd = compare(spark, spec, sf_dir, mode="digest")
            td = time.time() - t0
            t0 = time.time()
            okp, dp = compare(spark, spec, sf_dir, mode="pandas")
            tp = time.time() - t0
        except Exception as exc:  # noqa: BLE001 — keep sweeping
            print(f"ERR  {name}: {type(exc).__name__}: {str(exc)[:300]}", flush=True)
            failed.append(name)
            continue
        tag = "SAME" if okd == okp else "DIVERGE"
        print(f"{tag} {name}: digest={okd} ({td:.1f}s) pandas={okp} ({tp:.1f}s)"
              + ("" if okd and okp else f" dd={dd} dp={dp}"), flush=True)
        if okd != okp:
            divergent.append(name)
        if not okp:
            failed.append(name)
    print(f"pinned {len(names)} queries: divergent={divergent} failed={failed}", flush=True)
    sys.exit(1 if (divergent or failed) else 0)


if __name__ == "__main__":
    main()
