#!/usr/bin/env python
"""Cross-session plan-fingerprint reproducibility check.

The bench's stall/plan-change forensics compare each query's
construction-time plan fingerprint against the committed
BENCH_FLOORS.json; a fingerprint that doesn't reproduce from a fresh
session would false-flag ``plan_changed`` and mute ``suspect_stall``.
This script derives all headline+scale fingerprints in THIS fresh
process and compares them to a reference: the committed floors file by
default, or a JSON written by a previous invocation (``--write out.json``
/ ``--ref out.json``) to check pure session-to-session determinism.

Exits non-zero listing mismatches. Round 6: post-execution fingerprints
failed 23/75 of these checks (materialized barrier caches rewrite the
printed plan); construction-time fingerprints pass 75/75.

Round 8: when the reference is the committed floors file, additionally
fails any entry holding fewer than 3 session minima — a plan-changing
commit must carry fresh floor sessions, or the stall detector rides the
loose 2x-floor fallback for up to two rounds (the regression-hiding
window ROUND7_NOTES documented).
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

REPO_ROOT = str(Path(__file__).resolve().parent.parent)
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

import bench  # noqa: E402
from land_registry_data_ingestion_spark.session import get_spark  # noqa: E402
from land_registry_data_ingestion_spark.plans.registry import (  # noqa: E402
    _load_all,
    REGISTRY,
)


def main() -> None:
    write_to = None
    ref_path = os.path.join(REPO_ROOT, "BENCH_FLOORS.json")
    args = sys.argv[1:]
    if "--write" in args:
        write_to = args[args.index("--write") + 1]
    if "--ref" in args:
        ref_path = args[args.index("--ref") + 1]

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="lrdi-fp-check",
        master=f"local[{cpus}]",
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.sql.shuffle.partitions": str(max(int(cpus), 16)),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    _load_all()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    scale_dir, _, _ = bench.build_scale_dir(spark, sf_dir)

    got = {
        "headline": {
            n: bench.plan_fingerprint(REGISTRY[n].fn(spark, sf_dir))
            for n in bench.HEADLINE
        },
        "scale": {
            n: bench.plan_fingerprint(REGISTRY[n].fn(spark, scale_dir))
            for n in bench.SCALE_QUERIES
        },
    }
    if write_to:
        with open(write_to, "w") as f:
            json.dump(got, f, indent=1)
        print(f"wrote {write_to}")
        return

    with open(ref_path) as f:
        ref = json.load(f)
    mismatches = []
    thin_bands = []
    for section in ("headline", "scale"):
        for n, fp in got[section].items():
            want = ref.get(section, {}).get(n)
            if isinstance(want, dict):
                # A committed fingerprint without >=3 session minima
                # behind it leaves the stall detector on the 2x-floor
                # fallback — the regression-hiding window the round-7
                # notes documented. A plan-changing commit must carry
                # fresh floor sessions, not just the new fingerprint.
                if len(want.get("sessions") or []) < 3:
                    thin_bands.append((section, n, len(want.get("sessions") or [])))
                want = want.get("plan")
            if want != fp:
                mismatches.append((section, n, want, fp))
    n_checked = len(got["headline"]) + len(got["scale"])
    print(
        f"checked {n_checked}; mismatches: {len(mismatches)}; "
        f"entries with <3 sessions: {len(thin_bands)}"
    )
    for m in mismatches:
        print(" ", m)
    for t in thin_bands:
        print("  thin band:", t)
    if mismatches or thin_bands:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
