#!/usr/bin/env python
"""Ad-hoc timing of registry queries at the bench scale dir (or any
sf_dir): ``python scripts/time_queries.py q1 q2 ...``. Reuses bench.py's
session, warm-up, adaptive-repeat and scale-dir machinery so numbers are
comparable with BENCH_DETAIL.json. ``--sf-dir`` overrides the data dir
(default: the replicated scale dir, built if absent)."""

from __future__ import annotations

import argparse
import json
import sys
import time
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
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf-dir", default=None)
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--repeats", type=int, default=0, help="fixed repeat count (0 = bench adaptive)")
    args = ap.parse_args()

    spark = get_spark(
        app_name="lrdi-time",
        master="local[32]",
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.sql.shuffle.partitions": "32",
            "spark.driver.memory": "24g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    _load_all()
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(128).repartition(32).mapInPandas(
        lambda b: b, "id long"
    ).write.format("noop").mode("overwrite").save()

    if args.sf_dir:
        sf_dir = args.sf_dir
    else:
        sf_dir, _, rows = bench.build_scale_dir(spark, args.base)
        print("scale dir:", sf_dir, rows, file=sys.stderr)

    def run(name):
        REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    out = {}
    for name in args.queries:
        if args.repeats:
            ts = []
            for _ in range(args.repeats):
                t0 = time.perf_counter()
                run(name)
                ts.append(round(time.perf_counter() - t0, 3))
                spark.sparkContext._jvm.System.gc()
            out[name] = ts
        else:
            t0 = None
            out[name] = round(
                _adaptive(lambda: run(name)), 3
            )
            spark.sparkContext._jvm.System.gc()
    print(json.dumps(out))


def _adaptive(fn) -> float:
    times = []
    while True:
        start = time.perf_counter()
        fn()
        times.append(time.perf_counter() - start)
        if len(times) >= 2:
            a, b = sorted(times)[:2]
            settled = b / a <= 1.5 and times[-1] >= a * 0.8
            if len(times) >= 4 or a < 0.3 or settled:
                return a


if __name__ == "__main__":
    main()
