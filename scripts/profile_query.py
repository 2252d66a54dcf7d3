#!/usr/bin/env python
"""Per-stage profile of registry queries: run each named query against
the noop sink (warm, N repeats) on a UI-enabled session, then pull
per-stage metrics (executor run time, input/shuffle bytes, task counts)
from the local Spark UI REST API. Stage attribution follows the job
description label set around each run.

Usage: python scripts/profile_query.py [--sf-dir DIR|--scale] [--repeats 2] q1 ...
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import urllib.request
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


def rest(url: str):
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.load(r)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf-dir", default=None)
    ap.add_argument("--scale", action="store_true")
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()

    spark = get_spark(
        app_name="lrdi-profile",
        master="local[32]",
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.ui.enabled": "true",
            "spark.sql.shuffle.partitions": "32",
            "spark.driver.memory": "24g",
        },
    )
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")
    _load_all()
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(128).repartition(32).mapInPandas(
        lambda b: b, "id long"
    ).write.format("noop").mode("overwrite").save()

    if args.sf_dir:
        sf_dir = args.sf_dir
    elif args.scale:
        sf_dir, _, _ = bench.build_scale_dir(spark, args.base)
    else:
        sf_dir = args.base

    ui = sc.uiWebUrl
    app_id = sc.applicationId

    for name in args.queries:
        fn = REGISTRY[name].fn
        # warm run (JIT/codegen) — unlabelled
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        walls = []
        sc.setJobDescription(f"profile:{name}")
        sc.setJobGroup(f"grp:{name}", f"profile:{name}")
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            walls.append(time.perf_counter() - t0)
        sc.setJobDescription(None)

        jobs = rest(f"{ui}/api/v1/applications/{app_id}/jobs?status=succeeded")
        stage_ids = set()
        n_jobs = 0
        for j in jobs:
            if j.get("jobGroup") == f"grp:{name}":
                n_jobs += 1
                stage_ids.update(j["stageIds"])
        stages = rest(f"{ui}/api/v1/applications/{app_id}/stages?status=complete")
        rows = []
        for s in stages:
            if s["stageId"] not in stage_ids:
                continue
            rows.append(
                (
                    s["executorRunTime"],
                    s["stageId"],
                    s["numCompleteTasks"],
                    s.get("inputBytes", 0),
                    s.get("shuffleReadBytes", 0),
                    s.get("shuffleWriteBytes", 0),
                    s.get("executorCpuTime", 0) // 1_000_000,
                    (s.get("name") or "")[:60],
                )
            )
        rows.sort(reverse=True)
        print(f"\n=== {name}  walls={['%.2f' % w for w in walls]}  "
              f"jobs={n_jobs} stages={len(rows)} (over {args.repeats} runs)")
        print(f"{'runMs':>8} {'cpuMs':>8} {'stage':>6} {'tasks':>6} "
              f"{'inMB':>8} {'shRdMB':>8} {'shWrMB':>8}  name")
        for rt, sid, nt, ib, srb, swb, cpu, nm in rows[:14]:
            print(
                f"{rt:8d} {cpu:8d} {sid:6d} {nt:6d} "
                f"{ib/1e6:8.1f} {srb/1e6:8.1f} {swb/1e6:8.1f}  {nm}"
            )


if __name__ == "__main__":
    main()
