#!/usr/bin/env python
"""Benchmark the engine's headline queries.

Runs at ``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` (default 32) and prints ONE JSON line:
``{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}``.

Each query executes against the noop sink so the full plan runs (scan →
shuffle → result) without driver-side collection costs.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO_ROOT = str(Path(__file__).resolve().parent)
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from land_registry_data_ingestion_spark.session import get_spark  # noqa: E402
from land_registry_data_ingestion_spark.plans.registry import (  # noqa: E402
    _load_all,
    REGISTRY,
)

# One representative per operator family (SURVEY §2) — kept small enough
# that a bench round is minutes, wide enough that a regression anywhere
# (scan, join, agg, window, merge, dedup, similarity, text) shows up.
HEADLINE = [
    "q1_delay_histogram_days",
    "q4_normalized_delay",
    "q5_smoothed_delay",
    "rel_project_filter",
    "rel_inner_join_agg",
    "rel_left_join_broadcast",
    "rel_full_outer_reconcile",
    "agg_multi",
    "win_latest_row",
    "ord_sort_limit",
    "cdc_merge_state",
    "dedup_exact_groups",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_simhash_pairs",
    "text_quality_score",
    "sim_topk_bruteforce",
    "sim_ivf_topk",
    "evt_sessionize",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="lrdi-bench",
        master=f"local[{cpus}]",
        extra_conf={"spark.sql.shuffle.partitions": str(max(int(cpus), 16))},
    )
    spark.sparkContext.setLogLevel("ERROR")
    _load_all()

    # Warm up the JVM/codegen and prime the file-index caches so the first
    # timed query doesn't absorb session startup.
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    REGISTRY["agg_scalar_max"].fn(spark, sf_dir).collect()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        spec = REGISTRY[name]
        start = time.perf_counter()
        spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - start, 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall_seconds",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
