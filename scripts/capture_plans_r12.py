#!/usr/bin/env python
"""Capture `.explain("formatted")` for named registry queries into
``plans/r12/<query>_<suffix>.txt`` (two sections: headline sf0.1 and the
replicated scale tier), matching the round-11 before-capture format.

Usage: python scripts/capture_plans_r12.py [--suffix after] q1 q2 ...
"""

from __future__ import annotations

import argparse
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


def explain_str(df, mode: str = "formatted") -> str:
    jmode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(  # noqa: E501
        mode
    )
    return df._jdf.queryExecution().explainString(jmode)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--suffix", default="after")
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    spark = get_spark(
        app_name="lrdi-plans-r12",
        master="local[32]",
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.sql.shuffle.partitions": "32",
            "spark.driver.memory": "24g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    _load_all()
    scale_dir, _, _ = bench.build_scale_dir(spark, args.base)
    out_dir = Path(REPO_ROOT) / "plans" / "r12"
    out_dir.mkdir(parents=True, exist_ok=True)
    for name in args.queries:
        fn = REGISTRY[name].fn
        parts = [
            "== headline sf0.1 ==",
            explain_str(fn(spark, args.base)).rstrip(),
            "== scale tier ==",
            explain_str(fn(spark, scale_dir)).rstrip(),
            "",
        ]
        path = out_dir / f"{name}_{args.suffix}.txt"
        path.write_text("\n".join(parts))
        print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
