#!/usr/bin/env python
"""Run declared queries vs their DuckDB oracles on an adversarial data
dir (see gen_adversarial.py) and print per-query mismatch detail —
the triage companion the pytest -q output can't give."""

from __future__ import annotations

import sys
import traceback
from pathlib import Path

REPO_ROOT = str(Path(__file__).resolve().parent.parent)
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

import duckdb

from land_registry_data_ingestion_spark.session import get_spark
from land_registry_data_ingestion_spark.plans.registry import _load_all, REGISTRY
from tests.oracle_harness import run_compare


def main() -> None:
    data_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfadv"
    spark = get_spark(
        app_name="lrdi-adv-triage",
        master="local[8]",
        extra_conf={
            "spark.sql.shuffle.partitions": "8",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    _load_all()
    rest = sys.argv[2:]
    names = []
    skip_next = False
    for a in rest:
        if skip_next:
            skip_next = False
            continue
        if a == "--tb":
            continue
        if a == "--json":
            skip_next = True
            continue
        names.append(a)
    names = names or sorted(
        n for n, s in REGISTRY.items() if s.sql is not None
    )
    duck = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        duck.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{data_dir}/{t}.parquet'"
        )
    n_bad = 0
    for name in names:
        spec = REGISTRY[name]
        if spec.sql is None:
            continue
        try:
            problems = run_compare(
                spark, duck, spec.fn, spec.sql, data_dir, name
            )
        except Exception as e:  # engine or oracle crashed — worst class
            n_bad += 1
            print(f"=== {name}: EXCEPTION {type(e).__name__}")
            print("   ", str(e).split("\n")[0][:300])
            if "--tb" in sys.argv:
                traceback.print_exc()
            continue
        if problems:
            n_bad += 1
            print(f"=== {name}: {len(problems)} problem(s)")
            for p in problems[:8]:
                print("   ", p[:300])
    print(f"\n{n_bad} queries diverged on {data_dir}")
    out_json = None
    argv = sys.argv[1:]
    if "--json" in argv:
        out_json = argv[argv.index("--json") + 1]
    if out_json:
        import json
        import subprocess

        head = subprocess.run(
            ["git", "rev-parse", "HEAD"],
            capture_output=True,
            text=True,
            cwd=REPO_ROOT,
        ).stdout.strip()
        with open(out_json, "w") as fh:
            json.dump(
                {
                    "data_dir": data_dir,
                    "head": head,
                    "queries_checked": len(names),
                    "diverged": n_bad,
                },
                fh,
                indent=1,
            )
        print(f"wrote {out_json}")


if __name__ == "__main__":
    main()
