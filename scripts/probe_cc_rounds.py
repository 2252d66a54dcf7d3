#!/usr/bin/env python
"""Time-boxed probe for verdict-r5 #6: where does
``dedup_near_dup_groups`` spend its 11-12 s at the bench scale tier —
pair mining or propagation rounds — and how many rounds does the
pointer-jumping loop actually take? The answer decides whether a
large-star/small-star alternation (Kiveris et al.) is worth pursuing
(keep only if ≥30% off end-to-end) or the current shape is already
round-bound at its floor.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO_ROOT = str(Path(__file__).resolve().parent.parent)
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

import bench  # noqa: E402
from land_registry_data_ingestion_spark.session import get_spark  # noqa: E402
from land_registry_data_ingestion_spark.operators.dedup import (  # noqa: E402
    minhash_near_dup_groups,
    minhash_near_duplicates,
    near_dup_groups,
)
from land_registry_data_ingestion_spark.sources.parquet import (  # noqa: E402
    load_tables,
)
from land_registry_data_ingestion_spark.util import release_caches  # noqa: E402


def main() -> None:
    spark = get_spark(
        app_name="lrdi-cc-probe",
        master="local[32]",
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.sql.shuffle.partitions": "32",
            "spark.driver.memory": "24g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(128).repartition(32).mapInPandas(
        lambda b: b, "id long"
    ).write.format("noop").mode("overwrite").save()

    scale_dir, _, _ = bench.build_scale_dir(spark, "/root/testdata/sf0.1")
    docs = load_tables(spark, scale_dir).documents

    def pairs_df():
        return minhash_near_duplicates(
            docs,
            "doc_id",
            num_hashes=16,
            band_size=4,
            threshold=0.3,
            family_edges="star",
        )

    out = {}
    for attempt in range(2):
        t0 = time.perf_counter()
        pairs_df().write.format("noop").mode("overwrite").save()
        t_pairs = time.perf_counter() - t0
        release_caches()

        # star-pairs → member-level CC: the round-5 shape, kept for
        # comparison with the shipped composition below.
        stats: dict = {}
        t0 = time.perf_counter()
        near_dup_groups(pairs_df(), stats=stats).write.format("noop").mode(
            "overwrite"
        ).save()
        t_total = time.perf_counter() - t0
        release_caches()

        # the SHIPPED query path (round 6): rep-graph CC composed inside
        # minhash_near_dup_groups — what dedup_near_dup_groups executes.
        stats2: dict = {}
        t0 = time.perf_counter()
        minhash_near_dup_groups(
            docs,
            "doc_id",
            num_hashes=16,
            band_size=4,
            threshold=0.3,
            stats=stats2,
        ).write.format("noop").mode("overwrite").save()
        t_composed = time.perf_counter() - t0
        release_caches()
        run = {
            "pairs_only_sec": round(t_pairs, 2),
            "member_cc_total_sec": round(t_total, 2),
            "member_cc_rounds": stats["rounds"],
            "composed_total_sec": round(t_composed, 2),
            "composed_rounds": stats2["rounds"],
        }
        out[f"run{attempt}"] = run
        print(json.dumps(run), file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
