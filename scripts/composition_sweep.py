#!/usr/bin/env python
"""Whole-section composition sweep at a grown scale tier (r7 verdict #6).

Per-operator scaling exponents are committed (COVERAGE.md; ≤1.0
everywhere), but they were each measured in ISOLATION — the full
31-query scale section had only ever run at the bench tier
(documents ×20 / orders ×40 / events ×10). This sweep runs the entire
section once at the probe's grown tier (documents ×80 / orders ×120 /
events ×30 — the same tier-2 replica dirs the scaling probes cache
under /tmp) and compares each query's section-context ratio
``t_tier2 / t_tier1`` against what its committed per-operator exponent
predicts, flagging anything more than 25% above. That is the cheapest
end-to-end check that nothing super-linear hides in query COMPOSITION —
shared session, accumulated memory pressure, GC — rather than in the
operators themselves.

Two query classes:

- committed-exponent queries (the probe set): expected ratio =
  ``growth ** exponent`` with the newest committed exponent; flag when
  ``ratio > 1.25 × expected``.
- everything else: no committed exponent, so the guard is the
  super-linearity bound — flag when ``ratio > 1.25 × growth`` (growth
  is the query's DRIVING table's growth between the tiers; tables the
  query doesn't read, or reads at an unchanged factor, give growth 1).

Run: ``python scripts/composition_sweep.py --two-session`` (the
committed artifact's mode: the whole sweep re-runs in two fresh
subprocess JVMs, per-cell minima merged — this host's multi-second
stall episodes can cover a whole in-session adaptive window, see
bench.py). Writes COMPOSITION_SWEEP.json at the repo root and exits
non-zero if any query flags.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO_ROOT = str(Path(__file__).resolve().parent.parent)
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

import bench  # noqa: E402
from scaling_probe import TIER2_SPEC  # noqa: E402  (same dir)
from land_registry_data_ingestion_spark.session import get_spark  # noqa: E402
from land_registry_data_ingestion_spark.plans.registry import (  # noqa: E402
    _load_all,
    REGISTRY,
)

# Growth of each table between the bench tier (bench.SCALE_SPEC) and the
# sweep tier (scaling_probe.TIER2_SPEC) — derived, not hand-kept.
TABLE_GROWTH = {
    name: TIER2_SPEC[name][1] / factor
    for name, (_, factor) in bench.SCALE_SPEC.items()
}

# Query -> driving table (the table whose growth dominates the query's
# input between the tiers). Queries driven by embeddings/lineitem see
# growth 1 here — the sweep tier deliberately holds those constant.
DRIVER = {
    "q1_delay_histogram_days": "orders",
    "cdc_merge_state": "orders",
    "win_latest_row": "orders",
    "win_equidepth_histogram": "orders",
    "dedup_exact_groups": "documents",
    "dedup_minhash_lsh": "documents",
    "dedup_simhash": "documents",
    "dedup_simhash_pairs": "documents",
    "dedup_near_dup_groups": "documents",
    "text_quality_score": "documents",
    "text_language_id": "documents",
    "text_decontaminate": "documents",
    "text_segment_dedup": "documents",
    "text_pipeline_pack": "documents",
    "text_lm_perplexity": "documents",
    "text_dsir_weights": "documents",
    "text_token_budget_sample": "documents",
    "text_repetition_filters": "documents",
    "text_dup_spans": "documents",
    "text_dup_span_trim": "documents",
    "sim_ivf_topk": "embeddings",
    "sim_lsh_ann_pairs": "embeddings",
    "sim_pq_topk": "embeddings",
    "sim_kmeans_clusters": "embeddings",
    "dedup_embedding_cosine": "embeddings",
    "dedup_semantic": "embeddings",
    "evt_asof_join": "events",
    "evt_range_join": "events",
    "evt_rolling_24h": "events",
    "evt_ohlc_hourly": "events",
    "evt_sliding_users_24h": "events",
}

# Pair-emitting queries whose OUTPUT is quadratic on the replica axis
# BY DECLARED CONTRACT — for them "super-linear wall time" is the
# contract, not a composition pathology, and the honest bound is the
# output growth (growth², verified by counting at both tiers):
#
# - dedup_simhash_pairs emits every near-dup pair; the replica dir's
#   identical-document families grow 20-way → 80-way, so family pairs
#   grow C(80,2)/C(20,2) ≈ 16.6× while documents grow 4×. Measured
#   output rows: 30,518,400 → 488,894,400 = ×16.0 (wall grew only
#   ×5.9 — sub-linear in its own output).
# - evt_range_join counts events (ANY user) in each purchase's 30-min
#   window; events ×3 grows BOTH the interval count and the
#   per-window event density, so the matched-pair volume the bucketed
#   join must verify grows ×9. Measured matched pairs: 141,404,100 →
#   1,272,636,900 = ×9.0 exactly (wall grew ×5.7).
#
# (The equivalent minhash/near-dup queries DON'T appear here: their
# r5 star-edge / rep-level rewrites made them output-LINEAR on this
# axis by construction, and their measured ratios above confirm it.)
OUTPUT_QUADRATIC = {"dedup_simhash_pairs", "evt_range_join"}

# Newest committed per-operator exponents (COVERAGE.md round-6/7
# tables; three-point / post-rewrite values where those superseded the
# two-point ones). Everything else carries no committed exponent and is
# judged against the super-linearity bound instead.
COMMITTED_EXPONENT = {
    "text_dup_spans": 0.48,
    "text_dup_span_trim": 0.64,
    "text_repetition_filters": 0.97,
    "evt_sliding_users_24h": 0.02,
    "win_equidepth_histogram": 0.71,
    "text_pipeline_pack": 0.37,
    "text_decontaminate": 0.25,
    "cdc_merge_state": 0.41,
    "dedup_near_dup_groups": 0.10,
}

TOLERANCE = 1.25


def _timed(spark, name: str, sf_dir: str) -> float:
    times: list[float] = []
    while True:
        t0 = time.perf_counter()
        REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        times.append(time.perf_counter() - t0)
        if len(times) >= 2:
            a, b = sorted(times)[:2]
            if len(times) >= 4 or a < 0.3 or (
                b / a <= 1.5 and times[-1] >= a * 0.8
            ):
                spark.sparkContext._jvm.System.gc()
                return a


def _one_session() -> dict:
    spark = get_spark(
        app_name="lrdi-composition-sweep",
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

    base = "/root/testdata/sf0.1"
    tier1, _, _ = bench.build_scale_dir(spark, base)
    saved = bench.SCALE_SPEC
    try:
        bench.SCALE_SPEC = TIER2_SPEC
        tier2, _, _ = bench.build_scale_dir(spark, base)
    finally:
        bench.SCALE_SPEC = saved

    out: dict[str, dict] = {}
    # whole SECTION at each tier, in section order — composition (shared
    # session, memory pressure from earlier queries) is the measurement
    for tier_key, d in (("t1", tier1), ("t2", tier2)):
        for name in bench.SCALE_QUERIES:
            out.setdefault(name, {})[tier_key] = round(
                _timed(spark, name, d), 3
            )
    return out


def _verdicts(cells: dict[str, dict]) -> dict:
    rows = {}
    flagged = []
    for name in bench.SCALE_QUERIES:
        t1, t2 = cells[name]["t1"], cells[name]["t2"]
        ratio = t2 / t1
        growth = TABLE_GROWTH[DRIVER[name]]
        exp = COMMITTED_EXPONENT.get(name)
        if name in OUTPUT_QUADRATIC:
            expected, kind = growth ** 2, "output-quadratic-contract"
        elif exp is not None:
            expected, kind = growth ** exp, "committed-exponent"
        else:
            expected, kind = growth, "superlinear-bound"
        flag = ratio > TOLERANCE * expected
        rows[name] = {
            "t1_sec": t1,
            "t2_sec": t2,
            "ratio": round(ratio, 2),
            "driver": DRIVER[name],
            "growth": growth,
            "exponent": exp,
            "expected_ratio": round(expected, 2),
            "bound": kind,
            "flag": flag,
        }
        if flag:
            flagged.append(name)
    return {
        "tier1": "bench scale tier (documents x20 / orders x40 / events x10)",
        "tier2": "probe tier 2 (documents x80 / orders x120 / events x30)",
        "tolerance": TOLERANCE,
        "flagged": flagged,
        "totals": {
            "t1_sec": round(sum(r["t1_sec"] for r in rows.values()), 2),
            "t2_sec": round(sum(r["t2_sec"] for r in rows.values()), 2),
        },
        "queries": rows,
    }


def main() -> None:
    if "--rederive" in sys.argv:
        # Recompute verdicts from the committed artifact's raw session
        # cells (e.g. after an expectation-class change) — no re-timing.
        path = os.path.join(REPO_ROOT, "COMPOSITION_SWEEP.json")
        with open(path) as f:
            prev = json.load(f)
        outs = prev["sessions"]
        cells = {
            name: {
                k: min(outs[0][name][k], outs[1][name][k])
                for k in ("t1", "t2")
            }
            for name in outs[0]
        }
        result = _verdicts(cells)
        result["sessions"] = outs
        result["agg"] = prev["agg"]
        with open(path, "w") as f:
            json.dump(result, f, indent=1)
        print(json.dumps({k: result[k] for k in ("flagged", "totals")}))
        if result["flagged"]:
            raise SystemExit(1)
        return
    if "--two-session" in sys.argv:
        import subprocess

        outs = []
        for i in range(2):
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--cells-only"],
                capture_output=True,
                timeout=7200,
                text=True,
            )
            if proc.returncode != 0:
                print(proc.stderr[-3000:], file=sys.stderr)
                raise SystemExit(f"sweep session {i} failed")
            line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
            outs.append(json.loads(line))
            print(f"session {i} done", file=sys.stderr)
        cells = {
            name: {
                k: min(outs[0][name][k], outs[1][name][k])
                for k in ("t1", "t2")
            }
            for name in outs[0]
        }
        result = _verdicts(cells)
        result["sessions"] = outs
        result["agg"] = "per-cell min across two fresh JVMs"
    else:
        cells = _one_session()
        if "--cells-only" in sys.argv:
            print(json.dumps(cells))
            return
        result = _verdicts(cells)
        result["agg"] = "single session (use --two-session for committed numbers)"

    with open(os.path.join(REPO_ROOT, "COMPOSITION_SWEEP.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: result[k] for k in ("flagged", "totals")}))
    if result["flagged"]:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
