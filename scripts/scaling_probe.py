#!/usr/bin/env python
"""Two/three-point scaling probe for the heaviest declared operators.

Times each query at the bench's scale tier (tier 1) and at a tier with
the query's driving table grown by a known factor (tier 2), then reports
the measured scaling exponent ``log(t2/t1) / log(growth)`` — ~1.0 means
linear in the input, the property the 100 TB story rests on. Exponents
land in COVERAGE.md's scaling table.

Run: ``python scripts/scaling_probe.py`` (~15 min including the one-time
tier-2 build; the replicated dirs cache under /tmp like the bench's).
``python scripts/scaling_probe.py q1 q2`` probes only the named queries.

``--three-point`` (verdict-r5 #4): for the queries whose two-point
exponent sits close enough to 1.0 that a creeping superlinear term could
hide inside two-point host noise (``dedup_near_dup_groups`` 0.89,
``text_repetition_filters`` 0.81, plus ``text_dup_span_trim`` as the
well-understood control), add a documents ×8 tier and fit the exponent
by least squares over all THREE (log growth, log t) points. A quadratic
term that two points can absorb into the constant shows up as a fit
exponent pulled above the two-point value and a visibly convex residual.

``--rep-refit`` (verdict-r6 #5): re-fit text_repetition_filters' post-
kernel exponent over documents ×4/×8/×16 — the ×1 tier's 0.88 s wall is
mostly fixed per-session/Arrow overhead, so a fit anchored there
measures the overhead amortizing, not the operator.

``--two-session``: committed numbers follow the min-across-sessions
discipline (this host has stall episodes that cover a whole adaptive
min-of-2-4 window). This flag automates it: the probe re-invokes itself
in TWO fresh subprocesses (fresh JVMs, no shared session state), takes
per-cell minima, and recomputes exponents/fits from the merged cells —
one invocation, committed-grade output.
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
from land_registry_data_ingestion_spark.session import get_spark  # noqa: E402
from land_registry_data_ingestion_spark.plans.registry import (  # noqa: E402
    _load_all,
    REGISTRY,
)

# Tier 2 = tier 1 with the text/event/rank families' driving tables
# grown: documents x4, events x3, orders x3. The untouched tables keep
# their tier-1 factors (they are not these queries' drivers).
TIER2_SPEC = {
    "orders": ("o_orderkey", 120),
    "lineitem": ("l_orderkey", 10),
    "documents": ("doc_id", 80),
    "embeddings": ("vec_id", 10),
    "events": ("user_id", 30),
}

# Tier 3 = tier 1 with documents grown x8 (vs tier 2's x4); every other
# table stays at its tier-1 factor so the third point isolates the same
# driving axis the first two measured.
TIER3_SPEC = {
    "orders": ("o_orderkey", 40),
    "lineitem": ("l_orderkey", 10),
    "documents": ("doc_id", 160),
    "embeddings": ("vec_id", 10),
    "events": ("user_id", 10),
}

# Tier 4 = documents ×16 over tier 1 — exists only for ``--rep-refit``:
# round 6 left text_repetition_filters' post-kernel three-point fit
# (0.64) overhead-flattened, because the integer-counts kernel pushed
# the tier-1 wall to 0.88 s where per-batch Arrow/session constants
# dominate the smallest point. The refit drops the ×1 point and fits
# over ×4/×8/×16, where the operator (not the overhead) is the
# measurement.
TIER4_SPEC = {
    "orders": ("o_orderkey", 40),
    "lineitem": ("l_orderkey", 10),
    "documents": ("doc_id", 320),
    "embeddings": ("vec_id", 10),
    "events": ("user_id", 10),
}

# Tier 5 = documents ×32 — the rep-refit's FOURTH point (round 8): with
# three points a two-parameter linear+offset model has one degree of
# freedom, so a small residual is nearly guaranteed whenever the data
# is smooth — it cannot distinguish linear from, say, n·log n. Four
# points over-determine the model (2 dof): a genuinely super-linear
# kernel now shows as a growing residual at the top tier instead of
# being absorbed into the fit.
TIER5_SPEC = {
    "orders": ("o_orderkey", 40),
    "lineitem": ("l_orderkey", 10),
    "documents": ("doc_id", 640),
    "embeddings": ("vec_id", 10),
    "events": ("user_id", 10),
}

# Three-point set: the two highest two-point exponents + one control
# whose linear story is already well understood from the plan.
THREE_POINT = {
    "dedup_near_dup_groups": ("documents", [1.0, 4.0, 8.0]),
    "text_repetition_filters": ("documents", [1.0, 4.0, 8.0]),
    "text_dup_span_trim": ("documents", [1.0, 4.0, 8.0]),
}

# query -> (driving table, tier2/tier1 growth factor)
PROBES = {
    "text_dup_spans": ("documents", 4.0),
    "text_dup_span_trim": ("documents", 4.0),
    "text_repetition_filters": ("documents", 4.0),
    "evt_sliding_users_24h": ("events", 3.0),
    "win_equidepth_histogram": ("orders", 3.0),
    # Composed pipelines (round 5): the three most user-visible
    # compositions carry the same two-point evidence as the heavy
    # singles. cdc_merge_state's driver is the STATE side (built from
    # orders), so orders growth is state growth.
    "text_pipeline_pack": ("documents", 4.0),
    "text_decontaminate": ("documents", 4.0),
    "cdc_merge_state": ("orders", 3.0),
    # Iterative operator (round 5, post-lineage-truncation): pairs from
    # banded MinHash over documents, then label-propagation rounds —
    # the growth factor drives both the pair count and the rounds' edge
    # shuffles.
    "dedup_near_dup_groups": ("documents", 4.0),
    # NOT evt_graph_triangles: its graph derives from lineitem's part
    # co-purchases, and replication remaps l_orderkey but not l_partkey,
    # so every replica order repeats the same part pairs and the DISTINCT
    # edge set is invariant under any growth factor — a replication-based
    # probe would time an unchanged graph core behind a bigger scan and
    # report a meaningless (even negative) exponent. Its scale story is
    # the plan-level Σ outdeg² wedge bound (operators/graph.py).
}


def loglog_fit(growths: list[float], sec: list[float]) -> dict:
    """Least-squares slope over (log growth, log t) plus per-segment
    exponents — the one implementation every output path shares."""
    import math

    xs = [math.log(g) for g in growths]
    ys = [math.log(t) for t in sec]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    slope = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / sum(
        (x - mx) ** 2 for x in xs
    )
    segs = [
        round((ys[i + 1] - ys[i]) / (xs[i + 1] - xs[i]), 2)
        for i in range(n - 1)
    ]
    return {
        "fit_exponent": round(slope, 2),
        "segment_exponents": segs,
        "convex": segs[-1] > segs[0] + 0.05,
    }


def offset_fit(growths: list[float], sec: list[float]) -> dict:
    """Linear-plus-offset model ``t(g) = c + a·g`` by least squares,
    then the power-law exponent refit on the OFFSET-SUBTRACTED times.

    A per-session fixed cost (Arrow worker spin-up, scan planning,
    stage scheduling) biases a raw log-log fit of a genuinely linear
    operator BELOW 1.0 — the round-6 0.64 reading. If the linear+offset
    model explains the points (small ``offset_residual_sec``), the
    subtracted exponent is the operator's true scaling and ``c`` is the
    measured overhead constant the verdict asked to subtract."""
    import math

    n = len(growths)
    mg, mt = sum(growths) / n, sum(sec) / n
    a = sum((g - mg) * (t - mt) for g, t in zip(growths, sec)) / sum(
        (g - mg) ** 2 for g in growths
    )
    c = mt - a * mg
    resid = max(abs(c + a * g - t) for g, t in zip(growths, sec))
    adj = [t - c for t in sec]
    if min(adj) <= 0:
        return {
            "offset_sec": round(c, 3),
            "offset_residual_sec": round(resid, 3),
            "offset_subtracted_exponent": None,
        }
    xs = [math.log(g) for g in growths]
    ys = [math.log(t) for t in adj]
    mx, my = sum(xs) / n, sum(ys) / n
    slope = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / sum(
        (x - mx) ** 2 for x in xs
    )
    return {
        "offset_sec": round(c, 3),
        "offset_residual_sec": round(resid, 3),
        "offset_subtracted_exponent": round(slope, 2),
    }


def _merge_sessions(a: dict, b: dict) -> dict:
    """Per-cell minima of two session outputs, exponents/fits recomputed
    from the merged cells."""
    import math

    out = {}
    for name in a:
        ra, rb = a[name], b[name]
        if "sec" in ra:  # three-point entry
            ts = [min(x, y) for x, y in zip(ra["sec"], rb["sec"])]
            out[name] = {
                **ra,
                "sec": [round(t, 3) for t in ts],
                **loglog_fit(ra["growths"], ts),
                "sessions": [ra["sec"], rb["sec"]],
                **offset_fit(ra["growths"], ts),
            }
        else:  # two-point entry
            t1 = min(ra["tier1_sec"], rb["tier1_sec"])
            t2 = min(ra["tier2_sec"], rb["tier2_sec"])
            out[name] = {
                **ra,
                "tier1_sec": t1,
                "tier2_sec": t2,
                "exponent": round(
                    math.log(t2 / t1) / math.log(ra["growth"]), 2
                ),
                "sessions": [
                    [ra["tier1_sec"], ra["tier2_sec"]],
                    [rb["tier1_sec"], rb["tier2_sec"]],
                ],
            }
    return out


def _two_session() -> None:
    import subprocess

    child_args = [a for a in sys.argv[1:] if a != "--two-session"]
    outs = []
    for i in range(2):
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)] + child_args,
            capture_output=True,
            timeout=7200,
            text=True,
        )
        if proc.returncode != 0:
            print(proc.stderr[-3000:], file=sys.stderr)
            raise SystemExit(f"child session {i} failed")
        line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
        outs.append(json.loads(line))
        print(f"session {i} done", file=sys.stderr)
    print(json.dumps(_merge_sessions(*outs)))


def main() -> None:
    if "--two-session" in sys.argv:
        _two_session()
        return
    spark = get_spark(
        app_name="lrdi-scaling",
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
    three_point = "--three-point" in sys.argv
    rep_refit = "--rep-refit" in sys.argv
    tier1 = None
    if not rep_refit:  # rep-refit times tiers 2-4 only; skip the build
        tier1, _, rows1 = bench.build_scale_dir(spark, base)
        print("tier1:", rows1, file=sys.stderr)
    saved = bench.SCALE_SPEC
    try:
        bench.SCALE_SPEC = TIER2_SPEC
        tier2, _, rows2 = bench.build_scale_dir(spark, base)
        print("tier2:", rows2, file=sys.stderr)
        tier3 = tier4 = tier5 = None
        if three_point or rep_refit:
            bench.SCALE_SPEC = TIER3_SPEC
            tier3, _, rows3 = bench.build_scale_dir(spark, base)
            print("tier3:", rows3, file=sys.stderr)
        if rep_refit:
            bench.SCALE_SPEC = TIER4_SPEC
            tier4, _, rows4 = bench.build_scale_dir(spark, base)
            print("tier4:", rows4, file=sys.stderr)
            bench.SCALE_SPEC = TIER5_SPEC
            tier5, _, rows5 = bench.build_scale_dir(spark, base)
            print("tier5:", rows5, file=sys.stderr)
    finally:
        bench.SCALE_SPEC = saved

    def timed(name: str, sf_dir: str) -> float:
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

    out = {}
    import math

    only = {a for a in sys.argv[1:] if not a.startswith("--")}

    if rep_refit:
        # text_repetition_filters over documents ×4/×8/×16/×32: the
        # fit's BASE point is the 4×-grown tier, so the ~1 s fixed
        # per-session overhead that flattened the round-6 fit is <35%
        # of the smallest wall — and the OFFSET FIT below measures and
        # removes it entirely instead of letting it bias the power law.
        # FOUR points (round 8): the two-parameter model is now
        # over-determined, so "small residual" is evidence of linearity
        # rather than a near-tautology of the fit.
        name = "text_repetition_filters"
        growths = [4.0, 8.0, 16.0, 32.0]
        ts = [round(timed(name, d), 3) for d in (tier2, tier3, tier4, tier5)]
        out[name] = {
            "driver_table": "documents",
            "growths": growths,
            "sec": ts,
            **loglog_fit(growths, ts),
            **offset_fit(growths, ts),
        }
        print(name, out[name], file=sys.stderr)
        print(json.dumps(out))
        return

    if three_point:
        probes3 = {
            n: spec
            for n, spec in THREE_POINT.items()
            if not only or n in only
        }
        for name, (table, growths) in probes3.items():
            ts = [
                round(timed(name, d), 3) for d in (tier1, tier2, tier3)
            ]
            # least-squares slope over (log growth, log t); with three
            # points the residual sign says convex (hidden superlinear
            # term emerging) vs concave (overhead still amortizing).
            out[name] = {
                "driver_table": table,
                "growths": growths,
                "sec": ts,
                **loglog_fit(growths, ts),
            }
            print(name, out[name], file=sys.stderr)
        print(json.dumps(out))
        return

    probes = {
        n: spec for n, spec in PROBES.items() if not only or n in only
    }
    for name, (table, growth) in probes.items():
        t1 = round(timed(name, tier1), 3)
        t2 = round(timed(name, tier2), 3)
        exp = round(math.log(t2 / t1) / math.log(growth), 2)
        out[name] = {
            "driver_table": table,
            "growth": growth,
            "tier1_sec": t1,
            "tier2_sec": t2,
            "exponent": exp,
        }
        print(name, out[name], file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
