#!/usr/bin/env python
"""Benchmark the engine's headline queries.

Runs at ``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` (default 32) and prints ONE JSON line:
``{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}``.

Each query executes against the noop sink so the full plan runs (scan →
shuffle → result) without driver-side collection costs.

The line additionally carries a ``"scale"`` section: the heavy operator
families re-run against a deterministically replicated dataset (6M-row
orders/lineitem, 100k documents/embeddings with 20-50-way duplicate
families) where data, not session/stage overhead, dominates — sf0.1's 5k
documents sit on a ~1 s stage-overhead floor that hides real throughput
changes round-over-round. Disable with ``SPARK_GRAFT_BENCH_SCALE=0``;
the replicated tables are cached under /tmp between runs.

Stall forensics (this host has multi-second stall EPISODES long enough
to cover a whole adaptive min-of-2-4 window — and, round 5 showed, both
passes of a single-session two-pass scheme):

- The scale section's pass 2 runs in a FRESH SUBPROCESS (new JVM), so
  the reported min-across-passes spans two genuinely separate sessions
  — a stall episode pinned to one session can no longer forge a
  regression. Falls back to the in-process reverse pass if the
  subprocess fails.
- Every query gets a normalized PLAN FINGERPRINT (formatted explain,
  ids/paths/numbers stripped). ``BENCH_FLOORS.json`` — committed,
  updated with ``SPARK_GRAFT_BENCH_WRITE_FLOORS=1`` — records each
  query's best-known floor + fingerprint + a rolling list of
  per-invocation minima (``sessions``); at bench time each query is
  annotated ``plan_changed`` (fingerprint differs — a real plan
  change, timing deltas are expected) or ``suspect_stall`` (same plan,
  above the session-noise band — see ``stall_threshold``; round 6's
  floor×1.5 rule flagged 19/31 healthy queries because a single
  calm-window floor is an outlier every ordinary session exceeds).
  The compact line carries both lists, plus the FULL per-query timing
  vectors as fixed-order 1-decimal arrays (``ht``/``st``, order
  digests ``ho``/``so``) so the externally archived line is
  self-contained even under the harness's ~1500-char tail capture.
- Every invocation records HOST TELEMETRY (round 9): 1-min load before
  any bench work, a timed fixed-workload canary, and per-section
  loadavg/cpu-busy/cpu-steal from /proc — on the compact line
  (``host``), in the sidecar, and per floor session
  (``BENCH_FLOORS.json`` ``_hosts``, linked from each query's ``sids``).
  ``host_slow_window`` turns a flagged reading's session telemetry into
  a mechanical slow-window verdict; round 8 spent 6 bench sessions plus
  ~20 isolated re-measures doing this by hand.
- Floors writes are GATED (round 10): ``SPARK_GRAFT_BENCH_WRITE_FLOORS=1``
  refuses to land a floors file that changes the un-adjudicated flag
  set (``replay_floor_flags`` / ``floors_write_blockers``) — the r9
  end-of-round snapshot shipped exactly such a write after the last
  gate run and left the committed tree red. Adjudicate (sync the
  enumerated set in tests/test_bench_flags.py) and re-run with
  ``SPARK_GRAFT_BENCH_FORCE_FLOORS=1`` to override.
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import subprocess
import sys
import tempfile
import time
from pathlib import Path
from statistics import median as _median

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
    "evt_asof_join",
    "dedup_embedding_cosine",
    "text_redact_pii",
    "text_decontaminate",
    "text_segment_dedup",
    "text_bm25_search",
    "dedup_semantic",
    "evt_funnel",
    "text_pipeline_pack",
    "sim_pq_topk",
    "text_lm_perplexity",
    "sim_hybrid_rrf",
    "text_dsir_weights",
    "evt_range_join",
    "evt_rolling_24h",
    "sim_kmeans_clusters",
    "text_token_budget_sample",
    "text_repetition_filters",
    "evt_ohlc_hourly",
    "rel_skew_join_salted",
    "text_dup_spans",
    "win_equidepth_histogram",
    "rel_multi_join_chain",
    "text_dup_span_trim",
    "evt_sliding_users_24h",
]


# (table, key column to remap, replication factor). Keys remap as
# key*KEY_STRIDE + replica so lineitem's l_orderkey keeps joining its
# orders replica; lineitem gets fewer replicas than orders, which an
# inner join tolerates. Replicated documents/embeddings form exact
# duplicate families — an adversarial (not easier) input for the dedup
# and ANN operators.
#
# KEY_STRIDE must exceed EVERY replication factor any tier uses
# (including the scaling probe's grown tiers — round 6 found the ×80/
# ×120/×160 tiers silently overflowing the old stride of 64: replica 64
# of key k collided with replica 0 of key k+1, which chained unrelated
# duplicate families into one giant component and corrupted every
# key-grouped measurement on those tiers — the CC convergence trouble
# round 5 attributed to band-df sparsification was this).
KEY_STRIDE = 1024
SCALE_SPEC = {
    "orders": ("o_orderkey", 40),
    "lineitem": ("l_orderkey", 10),
    "documents": ("doc_id", 20),
    # 10×, not more: sim_lsh_ann_pairs' within-bucket candidate count is
    # quadratic in bucket size at fixed (tables, planes); 20k vectors in
    # 256 buckets ≈ 3M candidate pairs — a bench, not a stall.
    "embeddings": ("vec_id", 10),
    # remap user_id (not event_id): more users at the same per-user
    # density — the realistic growth axis for keyed windows/as-of.
    "events": ("user_id", 10),
}
SCALE_QUERIES = [
    "q1_delay_histogram_days",
    "cdc_merge_state",
    "win_latest_row",
    "dedup_exact_groups",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_simhash_pairs",
    "text_quality_score",
    "text_language_id",
    "sim_ivf_topk",
    "sim_lsh_ann_pairs",
    "evt_asof_join",
    "dedup_embedding_cosine",
    "text_decontaminate",
    "text_segment_dedup",
    "dedup_semantic",
    "text_pipeline_pack",
    "sim_pq_topk",
    "text_lm_perplexity",
    "text_dsir_weights",
    "evt_range_join",
    "evt_rolling_24h",
    "sim_kmeans_clusters",
    "text_token_budget_sample",
    "text_repetition_filters",
    "evt_ohlc_hourly",
    "text_dup_spans",
    "win_equidepth_histogram",
    "text_dup_span_trim",
    "evt_sliding_users_24h",
    # round 5: the iterative CC query joined the scale section once its
    # two structural fixes landed (star family edges; per-round stats
    # re-seed) — before them it was quadratic in dup-family size and
    # driver-bound at this tier, exactly what this section must catch.
    "dedup_near_dup_groups",
    # NOT rel_skew_join_salted: it reads `part`, which the replicated
    # scale dir does not carry (SCALE_SPEC tables only).
]


def build_scale_dir(spark, sf_dir: str) -> tuple[str, float, dict[str, int]]:
    """Replicate sf tables into a /tmp dir usable as an sf_dir. Cached —
    rebuilt only when absent. Returns (dir, build_seconds, row counts).

    Reads through the ``Tables`` loader (not raw ``spark.read.parquet``)
    so events' TIMESTAMP(NANOS) column gets the same nanos→micros
    conversion every query path uses; the replicated dir then holds plain
    micros timestamps."""
    from pyspark.sql import functions as F

    from land_registry_data_ingestion_spark.sources.parquet import load_tables

    spec_tag = f"s{KEY_STRIDE}_" + "_".join(
        f"{name}{factor}" for name, (_, factor) in sorted(SCALE_SPEC.items())
    )
    # The source sf_dir is part of the cache key: without it, a scale dir
    # replicated from sf0.001 would silently serve a later sf0.1 run.
    sf_tag = os.path.basename(os.path.normpath(sf_dir))
    out_dir = os.path.join(
        os.environ.get("TMPDIR", "/tmp"),
        f"lrdi_bench_scale_{sf_tag}_{spec_tag}",
    )
    marker = os.path.join(out_dir, "_DONE")
    rows: dict[str, int] = {}
    start = time.perf_counter()
    if not os.path.exists(marker):
        tables = load_tables(spark, sf_dir)
        for name, (key, factor) in SCALE_SPEC.items():
            if factor > KEY_STRIDE:
                raise ValueError(
                    f"replication factor {factor} for {name} exceeds "
                    f"KEY_STRIDE {KEY_STRIDE}: replica ids would collide "
                    f"with neighboring keys and corrupt key-grouped "
                    f"semantics"
                )
            src = tables.table(name)
            reps = spark.range(factor).select(F.col("id").alias("_rep"))
            scaled = src.crossJoin(reps).withColumn(
                key, F.col(key) * KEY_STRIDE + F.col("_rep")
            ).drop("_rep")
            # One file per core: a single-file table reads as ONE split
            # (these stay under one row group), serializing every
            # CPU-bound map stage — real-scale inputs have thousands of
            # splits, so the bench layout should parallelize too.
            n_files = int(spark.sparkContext.defaultParallelism)
            scaled.repartition(n_files).write.mode("overwrite").parquet(
                os.path.join(out_dir, f"{name}.parquet")
            )
        with open(marker, "w") as f:
            f.write("ok")
    build_sec = round(time.perf_counter() - start, 3)
    for name in SCALE_SPEC:
        rows[name] = spark.read.parquet(
            os.path.join(out_dir, f"{name}.parquet")
        ).count()
    return out_dir, build_sec, rows


_FP_NOISE = re.compile(
    r"#\d+|\(\d+\)|\[plan_id=\d+\]|\d+"  # exprIds, op ids, any number
)
_FP_PATH = re.compile(r"(file:)?/[^\s,\]\)]+")  # data/RDD/checkpoint paths


def plan_fingerprint(df) -> str:
    """12-hex digest of the plan SHAPE: formatted explain with operator
    ids, exprIds, paths, and every literal number masked — stable across
    sessions (checkpointed queries embed per-session RDD ids; scale dirs
    embed spec tags) but different whenever the operator tree changes.

    MUST be computed at CONSTRUCTION time, before the query ever
    executes: once a barrier cache materializes, the cache manager
    substitutes InMemoryRelation subtrees whose printed form depends on
    runtime state, so a post-execution fingerprint does not reproduce
    from a fresh session (round 6 measured 23/75 committed floors
    failing a fresh-session re-derivation before this rule; 75/75
    after)."""
    jmode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    text = df._jdf.queryExecution().explainString(jmode)
    text = _FP_PATH.sub("<path>", text)
    text = _FP_NOISE.sub("#", text)
    return hashlib.sha256(text.encode()).hexdigest()[:12]


def load_floors() -> dict:
    try:
        with open(os.path.join(REPO_ROOT, "BENCH_FLOORS.json")) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def host_probe() -> dict:
    """Snapshot host state: 1-min loadavg + aggregate /proc/stat cpu
    counters (Linux). Returns Nones/zeros if /proc is unreadable — the
    bench must never fail for its telemetry layer."""
    out: dict = {"load1": None, "total": 0, "idle": 0, "steal": 0}
    try:
        with open("/proc/loadavg") as f:
            out["load1"] = float(f.read().split()[0])
        with open("/proc/stat") as f:
            v = [int(x) for x in f.readline().split()[1:]]
        out["total"] = sum(v)
        out["idle"] = v[3] + (v[4] if len(v) > 4 else 0)  # idle + iowait
        out["steal"] = v[7] if len(v) > 7 else 0
    except (OSError, ValueError, IndexError):
        pass
    return out


def host_section(before: dict, after: dict, wall: float) -> dict:
    """Per-section host telemetry (round-9 verdict #2): 1-min loadavg at
    the section's edges, the busy fraction of ALL host CPU ticks during
    it, and the hypervisor-steal fraction. Committed alongside every
    floor session (and on the compact bench line), this is what lets a
    flagged reading be labeled "slow-window session" from recorded data
    alone — round 8 spent 6 bench sessions + ~20 isolated re-measures
    adjudicating drift flags by hand."""
    dt = after["total"] - before["total"]
    if before["total"] <= 0 or after["total"] <= 0 or dt <= 0:
        # /proc unreadable on either probe (non-Linux host, transient
        # failure): record honest nulls, not a fabricated "fully busy /
        # zero steal" reading — host_slow_window treats None as
        # no-evidence (round-9 review).
        busy = steal = None
    else:
        busy = round(1.0 - (after["idle"] - before["idle"]) / dt, 3)
        steal = round((after["steal"] - before["steal"]) / dt, 4)
    return {
        "load1": [before.get("load1"), after.get("load1")],
        "cpu_busy": busy,
        "cpu_steal": steal,
        "wall_sec": round(wall, 3),
    }


# Mechanical slow-window thresholds, calibrated on the recorded episodes:
# an idle box reads 1-min load well under 1 before a bench run (the r8
# judge observed 13.8 with NOTHING running during a slow window); the
# canary is a fixed warm-up workload whose healthy spread is well inside
# 1.5x; steal above a few percent means the hypervisor is taking the CPU.
LOAD1_IDLE_MAX = 4.0
CANARY_SLOW_RATIO = 1.5
STEAL_MAX = 0.05
# Per-SECTION load1 ceiling (round-10, r9 verdict #2): the bench's own
# local[32] work legitimately inflates load1 DURING a section, so the
# idle threshold cannot apply there — but the self-load has a measured
# ceiling. Across every recorded clean session the highest section-edge
# load1 the bench produces from a quiet start is 13.98 (sid 1, scale);
# the one external mid-run ramp on record read 23.45 (sid 4, scale,
# load_start 0.13 — a quiet start, so load_start/canary/steal all
# missed it and three same-plan flags needed hand adjudication). 20
# splits the two with ≥40% margin each way.
#
# Known limitation (accepted): the clause bounds self-load, it cannot
# DISTINGUISH it — a same-plan regression that keeps the full local[32]
# pool runnable long enough could push a section edge past 20 and
# auto-adjudicate its own session. The protection against that class is
# structural, not per-session: a real regression recurs in every
# subsequent session (each new flagged reading re-enters the gate),
# and constant-factor regressions in this engine come from plan
# changes, which the fingerprint check catches regardless of timing.
SECTION_LOAD1_MAX = 20.0


def host_slow_window(
    host: dict, ref_canary: float | None = None, section: str | None = None
) -> list[str]:
    """Mechanical slow-window verdict for one recorded bench session's
    telemetry (the dict written as ``_hosts[sid]`` in BENCH_FLOORS.json
    / ``host`` in the compact line). Returns the evidence strings —
    empty means no host anomaly is visible in the recorded data, so a
    same-plan flag in that session deserves a real look.

    ``section`` restricts the PER-SECTION clauses (cpu_steal, mid-run
    load1 ramp) to the named section; the session-wide clauses
    (load_start, canary) always apply. The adjudication path passes the
    flagged reading's own section (round-11 ADVICE): evidence recorded
    only during the scale section must not dismiss a headline flag from
    the same session — the headline section ran BEFORE that load
    arrived, so a genuine headline regression would otherwise be
    silently adjudicated away. ``section=None`` (the human-facing
    default) keeps the full-session view."""
    ev: list[str] = []
    l0 = host.get("load_start")
    if l0 is not None and l0 > LOAD1_IDLE_MAX:
        ev.append(
            f"load_start {l0} > {LOAD1_IDLE_MAX}: box not idle before the run"
        )
    c = host.get("canary_sec")
    if c is not None and ref_canary and c > CANARY_SLOW_RATIO * ref_canary:
        ev.append(
            f"canary {c}s > {CANARY_SLOW_RATIO}x reference {ref_canary}s"
        )
    for sec in ("headline", "scale"):
        if section is not None and sec != section:
            continue
        s = host.get(sec) or {}
        if (s.get("cpu_steal") or 0) > STEAL_MAX:
            ev.append(f"{sec} cpu_steal {s['cpu_steal']} > {STEAL_MAX}")
        # Mid-run load ramp (round 10): a section-edge load1 above what
        # the bench's own threads can produce means external load
        # arrived AFTER the load_start probe — the r9 session-4 episode
        # (quiet start 0.13, scale load1 ending 23.45) was exactly this
        # and forged three same-plan flags invisible to every other
        # clause.
        peak = max(
            (v for v in (s.get("load1") or []) if v is not None),
            default=None,
        )
        if peak is not None and peak > SECTION_LOAD1_MAX:
            ev.append(
                f"{sec} load1 peak {peak} > {SECTION_LOAD1_MAX}: external "
                "load ramped mid-run"
            )
    return ev


def replay_floor_flags(floors: dict) -> tuple[set, set]:
    """Replay EVERY recorded session minimum in a floors dict against its
    own noise band. Returns ``(flagged, auto)``: all ``(section, name,
    value)`` readings above their band, and the subset whose linked
    session telemetry (``_hosts[sid]``) shows a mechanical slow window.
    ``flagged - auto`` is the set that needs human adjudication — the
    replay test pins it to an enumerated provenance list, and the
    floors-write gate refuses to change it silently (round-10: the r9
    end-of-round snapshot shipped a 4th floor session whose three
    un-adjudicated flags left the committed tree red)."""
    hosts = floors.get("_hosts") or {}
    canaries = sorted(
        h["canary_sec"] for h in hosts.values() if h.get("canary_sec")
    )
    ref_canary = canaries[len(canaries) // 2] if canaries else None
    flagged: set = set()
    auto: set = set()
    for section, entries in floors.items():
        if section.startswith("_"):
            continue  # _hosts: the session telemetry map, not a section
        abs_noise = ABS_NOISE_SEC[section]
        for name, ref in entries.items():
            sessions = ref.get("sessions") or []
            sids = ref.get("sids") or []
            if len(sids) > len(sessions):
                # The build path keeps them in lockstep; a longer sids
                # list means a hand-edited/corrupt sidecar, and the
                # None-padding below would silently zip() values against
                # the WRONG session ids — adjudication would then read
                # the wrong telemetry (round-11 ADVICE).
                raise ValueError(
                    f"{section}/{name}: {len(sids)} sids for "
                    f"{len(sessions)} sessions — corrupt floors entry"
                )
            sids = [None] * (len(sessions) - len(sids)) + sids
            thr = stall_threshold(ref, abs_noise)
            if thr is None:
                continue
            for s, sid in zip(sessions, sids):
                if s is None or s <= thr:
                    continue
                flagged.add((section, name, s))
                host = hosts.get(str(sid)) if sid is not None else None
                # evidence must match the flagged reading's own section
                # (or be session-wide) — see host_slow_window
                if host and host_slow_window(host, ref_canary, section=section):
                    auto.add((section, name, s))
    return flagged, auto


def floors_write_blockers(old_floors: dict, new_floors: dict) -> dict:
    """The floors-write gate's verdict: how a proposed floors file would
    CHANGE the un-adjudicated flag set relative to the committed one.
    ``new`` readings need adjudication before they ship; ``gone``
    readings orphan entries in the replay test's enumerated set (bands
    widen / sessions rotate out — the set is maintained, not
    append-only). Either direction shipping silently is exactly how the
    r9 snapshot commit left the tree red; an empty dict means the write
    is invisible to the gates and safe to land unattended."""
    old_f, old_a = replay_floor_flags(old_floors) if old_floors else (set(), set())
    old_open = old_f - old_a
    new_f, new_a = replay_floor_flags(new_floors)
    new_open = new_f - new_a
    out: dict = {}
    if new_open - old_open:
        out["new"] = sorted(new_open - old_open)
    if old_open - new_open:
        out["gone"] = sorted(old_open - new_open)
    return out


def build_new_floors(
    floors: dict,
    host_rec: dict,
    timings: dict,
    headline_plans: dict,
    scale: dict | None,
) -> dict:
    """Refresh the committed floor sidecar from ONE run: per-query best
    time + plan fingerprint. An unchanged plan keeps the best floor ever
    seen; a changed plan starts a fresh floor/band. The session id links
    every per-query session minimum to this invocation's host telemetry
    (``_hosts[sid]``) — the round-9 mechanism that makes drift
    adjudication mechanical. Extracted from main() so the
    headline-only-run path is unit-testable (round-9 review: that path
    used to silently erase the whole committed scale section)."""
    hosts: dict[str, dict] = dict(floors.get("_hosts") or {})
    sid = 1 + max((int(k) for k in hosts), default=0)
    hosts[str(sid)] = host_rec

    def floor_entry(prev: dict, best: float, fp: str) -> dict:
        # "floor" = best ever on this plan (min-of-min, the honest
        # lower bound); "sessions" = rolling per-INVOCATION minima
        # (newest last, capped at 8) — the noise band the stall flag
        # reads; "sids" = the host-telemetry session id behind each
        # (None for readings recorded before telemetry existed, and
        # for driver readings appended by hand during adjudication).
        # A plan change resets all three: old timings measured a
        # different operator tree.
        this = round(best, 3)
        prev_sessions = prev.get("sessions") or []
        prev_sids = prev.get("sids") or []
        prev_sids = [None] * (len(prev_sessions) - len(prev_sids)) + prev_sids
        if prev.get("plan") == fp:
            sessions = prev_sessions[-7:] + [this]
            sids = prev_sids[-7:] + [sid]
            floor = round(min(best, prev.get("floor") or best), 3)
        else:
            sessions = [this]
            sids = [sid]
            floor = this
        return {"floor": floor, "plan": fp, "sessions": sessions, "sids": sids}

    new_floors = {
        "_hosts": hosts,
        "headline": {
            n: floor_entry(
                floors.get("headline", {}).get(n, {}),
                timings[n],
                headline_plans[n],
            )
            for n in HEADLINE
        },
    }
    if scale is not None:
        new_floors["scale"] = {
            n: floor_entry(
                floors.get("scale", {}).get(n, {}),
                scale["queries"][n],
                scale["spread"][n]["plan"],
            )
            for n in SCALE_QUERIES
        }
    elif floors.get("scale"):
        # Headline-only run (SPARK_GRAFT_BENCH_SCALE=0): carry the
        # committed scale section forward untouched — overwriting the
        # file without it would silently erase every scale query's
        # floor/sessions/sids and drop the stall detector onto the
        # loose 2x-floor fallback (round-9 review).
        new_floors["scale"] = floors["scale"]
    # Trim _hosts to the last 16 sessions BUT keep any record a sids
    # list still references: headline-only writes carry the scale
    # section forward untouched, so after enough of them a fixed window
    # would rotate out exactly the telemetry that makes a scale flag's
    # adjudication mechanical (round-10 review).
    referenced = {
        str(s)
        for sec in ("headline", "scale")
        for entry in (new_floors.get(sec) or {}).values()
        for s in (entry.get("sids") or [])
        if s is not None
    }
    keep = set(sorted(hosts, key=int)[-16:]) | (referenced & set(hosts))
    new_floors["_hosts"] = {
        k: hosts[k] for k in sorted(keep, key=int)
    }
    return new_floors


# Absolute noise term of the stall band, per section. Scale keeps the
# round-7 0.4 s (its queries run 0.5-7 s; sub-0.4 s scheduler jitter is
# real there). Headline drops to 0.15 s (round-8, r7 verdict #5): its
# fastest queries sit at 0.2-0.3 s medians, where a 0.4 s absolute term
# tolerated ~2.5× same-plan slowdowns silently — and the fast queries
# are exactly where a quietly-added exchange shows first. Validated by
# replaying every recorded floor session at zero false flags
# (tests/test_bench_flags.py::test_committed_floor_sessions_replay_clean).
ABS_NOISE_SEC = {"headline": 0.15, "scale": 0.4}


def stall_threshold(ref: dict, abs_noise: float = 0.4) -> float | None:
    """Per-query stall threshold from the committed noise band.

    Round 6 showed one calm-window floor × 1.5 flags 19/31 HEALTHY
    queries — the committed floors were min-of-min outliers that
    ordinary sessions read 1.3-2× above, so the flag carried no signal.
    The band is built from per-SESSION minima (``sessions``, one entry
    per bench invocation, ≥3 required): flag only above
    ``median + max(3·MAD, 75% of median, abs_noise)`` — MAD degenerates
    to 0 when sessions agree exactly, the 75% term absorbs this host's
    measured session-to-session drift (within the three round-7 floor
    sessions alone, healthy per-session minima ranged to 1.73× their
    median — sim_pq_topk 0.82→1.42 s — even though each scale value is
    already a min over two passes), and the absolute term keeps
    sub-second queries from flagging on scheduler jitter (per-section:
    ``ABS_NOISE_SEC``). A 3× true regression still clears the band by
    ≥70%; quieter regressions are the plan-fingerprint check's job,
    since perf regressions in this engine come from plan changes, not
    constant factors. With <3 recorded sessions there is no band yet:
    fall back to 2× the floor (wider than the miscalibrated 1.5× on
    purpose)."""
    # `is not None`, not truthiness: a legitimately tiny session minimum
    # rounded to 0.0 must still count toward the ≥3-session band, or the
    # query silently rides the 2×-floor fallback forever.
    sessions = [s for s in ref.get("sessions", []) if s is not None]
    if len(sessions) >= 3:
        med = _median(sessions)
        mad = _median([abs(s - med) for s in sessions])
        return med + max(3 * mad, 0.75 * med, abs_noise)
    if ref.get("floor"):
        return ref["floor"] * 2.0
    return None


def annotate(
    section: dict, name: str, best: float, fp: str, abs_noise: float = 0.4
) -> dict | None:
    """Compare one query against the committed reference: a fingerprint
    mismatch means the plan changed (timing deltas expected); the same
    plan reading above its noise band (see stall_threshold) is a
    suspected stall/regression."""
    ref = section.get(name)
    if not ref:
        return None
    if ref.get("plan") != fp:
        return {"plan_changed": True}
    thr = stall_threshold(ref, abs_noise)
    if thr is not None and best > thr:
        return {
            "suspect_stall": True,
            "floor": ref.get("floor"),
            "threshold": round(thr, 3),
        }
    return None


def _timed_adaptive(
    fn, flag_threshold: float | None = None
) -> tuple[float, float, int]:
    # Min over adaptive repeats: the first execution of an
    # expression-heavy plan is dominated by one-time JIT/codegen
    # compilation, and this host shows sporadic multi-second stalls
    # unrelated to the plan. Two runs always; when the two best still
    # disagree by >1.5x the query is re-run (up to 4 total). Returns
    # (min, max, n_runs) — the spread makes a stall-window number
    # VISIBLY unstable instead of silently wrong.
    #
    # ``flag_threshold`` (round 11): a query whose generated code is
    # large (measured: text_token_budget_sample's chunked prefix-sum +
    # tokenizer chain) has a ~3-4-run JIT TIERING decay — wall time
    # tracks JVM compilation time, ~5.3 s → 1.4 s across four runs on
    # this host. Min-of-2 settles on an inflated reading whenever the
    # run-1→2 decay happens to be slow (two readings near 3 s agree
    # within 1.5× and the session records ~2.9 s against a ~1.4 s
    # band — both committed text_token_budget_sample transients are
    # exactly this). When the two agreeing runs sit ABOVE the
    # committed stall band, the reading is either a real regression or
    # an unfinished warm-up — both deserve the remaining run budget,
    # so settle is deferred until the 4-run cap. Healthy readings are
    # untouched (no extra runs), and a genuine regression still flags
    # — its extra runs read just as high.
    times: list[float] = []
    while True:
        start = time.perf_counter()
        fn()
        times.append(time.perf_counter() - start)
        if len(times) >= 2:
            a, b = sorted(times)[:2]
            settled = b / a <= 1.5 and times[-1] >= a * 0.8
            if (
                settled
                and flag_threshold is not None
                and a > flag_threshold
            ):
                settled = False
            if len(times) >= 4 or a < 0.3 or settled:
                return a, max(times), len(times)


def _scale_pass2_child() -> None:
    """Subprocess entry: replay the scale section in REVERSE order in a
    fresh JVM and write per-query (min, max, runs) JSON. A separate
    process is the point — its measurement window shares no session
    state (and no session-pinned stall episode) with pass 1."""
    with open(os.environ["SPARK_GRAFT_BENCH_CHILD_IN"]) as f:
        child_in = json.load(f)
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="lrdi-bench-pass2",
        master=f"local[{cpus}]",
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.sql.shuffle.partitions": str(max(int(cpus), 16)),
            "spark.driver.memory": os.environ.get(
                "SPARK_GRAFT_DRIVER_MEM", "24g"
            ),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    _load_all()
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(int(cpus) * 4).repartition(int(cpus)).mapInPandas(
        lambda batches: batches, "id long"
    ).write.format("noop").mode("overwrite").save()

    scale_dir = child_in["scale_dir"]
    p1 = child_in["p1_min"]
    out: dict[str, list] = {}
    for name in reversed(SCALE_QUERIES):
        def run(n=name):
            REGISTRY[n].fn(spark, scale_dir).write.format("noop").mode(
                "overwrite"
            ).save()

        start = time.perf_counter()
        run()
        t = time.perf_counter() - start
        # confirmatory: plans/codegen warm after the first query; re-run
        # once only if it looks stalled relative to pass 1's minimum.
        if t > p1.get(name, t) * 1.25:
            start = time.perf_counter()
            run()
            t2 = time.perf_counter() - start
            out[name] = [min(t, t2), max(t, t2), 2]
        else:
            out[name] = [t, t, 1]
        spark.sparkContext._jvm.System.gc()
    with open(os.environ["SPARK_GRAFT_BENCH_CHILD_OUT"], "w") as f:
        json.dump(out, f)


def main() -> None:
    if os.environ.get("SPARK_GRAFT_BENCH_CHILD_OUT"):
        _scale_pass2_child()
        return
    # First probe BEFORE any Spark work: the 1-min load here is the
    # cleanest "was the box idle" signal — every later reading is
    # self-inflated by the bench's own 32-thread sections.
    probe_start = host_probe()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="lrdi-bench",
        master=f"local[{cpus}]",
        extra_conf={
            # The external harness tail-captures stdout and parses the LAST
            # line as JSON; Spark's console progress bar floods the stream
            # with \r-frames (the round-3 bench record failed to parse for
            # exactly this reason). Keep bench stdout clean.
            "spark.ui.showConsoleProgress": "false",
            "spark.sql.shuffle.partitions": str(max(int(cpus), 16)),
            # The scale section (6M-row merges, 100k-doc minhash) runs many
            # heavy queries in one JVM; 8g leaves it GC-bound by the tail
            # queries (measured: text_quality_score 5s alone vs 56s late in
            # the sequence). Bench is single-JVM local mode on a 128 GiB
            # box — give it real headroom.
            "spark.driver.memory": os.environ.get(
                "SPARK_GRAFT_DRIVER_MEM", "24g"
            ),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    _load_all()

    # Warm up the JVM/codegen and prime the file-index caches so the first
    # timed query doesn't absorb session startup. The warm-up is TIMED as
    # the session's host-speed canary (round-9 verdict #2): a fixed
    # workload whose wall time on a quiet host is stable, so a committed
    # canary far above the reference labels the whole session slow-window
    # without any re-measure.
    _canary_t0 = time.perf_counter()
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    # ...and the Python/Arrow workers: the first mapInPandas otherwise
    # pays one worker spawn per core inside whichever query hits it first
    # (measured ~7 s of pure spawn at local[32]) — steady-state cost is
    # what the bench should report.
    spark.range(int(cpus) * 4).repartition(int(cpus)).mapInPandas(
        lambda batches: batches, "id long"
    ).write.format("noop").mode("overwrite").save()
    REGISTRY["agg_scalar_max"].fn(spark, sf_dir).collect()
    canary_sec = round(time.perf_counter() - _canary_t0, 3)

    def gc_between():
        spark.sparkContext._jvm.System.gc()

    def noop_write(spec, data_dir, sink: dict):
        def run():
            df = spec.fn(spark, data_dir)
            df.write.format("noop").mode("overwrite").save()

        return run

    def construction_fp(name: str, data_dir: str) -> str:
        # fingerprint a fresh build OUTSIDE the timed window and before
        # any execution — see plan_fingerprint's construction-time rule
        return plan_fingerprint(REGISTRY[name].fn(spark, data_dir))

    floors = load_floors()
    # per-section: a query can appear in BOTH sections (different data
    # dirs, same name) — a flat dict would let one section's verdict
    # shadow the other's in the sidecar.
    flags: dict[str, dict[str, dict]] = {"headline": {}, "scale": {}}

    host_rec: dict = {
        "load_start": probe_start.get("load1"),
        "canary_sec": canary_sec,
    }

    timings: dict[str, float] = {}
    headline_spread: dict[str, list] = {}
    headline_plans: dict[str, str] = {}
    _ph0, _ph_t0 = host_probe(), time.perf_counter()
    def band_threshold(section: str, name: str, fp: str) -> float | None:
        """The committed stall band's flag threshold, iff the committed
        plan matches this build — feeds _timed_adaptive's deferred
        settle so a would-flag reading always carries the full 4-run
        evidence (a changed plan has no valid band to defer against)."""
        ref = floors.get(section, {}).get(name)
        if not ref or ref.get("plan") != fp:
            return None
        return stall_threshold(ref, ABS_NOISE_SEC[section])

    for name in HEADLINE:
        headline_plans[name] = construction_fp(name, sf_dir)
        lo, hi, n = _timed_adaptive(
            noop_write(REGISTRY[name], sf_dir, {}),
            flag_threshold=band_threshold("headline", name, headline_plans[name]),
        )
        timings[name] = round(lo, 3)
        headline_spread[name] = [round(lo, 3), round(hi, 3), n]
        note = annotate(
            floors.get("headline", {}),
            name,
            lo,
            headline_plans[name],
            ABS_NOISE_SEC["headline"],
        )
        if note:
            flags["headline"][name] = note
        gc_between()
    host_rec["headline"] = host_section(
        _ph0, host_probe(), time.perf_counter() - _ph_t0
    )

    def _run_pass2(
        scale_dir: str, p1: dict[str, tuple[float, float, int]]
    ) -> tuple[dict[str, tuple[float, float, int]], str]:
        """Pass 2 in a fresh subprocess JVM; in-process reverse replay as
        the fallback if the subprocess fails (never fail the bench for
        the forensic layer)."""
        p1_min = {n: v[0] for n, v in p1.items()}
        try:
            with tempfile.TemporaryDirectory() as td:
                cin = os.path.join(td, "in.json")
                cout = os.path.join(td, "out.json")
                with open(cin, "w") as f:
                    json.dump({"scale_dir": scale_dir, "p1_min": p1_min}, f)
                env = dict(os.environ)
                env["SPARK_GRAFT_BENCH_CHILD_IN"] = cin
                env["SPARK_GRAFT_BENCH_CHILD_OUT"] = cout
                proc = subprocess.run(
                    [sys.executable, os.path.abspath(__file__)],
                    env=env,
                    capture_output=True,
                    timeout=3600,
                )
                if proc.returncode == 0 and os.path.exists(cout):
                    with open(cout) as f:
                        raw = json.load(f)
                    if set(raw) >= set(SCALE_QUERIES):
                        return (
                            {n: tuple(raw[n]) for n in SCALE_QUERIES},
                            "subprocess",
                        )
                print(
                    "pass-2 subprocess failed:\n"
                    + proc.stderr.decode(errors="replace")[-2000:],
                    file=sys.stderr,
                )
        except Exception as e:
            print(f"pass-2 subprocess error: {e!r}", file=sys.stderr)
        p2: dict[str, tuple[float, float, int]] = {}
        for name in reversed(SCALE_QUERIES):
            f = noop_write(REGISTRY[name], scale_dir, {})
            start = time.perf_counter()
            f()
            t = time.perf_counter() - start
            if t > p1_min[name] * 1.25:
                start = time.perf_counter()
                f()
                t2 = time.perf_counter() - start
                p2[name] = (min(t, t2), max(t, t2), 2)
            else:
                p2[name] = (t, t, 1)
            gc_between()
        return p2, "in-process (subprocess failed)"

    scale: dict | None = None
    if os.environ.get("SPARK_GRAFT_BENCH_SCALE", "1") != "0":
        scale_dir, build_sec, rows = build_scale_dir(spark, sf_dir)
        # TWO passes in TWO sessions: this host has stall EPISODES long
        # enough to cover one whole adaptive min-of-2-4 window (which
        # forged 2-2.8× "regressions" on unchanged plans in round 4) and
        # — round 5 showed — long enough to cover both passes when they
        # share one session. Pass 2 therefore replays the section in
        # REVERSE order in a fresh subprocess JVM; the reported number is
        # each query's min across both sessions, and both session minima
        # are published so inter-session disagreement stays visible.
        p1: dict[str, tuple[float, float, int]] = {}
        scale_plans: dict[str, str] = {}
        _ps0, _ps_t0 = host_probe(), time.perf_counter()
        for name in SCALE_QUERIES:
            scale_plans[name] = construction_fp(name, scale_dir)
            p1[name] = _timed_adaptive(
                noop_write(REGISTRY[name], scale_dir, {}),
                flag_threshold=band_threshold("scale", name, scale_plans[name]),
            )
            gc_between()
        gc_between()
        time.sleep(float(os.environ.get("SPARK_GRAFT_BENCH_COOLDOWN", "20")))
        p2, pass2_mode = _run_pass2(scale_dir, p1)
        # the section's telemetry window spans both passes (the measured
        # work), not the cached/rebuilt scale-dir construction before it
        host_rec["scale"] = host_section(
            _ps0, host_probe(), time.perf_counter() - _ps_t0
        )
        scale_timings = {
            name: round(min(p1[name][0], p2[name][0]), 3)
            for name in SCALE_QUERIES
        }
        scale_spread = {
            name: {
                "min": scale_timings[name],
                "max": round(max(p1[name][1], p2[name][1]), 3),
                "pass_min": [round(p1[name][0], 3), round(p2[name][0], 3)],
                "runs": p1[name][2] + p2[name][2],
                "plan": scale_plans[name],
            }
            for name in SCALE_QUERIES
        }
        for name in SCALE_QUERIES:
            note = annotate(
                floors.get("scale", {}),
                name,
                scale_timings[name],
                scale_plans[name],
                ABS_NOISE_SEC["scale"],
            )
            if note:
                flags["scale"][name] = note
        scale = {
            "rows": rows,
            "build_sec": build_sec,
            "runs_per_query": "2-4 adaptive + 1-2 confirmatory (pass 2)",
            "agg": "min across two passes",
            "pass2_mode": pass2_mode,
            "total_sec": round(sum(scale_timings.values()), 3),
            "pass_totals": [
                round(sum(v[0] for v in p1.values()), 3),
                round(sum(v[0] for v in p2.values()), 3),
            ],
            "queries": scale_timings,
            "spread": scale_spread,
        }

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    # Two outputs: a full-detail sidecar (per-query scale timings, row
    # counts, methodology) for humans/this repo, and ONE compact JSON line
    # printed LAST for the harness. Round 3's single ~2.5 KB line overflowed
    # the harness's tail-capture window and recorded `parsed: null` — the
    # machine-readable line must stay small, so the scale section carries
    # only its totals here and the sidecar carries the rest.
    detail = {
        "metric": "headline_queries_total_wall_seconds",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "runs_per_query": "2-4 adaptive",
        "agg": "min",
        "queries": timings,
        "queries_spread": headline_spread,
        "queries_plan": headline_plans,
        "flags": flags,
        "host": host_rec,
        "sf": sf_val,
    }
    if scale is not None:
        detail["scale"] = scale
    with open(os.path.join(REPO_ROOT, "BENCH_DETAIL.json"), "w") as f:
        json.dump(detail, f, indent=2)

    floors_status: str | None = None
    if os.environ.get("SPARK_GRAFT_BENCH_WRITE_FLOORS") == "1":
        new_floors = build_new_floors(
            floors, host_rec, timings, headline_plans, scale
        )
        # Floors-write gate (round-10, r9 verdict #3): the r9 end-of-round
        # snapshot committed a floors write whose new session flagged three
        # readings nobody adjudicated — the tree went red AFTER the last
        # verification pass. A write that changes the un-adjudicated flag
        # set now refuses to land unless explicitly forced; the enumerated
        # set in tests/test_bench_flags.py must be updated in the same
        # change, which is precisely the adjudication the gate exists to
        # demand.
        blockers = floors_write_blockers(floors, new_floors)
        blocker_lines = "".join(
            f"  {kind}: {item}\n"
            for kind in ("new", "gone")
            for item in blockers.get(kind, [])
        )
        if blockers and os.environ.get("SPARK_GRAFT_BENCH_FORCE_FLOORS") != "1":
            floors_status = "refused"
            print(
                "BENCH_FLOORS.json NOT written: this session changes the "
                "un-adjudicated flag set.\n" + blocker_lines
                + "Re-run on a quiet host, or adjudicate: sync the "
                "enumerated set in tests/test_bench_flags.py::"
                "test_committed_floor_sessions_replay_clean and re-run "
                "with SPARK_GRAFT_BENCH_FORCE_FLOORS=1.",
                file=sys.stderr,
            )
        else:
            floors_status = "forced" if blockers else "written"
            if blockers:
                # The forced write's OWN delta, not the refused run's —
                # per-invocation minima differ between sessions, so the
                # operator must sync the enumerated set to exactly these
                # tuples (round-10 review: a silent forced write would
                # recreate the r9 red-after-last-gate-run failure).
                print(
                    "BENCH_FLOORS.json written UNDER FORCE; sync the "
                    "enumerated set to this delta:\n" + blocker_lines,
                    file=sys.stderr,
                )
            with open(os.path.join(REPO_ROOT, "BENCH_FLOORS.json"), "w") as f:
                json.dump(new_floors, f, indent=1)

    out = {
        "metric": "headline_queries_total_wall_seconds",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
    }
    # Stall forensics on the compact line: names only (details + plan
    # fingerprints live in the sidecar). An unchanged-plan query reading
    # >1.5x its committed floor is listed in suspect_stall; a query whose
    # fingerprint moved is listed in plan_changed (its timing delta is a
    # real plan change, not noise).
    out["suspect_stall"] = sorted(
        {n for sec in flags.values() for n, v in sec.items() if v.get("suspect_stall")}
    )
    out["plan_changed"] = sorted(
        {n for sec in flags.values() for n, v in sec.items() if v.get("plan_changed")}
    )
    # Host telemetry on the compact line (the externally archived record):
    # l0 = 1-min load BEFORE any bench work (idle box ≪ 1), c = canary
    # wall, then per-section [load1_start, load1_end, cpu_busy,
    # cpu_steal, wall_sec] — enough to label a flagged driver run
    # slow-window with zero re-measures (full struct in the sidecar).
    if floors_status is not None:
        # Machine-readable floors-write verdict (round-11 ADVICE): an
        # automated invocation must not have to parse stderr to learn a
        # floors write was refused — and the process exits non-zero on
        # refusal (below), AFTER the compact line is printed so the
        # parse contract holds either way.
        out["floors_write"] = floors_status
    out["host"] = {"l0": host_rec.get("load_start"), "c": canary_sec}
    for sec_name, tag in (("headline", "h"), ("scale", "s")):
        s = host_rec.get(sec_name)
        if s:
            out["host"][tag] = [
                s["load1"][0],
                s["load1"][1],
                s["cpu_busy"],
                s["cpu_steal"],
                s["wall_sec"],
            ]
    # Self-contained per-query record (round-6 verdict: the externally
    # archived BENCH_rN.json must not depend on the builder-committed
    # sidecar): EVERY query's time as a fixed-order array of 1-decimal
    # floats, keyed by an 8-hex digest of the query-name order — ~4
    # chars/query instead of ~28, so the full vectors fit the harness's
    # 1500-char tail-capture line even with the forensics lists present.
    def order_digest(names: list[str]) -> str:
        return hashlib.sha256(",".join(names).encode()).hexdigest()[:8]

    out["ho"] = order_digest(HEADLINE)
    out["ht"] = [round(timings[n], 1) for n in HEADLINE]
    if scale is not None:
        out["scale_total_sec"] = scale["total_sec"]
        out["scale_n_queries"] = len(scale["queries"])
        out["scale_pass2"] = scale["pass2_mode"]
        # spread fields (compact): the two pass minima totals — when they
        # disagree, one pass sat in a stall window and the per-query mins
        # (sidecar "spread") say which queries.
        out["scale_pass_totals"] = scale["pass_totals"]
        out["headline_max_total"] = round(
            sum(v[1] for v in headline_spread.values()), 3
        )
        out["so"] = order_digest(SCALE_QUERIES)
        out["st"] = [round(scale["queries"][n], 1) for n in SCALE_QUERIES]
    line = json.dumps(out, separators=(",", ":"))
    if len(line) > 1500:
        # Keep the parse contract over per-query detail: collapse the
        # queries map to the 10 slowest (detail survives in the sidecar).
        slowest = dict(
            sorted(timings.items(), key=lambda kv: -kv[1])[:10]
        )
        out["queries"] = slowest
        out["queries_truncated_to_slowest"] = 10
        line = json.dumps(out, separators=(",", ":"))
    if len(line) > 1500:
        # Last resort: collapse the forensics lists to counts (the names
        # survive in the sidecar's "flags").
        out["suspect_stall"] = len(out["suspect_stall"])
        out["plan_changed"] = len(out["plan_changed"])
        line = json.dumps(out, separators=(",", ":"))
    sys.stdout.flush()
    print(line, flush=True)
    if floors_status == "refused":
        sys.exit(3)


def _parse_args(argv: list[str] | None = None) -> None:
    """Minimal front end (round-11, r10 verdict #2): ``bench.py`` takes
    NO positional or flag operands — all knobs are environment variables
    — but before this existed ``bench.py --help`` silently ran the full
    ~13-minute two-section bench and overwrote BENCH_DETAIL.json (the
    same mutate-on-verify footgun class as the five fixed in round 10).
    ``--help`` now prints and exits; any unexpected argument errors out
    instead of benching."""
    import argparse

    p = argparse.ArgumentParser(
        prog="bench.py",
        description=(
            "Run the two-section bench (headline at $SPARK_GRAFT_SF_DIR, "
            "scale at the replicated scale dir), write BENCH_DETAIL.json, "
            "and print one compact JSON line last."
        ),
        epilog=(
            "environment variables:\n"
            "  SPARK_GRAFT_SF_DIR             headline data dir "
            "(default /root/testdata/sf0.1)\n"
            "  SPARK_GRAFT_CPUS               local[] thread count "
            "(default 32)\n"
            "  SPARK_GRAFT_DRIVER_MEM         driver heap (default 24g)\n"
            "  SPARK_GRAFT_BENCH_SCALE=0      skip the scale section\n"
            "  SPARK_GRAFT_BENCH_COOLDOWN     seconds between scale "
            "passes (default 20)\n"
            "  SPARK_GRAFT_BENCH_WRITE_FLOORS=1  refresh BENCH_FLOORS.json "
            "(gated; exit 3 + floors_write:\"refused\" on the compact "
            "line when the write would change the open-flag set)\n"
            "  SPARK_GRAFT_BENCH_FORCE_FLOORS=1  override the gate "
            "(adjudicate in the same change)"
        ),
        formatter_class=argparse.RawDescriptionHelpFormatter,
    )
    p.parse_args(argv)


if __name__ == "__main__":
    _parse_args()
    main()
