"""Unit tests for bench.py's stall-flag calibration (round-7 rework).

Round 6's floor×1.5 rule flagged 19/31 healthy queries — the committed
floors were calm-window minima that ordinary sessions read 1.3-2× above.
The flag now reads a per-query noise band built from per-session minima;
these tests pin both directions: ordinary session drift must NOT flag,
an injected regression (the sleep-in-one-query scenario) MUST."""

from __future__ import annotations

import importlib.util
import os

_spec = importlib.util.spec_from_file_location(
    "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py")
)
bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench)


def _ref(sessions, floor=None, plan="abc123"):
    return {
        "plan": plan,
        "floor": floor if floor is not None else min(sessions),
        "sessions": sessions,
    }


def test_ordinary_session_drift_not_flagged():
    # committed sessions drift 1.0-1.3; readings up to ~1.7x the median
    # are this host's measured healthy inter-session spread — no flag.
    ref = _ref([1.0, 1.2, 1.3])
    assert bench.annotate({"q": ref}, "q", 2.0, "abc123") is None


def test_injected_regression_flagged():
    ref = _ref([1.0, 1.05, 1.1])
    note = bench.annotate({"q": ref}, "q", 3.0, "abc123")
    assert note and note["suspect_stall"] and note["threshold"] < 3.0


def test_zero_mad_does_not_flag_everything():
    # identical session minima → MAD 0; the 75%/0.4 s guards must keep
    # an ordinary next session from flagging.
    ref = _ref([2.0, 2.0, 2.0])
    assert bench.annotate({"q": ref}, "q", 3.4, "abc123") is None
    assert bench.annotate({"q": ref}, "q", 3.6, "abc123")


def test_subsecond_queries_need_absolute_excess():
    ref = _ref([0.2, 0.2, 0.25])
    # +0.4 s on a 0.2 s query is scheduler jitter, not a stall (scale
    # section's 0.4 s absolute term)
    assert bench.annotate({"q": ref}, "q", 0.55, "abc123") is None
    assert bench.annotate({"q": ref}, "q", 0.9, "abc123")


def test_headline_abs_floor_sees_fast_query_regressions():
    """Round-8 (r7 verdict #5): under the old 0.4 s absolute term a
    0.2 s-median headline query tolerated ~2.5× same-plan slowdowns
    silently; the headline section's 0.15 s term must flag them while
    still passing ordinary jitter."""
    ref = _ref([0.2, 0.2, 0.25])
    hl = bench.ABS_NOISE_SEC["headline"]
    # ordinary jitter (+0.1 s) stays quiet...
    assert bench.annotate({"q": ref}, "q", 0.3, "abc123", hl) is None
    # ...a 2.6× reading flags (it did NOT under the 0.4 s term)
    assert bench.annotate({"q": ref}, "q", 0.52, "abc123", hl)
    assert bench.annotate({"q": ref}, "q", 0.52, "abc123") is None


def test_zero_valued_session_minimum_still_counts():
    """A 0.0 recorded session (sub-millisecond reading rounded to 3
    decimals) must count toward the ≥3-session band — filtering with
    truthiness would silently drop it and leave the query on the
    2×-floor fallback despite having 3 recorded sessions."""
    ref = {"plan": "abc123", "floor": 0.0, "sessions": [0.0, 0.001, 0.001]}
    thr = bench.stall_threshold(ref, 0.15)
    # band exists (3 sessions) and is the absolute term, not 2×floor=0
    assert thr is not None and 0.15 <= thr <= 0.16


def test_committed_floor_sessions_replay_clean():
    """Replay EVERY recorded session minimum in the committed
    BENCH_FLOORS.json against its own band (headline 0.15 s absolute
    term, scale 0.4 s): the only flags allowed are the adjudicated
    host-anomaly readings, each with a recorded isolated re-measure
    showing steady-state inside the band (provenance per reading:
    ROUND7_NOTES for the r7 floor-session episodes, ROUND8_NOTES for
    the r7 driver reading and the r8 episodes). Anything else flagging
    would be a false flag. Note the set is maintained, not append-only:
    r7's text_token_budget_sample 2.642 stopped flagging when drift
    readings widened its band, and the r7/r8 text_dsir_weights /
    text_token_budget_sample readings left the file entirely when the
    round-8 NULL-semantics fixes changed those queries' plans and reset
    their sessions (a plan change starts a fresh band by design)."""
    import json

    with open(os.path.join(os.path.dirname(__file__), "..", "BENCH_FLOORS.json")) as f:
        floors = json.load(f)
    adjudicated = {
        ("scale", "text_quality_score", 1.7),  # r7 driver; judge 0.84-0.92 isolated
        # --- r8 third floor cycle: one SUSTAINED host slow window.
        # The three sessions behind the similarity-family plan change
        # read 68.5 / 62.8 / 69.7 s headline vs the ~41-45 s committed
        # medians (~50% hot, ~1 h long — same recurring episode class as
        # ROUND3_NOTES/r7, longest observed). Every reading below is
        # from those sessions, on an unchanged plan, and every query was
        # isolated-re-measured after the window cooled: steady-state
        # inside its band (readings in ROUND8_NOTES §floor-cycle table).
        # Earlier enumerated readings that stopped flagging when the
        # wider bands absorbed them (cdc_merge_state 4.547,
        # text_quality_score 1.244, text_dup_span_trim 2.555,
        # text_dsir_weights 3.559, evt_ohlc_hourly 0.532) left the set —
        # it is maintained, not append-only.
        ("headline", "dedup_minhash_lsh", 13.934),  # 3.05 isolated
        ("headline", "evt_range_join", 1.13),  # 0.52 isolated
        ("headline", "evt_sliding_users_24h", 5.753),  # 1.67 isolated
        ("headline", "rel_full_outer_reconcile", 2.508),  # 0.49 isolated
        ("headline", "rel_left_join_broadcast", 1.464),  # 0.48 isolated
        ("headline", "rel_multi_join_chain", 2.483),  # 1.41 isolated
        ("headline", "sim_kmeans_clusters", 0.892),  # 0.51 isolated
        ("headline", "text_decontaminate", 2.912),  # 1.32 isolated
        ("headline", "text_dup_span_trim", 4.876),  # 1.30 isolated
        ("headline", "text_redact_pii", 1.284),  # 0.44 isolated
        ("headline", "win_latest_row", 1.149),  # 0.49 isolated
        ("scale", "sim_kmeans_clusters", 1.25),  # 0.78 isolated
        ("scale", "text_dup_span_trim", 5.573),  # 3.71 isolated
        ("scale", "text_repetition_filters", 1.745),  # 1.54 isolated
        ("scale", "text_repetition_filters", 1.746),  # (same episode)
        # first isolated re-run read 3.63 in a fresh load spike; second
        # idle run 1.78 — matching its r8a idle steady-state 1.77/1.88
        ("scale", "text_token_budget_sample", 3.37),
        ("scale", "text_token_budget_sample", 3.785),
        ("scale", "win_equidepth_histogram", 7.241),  # 3.55 isolated
    }
    flagged = set()
    for section, entries in floors.items():
        abs_noise = bench.ABS_NOISE_SEC[section]
        for name, ref in entries.items():
            sessions = ref.get("sessions", [])
            assert len(sessions) >= 3, (
                f"{section}/{name}: {len(sessions)} sessions — a plan "
                "change must land with >=3 fresh floor sessions"
            )
            thr = bench.stall_threshold(ref, abs_noise)
            for s in sessions:
                if s > thr:
                    flagged.add((section, name, s))
    assert flagged == adjudicated


def test_fewer_than_three_sessions_falls_back_to_2x_floor():
    ref = {"plan": "abc123", "floor": 1.0, "sessions": [1.0]}
    assert bench.annotate({"q": ref}, "q", 1.9, "abc123") is None
    assert bench.annotate({"q": ref}, "q", 2.1, "abc123")


def test_plan_change_wins_over_stall():
    ref = _ref([1.0, 1.0, 1.0])
    note = bench.annotate({"q": ref}, "q", 9.0, "DIFFERENT")
    assert note == {"plan_changed": True}


def test_legacy_floor_only_entries_still_work():
    # pre-round-7 BENCH_FLOORS.json had no "sessions" key at all
    ref = {"plan": "abc123", "floor": 1.0}
    assert bench.annotate({"q": ref}, "q", 1.9, "abc123") is None
    assert bench.annotate({"q": ref}, "q", 2.1, "abc123")
