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
    # +0.4 s on a 0.2 s query is scheduler jitter, not a stall
    assert bench.annotate({"q": ref}, "q", 0.55, "abc123") is None
    assert bench.annotate({"q": ref}, "q", 0.9, "abc123")


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
