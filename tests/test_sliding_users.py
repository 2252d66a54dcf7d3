"""Edge-case tests for the interval-delta form of
``evt_sliding_users_24h`` (plans/events_queries.py): the rewrite merges a
user's event hours into coverage intervals with a gap-≤-24h rule, emits
±1 endpoint deltas, and running-sums the delta spine. The riskiest logic
is the merge boundary — hours exactly 24 apart produce ADJACENT tick
intervals (one merged interval is equivalent), hours 25 apart must NOT
merge (tick between them is uncovered). These cases are checked against
an independent brute-force reference, not the oracle SQL (the sf
fixtures need not contain exact-gap pairs)."""

from __future__ import annotations

import datetime as dt

import pytest

from land_registry_data_ingestion_spark.plans.registry import (
    _load_all,
    REGISTRY,
)
from land_registry_data_ingestion_spark.util import release_caches

BASE = dt.datetime(2024, 3, 1, 0, 30)  # mid-hour, so date_trunc matters


def _events_dir(spark, tmp_path, rows):
    """Write a crafted events.parquet usable as an sf_dir."""
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    path = str(tmp_path / "events.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(path)
    return str(tmp_path)


def _brute_force(rows):
    """Reference: for each observed hour T (ANY event with a non-NULL ts,
    NULL user included — the oracle's hours CTE is over all events),
    count distinct non-NULL users with an event hour in [T-23h, T]."""
    pairs = {
        (u, t.replace(minute=0, second=0, microsecond=0))
        for u, t in rows
        if t is not None
    }
    observed = sorted({h for _, h in pairs})
    out = {}
    for T in observed:
        lo = T - dt.timedelta(hours=23)
        out[T] = len({u for u, h in pairs if u is not None and lo <= h <= T})
    return out


def _run(spark, sf_dir):
    _load_all()
    got = {
        r["window_end"]: r["n_users"]
        for r in REGISTRY["evt_sliding_users_24h"].fn(spark, sf_dir).collect()
    }
    release_caches()
    return got


def test_exact_24h_and_25h_gap_boundaries(spark, tmp_path):
    h = lambda k: BASE + dt.timedelta(hours=k)  # noqa: E731
    rows = [
        # user 1: hours 0 and 24 — gap exactly 24: coverage [0..47]
        # contiguous; tick 24's window [1, 24] contains h=24.
        (1, h(0)),
        (1, h(24)),
        # user 2: hours 0 and 25 — gap 25: tick 24's window [1, 24]
        # contains NEITHER 0 nor 25; user 2 must not count at tick 24.
        (2, h(0)),
        (2, h(25)),
        # user 3: three events inside one hour — dedup to one pair.
        (3, h(24)),
        (3, h(24) + dt.timedelta(minutes=10)),
        (3, h(24) + dt.timedelta(minutes=20)),
    ]
    sf_dir = _events_dir(spark, tmp_path, rows)
    got = _run(spark, sf_dir)
    want = _brute_force(rows)
    assert got == want
    # the discriminating tick, stated explicitly so a regression reads:
    t24 = h(24).replace(minute=0)
    assert got[t24] == 2  # users 1 and 3, NOT user 2


def test_null_user_and_null_ts_excluded(spark, tmp_path):
    h = lambda k: BASE + dt.timedelta(hours=k)  # noqa: E731
    rows = [
        (1, h(0)),
        (None, h(0)),  # null user: count-distinct semantics ignore it
        (2, None),  # null ts: contributes no hour
        (2, h(1)),
    ]
    sf_dir = _events_dir(spark, tmp_path, rows)
    got = _run(spark, sf_dir)
    want = _brute_force(rows)
    assert got == want
    assert got[h(1).replace(minute=0)] == 2


def test_null_user_only_hour_emits_zero_tick(spark, tmp_path):
    """An hour whose trailing window contains ONLY NULL-user events is
    still an observed tick (the oracle's hours CTE spans all events) and
    reads n_users = 0 — regression pin for the r7 spine fix."""
    h = lambda k: BASE + dt.timedelta(hours=k)  # noqa: E731
    rows = [
        (1, h(0)),
        (None, h(0)),
        (None, h(40)),  # > 23h after any real-user event
    ]
    sf_dir = _events_dir(spark, tmp_path, rows)
    got = _run(spark, sf_dir)
    want = _brute_force(rows)
    assert got == want
    assert got[h(40).replace(minute=0)] == 0


@pytest.mark.parametrize("gap_hours", [1, 23, 24, 25, 47, 48, 49])
def test_two_event_user_all_gap_widths(spark, tmp_path, gap_hours):
    """One user, two events `gap_hours` apart, plus a second user marking
    every hour in between as observed — the engine must agree with brute
    force at EVERY tick for merge-boundary-adjacent widths."""
    h = lambda k: BASE + dt.timedelta(hours=k)  # noqa: E731
    rows = [(1, h(0)), (1, h(gap_hours))]
    rows += [(99, h(k)) for k in range(0, gap_hours + 1)]
    sf_dir = _events_dir(spark, tmp_path, rows)
    got = _run(spark, sf_dir)
    want = _brute_force(rows)
    assert got == want


@pytest.mark.parametrize("seed", [5, 17, 29])
def test_random_events_match_brute_force(spark, tmp_path, seed):
    """Randomized differential for the interval-delta form: random
    (user, hour) scatter over a 90-hour span, with NULL users and NULL
    timestamps mixed in — every observed tick must match the brute
    force at every seed (merge boundaries, 0-delta interior ticks, and
    the NULL-user spine semantics all land in-distribution here)."""
    import random

    rng = random.Random(seed)
    h = lambda k: BASE + dt.timedelta(hours=k, minutes=rng.randint(0, 59))  # noqa: E731
    rows = []
    for _ in range(120):
        user = rng.choice([None, 1, 2, 3, 4, 5, 6])
        ts = None if rng.random() < 0.05 else h(rng.randint(0, 90))
        rows.append((user, ts))
    sf_dir = _events_dir(spark, tmp_path, rows)
    got = _run(spark, sf_dir)
    assert got == _brute_force(rows)
