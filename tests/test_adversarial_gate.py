"""The adversarial oracle gate (scripts/gen_adversarial.py +
scripts/adversarial_triage.py) found 27 real divergences in round 8 —
NULL/NaN/Inf/Unicode/tied-timestamp shapes eight rounds of clean-data
external checks could never see. It only protects FUTURE rounds if it
cannot silently go stale, so (round-9 verdict) the committed
ADVERSARIAL.json is held to the same freshness contract as the
rotation's check_priority.py: it must have been recorded at (or after)
the last change to any engine-semantics module, and it must record zero
divergences."""

from __future__ import annotations

import json
import os
import subprocess

import pytest

REPO_ROOT = os.path.join(os.path.dirname(__file__), "..")
PKG = "land_registry_data_ingestion_spark"

# Modules whose changes cannot alter any query's semantics (the same
# exemptions as the rotation's rule 1): the generated check ordering and
# the registration fan-in. Everything else in the package — and the
# adversarial generator itself, since editing it changes the DATA the
# artifact claims to have survived — requires a re-run.
_EXEMPT = {
    f"{PKG}/plans/check_priority.py",
    f"{PKG}/plans/registry.py",
}
_ALSO_WATCHED = {"scripts/gen_adversarial.py"}


def _git(*args: str) -> subprocess.CompletedProcess:
    return subprocess.run(
        ["git", *args], cwd=REPO_ROOT, capture_output=True, text=True
    )


def test_adversarial_artifact_fresh_and_clean():
    """ADVERSARIAL.json's recorded head must not predate the last
    engine-semantics change (diffed against the WORKING TREE, so
    uncommitted edits flag too — the fix is always: re-run
    ``gen_adversarial.py`` + ``adversarial_triage.py --json
    ADVERSARIAL.json`` as the round's last step), and the recorded
    triage must be 0/;-diverged over every SQL-oracled query."""
    path = os.path.join(REPO_ROOT, "ADVERSARIAL.json")
    with open(path) as fh:
        art = json.load(fh)

    assert art.get("diverged") == 0, (
        "the committed adversarial triage records divergences — fix the "
        "engine/oracle contracts and re-run the gate"
    )
    from land_registry_data_ingestion_spark.plans.registry import (
        REGISTRY,
        _load_all,
    )

    _load_all()
    n_sql = sum(1 for s in REGISTRY.values() if s.sql is not None)
    assert art.get("queries_checked") == n_sql, (
        f"triage checked {art.get('queries_checked')} queries but "
        f"{n_sql} declare SQL oracles — re-run the gate over all of them"
    )

    head = art.get("head")
    assert head, "ADVERSARIAL.json records no head — re-run the triage"
    if _git("cat-file", "-e", f"{head}^{{commit}}").returncode != 0:
        pytest.skip(f"recorded head {head[:9]} not in this clone")

    diff = _git("diff", "--name-only", head).stdout.splitlines()
    diff += _git(
        "ls-files", "--others", "--exclude-standard"
    ).stdout.splitlines()
    stale = sorted(
        f
        for f in set(diff)
        if (
            (f.startswith(PKG + "/") and f.endswith(".py") and f not in _EXEMPT)
            or f in _ALSO_WATCHED
        )
    )
    assert not stale, (
        f"engine modules changed after ADVERSARIAL.json was recorded at "
        f"{head[:9]}: {stale} — regenerate the adversarial dir and re-run "
        f"scripts/adversarial_triage.py --json ADVERSARIAL.json at HEAD"
    )
