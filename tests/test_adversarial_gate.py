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


def _load_script(name: str):
    """Import a scripts/ module by file path (they are not a package)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REPO_ROOT, "scripts", f"{name}.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


# Round 9 grew the gate from one hostile-values tier to five (hostile
# values / empty / singleton / skew shapes / timeedge boundary
# magnitudes); round 10 added allnull (whole nullable columns 100%
# NULL with rows and keys intact — the malformed-delivery shape
# neither scattered hostile NULLs nor the empty tier reaches) and
# keyedge (ids across the full int64 range — hash-derived 64-bit keys;
# found 3 real crashes on first contact: element_at index 0 from
# negative-id residues in both mm_* queries, int64 overflow in
# text_redact_pii's synthetic-phone arithmetic). Each must be re-run
# at the round's final engine HEAD (gen_adversarial.py --tier).
REQUIRED_TIERS = (
    "hostile", "empty", "singleton", "skew", "timeedge", "allnull",
    "keyedge",
)


def _stale_engine_files(head: str) -> list[str]:
    diff = _git("diff", "--name-only", head).stdout.splitlines()
    diff += _git(
        "ls-files", "--others", "--exclude-standard"
    ).stdout.splitlines()
    return sorted(
        f
        for f in set(diff)
        if (
            (f.startswith(PKG + "/") and f.endswith(".py") and f not in _EXEMPT)
            or f in _ALSO_WATCHED
        )
    )


def test_adversarial_artifact_fresh_and_clean():
    """Every tier record in ADVERSARIAL.json must (a) exist, (b) record
    zero divergences over every SQL-oracled query, and (c) carry a head
    that does not predate the last engine-semantics change (diffed
    against the WORKING TREE, so uncommitted edits flag too — the fix is
    always: regenerate each tier dir and re-run ``adversarial_triage.py
    --tier <t> --json ADVERSARIAL.json`` as the round's last step)."""
    path = os.path.join(REPO_ROOT, "ADVERSARIAL.json")
    with open(path) as fh:
        art = json.load(fh)

    from land_registry_data_ingestion_spark.plans.registry import (
        REGISTRY,
        _load_all,
    )

    _load_all()
    n_sql = sum(1 for s in REGISTRY.values() if s.sql is not None)

    tiers = art.get("tiers")
    assert isinstance(tiers, dict), (
        "ADVERSARIAL.json predates the tiered gate — re-run "
        "adversarial_triage.py --tier <t> --json for every tier"
    )
    missing = [t for t in REQUIRED_TIERS if t not in tiers]
    assert not missing, f"tiers never triaged: {missing}"

    # Verdicts first, for EVERY tier: a pytest.skip inside this loop
    # used to abort the whole test at the first tier whose head was
    # absent from the clone, silently skipping the diverged==0 and
    # queries_checked assertions for all remaining tiers (round-10
    # review) — so the unconditional checks run before any
    # head-existence question is asked.
    for tier in REQUIRED_TIERS:
        rec = tiers[tier]
        assert rec.get("diverged") == 0, (
            f"tier {tier!r} records {rec.get('diverged')} divergences — "
            "fix the engine/oracle contracts and re-run the gate"
        )
        assert rec.get("queries_checked") == n_sql, (
            f"tier {tier!r} checked {rec.get('queries_checked')} queries "
            f"but {n_sql} declare SQL oracles — re-run it over all"
        )
        assert rec.get("head"), f"tier {tier!r} records no head — re-run the triage"

    # Freshness per tier: a head this clone cannot resolve (shallow /
    # partial checkout) skips only THAT tier's staleness check.
    any_checked = False
    for tier in REQUIRED_TIERS:
        head = tiers[tier]["head"]
        if _git("cat-file", "-e", f"{head}^{{commit}}").returncode != 0:
            continue
        any_checked = True
        stale = _stale_engine_files(head)
        assert not stale, (
            f"engine modules changed after tier {tier!r} was recorded at "
            f"{head[:9]}: {stale} — regenerate the tier dir and re-run "
            f"scripts/adversarial_triage.py --tier {tier} --json "
            "ADVERSARIAL.json at HEAD"
        )
    if not any_checked:
        pytest.skip("no recorded tier head resolvable in this clone")


def test_tier_generators_are_deterministic(tmp_path):
    """Every tier regenerates BYTE-identically (fixed modular index
    rules, no RNG) — the property that lets an external verifier
    sha-compare a regenerated dir against the one the committed triage
    ran on. A generator that drifted (dict ordering, float repr,
    timestamp ambiguity) would quietly decouple the artifact from the
    data it claims to describe."""
    gen = _load_script("gen_adversarial")
    # the SAME digest the triage records and the binding test verifies —
    # a second local copy of the algorithm could silently drift from
    # what the artifact actually pins (round-10 review)
    digest = _load_script("adversarial_triage").dir_digest

    for tier in REQUIRED_TIERS:
        a = tmp_path / f"{tier}_a"
        b = tmp_path / f"{tier}_b"
        gen.generate(str(a), tier=tier)
        gen.generate(str(b), tier=tier)
        assert digest(str(a)) == digest(str(b)), f"tier {tier!r} is not reproducible"


def test_tier_records_bind_to_tier_data(tmp_path):
    """Each committed tier record must carry the sha-256 of the data dir
    it actually triaged, and that hash must equal a fresh
    ``generate()`` of the SAME tier (byte-identical regeneration is
    pinned above). Without this binding, --tier was a free-form label:
    all five tiers could be 'triaged' against one reused directory and
    the gate would accept the clean records (round-10 review)."""
    triage = _load_script("adversarial_triage")
    gen = _load_script("gen_adversarial")

    # the triage script's tier choices are the generator's tier set —
    # and this test's own REQUIRED_TIERS must be that same set, or a
    # tier added to the generator but forgotten here would never be
    # required, freshness-checked, or data-bound (round-10 review: the
    # same label-drift class the triage/generator binding closed)
    assert triage._load_tier_names() == sorted(gen.TIER_DEFAULT_OUT)
    assert set(REQUIRED_TIERS) == set(gen.TIER_DEFAULT_OUT)

    with open(os.path.join(REPO_ROOT, "ADVERSARIAL.json")) as fh:
        tiers = json.load(fh)["tiers"]
    for tier in REQUIRED_TIERS:
        rec = tiers[tier]
        recorded = rec.get("data_sha256")
        assert recorded, (
            f"tier {tier!r} records no data_sha256 — re-run "
            f"scripts/adversarial_triage.py --tier {tier} on a freshly "
            "generated dir"
        )
        fresh = tmp_path / tier
        gen.generate(str(fresh), tier=tier)
        assert triage.dir_digest(str(fresh)) == recorded, (
            f"tier {tier!r}'s recorded data hash does not match a fresh "
            f"generate() of that tier — the triage ran on mislabeled or "
            "stale data; regenerate the dir and re-run the triage"
        )


