"""Front-end guards for scripts/audit_plans.py (round-11, r10 verdict
#2): the old ``sys.argv[1]``-as-data-dir parsing treated ANY first
argument as the sf dir, so ``audit_plans.py --check`` ran all 112
queries against the literal path "--check", overwrote the committed
PLAN_AUDIT.md with ERROR rows, and exited 0 — the last surviving member
of the mutate-on-verify footgun class round 10 fixed in five sibling
scripts. These tests pin the argparse behavior and the diff-not-write
--check mode without spinning up Spark."""

from __future__ import annotations

import importlib.util
import os

import pytest

_spec = importlib.util.spec_from_file_location(
    "audit_plans",
    os.path.join(os.path.dirname(__file__), "..", "scripts", "audit_plans.py"),
)
ap = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(ap)


def test_check_flag_is_a_mode_not_a_data_dir():
    args = ap._parse_args(["--check"])
    assert args.check is True
    assert args.sf_dir == "/root/testdata/sf0.01"  # default preserved


def test_help_exits_zero_without_running():
    with pytest.raises(SystemExit) as e:
        ap._parse_args(["--help"])
    assert e.value.code == 0


def test_check_and_out_mutually_exclusive():
    with pytest.raises(SystemExit) as e:
        ap._parse_args(["--check", "--out", "/tmp/x.md"])
    assert e.value.code == 2


def test_positional_sf_dir_still_accepted():
    args = ap._parse_args(["/root/testdata/sf0.1", "--check"])
    assert args.sf_dir == "/root/testdata/sf0.1" and args.check


def test_check_against_ok_and_drift(tmp_path, capsys):
    """--check must diff against the committed file WITHOUT writing:
    identical content reports OK; drift exits non-zero naming the first
    divergent line and leaves the committed file untouched."""
    committed = tmp_path / "PLAN_AUDIT.md"
    committed.write_text("line1\nline2\n")
    ap.check_against("line1\nline2\n", str(committed))
    assert "check OK" in capsys.readouterr().out

    with pytest.raises(SystemExit, match="line 2"):
        ap.check_against("line1\nCHANGED\n", str(committed))
    assert committed.read_text() == "line1\nline2\n"

    # a missing committed file is drift, not a crash
    with pytest.raises(SystemExit, match="check FAILED"):
        ap.check_against("anything\n", str(tmp_path / "absent.md"))
