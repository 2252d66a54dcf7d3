"""Unit tests for the rotation generator's pure parts
(scripts/gen_query_index.py): symbol-level AST diffing must see real
body changes and must NOT see docstring/comment/import-order churn —
false positives crowd the staleness block out of the external window
(the round-6 failure mode), false negatives ship semantics changes on
stale external rows."""

from __future__ import annotations

import importlib.util
import os

import pytest

_spec = importlib.util.spec_from_file_location(
    "gen_query_index",
    os.path.join(os.path.dirname(__file__), "..", "scripts", "gen_query_index.py"),
)
gqi = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(gqi)


def _dumps(src: str):
    return gqi._symbol_dumps(src, "<test>")


BASE = '''
import os
from collections import Counter

X = 1

def f(a):
    """doc."""
    return a + X

def g(b):
    # a comment
    return f(b)
'''


def test_identical_source_no_changes():
    syms, loose = _dumps(BASE)
    syms2, loose2 = _dumps(BASE)
    assert syms == syms2 and loose == loose2
    assert set(syms) == {"X", "f", "g"}


def test_docstring_and_comment_changes_invisible():
    churn = BASE.replace('"""doc."""', '"""much longer docstring."""')
    churn = churn.replace("# a comment", "# a different comment")
    assert _dumps(BASE) == _dumps(churn)


def test_import_reorder_invisible_but_body_change_seen():
    reordered = BASE.replace(
        "import os\nfrom collections import Counter",
        "from collections import Counter\nimport os",
    )
    assert _dumps(BASE) == _dumps(reordered)
    changed = BASE.replace("return a + X", "return a - X")
    old, new = _dumps(BASE)[0], _dumps(changed)[0]
    assert old["g"] == new["g"]
    assert old["f"] != new["f"]
    assert old["X"] == new["X"]


def test_import_retarget_is_visible():
    """Rebinding a module-level import to a DIFFERENT source module
    changes behavior without changing any function body — the loose
    digest must move so rule 1 marks the module changed (review
    finding: the first cut skipped imports entirely, which made
    retargeting invisible)."""
    retargeted = BASE.replace(
        "from collections import Counter", "from typing import Counter"
    )
    assert _dumps(BASE)[1] != _dumps(retargeted)[1]
    # ...while the symbol dumps themselves are unchanged
    assert _dumps(BASE)[0] == _dumps(retargeted)[0]


def test_assign_and_loose_code_changes():
    const = BASE.replace("X = 1", "X = 2")
    assert _dumps(BASE)[0]["X"] != _dumps(const)[0]["X"]
    loose = BASE + "\nprint(X)\n"
    assert _dumps(BASE)[1] != _dumps(loose)[1]


def test_symbol_ref_graph_links_plans_to_operators():
    """The cross-module graph must carry the edge that makes a touched
    operator function promote its consumer query: text_dup_span_trim's
    plan reaches operators.spans.trim_duplicated_spans."""
    graph = gqi._symbol_ref_graph()
    pkg = gqi.PKG
    key = (f"{pkg}.plans.textops_queries", "text_dup_span_trim")
    assert key in graph
    assert ("sym", f"{pkg}.operators.spans", "trim_duplicated_spans") in graph[key]


def test_check_priority_covers_registry_exactly():
    from land_registry_data_ingestion_spark.plans.check_priority import (
        CHECK_PRIORITY,
    )
    from land_registry_data_ingestion_spark.plans.registry import (
        REGISTRY,
        _load_all,
    )

    _load_all()
    assert len(CHECK_PRIORITY) == len(set(CHECK_PRIORITY))
    assert set(CHECK_PRIORITY) == set(REGISTRY)
    # registry iteration order IS the generated order (the harness
    # samples a prefix)
    assert list(REGISTRY) == list(CHECK_PRIORITY)


def test_symbol_graph_init_assumptions_hold():
    """The rotation's symbol-reference graph does not propagate through
    package ``__init__`` namespaces (accepted limitation, ROUND7_NOTES):
    a change to ``operators/merge.py::cdc_merge`` would be invisible to
    a consumer spelling ``from ..operators import cdc_merge``, because
    the re-export statement in the ``__init__`` itself never changes.
    Two invariants keep that limitation harmless; this test fails the
    moment either is broken (r7 verdict #7):

    1. No package module outside an ``__init__.py`` imports THROUGH a
       package namespace — every intra-package import names a concrete
       module, or a submodule via its package (which IS a module the
       graph tracks).
    2. ``__init__.py`` files carry no semantics of their own — only a
       docstring, re-export ImportFroms, and __all__/__version__
       assignments — so there is no symbol a query could reach that
       LIVES in an ``__init__``."""
    import ast

    mods = gqi.package_modules()
    violations = []
    for mod, path in mods.items():
        is_init = path.endswith("__init__.py")
        tree = ast.parse(open(path).read(), filename=path)
        if is_init:
            for node in tree.body:
                if isinstance(node, ast.ImportFrom):
                    continue
                if isinstance(node, ast.Expr) and isinstance(
                    node.value, ast.Constant
                ):
                    continue  # docstring
                if isinstance(node, ast.Assign) and all(
                    isinstance(t, ast.Name)
                    and t.id in ("__all__", "__version__")
                    for t in node.targets
                ):
                    continue
                violations.append((mod, f"init hosts semantics: {ast.dump(node)[:80]}"))
            continue
        for node in ast.walk(tree):
            if isinstance(node, ast.ImportFrom):
                base = node.module or ""
                if node.level:
                    base = gqi._resolve_relative(mod, mods, node.level, base)
                if not base.startswith(gqi.PKG):
                    continue
                if mods.get(base, "").endswith("__init__.py"):
                    for alias in node.names:
                        if f"{base}.{alias.name}" not in mods:
                            violations.append(
                                (mod, f"re-export import: from {base} "
                                      f"import {alias.name}")
                            )
            elif isinstance(node, ast.Import):
                for alias in node.names:
                    if alias.name.startswith(gqi.PKG) and mods.get(
                        alias.name, ""
                    ).endswith("__init__.py"):
                        violations.append(
                            (mod, f"package import: import {alias.name}")
                        )
    assert not violations, violations


def _check_priority_header():
    """(ref, recorded rule-1 touched list) from the generated file."""
    import ast
    import re

    path = os.path.join(
        os.path.dirname(__file__),
        "..",
        gqi.PKG,
        "plans",
        "check_priority.py",
    )
    src = open(path).read()
    ref = re.search(r"^# ref=(\S+) ", src, re.M).group(1)
    touched = ast.literal_eval(
        re.search(r"^# rule-1 touched \(\d+\): (\[.*\])$", src, re.M).group(1)
    )
    return ref, touched


def test_check_priority_fresh_at_head():
    """The pre-round rotation contract, automated (r7 verdict #2 /
    ADVICE): the committed ``check_priority.py`` must have been
    generated (a) from a ref at or after the previous driver round's
    final commit, and (b) AFTER the last change to any package module —
    otherwise rule 1 silently misses a touched query and a semantics
    change ships on stale external rows. (b) is checked by re-running
    the symbol-level touched walk from the header's ref against the
    CURRENT working tree and comparing to the recorded touched set, so
    this fails for uncommitted edits too — the fix is always: re-run
    ``scripts/gen_query_index.py --rotation <prev-round-final-commit>``
    after the round's last engine commit."""
    import re
    import subprocess

    ref, recorded_touched = _check_priority_header()
    git = lambda *a: subprocess.run(  # noqa: E731
        ["git", *a], cwd=gqi.REPO_ROOT, capture_output=True, text=True
    )
    # (a) find the newest driver round-boundary commit ("round N: ...")
    log = git("log", "--format=%H %s").stdout.splitlines()
    round_commit = next(
        (
            h.split(" ", 1)[0]
            for h in log
            if re.match(r"round \d+: ", h.split(" ", 1)[1])
        ),
        None,
    )
    if round_commit is None:
        pytest.skip("no driver round-boundary commit in history")
    assert git("merge-base", "--is-ancestor", round_commit, ref).returncode == 0, (
        f"check_priority.py was generated at ref={ref}, which predates "
        f"the last round boundary {round_commit[:9]} — regenerate with "
        f"--rotation {round_commit[:9]}"
    )
    # (b) the recorded touched set must reproduce at HEAD + working tree
    declared = set()
    from land_registry_data_ingestion_spark.plans import registry

    registry._load_all()
    declared = set(registry.REGISTRY)
    touched, _ = gqi.affected_queries_function_level(ref)
    assert sorted(touched & declared) == sorted(recorded_touched), (
        "package modules changed after check_priority.py was generated "
        "(or the generator ran against a dirty tree) — re-run the "
        "rotation generator as the round's last step"
    )


def test_rotation_overflow_hard_fails(monkeypatch, tmp_path):
    """A touched set larger than the window must abort loudly, not
    silently spill — the generator owns the arithmetic now."""
    monkeypatch.setattr(
        gqi,
        "affected_queries_function_level",
        lambda ref: ({"a", "b", "c"}, {}),
    )
    monkeypatch.setattr(gqi, "query_ages", lambda as_of=None: {"a": 1, "b": 1, "c": 1})
    monkeypatch.setattr(
        gqi, "_CHECK_PRIORITY_PATH", str(tmp_path / "check_priority.py")
    )
    with pytest.raises(SystemExit, match="rule-1 violation"):
        gqi.rotation("HEAD", window=2, next_round=7, declared=["a", "b", "c"])


def test_rotation_staleness_spill_hard_fails(monkeypatch, tmp_path):
    """An AVOIDABLE overdue spill (the window had room for every overdue
    row — an ordering bug) and a SECOND deferral (a row that would land
    ≥3 rounds stale at the next round) must both abort — the round-6
    hole and the deferral-never-honored hole respectively."""
    monkeypatch.setattr(
        gqi, "affected_queries_function_level", lambda ref: (set(), {})
    )
    monkeypatch.setattr(
        gqi, "_CHECK_PRIORITY_PATH", str(tmp_path / "check_priority.py")
    )
    # b at r3 would be >3 rounds stale after an r7 run — deferring it
    # again is never allowed, even with a full window.
    monkeypatch.setattr(gqi, "query_ages", lambda as_of=None: {"a": 6, "b": 3, "c": 6})
    with pytest.raises(SystemExit, match="staleness violation"):
        gqi.rotation("HEAD", window=0, next_round=7, declared=["a", "b", "c"])


def test_rotation_unavoidable_overdue_defers_with_record(
    monkeypatch, tmp_path, capsys
):
    """Round-11 contract: when rule-1 touched queries legitimately fill
    the window past the overdue rows, the generator defers the overdue
    set ONE round — loudly, and recorded in the generated header —
    instead of dead-locking the rotation (rule 1 outranks rule 2: a
    touched query on a pre-change row is a correctness hole; a deferred
    stale row is a delayed re-check)."""
    monkeypatch.setattr(
        gqi,
        "affected_queries_function_level",
        lambda ref: ({"a", "c"}, {}),
    )
    monkeypatch.setattr(
        gqi, "query_ages", lambda as_of=None: {"a": 6, "b": 4, "c": 6}
    )
    target = tmp_path / "check_priority.py"
    monkeypatch.setattr(gqi, "_CHECK_PRIORITY_PATH", str(target))
    # window 2 holds exactly the touched pair; b (r4, 3 rounds stale at
    # r7) cannot fit and defers.
    gqi.rotation("HEAD", window=2, next_round=7, declared=["a", "b", "c"])
    out = capsys.readouterr().out
    assert "deferring to r8" in out and "'b'" in out
    content = target.read_text()
    assert "rule-2 deferred" in content and "'b'" in content


def test_rotation_check_mode_never_writes(monkeypatch, tmp_path, capsys):
    """--check must verify the committed file reproduces WITHOUT touching
    it (round-9 verdict: a judge verification run used to rewrite
    check_priority.py in place and needed a git checkout to undo), and
    must exit non-zero naming the first divergent line when it doesn't."""
    monkeypatch.setattr(
        gqi, "affected_queries_function_level", lambda ref: (set(), {})
    )
    monkeypatch.setattr(gqi, "query_ages", lambda as_of=None: {"a": 6, "b": 6})
    target = tmp_path / "check_priority.py"
    monkeypatch.setattr(gqi, "_CHECK_PRIORITY_PATH", str(target))

    # generate the committed file once, then check-mode must reproduce it
    gqi.rotation("HEAD", window=2, next_round=7, declared=["a", "b"])
    committed = target.read_text()
    gqi.rotation("HEAD", window=2, next_round=7, declared=["a", "b"], check=True)
    assert target.read_text() == committed
    assert "check OK" in capsys.readouterr().out

    # a divergent regeneration (different round) fails without writing
    with pytest.raises(SystemExit, match="check FAILED.*line"):
        gqi.rotation(
            "HEAD", window=2, next_round=8, declared=["a", "b"], check=True
        )
    assert target.read_text() == committed


def test_rotation_out_redirects_emission(monkeypatch, tmp_path):
    """--out writes the generated file elsewhere and leaves the committed
    check_priority.py untouched."""
    monkeypatch.setattr(
        gqi, "affected_queries_function_level", lambda ref: (set(), {})
    )
    monkeypatch.setattr(gqi, "query_ages", lambda as_of=None: {"a": 6, "b": 6})
    target = tmp_path / "check_priority.py"
    target.write_text("SENTINEL")
    monkeypatch.setattr(gqi, "_CHECK_PRIORITY_PATH", str(target))
    out = tmp_path / "elsewhere.py"
    gqi.rotation(
        "HEAD", window=2, next_round=7, declared=["a", "b"], out=str(out)
    )
    assert target.read_text() == "SENTINEL"
    assert 'CHECK_PRIORITY: tuple[str, ...] = (' in out.read_text()


def test_normalize_module_is_cwd_insensitive(monkeypatch, tmp_path):
    """git emits repo-relative paths; resolving them against the process
    CWD instead of the repo root mapped every touched module to a
    garbage dotted name when the generator ran from elsewhere — rule 1
    then silently saw ZERO touched queries (found in round 9)."""
    rel = f"{gqi.PKG}/operators/similarity.py"
    monkeypatch.chdir(tmp_path)
    assert gqi._normalize_module(rel) == f"{gqi.PKG}.operators.similarity"


# -- front-end guards (round 11: the mutate-on-verify footgun class) ----


def test_parse_args_rejects_empty_refs():
    """A misexpanded shell variable (``--rotation ""`` /
    ``--touched-since ""``) must error inside its mode, never fall
    through to the default mode that rewrites QUERIES.md /
    QUERY_DEPS.json (round-11 ADVICE: the old main() dispatched on
    truthiness, so an empty ref WAS the default mode)."""
    for argv in (["--rotation", ""], ["--touched-since", ""],
                 ["--touched-since", "  "]):
        with pytest.raises(SystemExit) as e:
            gqi._parse_args(argv)
        assert e.value.code == 2


def test_parse_args_rotation_only_flags_still_guarded():
    for argv in (["--check"], ["--as-of", "r10"], ["--window", "50"]):
        with pytest.raises(SystemExit) as e:
            gqi._parse_args(argv)
        assert e.value.code == 2


def test_parse_args_as_of_spellings():
    a = gqi._parse_args(["--rotation", "HEAD", "--as-of", "r10"])
    assert a.as_of == 10
    a = gqi._parse_args(["--rotation", "HEAD", "--as-of", "10"])
    assert a.as_of == 10
    with pytest.raises(SystemExit):
        gqi._parse_args(["--rotation", "HEAD", "--as-of", "ten"])


def test_query_ages_as_of_hides_newer_rounds():
    """--as-of must reproduce the historical ages view: the committed
    rotation was generated BEFORE the driver's newest CORRECTNESS file
    landed, so verifying it later needs that file hidden (r10 verdict
    #4: the judge moved CORRECTNESS_r10.json aside by hand)."""
    full = gqi.query_ages()
    newest = max(full.values())
    assert newest >= 2  # repo has a history of rounds
    capped = gqi.query_ages(newest - 1)
    assert max(capped.values()) == newest - 1
    # hiding nothing reproduces the full view
    assert gqi.query_ages(newest) == full


def test_rotation_passes_as_of_to_ages(monkeypatch, tmp_path):
    seen: list = []

    def fake_ages(as_of=None):
        seen.append(as_of)
        return {"a": 6, "b": 6}

    monkeypatch.setattr(gqi, "affected_queries_function_level",
                        lambda ref: (set(), {}))
    monkeypatch.setattr(gqi, "query_ages", fake_ages)
    monkeypatch.setattr(gqi, "_CHECK_PRIORITY_PATH",
                        str(tmp_path / "check_priority.py"))
    gqi.rotation("HEAD", window=2, next_round=7, declared=["a", "b"],
                 as_of=6)
    assert seen == [6]
