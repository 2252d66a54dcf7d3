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


def test_rotation_overflow_hard_fails(monkeypatch, tmp_path):
    """A touched set larger than the window must abort loudly, not
    silently spill — the generator owns the arithmetic now."""
    monkeypatch.setattr(
        gqi,
        "affected_queries_function_level",
        lambda ref: ({"a", "b", "c"}, {}),
    )
    monkeypatch.setattr(gqi, "query_ages", lambda: {"a": 1, "b": 1, "c": 1})
    monkeypatch.setattr(
        gqi, "_CHECK_PRIORITY_PATH", str(tmp_path / "check_priority.py")
    )
    with pytest.raises(SystemExit, match="rule-1 violation"):
        gqi.rotation("HEAD", window=2, next_round=7, declared=["a", "b", "c"])


def test_rotation_staleness_spill_hard_fails(monkeypatch, tmp_path):
    """A window that would push an untouched query past 2-round
    staleness must also abort — this is the exact round-6 hole."""
    monkeypatch.setattr(
        gqi, "affected_queries_function_level", lambda ref: (set(), {})
    )
    monkeypatch.setattr(gqi, "query_ages", lambda: {"a": 6, "b": 4, "c": 6})
    monkeypatch.setattr(
        gqi, "_CHECK_PRIORITY_PATH", str(tmp_path / "check_priority.py")
    )
    with pytest.raises(SystemExit, match="staleness violation"):
        # window 0 spills everything; "b" at r4 would be 3 rounds stale
        # after an r7 run, so the generator must abort.
        gqi.rotation("HEAD", window=0, next_round=7, declared=["a", "b", "c"])
