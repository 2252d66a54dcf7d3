"""Generate QUERIES.md + QUERY_DEPS.json and answer "which declared
queries consume this module?".

QUERIES.md: one row per declared query — name, family, first docstring
line, oracle kind.

QUERY_DEPS.json: query name -> sorted list of package modules its plan
transitively imports (static AST walk, including lazy in-function
imports). This is the machinery behind the registry's dependency-driven
rotation rule (plans/registry.py::_CHECK_PRIORITY): when a shared module
changes, every declared query that transitively imports it must move to
the front of the next external-check window — a semantics change must
never ship on the strength of external rows that predate it.

Usage:
    python scripts/gen_query_index.py
        regenerate QUERIES.md and QUERY_DEPS.json
    python scripts/gen_query_index.py --consumers <module-or-path>...
        print the declared queries transitively importing the named
        modules (accepts dotted names or file paths)
    python scripts/gen_query_index.py --touched-since <git-ref>
        same, for every package module touched since <git-ref>
        (the one-command pre-round rotation check)
"""

from __future__ import annotations

import ast
import json
import os
import subprocess
import sys
from collections import Counter

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

PKG = "land_registry_data_ingestion_spark"
PKG_DIR = os.path.join(REPO_ROOT, PKG)


def family(name: str) -> str:
    return name.split("_", 1)[0]


# -- static import walk ------------------------------------------------


def package_modules() -> dict[str, str]:
    """Dotted module name -> file path, for every module in the package."""
    mods: dict[str, str] = {}
    for dirpath, _, files in os.walk(PKG_DIR):
        for f in files:
            if not f.endswith(".py"):
                continue
            path = os.path.join(dirpath, f)
            rel = os.path.relpath(path, REPO_ROOT)[: -len(".py")]
            dotted = rel.replace(os.sep, ".")
            if f == "__init__.py":
                dotted = dotted[: -len(".__init__")]
            mods[dotted] = path
    return mods


def module_imports(path: str, mods: dict[str, str], owner: str) -> set[str]:
    """Package-internal modules imported anywhere in ``path`` (top-level
    and lazy in-function imports alike — the registry's own deferred
    imports are real dependencies)."""
    tree = ast.parse(open(path).read(), filename=path)
    deps: set[str] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for alias in node.names:
                if alias.name.startswith(PKG):
                    deps.add(alias.name)
        elif isinstance(node, ast.ImportFrom):
            base = node.module or ""
            if node.level:  # resolve relative against the owning module
                parts = owner.split(".")
                base = ".".join(parts[: len(parts) - node.level] + ([base] if base else []))
            if not base.startswith(PKG):
                continue
            # `from pkg.a import b`: b may be a submodule or a symbol —
            # count pkg.a.b as the dep iff it IS a module, else pkg.a.
            for alias in node.names:
                sub = f"{base}.{alias.name}"
                deps.add(sub if sub in mods else base)
    return {d for d in deps if d in mods}


def dependency_graph() -> dict[str, set[str]]:
    mods = package_modules()
    graph = {m: module_imports(p, mods, m) for m, p in mods.items()}
    # plans.registry's imports exist only to TRIGGER registration of every
    # plan module (_load_all's fan-in); following them would make every
    # query depend on every module and the closure meaningless. The
    # registry carries no query semantics of its own, so it contributes
    # no outgoing edges.
    graph[f"{PKG}.plans.registry"] = set()
    return graph


def transitive(graph: dict[str, set[str]], start: str) -> set[str]:
    seen: set[str] = set()
    stack = [start]
    while stack:
        m = stack.pop()
        if m in seen:
            continue
        seen.add(m)
        stack.extend(graph.get(m, ()))
    return seen


def _query_decorator_name(node: ast.FunctionDef) -> str | None:
    for deco in node.decorator_list:
        if (
            isinstance(deco, ast.Call)
            and isinstance(deco.func, ast.Name)
            and deco.func.id == "query"
            and deco.args
            and isinstance(deco.args[0], ast.Constant)
            and isinstance(deco.args[0].value, str)
        ):
            return deco.args[0].value
    return None


def _names_in(node: ast.AST) -> set[str]:
    return {n.id for n in ast.walk(node) for n in [n] if isinstance(n, ast.Name)}


def _imports_in(
    node: ast.AST, mods: dict[str, str], owner: str
) -> set[str]:
    """Package modules imported anywhere INSIDE this subtree (plan
    functions routinely lazy-import their operators in the body)."""
    deps: set[str] = set()
    for sub in ast.walk(node):
        if isinstance(sub, ast.Import):
            for alias in sub.names:
                if alias.name.startswith(PKG):
                    deps.add(alias.name)
        elif isinstance(sub, ast.ImportFrom):
            base = sub.module or ""
            if sub.level:
                parts = owner.split(".")
                base = ".".join(
                    parts[: len(parts) - sub.level] + ([base] if base else [])
                )
            if not base.startswith(PKG):
                continue
            for alias in sub.names:
                full = f"{base}.{alias.name}"
                deps.add(full if full in mods else base)
    return {d for d in deps if d in mods}


def query_direct_deps() -> dict[str, tuple[str, set[str]]]:
    """Declared query name -> (home module, package modules the query
    FUNCTION actually reaches). Function-level, not module-level: a plan
    module hosts many queries, and charging each query with the union of
    the whole module's imports would mark ~every query a consumer of
    every shared function. Resolution: names referenced anywhere in the
    query function or its decorator (the oracle SQL is often built by
    macro helpers called in the decorator) map to (a) the module's import
    bindings, (b) module-level helpers/constants — followed recursively,
    so a shared tokenizer used only inside an oracle macro still counts."""
    mods = package_modules()
    out: dict[str, tuple[str, set[str]]] = {}
    for mod, path in mods.items():
        tree = ast.parse(open(path).read(), filename=path)
        # name bound at module level -> package module it comes from
        import_binds: dict[str, str] = {}
        # name -> top-level def/assign node (helpers, macros, constants)
        local_binds: dict[str, ast.AST] = {}
        for node in tree.body:
            if isinstance(node, ast.Import):
                for alias in node.names:
                    if alias.name.startswith(PKG):
                        import_binds[(alias.asname or alias.name).split(".")[0]] = (
                            alias.name
                        )
            elif isinstance(node, ast.ImportFrom):
                base = node.module or ""
                if node.level:
                    parts = mod.split(".")
                    base = ".".join(
                        parts[: len(parts) - node.level] + ([base] if base else [])
                    )
                if not base.startswith(PKG):
                    continue
                for alias in node.names:
                    sub = f"{base}.{alias.name}"
                    import_binds[alias.asname or alias.name] = (
                        sub if sub in mods else base
                    )
            elif isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                local_binds[node.name] = node
            elif isinstance(node, ast.Assign):
                for tgt in node.targets:
                    for n in ast.walk(tgt):
                        if isinstance(n, ast.Name):
                            local_binds[n.id] = node.value

        resolved: dict[str, set[str]] = {}

        def deps_of(name: str, trail: set[str]) -> set[str]:
            if name in resolved:
                return resolved[name]
            if name in trail:
                return set()
            if name in import_binds:
                return {import_binds[name]}
            node = local_binds.get(name)
            if node is None:
                return set()
            acc: set[str] = _imports_in(node, mods, mod)
            for ref in _names_in(node):
                if ref != name:
                    acc |= deps_of(ref, trail | {name})
            resolved[name] = acc
            return acc

        for node in tree.body:
            if not isinstance(node, ast.FunctionDef):
                continue
            qname = _query_decorator_name(node)
            if qname is None:
                continue
            refs = _names_in(node) | set().union(
                *(_names_in(d) for d in node.decorator_list)
            )
            direct: set[str] = _imports_in(node, mods, mod)
            for ref in refs:
                direct |= deps_of(ref, {node.name})
            out[qname] = (mod, direct)
    return out


def query_deps() -> dict[str, list[str]]:
    """Query name -> transitive package-module dependency set (the
    function-level direct deps, closed over the module import graph —
    in-function lazy imports inside operators are still caught because
    the closure runs at module granularity from the direct set)."""
    graph = dependency_graph()
    out: dict[str, list[str]] = {}
    for name, (home, direct) in query_direct_deps().items():
        # The home module is a dependency (touching the file touches the
        # query) but is NOT transitively expanded — expanding it would
        # charge every query with the union of its whole module's
        # imports, i.e. module-level coarseness again.
        full: set[str] = {home}
        for d in direct:
            full |= transitive(graph, d)
        out[name] = sorted(full)
    return out


def _normalize_module(arg: str) -> str:
    """Accept a dotted module name or a file path (relative or absolute)."""
    if "/" in arg or arg.endswith(".py"):
        rel = os.path.relpath(os.path.abspath(arg), REPO_ROOT)
        rel = rel[: -len(".py")] if rel.endswith(".py") else rel
        dotted = rel.replace(os.sep, ".")
        return dotted[: -len(".__init__")] if dotted.endswith(".__init__") else dotted
    return arg


def consumers(modules: list[str]) -> dict[str, list[str]]:
    """Module -> declared queries transitively importing it."""
    deps = query_deps()
    out: dict[str, list[str]] = {}
    for arg in modules:
        mod = _normalize_module(arg)
        out[mod] = sorted(q for q, d in deps.items() if mod in d)
    return out


def touched_since(ref: str) -> list[str]:
    diff = subprocess.run(
        ["git", "diff", "--name-only", f"{ref}...HEAD"],
        cwd=REPO_ROOT,
        capture_output=True,
        text=True,
        check=True,
    ).stdout.splitlines()
    return [f for f in diff if f.startswith(PKG + "/") and f.endswith(".py")]


# -- index generation ----------------------------------------------------


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--consumers":
        for mod, qs in consumers(sys.argv[2:]).items():
            print(f"{mod}: {len(qs)} consumer queries")
            for q in qs:
                print(f"  {q}")
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--touched-since":
        touched = touched_since(sys.argv[2])
        print(f"touched package modules since {sys.argv[2]}: {len(touched)}")
        affected: set[str] = set()
        for mod, qs in consumers(touched).items():
            print(f"{mod}: {len(qs)} consumer queries")
            affected.update(qs)
        print(f"\npromote to front of _CHECK_PRIORITY ({len(affected)}):")
        for q in sorted(affected):
            print(f"  {q}")
        return

    from land_registry_data_ingestion_spark.plans import registry

    registry._load_all()
    deps = query_deps()
    rows = []
    fams = Counter()
    for name, spec in registry.REGISTRY.items():
        doc = (spec.doc or "").strip().splitlines()
        head = doc[0].strip() if doc else ""
        fams[family(name)] += 1
        oracle = "full SQL" if spec.sql else "rows-only"
        rows.append((name, family(name), head, oracle))

    missing = set(registry.REGISTRY) - set(deps)
    if missing:  # a query the AST scan failed to map would silently
        raise SystemExit(  # escape the dependency-rotation rule
            f"query_home_modules missed declared queries: {sorted(missing)}"
        )

    out = [
        "# Declared query index (generated by scripts/gen_query_index.py)",
        "",
        f"{len(rows)} queries; every one carries a full DuckDB hash oracle."
        " Families: "
        + ", ".join(f"{f} ({n})" for f, n in sorted(fams.items())),
        "",
        "| query | family | what it states | oracle |",
        "|---|---|---|---|",
    ]
    for name, fam, head, oracle in sorted(rows, key=lambda r: (r[1], r[0])):
        out.append(f"| `{name}` | {fam} | {head} | {oracle} |")
    path = os.path.join(REPO_ROOT, "QUERIES.md")
    with open(path, "w") as fh:
        fh.write("\n".join(out) + "\n")
    deps_path = os.path.join(REPO_ROOT, "QUERY_DEPS.json")
    with open(deps_path, "w") as fh:
        json.dump({q: deps[q] for q in sorted(deps)}, fh, indent=1)
    print(f"written: {path} ({len(rows)} queries)")
    print(f"written: {deps_path}")


if __name__ == "__main__":
    main()
