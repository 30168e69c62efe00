#!/usr/bin/env python
"""Zero-dependency lint gate (the repo's clippy analog).

The reference enforces a hard static-analysis gate in CI (`cargo fmt --check`
+ `clippy -- -D warnings`, /root/reference/.github/workflows/test.yml:13-26,
with `#![deny(unsafe_code)]` at src/lib.rs:3).  This tool is the Python-side
equivalent that works with only the stdlib, so the gate runs identically on
dev hosts without ruff and in CI (where ruff ALSO runs, as a second hard
gate).  Checks, all hard failures:

  * syntax errors (ast.parse)
  * unused imports (module scope and function scope)
  * duplicate imports of the same binding
  * redefined top-level functions/classes
  * `except:` bare excepts
  * f-strings with no placeholders
  * mutable default arguments ([] / {} / set())

`# lint: ignore[rule]` on the flagged line suppresses that rule; `__init__.py`
re-export imports are exempt from unused-import (they ARE the API), as is any
import bound in `__all__` or aliased to underscore.
"""

from __future__ import annotations

import ast
import sys
from pathlib import Path

RULES = (
    "syntax", "unused-import", "dup-import", "redef",
    "bare-except", "f-placeholder", "mutable-default",
)


def _suppressed(source_lines: list[str], lineno: int, rule: str) -> bool:
    try:
        line = source_lines[lineno - 1]
    except IndexError:
        return False
    return f"lint: ignore[{rule}]" in line or "lint: ignore-file" in line


class _Scope:
    def __init__(self, node: ast.AST, is_module: bool) -> None:
        self.node = node
        self.is_module = is_module
        self.imports: dict[str, ast.stmt] = {}
        self.used: set[str] = set()


def _walk_file(path: Path) -> list[tuple[int, str, str]]:
    src = path.read_text()
    lines = src.splitlines()
    out: list[tuple[int, str, str]] = []
    if "lint: ignore-file" in src[:400]:
        return out
    try:
        tree = ast.parse(src, filename=str(path))
    except SyntaxError as e:
        return [(e.lineno or 0, "syntax", str(e.msg))]

    is_init = path.name == "__init__.py"
    dunder_all: set[str] = set()
    for node in tree.body:
        if (isinstance(node, ast.Assign)
                and any(isinstance(t, ast.Name) and t.id == "__all__"
                        for t in node.targets)
                and isinstance(node.value, (ast.List, ast.Tuple))):
            for elt in node.value.elts:
                if isinstance(elt, ast.Constant) and isinstance(elt.value, str):
                    dunder_all.add(elt.value)

    # conditional contexts: imports inside if/try/while bodies may rebind
    # the same name on different branches — never flag those as dups.
    conditional: set[int] = set()
    for node in ast.walk(tree):
        if isinstance(node, (ast.If, ast.Try, ast.While, ast.For)):
            for sub in ast.walk(node):
                conditional.add(id(sub))
    # format specs are JoinedStr nodes with only Constant parts — exempt
    # them from the f-placeholder rule.
    format_specs: set[int] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.FormattedValue) and node.format_spec is not None:
            format_specs.add(id(node.format_spec))

    # --- per-scope unused/duplicate import detection -------------------
    def scan_scope(body: list[ast.stmt], is_module: bool) -> None:
        imports: dict[str, ast.stmt] = {}

        def bind(name: str, node: ast.stmt) -> None:
            base = name.split(".")[0]
            if (base in imports and id(node) not in conditional
                    # `import ctypes` + `import ctypes.util` both bind
                    # `ctypes`: the standard submodule-import idiom.
                    and not (isinstance(node, ast.Import)
                             and any("." in a.name and a.asname is None
                                     for a in node.names))
                    and not _suppressed(lines, node.lineno, "dup-import")):
                out.append((node.lineno, "dup-import", base))
            imports[base] = node

        nested: list[tuple[list[ast.stmt], bool]] = []
        used: set[str] = set()

        class V(ast.NodeVisitor):
            def visit_Import(self, node: ast.Import) -> None:
                for a in node.names:
                    bind(a.asname or a.name, node)

            def visit_ImportFrom(self, node: ast.ImportFrom) -> None:
                for a in node.names:
                    if a.name != "*":
                        bind(a.asname or a.name, node)

            def visit_Name(self, node: ast.Name) -> None:
                if isinstance(node.ctx, ast.Load):
                    used.add(node.id)

            def visit_Attribute(self, node: ast.Attribute) -> None:
                self.generic_visit(node)

            def _func(self, node) -> None:
                nested.append((node.body, False))
                for d in node.decorator_list:
                    self.visit(d)
                for default in list(node.args.defaults) + [
                        d for d in node.args.kw_defaults if d is not None]:
                    self.visit(default)
                for arg in (node.args.args + node.args.posonlyargs
                            + node.args.kwonlyargs):
                    if arg.annotation:
                        self.visit(arg.annotation)
                if node.returns:
                    self.visit(node.returns)

            visit_FunctionDef = _func
            visit_AsyncFunctionDef = _func

        v = V()
        for stmt in body:
            v.visit(stmt)
        # names used anywhere nested also count (closures read outer imports)
        for sub_body, _ in nested:
            for stmt in sub_body:
                for node in ast.walk(stmt):
                    if isinstance(node, ast.Name) and isinstance(node.ctx, ast.Load):
                        used.add(node.id)
        for name, node in imports.items():
            if name in used or name.startswith("_"):
                continue
            if is_module and (is_init or name in dunder_all):
                continue
            if name in ("annotations",):
                continue
            if _suppressed(lines, node.lineno, "unused-import"):
                continue
            out.append((node.lineno, "unused-import", name))
        for sub_body, sub_is_module in nested:
            scan_scope(sub_body, sub_is_module)

    scan_scope(tree.body, True)

    # --- top-level redefinitions ---------------------------------------
    seen: dict[str, int] = {}
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            if node.name in seen and not _suppressed(lines, node.lineno, "redef"):
                out.append((node.lineno, "redef",
                            f"{node.name} (first def line {seen[node.name]})"))
            seen[node.name] = node.lineno

    for node in ast.walk(tree):
        if isinstance(node, ast.ExceptHandler) and node.type is None:
            if not _suppressed(lines, node.lineno, "bare-except"):
                out.append((node.lineno, "bare-except", "use `except Exception:`"))
        if isinstance(node, ast.JoinedStr) and id(node) not in format_specs:
            if not any(isinstance(v, ast.FormattedValue) for v in node.values):
                if not _suppressed(lines, node.lineno, "f-placeholder"):
                    out.append((node.lineno, "f-placeholder",
                                "f-string without placeholders"))
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            for default in node.args.defaults + [
                    d for d in node.args.kw_defaults if d is not None]:
                if isinstance(default, (ast.List, ast.Dict, ast.Set)) or (
                        isinstance(default, ast.Call)
                        and isinstance(default.func, ast.Name)
                        and default.func.id in ("list", "dict", "set")):
                    if not _suppressed(lines, default.lineno, "mutable-default"):
                        out.append((default.lineno, "mutable-default",
                                    f"in {node.name}()"))
    return out


def main(argv: list[str]) -> int:
    roots = argv[1:] or ["opus_tpu", "tools", "tests", "bench.py",
                         "__graft_entry__.py"]
    repo = Path(__file__).resolve().parent.parent
    files: list[Path] = []
    for r in roots:
        p = (repo / r) if not Path(r).is_absolute() else Path(r)
        if p.is_dir():
            files.extend(sorted(p.rglob("*.py")))
        elif p.suffix == ".py":
            files.append(p)
    n_bad = 0
    for f in files:
        for lineno, rule, msg in _walk_file(f):
            print(f"{f.relative_to(repo)}:{lineno}: [{rule}] {msg}")
            n_bad += 1
    print(f"lint: {len(files)} files, {n_bad} findings", file=sys.stderr)
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
