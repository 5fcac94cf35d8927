#!/usr/bin/env python
"""qlint — the repo's lint gate (component #12; the reference vendors
cpplint.py, /root/reference/cpplint.py, as its only dev tooling — this is
the equivalent single-file checker, written for this repo since no external
linter ships in the offline environment).

Checks (Python, via AST + text):
  - syntax errors
  - unused imports (module scope)
  - bare `except:`
  - mutable default arguments
  - f-strings with no placeholders
  - trailing whitespace, tab indentation, overlong lines

Checks (C++ .cc/.h, text only):
  - trailing whitespace, tab indentation, overlong lines

Usage: python tools/qlint.py [paths...]   (default: qcnn_tpu tests tools
bench.py __graft_entry__.py). Exits 1 on any finding.
"""

from __future__ import annotations

import ast
import os
import re
import sys

MAX_LINE = 100
DEFAULT_TARGETS = (
    "qcnn_tpu", "tests", "tools", "benchmarks", "bench.py",
    "__graft_entry__.py",
)


def iter_files(targets):
    for t in targets:
        if os.path.isfile(t):
            yield t
        else:
            for root, dirs, files in os.walk(t):
                dirs[:] = [
                    d for d in dirs
                    if d not in ("__pycache__", ".pytest_cache")
                ]
                for f in files:
                    if f.endswith((".py", ".cc", ".h")):
                        yield os.path.join(root, f)


class ImportTracker(ast.NodeVisitor):
    def __init__(self):
        self.imports: dict[str, tuple[int, str]] = {}
        self.used: set[str] = set()

    def visit_Import(self, node):
        for a in node.names:
            name = (a.asname or a.name).split(".")[0]
            self.imports[name] = (node.lineno, a.name)

    def visit_ImportFrom(self, node):
        for a in node.names:
            if a.name == "*":
                continue
            self.imports[a.asname or a.name] = (node.lineno, a.name)

    def visit_Name(self, node):
        self.used.add(node.id)


def check_python(path: str, src: str, findings: list):
    try:
        tree = ast.parse(src, path)
    except SyntaxError as e:
        findings.append((path, e.lineno or 0, f"syntax error: {e.msg}"))
        return

    # __init__.py imports are the package API (re-exports), not dead code
    if os.path.basename(path) != "__init__.py":
        tracker = ImportTracker()
        tracker.visit(tree)
        # textual fallback for __all__, string annotations, docstring
        # references: used if the name appears on a NON-import line
        # (counting import lines let duplicate imports mask each other).
        # Import spans come from the AST, not a first-line regex: a
        # parenthesized multi-line import's continuation lines otherwise
        # survive the filter and mask every imported name (round-5
        # review: the gate was blind to dead names in multi-line
        # imports, which this repo uses pervasively)
        import_lines: set[int] = set()
        for node in ast.walk(tree):
            if isinstance(node, (ast.Import, ast.ImportFrom)):
                import_lines.update(range(
                    node.lineno, (node.end_lineno or node.lineno) + 1))
        non_import_src = "\n".join(
            ln for i, ln in enumerate(src.splitlines(), 1)
            if i not in import_lines
        )
        for name, (lineno, full) in tracker.imports.items():
            if name in tracker.used or name.startswith("_"):
                continue
            if full == "annotations":  # from __future__ import annotations
                continue
            if re.search(rf"\b{re.escape(name)}\b", non_import_src):
                continue
            findings.append((path, lineno, f"unused import: {full}"))

    # format_spec of an f-string placeholder is itself a JoinedStr; don't
    # flag those as placeholder-less f-strings
    spec_ids = {
        id(node.format_spec)
        for node in ast.walk(tree)
        if isinstance(node, ast.FormattedValue) and node.format_spec
    }
    for node in ast.walk(tree):
        if isinstance(node, ast.ExceptHandler) and node.type is None:
            findings.append((path, node.lineno, "bare except:"))
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            for d in node.args.defaults + node.args.kw_defaults:
                if isinstance(d, (ast.List, ast.Dict, ast.Set)):
                    findings.append(
                        (path, d.lineno, "mutable default argument")
                    )
        if isinstance(node, ast.JoinedStr) and id(node) not in spec_ids:
            if not any(
                isinstance(v, ast.FormattedValue) for v in node.values
            ):
                findings.append(
                    (path, node.lineno, "f-string without placeholders")
                )


def check_text(path: str, src: str, findings: list):
    for i, line in enumerate(src.splitlines(), 1):
        if line.rstrip("\n") != line.rstrip():
            findings.append((path, i, "trailing whitespace"))
        indent = line[: len(line) - len(line.lstrip())]
        if "\t" in indent:
            findings.append((path, i, "tab indentation"))
        if len(line) > MAX_LINE:
            findings.append((path, i, f"line too long ({len(line)})"))


def main(argv) -> int:
    if argv[1:]:
        missing = [t for t in argv[1:] if not os.path.exists(t)]
        if missing:
            print(f"qlint: no such target(s): {missing}", file=sys.stderr)
            return 2
        targets = argv[1:]
    else:
        targets = [t for t in DEFAULT_TARGETS if os.path.exists(t)]
        if not targets:
            print("qlint: none of the default targets exist here (run from "
                  "the repo root)", file=sys.stderr)
            return 2
    findings: list[tuple[str, int, str]] = []
    n_files = 0
    for path in sorted(set(iter_files(targets))):
        n_files += 1
        with open(path, encoding="utf-8") as f:
            src = f.read()
        if path.endswith(".py"):
            check_python(path, src, findings)
        check_text(path, src, findings)
    for path, line, msg in sorted(findings):
        print(f"{path}:{line}: {msg}")
    print(
        f"qlint: {n_files} files, {len(findings)} finding(s)",
        file=sys.stderr,
    )
    return 1 if findings else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
