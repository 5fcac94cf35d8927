"""Docs cite measurement artifacts; the artifacts must exist.

Round-4 verdict weak #1: a production routing rule shipped with a code
comment citing `tools/out/fc1x1_ab.txt` — which did not exist in the
repo. This guard scans every `tools/out/...` citation in the docs,
CLAUDE.md, README, and the package sources and asserts the file (or, for
`*`-glob citations, at least one match) is present, so a claim can never
again point at evidence that is not checked in.
"""

from __future__ import annotations

import glob
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CITE = re.compile(r"tools/out/[A-Za-z0-9_.\-*]+")


def _cited_paths():
    sources = []
    for root in ("docs", "qcnn_tpu"):
        for dirpath, _, names in os.walk(os.path.join(REPO, root)):
            sources += [os.path.join(dirpath, n) for n in names
                        if n.endswith((".md", ".py"))]
    sources += [os.path.join(REPO, n) for n in ("CLAUDE.md", "README.md",
                                                "bench.py")]
    cites = {}
    for path in sources:
        try:
            text = open(path, encoding="utf-8").read()
        except OSError:
            continue
        for m in _CITE.finditer(text):
            # strip trailing punctuation a sentence may append
            cite = m.group(0).rstrip(".-_")
            cites.setdefault(cite, []).append(os.path.relpath(path, REPO))
    return cites


def test_cited_artifacts_exist():
    missing = []
    for cite, where in sorted(_cited_paths().items()):
        pattern = os.path.join(REPO, cite)
        if "*" in cite:
            ok = bool(glob.glob(pattern))
        else:
            ok = os.path.exists(pattern) or bool(glob.glob(pattern + "*"))
        if not ok:
            missing.append(f"{cite} (cited in {sorted(set(where))})")
    assert not missing, (
        "docs cite artifacts that are not in the repo:\n  "
        + "\n  ".join(missing)
    )
