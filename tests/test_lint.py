"""Lint gate (component #12 — the reference's cpplint.py analogue).

Runs tools/qlint.py over the whole tree as part of the suite so style/
dead-code regressions fail CI, not just `make lint`.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_qlint_clean():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "qlint.py")],
        cwd=REPO, capture_output=True, text=True, timeout=120,
    )
    assert proc.returncode == 0, f"lint findings:\n{proc.stdout}"


def test_qlint_detects_violations(tmp_path):
    """The gate must actually fire (not silently pass on everything)."""
    bad = tmp_path / "bad.py"
    bad.write_text(
        "import os\nimport sys as _s\n\n"
        "def f(x=[]):\n    try:\n        pass\n    except:\n        pass\n"
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "qlint.py"),
         str(bad)],
        capture_output=True, text=True, timeout=60,
    )
    assert proc.returncode == 1
    assert "unused import: os" in proc.stdout
    assert "bare except:" in proc.stdout
    assert "mutable default argument" in proc.stdout
