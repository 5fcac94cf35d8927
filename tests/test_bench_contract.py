"""Driver-contract test for bench.py.

The driver runs `python bench.py` and records stdout's single JSON line
(BENCH_r{N}.json). Round-4 verdict #5: the line must be self-describing
on methodology — the subtracted harness baseline (median + per-rep
spread) and the step's rep count/spread — mirroring the reference's
publish-all-runs discipline (/root/reference/README.md:21-30).

Runs the real bench as a subprocess on the CPU backend with a tiny batch
and a zero time budget (skips the batch-1 phase and the mode sweep).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_json_line_is_self_describing():
    env = dict(os.environ, QCNN_BENCH_BUDGET_S="0")
    env.pop("JAX_PLATFORMS", None)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--cpu",
         "--batch", "4", "--k1", "1", "--k2", "3"],
        capture_output=True, text=True, timeout=900, env=env, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
    assert len(lines) == 1, f"driver contract: ONE json line, got {lines}"
    rec = json.loads(lines[0])
    # driver fields
    assert rec["metric"] == "alexnet_pq_images_per_sec"
    assert rec["unit"] == "img/s"
    assert rec["value"] > 0
    assert rec["vs_baseline"] > 0
    # methodology fields (round-4 verdict #5). Spread bounds are RAW
    # per-rep loop differences: under scheduler noise a single rep can
    # go negative (the headline median is clamped separately), so only
    # ordering is asserted — the raw bound is the point of the field.
    assert rec["reps"] >= 3
    lo, hi = rec["step_ms_spread"]
    assert lo <= hi
    blo, bhi = rec["harness_baseline_ms_spread"]
    assert blo <= rec["harness_baseline_ms"] <= bhi
