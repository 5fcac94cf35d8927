#!/usr/bin/env python
"""Interleaved A/B: serial vs striped parallel batch assembly (round 5).

Same-process alternating drains of the stub engine (the §12c measurement
discipline — host throughput varies run to run, only interleaved arms
are comparable). Arms toggle the assembly pool width via _asm_workers:
1 = the round-4 serial assembly, N = the striped pool. The 2-slot
pipeline, buffers, and formation FIFO are identical in both arms.

    python tools/asm_parallel_ab.py   # CPU only, no chip needed
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> int:
    from qcnn_tpu.serve.engine import EngineConfig
    from tools.engine_inproc_bench import drain, make_stub_engine

    shape = (227, 227, 3)
    cfg = EngineConfig(max_batch=64, max_wait_ms=2.0)
    rng = np.random.default_rng(0)
    image = rng.standard_normal(shape).astype(np.float32)
    n_req = 6000
    step_s = 1.31e-3  # measured AlexNet bf16 b64 step (engine_inproc_r5)

    def model(b):
        return 0.3e-3 + (step_s - 0.3e-3) * b / 64

    import ml_dtypes

    results: dict[str, list[float]] = {}
    workers_wide = max(1, min(8, (os.cpu_count() or 2) - 1))
    for rnd in range(3):
        for name, workers, fwd, dtype in (
            ("serial zero-cost", 1, lambda b: 0.0, np.float32),
            ("striped zero-cost", workers_wide, lambda b: 0.0, np.float32),
            ("serial device-model", 1, model, np.float32),
            ("striped device-model", workers_wide, model, np.float32),
            # bf16 upload = the REAL engine's byte stream (submit-time
            # cast halves the copy): the honest device-local ceiling
            ("striped bf16 device-model", workers_wide, model,
             ml_dtypes.bfloat16),
        ):
            eng = make_stub_engine(cfg, shape, 1000, fwd)
            eng._upload_dtype = dtype
            eng._asm_workers = workers
            r = drain(eng, image, n_req)
            eng.stop()
            results.setdefault(name, []).append(r["img_per_s"])
            nb = max(eng.stats["batches"], 1)
            stages = "  ".join(
                f"{k}={v/nb:.2f}" for k, v in
                eng.stats["stage_ms"].items())
            log(f"round {rnd} {name}: {r['img_per_s']:.0f} img/s  "
                f"[ms/batch: {stages}]")
            results.setdefault(name + " stages", []).append(stages)
    for name, vals in results.items():
        if name.endswith(" stages"):
            print(f"{name:28s} {vals[-1]}", flush=True)
        else:
            print(f"{name:28s} {min(vals):8.0f} - {max(vals):8.0f} img/s "
                  f"(median {sorted(vals)[len(vals)//2]:8.0f})", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
