#!/usr/bin/env python
"""ViT-B/16 throughput vs batch size — pick the serving default.

Round-2 ROADMAP item: batch 32 measured 2,996 img/s vs 2,177 at batch 64 in
ad-hoc runs; sweep batches under identical methodology (devtime on-device
loops) and record the curve. Results go to docs/KERNEL_STUDIES.md §11.

    timeout 3000 python tools/vit_batch_sweep.py [--model vit_b16]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="vit_b16")
    ap.add_argument("--batch", type=int, nargs="+",
                    default=[8, 16, 32, 64, 128])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from qcnn_tpu.utils.devtime import time_device_fn

    if args.model.startswith("resnet"):
        from qcnn_tpu.models import resnet as fam

        spec = fam.RESNETS[args.model]()
        size = spec.in_size
    else:
        from qcnn_tpu.models import vit as fam

        spec = fam.VITS[args.model]()
        size = spec.image_size
    pq = fam.quantize_params(spec, fam.init_dense_params(spec, seed=0))
    prepared = jax.device_put(
        fam.prepare_params(spec, pq, dtype=jnp.bfloat16)
    )
    rng = np.random.default_rng(1)
    print(f"device: {jax.devices()[0]}", file=sys.stderr, flush=True)
    print(f"{args.model} bf16: batch  ms/step  img/s  "
          "(bf16 input, harness-baseline-subtracted — bench.py methodology)")
    for b in args.batch:
        x = jnp.asarray(
            rng.standard_normal((b, size, size, 3)), jnp.bfloat16)

        def step(x, params):
            return fam.forward(
                params, x, spec=spec, compute_dtype=jnp.bfloat16
            )

        base = time_device_fn(lambda v, *_: v[(slice(0, 1),) * v.ndim], x, k1=2, k2=10, reps=3)
        t = max(time_device_fn(step, x, prepared) - base, 1e-9)
        print(f"{b:5d}  {t*1e3:8.3f}  {b/t:8.1f}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
