#!/usr/bin/env python
"""Same-session e2e A/B for the 'memory_fused' conv arm (round 4):
alexnet full-memory batch-256 and batch-1, resnet50 b64 (KERNEL_STUDIES
§16b). Decides the default memory conv impl per family.

    timeout 3000 python tools/memory_fused_e2e_ab.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))



def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> int:
    import jax
    import jax.numpy as jnp

    from qcnn_tpu.models import network, synth, zoo
    from qcnn_tpu.models.loader import load_alexnet_reference
    from qcnn_tpu.models.prepare import prepare_params
    from qcnn_tpu.utils.devtime import time_device_fn

    log(f"devices: {jax.devices()}")
    spec = zoo.alexnet()
    try:
        params = load_alexnet_reference(synthesize_missing=True).params
    except (FileNotFoundError, OSError):
        params = synth.random_pq_params(spec, seed=0)

    for batch in (256, 1):
        x = jnp.asarray(synth.random_input(spec, batch, seed=1),
                        jnp.bfloat16)
        base = time_device_fn(lambda v, *_: v, x, k1=4, k2=20, reps=3)
        for conv_impl in ("memory", "memory_fused"):
            prep, ci, fi = prepare_params(
                spec, params, batch_hint=batch,
                conv_impl=conv_impl, fc_impl="memory", dtype=jnp.bfloat16)
            prep = jax.device_put(prep)

            def step(x, p, ci=ci, fi=fi):
                return network.forward(p, x, spec=spec, conv_impls=ci,
                                       fc_impls=fi,
                                       compute_dtype=jnp.bfloat16)

            t = time_device_fn(step, x, prep, k1=4, k2=20, reps=3) - base
            unit = (f"{batch/t:9.1f} img/s" if batch > 1
                    else f"{t*1e3:7.3f} ms/img")
            print(f"alexnet full-memory b{batch:<4d} conv={conv_impl:13s}: "
                  f"{t*1e3:8.3f} ms  {unit}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
