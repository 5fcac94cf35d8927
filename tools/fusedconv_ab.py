#!/usr/bin/env python
"""The §9f end-run, measured (round-4 verdict item 3): fused in-kernel
decode-conv vs the shipping one-hot in-step decode vs dense.

Stage3 conv2 geometry (the relayout hotspot: 3x3, 512->512 at 7x7,
K=128/D=4), isolated; then the full stage3 prefix; then end-to-end
resnet50 memory mode with stride-1 3x3 convs routed to the fused kernel.

    timeout 1500 python tools/fusedconv_ab.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> int:
    import jax
    import jax.numpy as jnp

    from qcnn_tpu.models import common, resnet
    from qcnn_tpu.ops.conv import pq_conv
    from qcnn_tpu.utils.devtime import time_device_fn

    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)

    # --- isolated stage3 conv2 geometry -------------------------------
    b, h, w, cin, cout, k_taps = 64, 7, 7, 512, 512, 3
    s, k, d = 128, 128, 4
    x = jnp.asarray(rng.standard_normal((b, h, w, cin)), jnp.bfloat16)
    params = {
        "codebooks": jnp.asarray(
            rng.standard_normal((s, k, d)) * 0.1, jnp.bfloat16),
        "assignments": rng.integers(
            0, k, size=(cout, k_taps, k_taps, s)).astype(np.uint8),
        "bias": rng.standard_normal(cout).astype(np.float32),
    }
    params = jax.device_put(params)
    base = time_device_fn(lambda v, *_: v, x, k1=4, k2=20, reps=3)

    outs = {}
    for impl in ("fusedconv", "indecode_ohwi", "decode"):
        def fn(x, p, impl=impl):
            return pq_conv(x, p, stride=1, pad=1, impl=impl,
                           out_dtype=jnp.bfloat16)

        try:
            outs[impl] = np.asarray(jax.jit(fn)(x, params), np.float32)
            t = time_device_fn(fn, x, params, k1=4, k2=20, reps=3) - base
            print(f"isolated conv2 {impl:14s}: {t*1e6:9.1f} us", flush=True)
        except Exception as e:  # noqa: BLE001 - record compile failures
            print(f"isolated conv2 {impl:14s}: FAILED {str(e)[:200]}",
                  flush=True)
    if "fusedconv" in outs and "decode" in outs:
        err = np.abs(outs["fusedconv"] - outs["decode"]).max()
        ref = np.abs(outs["decode"]).max()
        print(f"fusedconv vs decode max abs err: {err:.3e} "
              f"(max |y| {ref:.3e})", flush=True)

    # --- end-to-end resnet50 memory mode ------------------------------
    spec = resnet.resnet50()
    pq = resnet.quantize_params(spec, resnet.init_dense_params(spec, seed=0))
    mem = jax.device_put(
        resnet.prepare_params(spec, pq, dtype=jnp.bfloat16, memory=True))
    xr = jnp.asarray(rng.standard_normal((64, 224, 224, 3)), jnp.bfloat16)
    base_r = time_device_fn(lambda v, *_: v, xr, k1=2, k2=10, reps=3)

    def step(x, p):
        return resnet.forward(p, x, spec=spec, compute_dtype=jnp.bfloat16)

    for impl in ("indecode_ohwi", "fusedconv_mix"):
        common.MEMORY_IMPL = (
            "indecode_ohwi" if impl == "indecode_ohwi" else "memory_fused")
        try:
            t = time_device_fn(step, xr, mem, k1=2, k2=10, reps=3) - base_r
            print(f"resnet50 b64 memory {impl:16s}: {t*1e3:8.3f} ms "
                  f"({64/t:8.1f} img/s)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"resnet50 b64 memory {impl:16s}: FAILED {str(e)[:200]}",
                  flush=True)
    common.MEMORY_IMPL = "memory_fused"  # the shipped default (round 4)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
