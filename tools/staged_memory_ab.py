#!/usr/bin/env python
"""Staged two-program memory mode (KERNEL_STUDIES §9f).

One-program in-step decode pays ~2.5 ms/step on resnet50 regardless of
decode formulation (§9e) — the conv's computed-weight handling. This
probes the alternative: per step, run a DECODE program (compressed params
-> dense tree, ~0.2 ms gather) and then the ordinary dense step with the
decoded tree as arguments. Resident HBM between steps stays compressed;
the dense copy lives only across the two dispatches.

Timing: the devtime loop cannot span two jits, so this uses a chained
multi-dispatch walk — iteration i+1's input depends on iteration i's
output scalar, so the final fetch fences the whole chain — and differences
two chain lengths (same RTT-cancelling idea as utils/devtime.py).

    timeout 1500 python tools/staged_memory_ab.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    from qcnn_tpu.models import resnet as fam
    from qcnn_tpu.ops.pallas import (
        decode_conv_kernel_gather, decode_fc_weight_gather,
    )

    spec = fam.RESNETS["resnet50"]()
    pq = fam.quantize_params(spec, fam.init_dense_params(spec, seed=0))
    mem = jax.device_put(
        fam.prepare_params(spec, pq, dtype=jnp.bfloat16, memory=True))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((64, 224, 224, 3)), jnp.bfloat16)

    def decode_leaf(p):
        if not (isinstance(p, dict) and "codebooks" in p):
            return p
        if "assignments" in p and p["assignments"].ndim == 4:
            cg = p["codebooks"].shape[0] * p["codebooks"].shape[2]
            k = decode_conv_kernel_gather(
                p["codebooks"], p["assignments"], cg)
            return {"kernel": k.astype(jnp.bfloat16), "bias": p["bias"]}
        cin = p["codebooks"].shape[0] * p["codebooks"].shape[2]
        w = decode_fc_weight_gather(p["codebooks"], p["assignments"], cin)
        return {"weight": w.astype(jnp.bfloat16), "bias": p["bias"]}

    @jax.jit
    def decode_all(ps):
        return {k: ({n: decode_leaf(v) for n, v in b.items()}
                    if isinstance(b, dict) and "codebooks" not in b
                    else decode_leaf(b))
                for k, b in ps.items()}

    @jax.jit
    def fwd(dense, xx):
        y = fam.forward(dense, xx, spec=spec, compute_dtype=jnp.bfloat16)
        return jnp.sum(y).astype(jnp.float32)

    def chain(iters: int) -> float:
        s = jnp.float32(0.0)
        t0 = time.perf_counter()
        for _ in range(iters):
            dense = decode_all(mem)
            s = fwd(dense, x + (s * jnp.float32(1e-30)).astype(x.dtype))
        float(s)  # fence: the scalar depends on every dispatched program
        return time.perf_counter() - t0

    chain(2)  # compile + warm both programs
    k1, k2 = 4, 16
    diffs = []
    for _ in range(3):
        t1 = chain(k1)
        t2 = chain(k2)
        diffs.append((t2 - t1) / (k2 - k1))
    per = float(np.median(diffs))
    print(f"staged memory (decode-jit + dense-jit) resnet50 b64: "
          f"{per*1e3:.3f} ms/step ({64/per:.0f} img/s)", flush=True)

    # control: same chained-dispatch methodology on the plain dense step,
    # so dispatch overhead is comparable
    dense0 = jax.device_put(fam.prepare_params(spec, pq,
                                               dtype=jnp.bfloat16))

    def chain_dense(iters: int) -> float:
        s = jnp.float32(0.0)
        t0 = time.perf_counter()
        for _ in range(iters):
            s = fwd(dense0, x + (s * jnp.float32(1e-30)).astype(x.dtype))
        float(s)
        return time.perf_counter() - t0

    chain_dense(2)
    diffs = []
    for _ in range(3):
        diffs.append((chain_dense(k2) - chain_dense(k1)) / (k2 - k1))
    per_d = float(np.median(diffs))
    print(f"dense control (same chained methodology)    : "
          f"{per_d*1e3:.3f} ms/step ({64/per_d:.0f} img/s)", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
