#!/usr/bin/env python
"""Isolate the resnet50 stage3 memory-mode anomaly (KERNEL_STUDIES §9e).

Stage3 (7x7 spatial, 512/2048 channels, ~15M weights) runs 0.74 ms dense
but 3.1-3.4 ms with in-step decode, regardless of decode formulation —
while the isolated decode cost models to <=1.5 ms (onehot) / ~0.15 ms
(gather). This probe times, on one jitted stage3-only program:

  dense          — decoded weights passed as program arguments
  indecode       — one-hot decode in-step
  indecode_ohwi  — one-hot decode, native layout
  gdecode_iohw   — Pallas gather decode, native layout
  decode-only    — the gather/onehot decodes alone (no convs)

    timeout 1500 python tools/stage3_memory_probe.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    from qcnn_tpu.models import common, resnet
    from qcnn_tpu.utils.devtime import time_device_fn

    spec = resnet.resnet50()
    dense = resnet.init_dense_params(spec, seed=0)
    pq = resnet.quantize_params(spec, dense)
    mem = resnet.prepare_params(spec, pq, dtype=jnp.bfloat16, memory=True)
    dec = resnet.prepare_params(spec, pq, dtype=jnp.bfloat16)

    s3_keys = [k for k in mem if k.startswith("s3")]
    print(f"stage3 blocks: {s3_keys}", file=sys.stderr, flush=True)
    rng = np.random.default_rng(0)
    # stage3 input: (64, 14, 14, 1024), first block strides to 7x7
    x = jnp.asarray(rng.standard_normal((64, 14, 14, 1024)), jnp.bfloat16)

    def stage3(params_subset):
        def fn(xx, ps):
            y = xx
            for i, k in enumerate(s3_keys):
                stride = 2 if i == 0 else 1
                y = resnet._run_block(
                    y, ps[k], stride, True,
                    lambda v: v.astype(jnp.bfloat16))
            return y
        return fn

    mem3 = jax.device_put({k: mem[k] for k in s3_keys})
    dec3 = jax.device_put({k: dec[k] for k in s3_keys})

    t = time_device_fn(stage3(dec3), x, dec3, k1=4, k2=20)
    print(f"stage3 dense           : {t*1e3:7.3f} ms", flush=True)

    # computed-weight control: same dense convs, but every kernel is
    # multiplied by a per-iteration traced scalar (~1.0) so XLA treats the
    # weights as COMPUTED values (no parameter pre-layout, no hoisting).
    # If this alone reproduces the ~3 ms, the memory-mode gap is the
    # computed-weight conv penalty, not decode arithmetic.
    def stage3_computed(xx, ps):
        one = 1.0 + jnp.float32(1e-30) * xx[0, 0, 0, 0].astype(jnp.float32)

        def mul(p):
            if isinstance(p, dict) and "kernel" in p:
                q = dict(p)
                q["kernel"] = (p["kernel"].astype(jnp.float32) * one
                               ).astype(p["kernel"].dtype)
                return q
            return p

        ps2 = {k: {n: mul(v) for n, v in b.items()} if isinstance(b, dict)
               else b for k, b in ps.items()}
        return stage3(ps2)(xx, ps2)

    t = time_device_fn(stage3_computed, x, dec3, k1=4, k2=20)
    print(f"stage3 dense-computed  : {t*1e3:7.3f} ms", flush=True)
    saved_impl = common.MEMORY_IMPL
    for impl in ("indecode", "indecode_ohwi", "gdecode", "gdecode_iohw"):
        common.MEMORY_IMPL = impl
        t = time_device_fn(stage3(mem3), x, mem3, k1=4, k2=20)
        print(f"stage3 {impl:15s}: {t*1e3:7.3f} ms", flush=True)
    common.MEMORY_IMPL = saved_impl  # restore the SHIPPED default (round-5 review)

    # decode-only: every stage3 conv weight, summed (perturb so nothing
    # hoists); small x rides along for the devtime contract
    from qcnn_tpu.ops import lut as lut_ops
    from qcnn_tpu.ops.pallas import decode_conv_kernel_gather

    convs, cgs = [], []
    for k in s3_keys:
        for name, p in mem3[k].items():
            if isinstance(p, dict) and "codebooks" in p:
                cgs.append(  # static: jit must not trace the slice bound
                    p["codebooks"].shape[0] * p["codebooks"].shape[2])
                convs.append((p["codebooks"], p["assignments"]))
    xs = jnp.asarray(rng.standard_normal((8, 8)), jnp.float32)

    def decode_all_onehot(xx, cs):
        acc = 0.0
        for (cb, a), cg in zip(cs, cgs):
            acc += lut_ops.decode_conv_kernel_onehot(
                cb, a, cg, layout="ohwi").astype(jnp.float32).sum()
        return acc + xx.sum()

    def decode_all_gather(xx, cs):
        acc = 0.0
        for (cb, a), cg in zip(cs, cgs):
            acc += decode_conv_kernel_gather(
                cb, a, cg, layout="iohw").astype(jnp.float32).sum()
        return acc + xx.sum()

    for label, fn in (("onehot", decode_all_onehot),
                      ("gather", decode_all_gather)):
        t = time_device_fn(fn, xs, convs, perturb_rest=True, k1=4, k2=20)
        print(f"stage3 decode-only {label}: {t*1e3:7.3f} ms", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
