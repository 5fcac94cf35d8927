#!/usr/bin/env python
"""A/B the one-hot operand dtype in the in-step decode (KERNEL_STUDIES
§9b): at K=128 a materialized bf16 one-hot is 16x the decoded kernel's
bytes, so if XLA materializes it, a narrower dtype (int8) or a fused
compare should win. Measures an isolated ResNet-conv-shaped decode and the
full resnet50 memory-mode step.

    timeout 3000 python tools/onehot_decode_dtype_ab.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    from qcnn_tpu.utils.devtime import time_device_fn

    rng = np.random.default_rng(0)
    print(f"device: {jax.devices()[0]}", file=sys.stderr, flush=True)

    # resnet50 stage2-ish conv: Cout=256, 3x3, Cin=256 -> S=64 (D=4), K=128
    cout, kh, kw, s, k, d = 256, 3, 3, 64, 128, 4
    cb = jnp.asarray(rng.standard_normal((s, k, d)), jnp.bfloat16)
    asmt = jnp.asarray(
        rng.integers(0, k, size=(cout, kh, kw, s)), jnp.uint8
    )

    def decode_onehot(cb, asmt, oh_dtype):
        oh = jax.nn.one_hot(asmt.astype(jnp.int32), k, dtype=oh_dtype)
        w = jnp.einsum("...sk,skd->...sd", oh.astype(cb.dtype), cb)
        return jnp.transpose(
            w.reshape(cout, kh, kw, s * d), (1, 2, 3, 0)
        )

    def decode_iota_compare(cb, asmt):
        # one-hot expressed as a compare against an iota INSIDE the einsum
        # operand; no separate one_hot call (gives XLA the whole producer
        # to fuse into the dot)
        i = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, 1, k), 4)
        oh = (asmt.astype(jnp.int32)[..., None] == i).astype(cb.dtype)
        w = jnp.einsum("...sk,skd->...sd", oh, cb)
        return jnp.transpose(
            w.reshape(cout, kh, kw, s * d), (1, 2, 3, 0)
        )

    # x rides only to thread the timing dependency; decode dominates
    x = jnp.asarray(rng.standard_normal((8, 8)), jnp.float32)

    variants = [
        ("onehot bf16 (shipping)",
         lambda xx, cb, a: decode_onehot(cb, a, jnp.bfloat16).sum() + xx),
        ("onehot int8->cast",
         lambda xx, cb, a: decode_onehot(cb, a, jnp.int8).sum() + xx),
        ("iota-compare fused",
         lambda xx, cb, a: decode_iota_compare(cb, a).sum() + xx),
    ]
    for label, fn in variants:
        t = time_device_fn(fn, x, cb, asmt, perturb_rest=True, k1=4, k2=32)
        print(f"isolated decode {label}: {t*1e6:9.1f} us", flush=True)

    # full resnet50 memory-mode step (shipping formulation baseline)
    from qcnn_tpu.models import resnet as fam

    spec = fam.RESNETS["resnet50"]()
    pq = fam.quantize_params(spec, fam.init_dense_params(spec, seed=0))
    prepared = jax.device_put(
        fam.prepare_params(spec, pq, dtype=jnp.bfloat16, memory=True)
    )
    xb = rng.standard_normal((64, 224, 224, 3)).astype(np.float32)

    def step(x, params):
        return fam.forward(params, x, spec=spec, compute_dtype=jnp.bfloat16)

    t = time_device_fn(step, xb, prepared, k1=2, k2=8)
    print(f"resnet50 memory step: {t*1e3:.3f} ms ({64/t:.0f} img/s)",
          flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
