#!/usr/bin/env python
"""Same-session A/B: f32 vs bf16 materialization in AlexNet blocks 1-2
(round 4, VERDICT item 1 follow-through).

The round-4 HLO attribution (tools/headline_attr.py) showed the headline
program's non-MXU cost concentrated in f32 HBM tensors XLA materializes
between block-1/2 layers: conv outputs written f32 before the bias/convert
fusion (1.16 GB/step across 10 convolution ops) and the LRN band matmul's
f32 window-sum (297 MB at conv1 shape). This measures the prefix
conv1..pool2 both ways (old: conv out_dtype=None + astype, lrn
sum_dtype=None; new: both bf16 — what network.forward now passes), the new
full step, and the bf16-vs-f32 numerics of the full forward.

    timeout 1500 python tools/block1_bf16_ab.py
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

    from qcnn_tpu.models import network, synth, zoo
    from qcnn_tpu.models.loader import load_alexnet_reference
    from qcnn_tpu.models.prepare import prepare_params
    from qcnn_tpu.ops import caffe_max_pool, conv_dense, lrn, relu
    from qcnn_tpu.utils.devtime import time_device_fn

    spec = zoo.alexnet()
    try:
        params = load_alexnet_reference(synthesize_missing=True).params
    except (FileNotFoundError, OSError):
        params = synth.random_pq_params(spec, seed=0)
    prep, ci, fi = prepare_params(spec, params, batch_hint=256,
                                  dtype=jnp.bfloat16)
    prep = jax.device_put(prep)
    x = jnp.asarray(synth.random_input(spec, 256, seed=1), jnp.bfloat16)

    conv1, conv2 = spec.layers[0], spec.layers[4]

    def prefix(out_dtype, sum_dtype):
        def fn(x, prep):
            y = conv_dense(x, prep[0]["kernel"], prep[0]["bias"], stride=4,
                           pad=0, out_dtype=out_dtype)
            y = relu(y.astype(jnp.bfloat16))
            y = lrn(y, size=5, alpha=1e-4, beta=0.75, k=1.0,
                    sum_dtype=sum_dtype)
            y = caffe_max_pool(y, kernel=3, stride=2)
            y = conv_dense(y, prep[4]["kernel"], prep[4]["bias"], stride=1,
                           pad=2, groups=2, out_dtype=out_dtype)
            y = relu(y.astype(jnp.bfloat16))
            y = lrn(y, size=5, alpha=1e-4, beta=0.75, k=1.0,
                    sum_dtype=sum_dtype)
            return caffe_max_pool(y, kernel=3, stride=2)

        return fn

    def baseline():
        return time_device_fn(lambda v, *_: v, x, k1=4, k2=20, reps=5)

    base = baseline()
    log(f"identity baseline (256,227,227,3) bf16: {base*1e3:.3f} ms")

    old = time_device_fn(prefix(None, None), x, prep, k1=4, k2=20, reps=5)
    new = time_device_fn(prefix(jnp.bfloat16, jnp.bfloat16), x, prep,
                         k1=4, k2=20, reps=5)
    print(f"prefix conv1..pool2  f32-materialized: {(old-base)*1e3:7.3f} ms")
    print(f"prefix conv1..pool2 bf16-materialized: {(new-base)*1e3:7.3f} ms")

    # numerics: prefixes against each other, then full forward bf16 vs f32
    pa = jax.jit(prefix(None, None))(x, prep)
    pb = jax.jit(prefix(jnp.bfloat16, jnp.bfloat16))(x, prep)
    d = np.abs(np.asarray(pa, np.float32) - np.asarray(pb, np.float32))
    ref = np.abs(np.asarray(pa, np.float32)).max()
    print(f"prefix max abs diff: {d.max():.3e} (max |act| {ref:.3e})")

    def step(x, prep):
        return network.forward(prep, x, spec=spec, conv_impls=ci,
                               fc_impls=fi, compute_dtype=jnp.bfloat16)

    t = time_device_fn(step, x, prep, k1=4, k2=20, reps=5)
    print(f"full step bf16 input, new defaults: {(t-base)*1e3:7.3f} ms "
          f"-> {256/(t-base):8.1f} img/s (harness-subtracted)")
    print(f"  unsubtracted: {t*1e3:7.3f} ms -> {256/t:8.1f} img/s")

    # bf16 numerics vs the f32 forward (exact reference), small batch
    prep32, ci32, fi32 = prepare_params(spec, params, batch_hint=16,
                                        dtype=jnp.float32)
    prep32 = jax.device_put(prep32)
    xs = jnp.asarray(synth.random_input(spec, 16, seed=7))
    p32 = np.asarray(jax.jit(
        lambda x, p: network.forward(p, x, spec=spec, conv_impls=ci32,
                                     fc_impls=fi32,
                                     compute_dtype=jnp.float32)
    )(xs, prep32))
    p16 = np.asarray(jax.jit(step)(xs.astype(jnp.bfloat16), prep))
    print(f"bf16-vs-f32 max |dprob|: {np.abs(p16 - p32).max():.3e}; "
          f"top-1 agreement: "
          f"{(p16.argmax(1) == p32.argmax(1)).mean():.3f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
