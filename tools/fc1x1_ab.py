#!/usr/bin/env python
"""A/B: memory-mode 1x1 convs as FC fused-gather vs one-hot decode.

The remaining resnet memory-mode gap after the fused multi-tap kernel
(KERNEL_STUDIES §16b) lives in the 1x1 convs' one-hot decodes. A 1x1
conv is exactly an FC over the flattened spatial batch, and the fc
fused-gather kernel (in-kernel decode + GEMM) is the measured memory-mode
winner at FC geometries — so route 1x1 convs through it ('fc1x1',
ops/conv.py) and measure at the real stage3 shapes.

    timeout 1800 python tools/fc1x1_ab.py
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

    from qcnn_tpu.ops.conv import pq_conv
    from qcnn_tpu.utils.devtime import time_device_fn

    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    b = 64
    # the three stage3-class 1x1 geometries (resnet50 b64):
    #   reduce 1024->512 @14x14 (stage3 conv1), expand 512->2048 @7x7,
    #   reduce 2048->512 @7x7
    geoms = [
        ("reduce14", 14, 1024, 512),
        ("expand7", 7, 512, 2048),
        ("reduce7", 7, 2048, 512),
    ]
    for name, hw, cin, cout in geoms:
        d = 4
        s = cin // d
        cb = (rng.standard_normal((s, 128, d)) * 0.1).astype(np.float32)
        a = rng.integers(0, 128, size=(cout, 1, 1, s), dtype=np.uint8)
        p = {"codebooks": jnp.asarray(cb), "assignments": jnp.asarray(a),
             "bias": jnp.asarray(rng.standard_normal(cout), jnp.float32)}
        x = jnp.asarray(rng.standard_normal((b, hw, hw, cin)), jnp.bfloat16)
        want = np.asarray(pq_conv(x, p, stride=1, pad=0,
                                  impl="indecode_ohwi"))
        got = np.asarray(pq_conv(x, p, stride=1, pad=0, impl="fc1x1"))
        rel = np.abs(got - want).max() / max(np.abs(want).max(), 1e-9)
        log(f"parity {name}: max rel {rel:.3e}")
        assert rel < 2e-2, rel
        bl = time_device_fn(lambda v, *_: v[(slice(0, 1),) * v.ndim], x,
                            k1=4, k2=20, reps=5)
        rows = []
        for impl in ("indecode_ohwi", "fc1x1"):
            t = time_device_fn(
                lambda v, pp, impl=impl: pq_conv(v, pp, stride=1, pad=0,
                                                 impl=impl),
                x, p, k1=4, k2=20, reps=5, perturb_rest=True,
            ) - bl
            rows.append((impl, t))
            print(f"{name:10s} {impl:14s} {t*1e6:9.1f} us", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
