#!/usr/bin/env python
"""A/B: AlexNet conv1 as-is vs space-to-depth reformulation (round 4).

The round-4 headline attribution (tools/out/headline_attr_r4b_report.txt)
ranks conv1 second (1.73M est. cycles, ~16.5% of per-iteration cost): an
11x11 stride-4 conv on THREE input channels keeps the MXU at single-digit
lane utilization. The classic TPU fix is space-to-depth: pack each 4x4
spatial block into channels, turning the stem into a 3x3 stride-1 conv on
48 channels (the kernel zero-pads 11 -> 12 = 3 taps x stride 4):

    x  [B,227,227,3] -> pad to 228 -> [B,57,57,48]   (di,dj,c) packing
    w  [11,11,3,96]  -> pad to 12x12 -> [3,3,48,96]
    conv(x', w', stride 1, VALID) == conv(x, w, stride 4, VALID)

Three arms: (a) baseline 11x11 s4; (b) s2d with the input packing inside
the jitted program; (c) s2d with the packing done on the host (what the
preprocessor would ship — serving can emit this layout directly).

    timeout 1500 python tools/conv1_s2d_ab.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def s2d_kernel(w: np.ndarray, stride: int = 4) -> np.ndarray:
    """[kh,kw,cin,cout] -> [kh',kw',cin*stride^2,cout], kh' = ceil(kh/s)."""
    kh, kw, cin, cout = w.shape
    khp = -(-kh // stride) * stride
    wp = np.zeros((khp, khp, cin, cout), w.dtype)
    wp[:kh, :kw] = w
    # [ti,di,tj,dj,c,o] -> taps (ti,tj), packed channel (di,dj,c)
    wp = wp.reshape(khp // stride, stride, khp // stride, stride, cin, cout)
    wp = wp.transpose(0, 2, 1, 3, 4, 5)
    return wp.reshape(khp // stride, khp // stride,
                      stride * stride * cin, cout)


def s2d_input(x, stride: int = 4):
    """[B,H,W,C] -> [B,H/s,W/s,s*s*C] (pads H,W up to a multiple of s)."""
    import jax.numpy as jnp

    b, h, w, c = x.shape
    hp = -(-h // stride) * stride
    xp = jnp.pad(x, ((0, 0), (0, hp - h), (0, hp - w), (0, 0)))
    xp = xp.reshape(b, hp // stride, stride, hp // stride, stride, c)
    xp = xp.transpose(0, 1, 3, 2, 4, 5)
    return xp.reshape(b, hp // stride, hp // stride, stride * stride * c)


def main() -> int:
    import jax
    import jax.numpy as jnp

    from qcnn_tpu.utils.devtime import time_device_fn

    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    b = 256
    x32 = rng.standard_normal((b, 227, 227, 3)).astype(np.float32)
    w = (rng.standard_normal((11, 11, 3, 96)) * 0.05).astype(np.float32)
    bias = rng.standard_normal(96).astype(np.float32)

    x = jnp.asarray(x32, jnp.bfloat16)
    wd = jnp.asarray(w, jnp.bfloat16)
    ws = jnp.asarray(s2d_kernel(w), jnp.bfloat16)
    bias_j = jnp.asarray(bias, jnp.bfloat16)
    x_s2d = jax.device_put(np.asarray(s2d_input(jnp.asarray(x32), 4),
                                      np.float32).astype(np.float32))
    x_s2d = jnp.asarray(x_s2d, jnp.bfloat16)

    def conv(xx, ww, stride):
        out = jax.lax.conv_general_dilated(
            xx, ww, (stride, stride), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.bfloat16,
        )
        return out + bias_j

    def arm_base(xx, ww):
        return conv(xx, ww, 4)

    def arm_s2d_ingraph(xx, ww):
        return conv(s2d_input(xx, 4), ww, 1)

    def arm_s2d_pre(xx, ww):
        return conv(xx, ww, 1)

    # parity first
    want = np.asarray(arm_base(x, wd), np.float32)
    got_b = np.asarray(arm_s2d_ingraph(x, ws), np.float32)
    got_c = np.asarray(arm_s2d_pre(x_s2d, ws), np.float32)
    for name, got in (("ingraph", got_b), ("pre", got_c)):
        rel = np.abs(got - want).max() / max(np.abs(want).max(), 1e-9)
        log(f"parity {name}: shape {got.shape} max rel {rel:.3e}")
        assert got.shape == want.shape
        assert rel < 3e-2, rel  # bf16 sum-order differences

    base = time_device_fn(lambda v, *_: v, x, k1=4, k2=20, reps=5)
    rows = []
    for name, fn, xx, ww in (
        ("conv1 11x11 s4 (base)", arm_base, x, wd),
        ("s2d in-graph", arm_s2d_ingraph, x, ws),
        ("s2d pre-packed input", arm_s2d_pre, x_s2d, ws),
    ):
        bl = time_device_fn(lambda v, *_: v, xx, k1=4, k2=20, reps=5)
        t = time_device_fn(fn, xx, ww, k1=4, k2=20, reps=5) - bl
        rows.append((name, t))
        print(f"{name:28s} {t*1e3:7.3f} ms   ({b/t:,.0f} img/s)",
              flush=True)
    _ = base
    return 0


if __name__ == "__main__":
    sys.exit(main())
