#!/usr/bin/env python
"""A/B the ResNet stem (7x7 s2 pad3, Cin=3) formulations at batch 64 bf16.

The profiled stem+pool segment runs at 18.5 TFLOP/s (tools/resnet_profile.py)
because Cin=3 uses 3/128 MXU input lanes. Candidates:
  a) plain conv (shipping)
  b) explicit zero-pad to pad=0, then space-to-depth r=2 -> 12-channel
     stride-1 conv (4x lane occupancy; generalizes the AlexNet transform
     that measured NEGATIVE at s4 pad0, docs/KERNEL_STUDIES.md)
  c) b) but r=2 folding applied twice conceptually = r=2 only (r must equal
     stride); instead also try im2col-as-patches: extract 7x7x3=147-channel
     patches at stride 2 (pure reshape/gather traffic) + 1x1 conv.

    timeout 580 python tools/resnet_stem_ab.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    import jax.numpy as jnp
    from jax import lax

    from qcnn_tpu.ops.conv import _space_to_depth_transform, conv_dense
    from qcnn_tpu.utils.devtime import time_device_fn

    b = 64
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, 224, 224, 3)), jnp.bfloat16)
    kernel = jnp.asarray(
        rng.standard_normal((7, 7, 3, 64)) * 0.05, jnp.bfloat16
    )
    bias = jnp.zeros(64, jnp.float32)

    def plain(x, kernel):
        return conv_dense(x, kernel, bias, stride=2, pad=3)

    def s2d(x, kernel):
        xp = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
        x_sd, k_sd = _space_to_depth_transform(xp, kernel, 2)
        out = lax.conv_general_dilated(
            x_sd, k_sd, window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        return out[:, :112, :112] + bias

    def patches(x, kernel):
        xp = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
        p = lax.conv_general_dilated_patches(
            xp, (7, 7), (2, 2), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )  # (B, 112, 112, 147)
        w = kernel.transpose(2, 0, 1, 3).reshape(147, 64)  # match CHW patches
        return (
            jnp.einsum("bhwc,co->bhwo", p, w,
                       preferred_element_type=jnp.float32) + bias
        )

    want = np.asarray(plain(x, kernel), np.float32)
    for name, fn in (("s2d", s2d), ("patches", patches)):
        got = np.asarray(fn(x, kernel), np.float32)
        err = np.abs(got - want).max() / np.abs(want).max()
        print(f"numerics {name}: max rel err {err:.2e}", flush=True)

    for name, fn in (("plain", plain), ("s2d+prepad", s2d),
                     ("patches+1x1", patches)):
        t = time_device_fn(fn, x, kernel, k1=4, k2=32)
        fl = 2 * b * 112 * 112 * 64 * 7 * 7 * 3
        print(f"{name}: {t*1e3:.3f} ms  ({fl/t/1e12:.1f} TFLOP/s)",
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
