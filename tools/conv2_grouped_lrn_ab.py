#!/usr/bin/env python
"""A/B: keep AlexNet's conv2->relu->LRN2->pool2 segment in GROUPED form.

The round-4 post-fix attribution (KERNEL_STUDIES 16c) shows copy.36 — a
95.6 MB bf16 un-grouping relayout between conv2's grouped output
[B,27,27,2,128] and LRN2's band dot over 256 channels — costing ~4.4% of
the headline step. Hypothesis: express the LRN window-sum as an einsum
directly on the grouped layout (Band reshaped to [G,Cg,G,Cg]; contraction
over (g, c)) and run relu/epilogue/pool on [., ., ., 2, 128], deferring
the un-grouping to AFTER pool2 where the tensor is 4x smaller.

    timeout 1800 python tools/conv2_grouped_lrn_ab.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def band_matrix(c: int, size: int, dtype):
    import jax.numpy as jnp

    idx = np.arange(c)
    band = (np.abs(idx[:, None] - idx[None, :]) <= (size - 1) // 2)
    return jnp.asarray(band.astype(np.float32), dtype)


def main() -> int:
    import jax
    import jax.numpy as jnp

    from qcnn_tpu.utils.devtime import time_device_fn

    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    b, h, cin, cout, g = 256, 27, 96, 256, 2
    size, alpha, beta, k = 5, 1e-4, 0.75, 1.0
    x32 = rng.standard_normal((b, h, h, cin)).astype(np.float32)
    w = (rng.standard_normal((5, 5, cin // g, cout)) * 0.05).astype(
        np.float32)
    bias = rng.standard_normal(cout).astype(np.float32)

    x = jnp.asarray(x32, jnp.bfloat16)
    wj = jnp.asarray(w, jnp.bfloat16)
    bias_j = jnp.asarray(bias, jnp.bfloat16)
    band = band_matrix(cout, size, jnp.bfloat16)
    # grouped band: [G,Cg,G,Cg]
    band_g = band.reshape(g, cout // g, g, cout // g)

    scale = alpha / size

    def pool(y):
        return jax.lax.reduce_window(
            y, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID")

    def arm_flat(xx, ww):
        y = jax.lax.conv_general_dilated(
            xx, ww, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=g, preferred_element_type=jnp.bfloat16)
        y = jnp.maximum(y + bias_j, 0)
        sq = (y.astype(jnp.bfloat16) ** 2)
        ws = jnp.einsum("...c,cd->...d", sq, band,
                        preferred_element_type=jnp.bfloat16)
        den = (k + scale * ws.astype(jnp.float32)) ** (-beta)
        y = (y * den).astype(jnp.bfloat16)
        return pool(y)

    def arm_grouped(xx, ww):
        # two half convs -> [B,H,W,G,Cg]; un-group only after pool2
        ys = []
        for gi in range(g):
            xi = xx[..., gi * (cin // g):(gi + 1) * (cin // g)]
            wi = ww[..., gi * (cout // g):(gi + 1) * (cout // g)]
            ys.append(jax.lax.conv_general_dilated(
                xi, wi, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.bfloat16))
        y = jnp.stack(ys, axis=-2)  # [B,H,W,G,Cg]
        y = jnp.maximum(y + bias_j.reshape(g, cout // g), 0)
        sq = y.astype(jnp.bfloat16) ** 2
        ws = jnp.einsum("bhwgc,gcjd->bhwjd", sq, band_g,
                        preferred_element_type=jnp.bfloat16)
        den = (k + scale * ws.astype(jnp.float32)) ** (-beta)
        y = (y * den).astype(jnp.bfloat16)
        y = jax.lax.reduce_window(
            y, -jnp.inf, jax.lax.max, (1, 3, 3, 1, 1), (1, 2, 2, 1, 1),
            "VALID")
        return y.reshape(y.shape[0], y.shape[1], y.shape[2], cout)

    want = np.asarray(arm_flat(x, wj), np.float32)
    got = np.asarray(arm_grouped(x, wj), np.float32)
    rel = np.abs(got - want).max() / max(np.abs(want).max(), 1e-9)
    log(f"parity grouped: shape {got.shape} vs {want.shape} "
        f"max rel {rel:.3e}")
    assert got.shape == want.shape
    assert rel < 3e-2, rel

    for name, fn in (("conv2+lrn2+pool2 flat (base)", arm_flat),
                     ("grouped end-to-end", arm_grouped)):
        bl = time_device_fn(lambda v, *_: v, x, k1=4, k2=20, reps=5)
        t = time_device_fn(fn, x, wj, k1=4, k2=20, reps=5) - bl
        print(f"{name:32s} {t*1e3:7.3f} ms", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
