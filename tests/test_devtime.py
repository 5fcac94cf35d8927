"""The device-timing harness itself: ordering sanity and dtype robustness.

devtime measurements defeated two silent failure modes this round (XLA
strength-reduction of the carry perturbation; DCE through partial output
reductions) — these tests pin the harness behaviors that prevent them.
"""

import jax.numpy as jnp
import numpy as np

from qcnn_tpu.utils.devtime import time_device_fn


def test_orders_heavy_vs_light():
    w = jnp.asarray(np.random.default_rng(0).standard_normal(
        (512, 512)).astype(np.float32))
    x = np.random.default_rng(1).standard_normal((512, 512)).astype(np.float32)

    def light(x):
        return x + 1.0

    def heavy(x):
        y = x
        for _ in range(16):
            y = y @ w
        return y

    t_light = time_device_fn(light, x, k1=2, k2=12)
    t_heavy = time_device_fn(heavy, x, k1=2, k2=12)
    assert t_heavy > t_light


def test_bfloat16_and_multi_output():
    x = np.random.default_rng(2).standard_normal((64, 64)).astype(np.float32)

    def fn(x):
        # bf16 input path (the perturbation must not promote the carry
        # dtype) and a pytree output (every leaf reduced)
        y = x.astype(jnp.bfloat16) * 2
        return {"a": y, "b": y.sum()}

    t = time_device_fn(lambda v: fn(v.astype(jnp.bfloat16)),
                       np.asarray(x), k1=2, k2=8)
    assert np.isfinite(t)


def test_bf16_carry_dtype():
    xb = jnp.asarray(np.ones((32, 32), np.float32)).astype(jnp.bfloat16)
    t = time_device_fn(lambda v: v * 1.5, xb, k1=2, k2=8)
    assert np.isfinite(t)
