"""Pooling, LRN, activations — the non-PQ layers of the 7-type op set."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def caffe_max_pool(
    x: jax.Array, *, kernel: int, stride: int, pad: int = 0
) -> jax.Array:
    """Max pooling with Caffe's CEIL output-size rule.

    out = ceil((H + 2p - k)/s) + 1 (CaffeEva.cc:367-370); border windows are
    clamped to valid pixels (:885-898), which -inf padding reproduces exactly
    for max reduction.
    """
    b, h, w, c = x.shape
    oh = -(-(h + 2 * pad - kernel) // stride) + 1
    ow = -(-(w + 2 * pad - kernel) // stride) + 1
    pad_h_hi = max(0, (oh - 1) * stride + kernel - h - pad)
    pad_w_hi = max(0, (ow - 1) * stride + kernel - w - pad)
    return lax.reduce_window(
        x,
        jnp.asarray(-jnp.inf, x.dtype),
        lax.max,
        window_dimensions=(1, kernel, kernel, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (pad, pad_h_hi), (pad, pad_w_hi), (0, 0)),
    )


def lrn(
    x: jax.Array, *, size: int, alpha: float, beta: float, k: float
) -> jax.Array:
    """Across-channel local response normalization (CalcFeatMap_LoRN,
    CaffeEva.cc:1038-1089):

        out = x * (k + (alpha/size) * sum_{window} x^2) ** (-beta)

    with a channel window of `size` centred at each channel, zero-padded.
    """
    radius = (size - 1) // 2
    xf = x.astype(jnp.float32)
    sq_sum = lax.reduce_window(
        xf * xf,
        0.0,
        lax.add,
        window_dimensions=(1, 1, 1, size),
        window_strides=(1, 1, 1, 1),
        padding=((0, 0), (0, 0), (0, 0), (radius, size - 1 - radius)),
    )
    scale = k + (alpha / size) * sq_sum
    return (xf * jnp.power(scale, -beta)).astype(x.dtype)


def relu(x: jax.Array) -> jax.Array:
    return jnp.maximum(x, 0.0)


def softmax(x: jax.Array, axis: int = -1) -> jax.Array:
    """Numerically stable softmax. The reference's is unstabilized
    (CaffeEva.cc:1098-1116); max-subtraction is mathematically identical and
    is the only sane choice in float32 on hardware."""
    return jax.nn.softmax(x, axis=axis)


def dropout_inference(x: jax.Array) -> jax.Array:
    """Identity at test time (CalcFeatMap_Drpt, CaffeEva.cc:1091-1096)."""
    return x
