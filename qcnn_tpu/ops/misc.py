"""Pooling, LRN, activations — the non-PQ layers of the 7-type op set."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def caffe_max_pool(
    x: jax.Array, *, kernel: int, stride: int, pad: int = 0,
    ceil_mode: bool = True,
) -> jax.Array:
    """Max pooling with Caffe's CEIL output-size rule.

    out = ceil((H + 2p - k)/s) + 1 (CaffeEva.cc:367-370); border windows are
    clamped to valid pixels (:885-898), which -inf padding reproduces exactly
    for max reduction.

    ceil_mode=False gives the torch/canonical FLOOR rule instead
    (out = floor((H + 2p - k)/s) + 1) — used by the ResNet family so
    torchvision-format pretrained weights import 1:1 (their stem pool is
    floor-mode 112->56; Caffe's ceil rule would give 57).
    """
    b, h, w, c = x.shape
    if ceil_mode:
        oh = -(-(h + 2 * pad - kernel) // stride) + 1
        ow = -(-(w + 2 * pad - kernel) // stride) + 1
        if pad:
            # Caffe's clamp (pooling_layer.cpp): drop a trailing output
            # whose window lies entirely in padding — without this the
            # extra row/column is all -inf and the spatial size diverges
            # from the reference for ceil-mode pools with pad > 0
            if (oh - 1) * stride >= h + pad:
                oh -= 1
            if (ow - 1) * stride >= w + pad:
                ow -= 1
    else:
        oh = (h + 2 * pad - kernel) // stride + 1
        ow = (w + 2 * pad - kernel) // stride + 1
    pad_h_hi = max(0, (oh - 1) * stride + kernel - h - pad)
    pad_w_hi = max(0, (ow - 1) * stride + kernel - w - pad)
    # int8 activations (the int8-native dataflow, ops/fc.py requantize
    # epilogue) max-pool in the quantized domain: monotone per-tensor
    # quantization commutes with max, so pooling int8 codes IS pooling the
    # dequantized values. Identity for integer max is the dtype minimum.
    if jnp.issubdtype(x.dtype, jnp.integer):
        init = jnp.asarray(jnp.iinfo(x.dtype).min, x.dtype)
    else:
        init = jnp.asarray(-jnp.inf, x.dtype)
    return lax.reduce_window(
        x,
        init,
        lax.max,
        window_dimensions=(1, kernel, kernel, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (pad, pad_h_hi), (pad, pad_w_hi), (0, 0)),
    )


def lrn(
    x: jax.Array, *, size: int, alpha: float, beta: float, k: float,
    impl: str = "auto", channel_map=None, sum_dtype=None,
) -> jax.Array:
    """Across-channel local response normalization (CalcFeatMap_LoRN,
    CaffeEva.cc:1038-1089):

        out = x * (k + (alpha/size) * sum_{window} x^2) ** (-beta)

    with a channel window of `size` centred at each channel, zero-padded.

    impl='auto' -> 'band' on TPU: the channel-window sum is a banded c x c
    matmul the MXU executes natively. Measured on (256,55,55,96) bf16:
    band 561 us vs reduce_window 2730 us vs shifted-slices 2086 us vs a
    Pallas lane-roll kernel 2969 us (rolls on non-128 lane widths lower
    terribly) — all bit-identical outputs.

    channel_map: lane-padded channel layout (models/lanepad.py; -1 =
    padding). The window adjacency follows the ORIGINAL indices, expressed
    in the band matrix — same matmul cost, any layout. Forces 'band'.

    sum_dtype: dtype the band matmul MATERIALIZES its window-sum in
    (default f32 — exact, bit-identical to the jnp path). bf16 halves the
    binding HBM stream of the band path (the f32 window-sum tensor is the
    largest intermediate in the AlexNet block-1 HLO — 297 MB at conv1
    shape, tools/headline_attr.py round 4); the scale/rsqrt/mul epilogue
    still computes in f32 in-register, so the only rounding is the one
    bf16 quantization of the window sum. network.forward passes its
    compute_dtype here.
    """
    if size % 2 == 0:
        # the band formulation is centred (radius (size-1)//2 both
        # sides), the jnp shifted-slice path is not: for EVEN size the
        # two silently diverge (round-5 review: measured 3.9e-4 on a
        # size-4 probe, i.e. TPU vs CPU results differ). Caffe's LRN is
        # odd-size only; make the contract explicit.
        raise ValueError(f"lrn requires an odd window size, got {size}")
    if channel_map is not None:
        m = jnp.asarray(channel_map, jnp.int32)
        valid = m >= 0
        band = (
            (jnp.abs(m[:, None] - m[None, :]) <= (size - 1) // 2)
            & valid[:, None] & valid[None, :]
        ).astype(x.dtype)
        impl = "band"
    if impl == "auto":
        impl = "band" if jax.default_backend() == "tpu" else "jnp"
    if impl == "band":
        c = x.shape[-1]
        if channel_map is None:
            i = jnp.arange(c)
            band = (
                jnp.abs(i[:, None] - i[None, :]) <= (size - 1) // 2
            ).astype(x.dtype)
        sq = x * x
        sq_sum = jnp.einsum(
            "...c,cd->...d", sq, band,
            preferred_element_type=(sum_dtype or jnp.float32),
        )
        scale = k + (alpha / size) * sq_sum.astype(jnp.float32)
        return (x.astype(jnp.float32) * _neg_pow(scale, beta)).astype(x.dtype)
    radius = (size - 1) // 2
    xf = x.astype(jnp.float32)
    sq = xf * xf
    # Channel-window sum as `size` shifted slices of one padded tensor:
    # measured 4x faster than lax.reduce_window over the minor axis, which
    # dominated the whole AlexNet step (42% at batch 256) before this.
    padded = jnp.pad(sq, ((0, 0),) * 3 + ((radius, size - 1 - radius),))
    c = x.shape[-1]
    sq_sum = padded[..., :c]
    for off in range(1, size):
        sq_sum = sq_sum + padded[..., off : off + c]
    scale = k + (alpha / size) * sq_sum
    return (xf * _neg_pow(scale, beta)).astype(x.dtype)


def _neg_pow(scale: jax.Array, beta: float) -> jax.Array:
    """scale ** (-beta) via rsqrt composition for the betas CNNs use.

    jnp.power lowers to exp/log (two transcendentals per element); rsqrt is
    a single fast VPU op. beta=0.75: s^-0.75 = rsqrt(s) * sqrt(rsqrt(s)).
    """
    if beta == 0.75:
        r = lax.rsqrt(scale)
        return r * jnp.sqrt(r)
    if beta == 0.5:
        return lax.rsqrt(scale)
    if beta == 1.0:
        return 1.0 / scale
    return jnp.power(scale, -beta)


def relu(x: jax.Array) -> jax.Array:
    # dtype-preserving zero: int8-domain activations (the requantize
    # epilogue path) ReLU as max(q, 0) — exact, since symmetric quantization
    # is monotone with q(0) == 0; a float 0.0 literal would promote int8
    # back to float and defeat the int8-native dataflow.
    return jnp.maximum(x, jnp.asarray(0, x.dtype))


def softmax(x: jax.Array, axis: int = -1) -> jax.Array:
    """Numerically stable softmax. The reference's is unstabilized
    (CaffeEva.cc:1098-1116); max-subtraction is mathematically identical and
    is the only sane choice in float32 on hardware."""
    return jax.nn.softmax(x, axis=axis)


def dropout_inference(x: jax.Array) -> jax.Array:
    """Identity at test time (CalcFeatMap_Drpt, CaffeEva.cc:1091-1096)."""
    return x
