"""Pallas TPU kernel: single-pass fused LRN (square -> banded window-sum
-> rsqrt-pow -> scale).

The shipped XLA formulation (ops/misc.lrn impl='band') is already the
measured winner among XLA variants (561 us on AlexNet's (256,55,55,96)
bf16, KERNEL_STUDIES §2), but it spends ~4x the speed-of-light HBM
traffic: XLA materializes sq / window-sums between passes. The math is
one read and one write per element if everything happens in VMEM:

    y = x * (k + (alpha/size) * (x^2 @ Band)) ** (-beta)

with Band the (C, C) 0/1 banded matrix of the channel window
(CalcFeatMap_LoRN, CaffeEva.cc:1038-1089). This kernel streams x in
(tile_m, C) blocks, squares in bf16 (exactly the precision of the XLA
band path, whose einsum is bf16 x bf16 -> f32), runs the tiny banded
contraction on the MXU per block, and applies the rsqrt-composed
negative power in-register.

**Measured negative result** (KERNEL_STUDIES §2b): despite the bf16 dot
and the (C, 128) lane-padded band (the fixes for round-1's f32 in-kernel
band matmul), Mosaic still runs the in-kernel dot at ~4 % MXU on a
96-lane operand — 2187 us vs the XLA band path's 898 us same-session —
and the shifted-add window variant pays §2's lane-rotation cost
(2574 us). Both kernels are bit-identical to their XLA counterparts and
kept as exercised negatives (tests/test_pallas.py, benchmarks/
lrn_kernels.py); NOT wired into ops/misc.lrn, whose XLA banded matmul
remains the TPU default.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

# one rsqrt-composition table for the production LRN and these kernels —
# the A/B comparisons the kernels exist for must share the exact math
from qcnn_tpu.ops.misc import _neg_pow


def _kernel(x_ref, band_ref, out_ref, *, c, alpha_over_n, k, beta):
    x = x_ref[:]                                   # (Tm, C) bf16
    sq = x * x                                     # bf16, as the XLA path
    sums = jnp.dot(sq, band_ref[:],
                   preferred_element_type=jnp.float32)  # (Tm, Cp) f32
    scale = k + alpha_over_n * sums[:, :c]
    y = x.astype(jnp.float32) * _neg_pow(scale, beta)
    out_ref[:] = y.astype(out_ref.dtype)


def _kernel_roll(x_ref, out_ref, *, c, cp, size, alpha_over_n, k, beta):
    """Window sum via cyclic lane rolls at the FULL 128-lane vreg width.

    §2/§2b measured pltpu.roll as terrible at 96-lane widths; at exactly
    128 lanes it is the native lane rotation. The value is zero-padded
    96 -> 128 IN VMEM (lanes were masked anyway — no HBM inflation, unlike
    the §15 whole-block pad), and because the pad width (>= 32) exceeds
    the window radius, the cyclic wrap only ever carries zeros into the
    real lanes — exact zero-padded window semantics."""
    from jax.experimental.pallas import tpu as pltpu

    x = x_ref[:]                                    # (Tm, C)
    sq = x * x                                      # bf16, as the band path
    sqp = jnp.pad(sq, ((0, 0), (0, cp - c))).astype(jnp.float32)
    radius = (size - 1) // 2
    sums = sqp
    for off in range(1, radius + 1):
        sums = sums + pltpu.roll(sqp, off, 1) + pltpu.roll(sqp, cp - off, 1)
    scale = k + alpha_over_n * sums[:, :c]
    y = x.astype(jnp.float32) * _neg_pow(scale, beta)
    out_ref[:] = y.astype(out_ref.dtype)


def _kernel_shift(x_ref, out_ref, *, c, size, alpha_over_n, k, beta):
    """Window sum via `size` lane-shifted adds instead of the dot —
    probes whether Mosaic's lane rotations beat its in-kernel matmul."""
    x = x_ref[:]
    sq = (x * x).astype(jnp.float32)
    radius = (size - 1) // 2
    tm = x.shape[0]
    zero_col = jnp.zeros((tm, 1), jnp.float32)
    sums = sq
    for off in range(1, radius + 1):
        left = jnp.concatenate(
            [sq[:, off:], jnp.tile(zero_col, (1, off))], axis=1)
        right = jnp.concatenate(
            [jnp.tile(zero_col, (1, off)), sq[:, :-off]], axis=1)
        sums = sums + left + right
    scale = k + alpha_over_n * sums
    y = x.astype(jnp.float32) * _neg_pow(scale, beta)
    out_ref[:] = y.astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("size", "alpha", "beta", "k", "tile_m", "pad_lanes",
                     "window", "interpret"),
)
def lrn_fused(
    x: jax.Array,
    *,
    size: int,
    alpha: float,
    beta: float,
    k: float,
    tile_m: int = 2048,
    pad_lanes: bool = True,
    window: str = "dot",
    interpret: bool = False,
) -> jax.Array:
    """Across-channel LRN over the last axis, one HBM round trip.

    x: (..., C) any rank; computed in the kernel at bf16-square precision
    when window='dot' (bit-matching ops/misc.lrn impl='band' on bf16
    inputs); window='shift' squares in f32 (matches impl='jnp')."""
    orig_shape = x.shape
    c = orig_shape[-1]
    xm = x.reshape(-1, c)
    m = xm.shape[0]
    grid = (pl.cdiv(m, tile_m),)
    block = pl.BlockSpec((tile_m, c), lambda i: (i, 0))

    if window == "shift":
        out = pl.pallas_call(
            functools.partial(
                _kernel_shift, c=c, size=size, alpha_over_n=alpha / size,
                k=k, beta=beta,
            ),
            out_shape=jax.ShapeDtypeStruct((m, c), x.dtype),
            grid=grid,
            in_specs=[block],
            out_specs=block,
            interpret=interpret,
        )(xm)
        return out.reshape(orig_shape)

    if window == "roll":
        cp = 128 * -(-c // 128)
        if cp - c < (size - 1) // 2:
            # wrap lanes would carry real data; widen by one vreg
            cp += 128
        out = pl.pallas_call(
            functools.partial(
                _kernel_roll, c=c, cp=cp, size=size,
                alpha_over_n=alpha / size, k=k, beta=beta,
            ),
            out_shape=jax.ShapeDtypeStruct((m, c), x.dtype),
            grid=grid,
            in_specs=[block],
            out_specs=block,
            interpret=interpret,
        )(xm)
        return out.reshape(orig_shape)

    cp = 128 * -(-c // 128) if pad_lanes else c
    i = np.arange(c)
    band = (np.abs(i[:, None] - i[None, :]) <= (size - 1) // 2)
    band_padded = np.zeros((c, cp), np.float32)
    band_padded[:, :c] = band
    band_arr = jnp.asarray(band_padded, x.dtype)

    out = pl.pallas_call(
        functools.partial(
            _kernel, c=c, alpha_over_n=alpha / size, k=k, beta=beta
        ),
        out_shape=jax.ShapeDtypeStruct((m, c), x.dtype),
        grid=grid,
        in_specs=[
            block,
            pl.BlockSpec((c, cp), lambda i: (0, 0)),
        ],
        out_specs=block,
        interpret=interpret,
    )(xm, band_arr)
    return out.reshape(orig_shape)
