"""Pallas TPU kernel: PQ FC as LUT build + in-kernel dynamic-gather
accumulate — the reference's actual hot-path algorithm (CaffeEva.cc
GetInPdMat :1261-1296 then the per-output gather loop :1006-1017) executed
natively instead of reformulated as matmuls.

  out[b, o] = bias[o] + sum_s LUT[b, s, A[o, s]]

The LUT (B, S, K inner products) is built outside the kernel on the MXU
(ops/lut.build_lut — B*S*K*D MACs, trivial at small B). Inside the kernel
the LUT chunk sits VMEM-resident as (K, Sg) with subspaces on lanes, so the
accumulate is ONE per-lane dynamic gather per (Ot, Sg) tile plus a lane
reduction — ~2 VPU ops per (output, subspace) pair.

Why this exists next to decode/indecode (KERNEL_STUDIES §9d): per step it
streams only the uint8 assignments (Cout*S bytes) — 8x less HBM than even
the bf16 decoded weight — so it is the latency play for batch-1/serving
where every other formulation is weight-stream bound, and the only
formulation whose traffic is independent of D. Cost scales linearly with
B (B*Cout*S gather ops), so large batches belong to decode/indecode.

Availability of the compiled gather is probed by
tools/pallas_gather_probe.py; interpret mode keeps CPU tests exact.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qcnn_tpu.ops import lut as lut_ops
from qcnn_tpu.ops.pallas._common import auto_interpret, ceil_to


def _kernel(lut_ref, asmt_ref, bias_ref, out_ref):
    """lut (1, K, Sg) f32; asmt (Ot, Sg) int8; bias (Ot, 1) f32;
    out (Ot, 1) f32 accumulated over the S-chunk grid axis."""
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _():
        out_ref[:] = bias_ref[:]

    idx = jnp.maximum(asmt_ref[:].astype(jnp.int32), 0)  # padding rows: -1
    val = jnp.take_along_axis(lut_ref[0], idx, axis=0)  # (Ot, Sg)
    out_ref[:] += jnp.sum(val, axis=1, keepdims=True)


@functools.partial(
    jax.jit, static_argnames=("block_o", "block_s", "interpret")
)
def _lut_gather(lut, asmt, bias, *, block_o, block_s, interpret):
    b, k, s = lut.shape
    cout, s_dim = asmt.shape
    assert s_dim == s
    s_pad = ceil_to(s, block_s)
    o_pad = ceil_to(cout, block_o)

    # padded lanes gather LUT row 0, which is zero-padded -> contribute 0;
    # K pads up to the 8-sublane Mosaic minimum (indices never reach it)
    k_pad = ceil_to(k, 8)
    lut_p = jnp.pad(lut, ((0, 0), (0, k_pad - k), (0, s_pad - s)))
    k = k_pad
    asmt_p = jnp.pad(
        asmt.astype(jnp.int8),
        ((0, o_pad - cout), (0, s_pad - s)),
        constant_values=-1,
    )
    bias_p = jnp.pad(
        bias.astype(jnp.float32), (0, o_pad - cout)
    ).reshape(o_pad, 1)

    grid = (b, o_pad // block_o, s_pad // block_s)
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, k, block_s), lambda bb, j, kk: (bb, 0, kk),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (block_o, block_s), lambda bb, j, kk: (j, kk),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (block_o, 1), lambda bb, j, kk: (j, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (block_o, 1), lambda bb, j, kk: (j, bb),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((o_pad, b), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * o_pad * s_pad,
            bytes_accessed=(
                b * k * s_pad * 4 + o_pad * s_pad * b + o_pad * b * 4
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(lut_p, asmt_p, bias_p)
    return out[:cout].T  # (B, Cout)


def pq_fc_lut_gather(
    x: jax.Array,
    params: dict,
    *,
    block_o: int = 512,
    block_s: int = 512,
    interpret: bool | None = None,
) -> jax.Array:
    """PQ FC via LUT build + in-kernel gather-accumulate.

    Args:
      x: (B, Cin) activations.
      params: {"codebooks" (S,K,D), "assignments" (Cout,S) uint8, "bias"}.
      block_o/block_s: output-row / subspace-lane tile sizes.
      interpret: force interpreter mode; default auto (True off-TPU).
    """
    interpret = auto_interpret(interpret)
    k = params["codebooks"].shape[1]
    if k > 127:
        raise ValueError(
            f"lut-gather kernel supports K <= 127 (int8 assignments); "
            f"got K={k}"
        )
    lut = lut_ops.build_lut(x, params["codebooks"])  # (B, S, K) f32
    lut_t = lut.transpose(0, 2, 1)  # (B, K, S)
    s = lut_t.shape[-1]
    return _lut_gather(
        lut_t,
        jnp.asarray(params["assignments"]),
        jnp.asarray(params["bias"]),
        block_o=min(block_o, ceil_to(params["assignments"].shape[0], 8)),
        block_s=min(block_s, ceil_to(s, 128)),
        interpret=interpret,
    )
